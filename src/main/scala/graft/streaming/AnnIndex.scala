package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle stats for one index version — the numbers the retrain
  * trigger reads. `appendedFrac` = appended rows / seeded rows;
  * `cellImbalance` = largest cell / mean cell size (1.0 = perfectly
  * balanced; grows as frozen centroids stop tracking the data). */
final case class AnnIndexStats(version: Int, seeded: Long, appended: Long,
    appendedFrac: Double, cellImbalance: Double, mergedThrough: Long)

/** VERSIONED lifecycle for the persisted IVF index (round-12 VERDICT
  * #1): n12 builds the index, [[StreamOps.ingestAnn]] appends to it —
  * but append-only maintenance against frozen seed-time centroids
  * degrades silently as ingested batches accumulate (cell balance
  * drifts, probe recall decays; the first thing a real retrieval store
  * hits after a week of ingest). This module adds the missing piece:
  * measurement ([[stats]]), the refresh lever ([[retrain]]) and a
  * measured trigger ([[maybeRetrain]]).
  *
  * Layout — one root, versioned subdirs, each version self-contained:
  * {{{
  *   root/v=K/centroids          (cid, cv, cn)
  *   root/v=K/cells/batch_id=*   (cid, vec_id, v, nrm); -1 = compacted
  *   root/v=K/meta               one row: merged_through BIGINT
  * }}}
  * [[retrain]] never mutates v=K: it writes v=K+1 (new centroids
  * trained from scratch over the FULL stored corpus, all cells
  * rewritten as one compacted `batch_id=-1` partition) and readers/
  * ingest pick up the new version atomically via [[latestVersion]].
  * Version dirs are cheap to retain for rollback and are pruned by
  * whatever retention the deployment wants — the engine only ever
  * reads the latest.
  *
  * Replay semantics across a retrain: `meta.merged_through` records
  * the highest ingested batch id folded into the compacted corpus. A
  * replayed batch (failure between write and checkpoint commit) with
  * `batchId <= merged_through` must NOT append — its vectors already
  * live in `batch_id=-1` — so [[ingest]] skips the append and only
  * rewrites its probe output (idempotent by the deterministic
  * batch-id path). The probe of such a replayed batch runs against
  * the compacted corpus, which may include LATER batches than the
  * original run saw — the documented divergence: append idempotence
  * (no vector ever double-enters the index) is guaranteed across
  * retrains; probe-output replay identity is guaranteed only within
  * an index version.
  *
  * 100 TB posture: retrain is the offline once-per-corpus-version
  * job (linear scans + constant-K broadcasts, the exact n7 build
  * shapes); ingest stays O(batch · IvfK) per micro-batch; nothing
  * here ever collects vectors to the driver.
  */
object AnnIndex {

  private val Ann = graft.ops.Ann

  def versionDir(root: String, v: Int): String = s"$root/v=$v"
  def centDir(root: String, v: Int): String = s"${versionDir(root, v)}/centroids"
  def cellsDir(root: String, v: Int): String = s"${versionDir(root, v)}/cells"
  private def metaDir(root: String, v: Int): String =
    s"${versionDir(root, v)}/meta"

  /** Highest v=K subdir present, or -1 when the root is empty. */
  def latestVersion(root: String): Int =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toInt)
      .foldLeft(-1)(math.max)

  private def writeMeta(s: SparkSession, root: String, v: Int,
      mergedThrough: Long): Unit = {
    import s.implicits._
    Seq(mergedThrough).toDF("merged_through")
      .coalesce(1).write.mode("overwrite").parquet(metaDir(root, v))
  }

  def mergedThrough(s: SparkSession, root: String, v: Int): Long =
    s.read.parquet(metaDir(root, v)).head().getLong(0)

  /** Build v=0 from the initial corpus: n12's build (two Lloyd
    * iterations from the md5 seed set, argmax-cosine cell assignment)
    * written as the first version. Returns 0. */
  def seed(embeddings: DataFrame, root: String): Int = {
    val s = embeddings.sparkSession
    require(latestVersion(root) < 0, s"index at $root already seeded")
    val vecs = Ann.normed(embeddings)
    val trained = Ann.lloydStep(vecs,
      Ann.lloydStep(vecs, Ann.seedCentroids(vecs)))
    trained.write.mode("overwrite").parquet(centDir(root, 0))
    val cents = s.read.parquet(centDir(root, 0))
    Ann.assignCells(vecs, cents)
      .write.mode("overwrite").parquet(s"${cellsDir(root, 0)}/batch_id=-1")
    writeMeta(s, root, 0, mergedThrough = -1L)
    0
  }

  /** The stored corpus of the latest version: (vec_id, v, nrm). */
  def corpus(s: SparkSession, root: String): DataFrame = {
    val v = latestVersion(root)
    s.read.parquet(cellsDir(root, v)).select("vec_id", "v", "nrm")
  }

  /** Probe the LATEST version with an explicit query frame
    * (qid, qv, qn) — 2-cell probe, exact top-3 rerank, stored
    * artifacts only. */
  def probe(s: SparkSession, root: String, queries: DataFrame)
      : DataFrame = {
    val v = latestVersion(root)
    Ann.probeStored(queries, s.read.parquet(centDir(root, v)),
      s.read.parquet(cellsDir(root, v))
        .select("cid", "vec_id", "v", "nrm"))
  }

  /** Streaming maintenance against the latest version — the versioned
    * form of [[StreamOps.ingestAnn]]: each micro-batch probes the
    * strictly-older stored index, then appends its cell assignments
    * WITHOUT retraining. The version is resolved per batch, so a
    * [[retrain]] performed while the stream runs is picked up on the
    * next micro-batch; the `merged_through` guard keeps a replayed
    * pre-retrain batch from double-entering the compacted corpus. */
  def ingest(vecs: DataFrame, root: String, outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      val nv = Ann.normed(batch.select("vec_id", "embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val v = latestVersion(root)
        val cents = s.read.parquet(centDir(root, v))
        val prior = s.read.parquet(cellsDir(root, v))
          .filter(col("batch_id") < batchId)
          .select("cid", "vec_id", "v", "nrm")
        Ann.probeStored(
            nv.select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn")),
            cents, prior)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        if (batchId > mergedThrough(s, root, v))
          Ann.assignCells(nv, cents)
            .write.mode("overwrite")
            .parquet(s"${cellsDir(root, v)}/batch_id=$batchId")
      } finally {
        nv.unpersist(); graft.Caches.drain(s)
      }
    }

  /** Measure the latest version: appended fraction and cell imbalance
    * — the two drift signals a retrain trigger can act on. One keyed
    * aggregate over the cell store's (cid, batch_id) columns; nothing
    * vector-sized moves. */
  def stats(s: SparkSession, root: String): AnnIndexStats = {
    val v = latestVersion(root)
    val cells = s.read.parquet(cellsDir(root, v))
    val byCell = cells.groupBy("cid").agg(
      count(lit(1)).as("n"),
      sum(when(col("batch_id") === -1, 1L).otherwise(0L)).as("n_seed"))
    val row = byCell.agg(
      sum("n_seed").as("seeded"),
      (sum("n") - sum("n_seed")).as("appended"),
      (max("n") * count(lit(1)).cast("double") / sum("n"))
        .as("imbalance")).head()
    val seeded = row.getLong(0)
    val appended = row.getLong(1)
    AnnIndexStats(v, seeded, appended,
      if (seeded == 0) Double.PositiveInfinity
      else appended.toDouble / seeded,
      row.getDouble(2), mergedThrough(s, root, v))
  }

  /** The refresh lever: retrain centroids FROM SCRATCH over the full
    * stored corpus (seed + every appended batch — the identical n12
    * build: md5 seed set, two Lloyd iterations), rewrite every cell
    * assignment as one compacted partition, and publish it all as
    * version K+1. The new version's probe output is row-identical to
    * a from-scratch n12 build over the merged corpus (spec-locked) —
    * the retrain IS the build, just fed by the index instead of the
    * raw table. Returns the new version. */
  def retrain(s: SparkSession, root: String): Int = {
    val v = latestVersion(root)
    val old = s.read.parquet(cellsDir(root, v))
    val maxBatch = old.agg(max(col("batch_id").cast("long"))).head()
      .getLong(0)
    val vecs = old.select("vec_id", "v", "nrm")
    val trained = Ann.lloydStep(vecs,
      Ann.lloydStep(vecs, Ann.seedCentroids(vecs)))
    val nv = v + 1
    trained.write.mode("overwrite").parquet(centDir(root, nv))
    val cents = s.read.parquet(centDir(root, nv))
    Ann.assignCells(vecs, cents)
      .write.mode("overwrite").parquet(s"${cellsDir(root, nv)}/batch_id=-1")
    writeMeta(s, root, nv,
      mergedThrough = math.max(maxBatch, mergedThrough(s, root, v)))
    nv
  }

  /** The measured trigger: retrain when the appended fraction reaches
    * `maxAppendedFrac` (default 1.0 — the corpus has doubled since the
    * centroids last saw it; the drift experiment in SCALE.md round 12
    * places the recall knee) or when cell imbalance exceeds
    * `maxImbalance` (frozen centroids funneling drifted data into few
    * cells). Returns the new version when it fired. Run it between
    * micro-batches or on the maintenance cadence — [[ingest]] picks up
    * the new version on its next batch. */
  def maybeRetrain(s: SparkSession, root: String,
      maxAppendedFrac: Double = 1.0,
      maxImbalance: Double = 4.0): Option[Int] = {
    val st = stats(s, root)
    if (st.appendedFrac >= maxAppendedFrac ||
        st.cellImbalance >= maxImbalance)
      Some(retrain(s, root))
    else None
  }
}
