package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ANN index-lifecycle drift experiment (round-12 VERDICT #1):
  * `ingestAnn` appends cell assignments against frozen seed-time
  * centroids forever — this measures what that costs, then measures
  * what the [[graft.streaming.AnnIndex.retrain]] lever buys back.
  *
  * Protocol:
  *  - SEED: the harness embeddings table (SPARK_GRAFT_SF_DIR, default
  *    sf0.1) builds index v=0 — the n12 build exactly.
  *  - INGEST: synthetic "new content" batches stream in through the
  *    REAL versioned ingest path (MemoryStream → AnnIndex.ingest →
  *    probe + append per micro-batch). New content is 48 topic
  *    clusters (> IvfK=32) of md5-seeded random unit directions in
  *    64-dim with 0.15 jitter — near-orthogonal both to the organic
  *    corpus and to each other, the "new topics appear over time"
  *    shift a retrieval store actually sees. Because frozen centroids
  *    never saw those directions, a topic's members scatter across
  *    cells on near-zero cosine noise while their TRUE neighbors are
  *    topic-mates: exactly the geometry where a 2-cell probe loses
  *    recall.
  *  - MEASURE at appended fraction 1×/4×/16× of the seeded corpus:
  *    probe-2 recall@3 vs exact kNN over the full stored corpus, for
  *    (a) drifted queries (every 20th appended id) and (b) organic
  *    seed queries (the n12 probe rule), plus cell imbalance and the
  *    mean scanned corpus fraction per probe.
  *  - RETRAIN at 16× via the measured trigger
  *    (AnnIndex.maybeRetrain) and re-measure — the recovery row.
  *
  * Prints one JSON line and writes ANN_DRIFT.json (or
  * SPARK_GRAFT_ANN_DRIFT_OUT).
  */
object AnnDrift {

  val Dim = 64
  val Topics = 48
  val Jitter = 0.15f

  private def u(seedStr: String): Float = {
    // uniform in [-1, 1] from the first 6 md5 hex chars
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seedStr.getBytes("UTF-8"))
    val x = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
    (x.toFloat / 0x7fffff) - 1f
  }

  private lazy val topicDirs: Array[Array[Float]] =
    Array.tabulate(Topics) { t =>
      val d = Array.tabulate(Dim)(j => u(s"topic_${t}_$j"))
      val n = math.sqrt(d.map(x => x.toDouble * x).sum).toFloat
      d.map(_ / n)
    }

  def driftVec(id: Long): Array[Float] = {
    val t = (id % Topics).toInt
    Array.tabulate(Dim)(j =>
      topicDirs(t)(j) + Jitter * u(s"jit_${id}_$j"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val AnnIdx = graft.streaming.AnnIndex

    val root = graft.Warehouse.tempDir("anndrift_idx_")
    val outDir = graft.Warehouse.tempDir("anndrift_out_")

    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nSeed = emb.count()
    AnnIdx.seed(emb, root)
    System.err.println(s"[anndrift] seeded v=0 with $nSeed vectors " +
      s"from $sfDir")

    // drifted ids in a namespace clear of any corpus/replica id
    val Base = 2000000000000L
    def batchRows(lo: Long, hi: Long): Seq[(Long, Array[Float])] =
      (lo until hi).map(i => (Base + i, driftVec(i)))

    /** recall@3 of the latest stored index vs exact kNN over the same
      * stored corpus, for the given query frame; also the mean scanned
      * corpus fraction per probe. */
    def measure(queries: DataFrame): (Double, Double) = {
      val v = AnnIdx.latestVersion(root)
      val cents = spark.read.parquet(AnnIdx.centDir(root, v))
      val cells = spark.read.parquet(AnnIdx.cellsDir(root, v))
        .select("cid", "vec_id", "v", "nrm")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCorpus = cells.count().toDouble
      val q = queries.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nq = q.count().toDouble
      val got = graft.ops.Ann.probeStored(q, cents, cells)
        .select("qid", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // scanned fraction: the two probed cells' stored sizes per query
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("csim").desc, col("cid"))
      val sizes = cells.groupBy("cid").agg(count(lit(1)).as("cell_n"))
      val scanned = q.crossJoin(broadcast(cents))
        .withColumn("csim", round(graft.ops.Ann.simFromNorms(
          col("qv"), col("cv"), col("qn"), col("cn")), 6))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .join(sizes, Seq("cid"))
        .agg(sum("cell_n")).head().getLong(0).toDouble / (nq * nCorpus)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      val exact = q.crossJoin(cells.select(col("vec_id"), col("v"),
          col("nrm")))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", round(graft.ops.Ann.simFromNorms(
          col("qv"), col("v"), col("qn"), col("nrm")), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      cells.unpersist(); q.unpersist()
      (got.intersect(exact).size.toDouble / exact.size, scanned)
    }

    def qFrame(df: DataFrame): DataFrame =
      df.select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))

    def driftQueries(): DataFrame = {
      val v = AnnIdx.latestVersion(root)
      qFrame(spark.read.parquet(AnnIdx.cellsDir(root, v))
        .filter(col("vec_id") >= Base && col("vec_id") % 20 === 0))
    }
    def seedQueries(): DataFrame = {
      val v = AnnIdx.latestVersion(root)
      qFrame(spark.read.parquet(AnnIdx.cellsDir(root, v))
        .filter(col("vec_id") < Base && col("vec_id") % 20 === 0))
    }

    val mem = MemoryStream[(Long, Array[Float])]
    val q = AnnIdx.ingest(mem.toDF().toDF("vec_id", "embedding"),
      root, outDir).start()
    val checkpoints = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      // batches: 1× in one batch; +3× in 3; +12× in 4 larger ones
      val plan: Seq[(Long, Long)] = {
        val s1 = Seq(0L -> nSeed)
        val s4 = (1 to 3).map(k => (k * nSeed) -> ((k + 1) * nSeed))
        val s16 = (0 until 4).map(k =>
          (4 * nSeed + 3 * k * nSeed) -> (4 * nSeed + 3 * (k + 1) * nSeed))
        s1 ++ s4 ++ s16
      }
      val markAfter = Map(0 -> "1x", 3 -> "4x", 7 -> "16x")
      plan.zipWithIndex.foreach { case ((lo, hi), i) =>
        mem.addData(batchRows(lo, hi)); q.processAllAvailable()
        markAfter.get(i).foreach { tag =>
          val st = AnnIdx.stats(spark, root)
          val (rd, scan) = measure(driftQueries())
          val (rs, _) = measure(seedQueries())
          System.err.println(f"[anndrift] $tag%-4s appended=${st.appended}" +
            f" frac=${st.appendedFrac}%.2f imb=${st.cellImbalance}%.2f " +
            f"recall_drift=$rd%.3f recall_seed=$rs%.3f scanned=$scan%.4f")
          checkpoints += (f""","$tag":{"appended":${st.appended},""" +
            f""""frac":${st.appendedFrac}%.3f,""" +
            f""""imbalance":${st.cellImbalance}%.3f,""" +
            f""""recall_drift":$rd%.4f,"recall_seed":$rs%.4f,""" +
            f""""scanned_frac":$scan%.5f}""")
        }
      }
      // the lever: trigger fires (frac >> 1.0), retrain, re-measure
      val t0 = System.nanoTime()
      val bumped = AnnIdx.maybeRetrain(spark, root, maxAppendedFrac = 1.0)
      val retrainS = (System.nanoTime() - t0) / 1e9
      require(bumped.nonEmpty, "trigger must fire at 16x appended")
      val st = AnnIdx.stats(spark, root)
      val (rd, scan) = measure(driftQueries())
      val (rs, _) = measure(seedQueries())
      System.err.println(f"[anndrift] post-retrain v=${st.version} " +
        f"(${retrainS}%.1f s) imb=${st.cellImbalance}%.2f " +
        f"recall_drift=$rd%.3f recall_seed=$rs%.3f scanned=$scan%.4f")
      checkpoints += (f""","post_retrain":{"version":${st.version},""" +
        f""""retrain_s":$retrainS%.1f,""" +
        f""""imbalance":${st.cellImbalance}%.3f,""" +
        f""""recall_drift":$rd%.4f,"recall_seed":$rs%.4f,""" +
        f""""scanned_frac":$scan%.5f}""")
    } finally q.stop()

    val json = s"""{"metric":"ann_drift","sf":"${sfDir.split('/').last}",""" +
      s""""seed_vectors":$nSeed,"topics":$Topics""" +
      checkpoints.mkString + "}"
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_ANN_DRIFT_OUT", "ANN_DRIFT.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
