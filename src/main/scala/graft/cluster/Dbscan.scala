package graft.cluster

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed DBSCAN with pivot-ring partitioning and a
  * connected-components label merge (SURVEY.md §2.10 M5–M8; reference
  * `Src/dbscan.py:84-123`).
  *
  * Algorithm:
  *  1. a deterministic pivot (the min-id point) anchors every point to a
  *     ring `floor(dist(p, pivot)/eps)`; each point is copied to its ring
  *     and the next one, so by the triangle inequality every eps-pair
  *     co-occurs in at least one ring (`Src/dbscan.py:11-21`);
  *  2. per-ring O(n²) eps-neighbor scan (`Src/dbscan.py:24-50`) — the
  *     quadratic cost is bounded by ring population, which eps controls;
  *  3. core points (|N(p)|+1 >= minPts) spread their own id as a label to
  *     themselves and their neighbors (`Src/dbscan.py:53-81`);
  *  4. a point holding several labels proves those labels co-occur; label
  *     components are merged with GraphX `connectedComponents`
  *     (`Src/dbscan.py:104-117` used GraphFrames) and every labeled point
  *     takes its component's min label.
  *
  * Scale posture: the only driver-side action is reading ONE row (the
  * pivot); everything else is keyed joins/groups. Ring skew at huge n is
  * handled upstream by eps choice; the GraphX step runs on the label
  * graph (#cores vertices), which is orders of magnitude smaller than
  * the point set.
  */
object Dbscan {

  /** Executor-side memo of token splits — distance closures receive the
    * same value strings across O(cell²) pair evaluations, so splitting
    * once per distinct value (not per pair) removes a constant factor
    * from every scan. Bounded: cleared if it outgrows the cap. */
  private object TokenCache {
    private val m =
      new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[String]]()
    def get(s: String): IndexedSeq[String] = {
      if (m.size > 500000) m.clear()
      var v = m.get(s)
      if (v == null) { v = s.split("-").toIndexedSeq; m.put(s, v) }
      v
    }
  }

  /** Batch pair test for one scan cell: `prepare` sees every value in the
    * cell once (tokenize, intern tokens to ints, build masks — whatever
    * the metric needs), and the returned predicate answers
    * `dist(vals(i), vals(j)) <= eps` by INDEX. This moves all per-value
    * work out of the O(cell²) loop: the string form paid two hash
    * lookups plus string-equality DP cells per pair (measured ~60% of
    * the whole m5 query). */
  trait PairScan extends Serializable {
    def prepare(vals: Array[String]): (Int, Int) => Boolean
  }

  /** Fallback: per-pair string distance (exact `dist <= eps`). */
  private final class StringScan(test: (String, String) => Double, eps: Double)
      extends PairScan {
    def prepare(vals: Array[String]): (Int, Int) => Boolean =
      (i, j) => test(vals(i), vals(j)) <= eps
  }

  /** @param points (id, value) pairs; ids must be unique
    * @param dist   symmetric distance on values
    * @return (id, component, is_core); component = -1 for noise
    *
    * Scale guards beyond the reference's design:
    *  - identical values are collapsed into ONE weighted representative
    *    before the quadratic scan (duplicates are at distance 0 and share
    *    a neighborhood, so this is exact DBSCAN, not an approximation) —
    *    the quadratic cost depends on DISTINCT values, not rows;
    *  - label co-occurrence edges are star-shaped per point (min-label →
    *    others) instead of cliques, so a point holding k labels emits
    *    k-1 edges, not k² (connectivity is preserved).
    */
  def run(
      spark: SparkSession,
      points: Dataset[(Long, String)],
      eps: Double,
      minPts: Int,
      dist: (String, String) => Double,
      scanDist: (String, String) => Double = null,
      scanKey: String => Long = null,
      pairScan: PairScan = null): DataFrame = {
    import spark.implicits._
    // pair scans only need a "<= eps" decision — callers may supply a
    // batch PairScan (preferred: per-value prep runs once per cell, not
    // per pair) or a cheaper bounded distance (ring assignment keeps
    // `dist` — the triangle-inequality argument needs the exact metric)
    val scan: PairScan =
      if (pairScan != null) pairScan
      else new StringScan(if (scanDist == null) dist else scanDist, eps)

    // stage timing for perf work, off unless GRAFT_DBSCAN_TIMING is set
    val t0 = System.nanoTime()
    def mark(label: String): Unit =
      if (sys.env.contains("GRAFT_DBSCAN_TIMING"))
        System.err.println(f"[dbscan] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // normalize column names — callers pass tuples under arbitrary names.
    // localCheckpoint (LAZY): it is reused (reps build + final
    // value→label join) AND it truncates the input lineage — a stage-2
    // DBSCAN composed over a stage-1 output otherwise embeds the whole
    // upstream plan once per downstream join (exponential plan growth;
    // measured as an OOM just STRINGIFYING the plan in tests). Lazy, so
    // the checkpoint materializes inside the stats job below instead of
    // paying a dedicated scheduling round trip (r3 ran ~6 sequential
    // jobs per DBSCAN; each round trip costs ~0.3-0.5 s in the driver
    // environment).
    val pts = points.toDF("id", "value").localCheckpoint(false)

    // 0. collapse duplicates: representative id + multiplicity per value
    val reps = graft.Caches.track(pts.groupBy("value")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("w"))
      .select(col("rep"), col("value"), col("w")).as[(Long, String, Long)])
    // 1. deterministic pivot = value of the min-rep point; fetched in the
    //    SAME job as the distinct-value count (each Spark action on this
    //    tiny frame costs a full scheduling round trip)
    val stats = reps.toDF("rep", "value", "w")
      .agg(count(lit(1)), min_by(col("value"), col("rep"))).head()
    if (stats.isNullAt(1)) return emptyResult(spark)
    val nDistinct = stats.getLong(0)
    val pivot = stats.getString(1)
    mark("stats")

    // 2. ring duplication + per-cell quadratic scan over distinct values.
    //    `scanKey` (contract: |key(a)-key(b)| > 1 ⇒ dist(a,b) > eps)
    //    refines big rings into (ring, key) cells. Each cell is further
    //    split into a G×G triangle-join block grid: when the distance
    //    distribution is degenerate (edit distances are small integers,
    //    so only a handful of rings exist), the cells alone would cap
    //    parallelism at #cells tasks — the block grid keeps the SAME
    //    pair set but spreads it over G*(G+1)/2 tasks per cell.
    // Adaptive grid: the block fan-out only pays off when cells are big;
    // tiny inputs (fixtures, small SFs) skip the replication entirely.
    val G = if (nDistinct < 2000) 1 else 16
    // every point is copied to its ring r and r+1 (and key k and k+1),
    // so an eps-pair with true rings (ra, rb) co-occurs in cell
    // max(ra, rb) — and, when ra == rb, AGAIN in ra+1. Each pair is
    // therefore OWNED by exactly one cell (the max of the true
    // ring/key coordinates): testing only owned pairs makes the scan
    // output duplicate-free by construction, which both halves the
    // duplicated DP work and removes the pair-table dropDuplicates
    // exchange r3 paid to clean it up. True coords ride along with
    // each copy.
    val ringed = reps.flatMap { case (rep, v, w) =>
      val ring = math.floor(dist(v, pivot) / eps).toLong
      val tk = if (scanKey == null) 0L else scanKey(v)
      val keys = if (scanKey == null) Seq(0L) else Seq(tk, tk + 1L)
      val g = ((rep % G) + G) % G
      val blocks = (0 until G)
        .map(o => (math.min(g, o.toLong), math.max(g, o.toLong))).distinct
      for {
        r <- Seq(ring, ring + 1L); k <- keys; (bi, bj) <- blocks
      } yield ((r, k, bi, bj), g.toLong, rep, v, w, ring, tk)
    }
    val nbrPairs = ringed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val (cellR, cellK, bi, bj) = key
      val arr = it.toArray
      val test = scan.prepare(arr.map(_._4))
      @inline def owned(i: Int, j: Int): Boolean =
        math.max(arr(i)._6, arr(j)._6) == cellR &&
          math.max(arr(i)._7, arr(j)._7) == cellK
      if (bi == bj) {
        // the predicate is symmetric — test each unordered owned pair
        // once, emit both directions
        for {
          i <- arr.indices.iterator
          j <- (i + 1) until arr.length
          if owned(i, j) && test(i, j)
          p <- Iterator((arr(i)._3, arr(j)._3, arr(j)._5),
                        (arr(j)._3, arr(i)._3, arr(i)._5))
        } yield p
      } else {
        val as = arr.indices.filter(i => arr(i)._2 == bi)
        val bs = arr.indices.filter(i => arr(i)._2 == bj)
        for {
          i <- as.iterator
          j <- bs
          if owned(i, j) && test(i, j)
          p <- Iterator((arr(i)._3, arr(j)._3, arr(j)._5),
                        (arr(j)._3, arr(i)._3, arr(i)._5))
        } yield p
      }
    }.toDF("rep", "nbr", "nw")
      // ONE explicit exchange on `rep`, reused by everything downstream:
      // the ball-weight groupBy(rep) and the (broadcast) core label
      // join — no dedup needed, ownership already made pairs unique
      .repartition(col("rep"))
      // persisted EAGERLY (round 13): both the ball-weight aggregation
      // and the label-spread join read this — unpersisted, the O(cell²)
      // scan runs twice, and a LAZY persist still let those two
      // consumers' stages race to first-touch the unbuilt cache inside
      // the label-collect action under the AQE-on protocol (each paying
      // the full quadratic scan — the d11/m23 pattern). The eager cut
      // materializes the scan exactly once; the checkpoint is released
      // by the context cleaner when the query's references drop.
      .localCheckpoint(true)
    // diagnosis only: force the scan so the timing marks isolate it
    // (extra action — never taken without the env flag)
    if (sys.env.contains("GRAFT_DBSCAN_TIMING")) {
      System.err.println(s"[dbscan] pairs ${nbrPairs.count()}")
      mark("scan")
    }

    // 3. eps-ball weight (self multiplicity + neighbor multiplicities);
    //    core iff ball weight >= minPts. Values with no external
    //    neighbor can still be core through their own duplicates.
    //    NB: no collect_set of neighbor lists — in dense neighborhoods
    //    (short paths, small eps-space) a value can have thousands of
    //    eps-neighbors, and building + exploding those arrays was the
    //    single biggest m5 stage; label spreading is a plain join on the
    //    already-deduplicated pair table instead.
    val ball = nbrPairs.groupBy("rep").agg(sum(col("nw")).as("nbrW"))
    val cores = reps.toDF("rep", "value", "w")
      .join(ball, Seq("rep"), "left")
      .filter(col("w") + coalesce(col("nbrW"), lit(0L)) >= minPts)
      .select("rep")
      // eager: labels references cores twice (direct + broadcast join)
      // and the final output joins it again — see nbrPairs above
      .localCheckpoint(true)
    // cores is a bounded label summary (≤ nDistinct ids, no payload) —
    // broadcast both uses so the 600k-row pair table keeps its `rep`
    // partitioning instead of sort-merge-exchanging twice more
    val labels = cores.select(col("rep").as("label"), col("rep").as("pt"))
      .unionByName(nbrPairs
        .select(col("rep").as("label"), col("nbr").as("pt"))
        .join(broadcast(cores.select(col("rep").as("label"))), Seq("label")))
      .transform(graft.Caches.track)
    // NB: no labels.isEmpty probe — the empty (no-core) case flows
    // through naturally (empty edges → empty components → every point
    // noise via the left joins below), which matches the DBSCAN
    // definition AND saves a full scheduling round trip in every run.

    // 4. merge co-occurring labels via connected components. The
    //    (label, pt) table IS the co-occurrence structure: two labels
    //    sharing a point are in one cluster, and a point's component is
    //    the min label reachable through that sharing. Size-guarded
    //    driver path (same dimension-table-class move as
    //    componentsFromEdges): collect the label table under the cap and
    //    run a union-find over LABEL ids, unioning each point's labels
    //    through a per-point anchor (the first label seen for that
    //    point — a star rooted anywhere spans the same set as one
    //    rooted at the min). union-by-min makes find() return the
    //    component's min label, and the anchor map yields
    //    (pt → component) directly — r4's pmin groupBy exchange, pmin
    //    broadcast, edges join and second labels read all disappear.
    //    Past the cap, the distributed chain (per-point min label →
    //    star edges → GraphX) runs exactly as before.
    val repComp: DataFrame = {
      val probe = collectUpTo(
        labels.select(col("label"), col("pt")).as[(Long, Long)],
        DriverCcMaxEdges)
      if (probe.isDefined) {
        labels.unpersist(blocking = false)
        // labels is now fully on the driver — the pair table behind it is
        // dead on this path (the ball/core joins already ran to build it)
        nbrPairs.unpersist(blocking = false)
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val next = parent.getOrElse(c, c); parent(c) = r; c = next
          }
          r
        }
        val anchor = scala.collection.mutable.HashMap.empty[Long, Long]
        probe.get.foreach { case (label, pt) =>
          parent.getOrElseUpdate(label, label)
          anchor.get(pt) match {
            case None => anchor(pt) = label
            case Some(a) =>
              val (ra, rl) = (find(a), find(label))
              if (ra != rl) parent(math.max(ra, rl)) = math.min(ra, rl)
          }
        }
        val ptComp = anchor.iterator
          .map { case (pt, a) => (pt, find(a)) }.toSeq
        spark.createDataset(ptComp).toDF("rep", "component")
      } else {
        // distributed fallback: per-point min label (bounded by
        // nDistinct — partial min() reduces each partition first),
        // star edges (min label → other labels; k-1 edges per point,
        // not k²), GraphX components over edge endpoints only. No
        // edge distinct: CC tolerates duplicates.
        val pmin = labels.groupBy("pt").agg(min(col("label")).as("l1"))
        val edges = labels.join(pmin, Seq("pt"))
          .filter(col("l1") =!= col("label"))
          .select(col("l1"), col("label").as("l2"))
        val comp = componentsFromEdges(spark, edges)
        pmin.join(comp, col("l1") === col("v"), "left")
          .select(col("pt").as("rep"),
            coalesce(col("component"), col("l1")).as("component"))
      }
    }
    mark("cc")
    // repComp is bounded by nDistinct (one row per labeled point) — on
    // the driver path it is already a local relation; hint it so the
    // join never exchanges the representative table
    val repCompHinted =
      if (nDistinct <= 100000L) broadcast(repComp) else repComp
    val repOut = reps.toDF("rep", "value", "w")
      .join(repCompHinted, Seq("rep"), "left")
      .join(broadcast(cores.select(col("rep"), lit(true).as("is_core"))),
        Seq("rep"), "left")
      .select(col("value").as("__v"),
        coalesce(col("component"), lit(-1L)).as("component"),
        coalesce(col("is_core"), lit(false)).as("is_core"))

    // the representative table is bounded by nDistinct (known exactly
    // from the stats job) — under the cap, broadcast it so the final
    // value join neither exchanges nor sorts the full point set
    val repOutHinted =
      if (nDistinct <= 100000L) broadcast(repOut) else repOut
    val out = pts.join(repOutHinted, col("value") === col("__v"))
      .select(col("id"), col("component"), col("is_core"))
    // reps stays persisted: the caller has not materialized `out` yet,
    // and the final join reads reps again — an eager unpersist here made
    // that job silently recompute the groupBy (LRU eviction reclaims
    // the handful of cached MBs once the query finishes)
    out
  }

  /** M8: GraphX connected components over a (v: long) vertex frame and
    * (l1, l2) edge frame; returns (v, component = min member id).
    *
    * The inputs here are label/dimension graphs — orders of magnitude
    * smaller than the point sets they summarize — so the RDDs are
    * coalesced to a handful of partitions: Pregel runs one stage set per
    * iteration, and tiny graphs spread over the session's default
    * parallelism pay far more scheduling than compute (measured 15s →
    * ~2s on a 150-vertex graph at 32 partitions vs 4). */
  /** Size cutoff below which the label graph is resolved with a driver
    * union-find instead of GraphX Pregel. The label graph is a bounded
    * SUMMARY (core labels, not points) — collecting it under this cap is
    * the same class of move as broadcasting a dimension table. GraphX's
    * per-iteration scheduling costs ~10s even on a 150-vertex graph;
    * union-find is milliseconds. Past the cap the distributed path runs. */
  // Overridable (SPARK_GRAFT_CC_CAP) so deployments can move the
  // regime switch and so the crossover can be MEASURED by pinning each
  // route on one graph. The 4M default sits on the round-9 measured
  // curve (PERF.md): with both routes pinned on the same co-activity
  // graphs, driver union-find beat GraphX at 1.2M edges (3.4 vs 4.9 s)
  // and 3.5M edges (6.1 vs 7.2 s) but lost at 13.9M (27.8 vs 23.0 s) —
  // the crossover lies between 3.5M and 13.9M, so 4M keeps the
  // union-find win everywhere it is measured to win while staying a
  // bounded driver transfer (4M edge rows = 64 MB, dimension-broadcast
  // class; the r8 2M default was conservative by half).
  val DriverCcMaxEdges: Long = sys.env.get("SPARK_GRAFT_CC_CAP")
    .map(_.toLong).getOrElse(4000000L)

  def connectedComponents(spark: SparkSession, vertices: DataFrame,
      edges: DataFrame): DataFrame = {
    // resolve components over edge endpoints only, then give every
    // edge-free vertex its own id via a left join — one collect job on
    // the (typically tiny) edge summary instead of r3's two (edges +
    // vertices). NB: vertices absent from `vertices` do not appear in
    // the output even if an edge mentions them (one row per vertex).
    vertices.select(col("v").cast("long").as("v"))
      .join(componentsFromEdges(spark, edges), Seq("v"), "left")
      .select(col("v"),
        coalesce(col("component"), col("v")).as("component"))
  }

  /** Components over the edge list only — (v, component = min reachable
    * id) for every vertex appearing in at least one edge; callers
    * coalesce edge-free vertices to themselves. Size-guarded: under
    * [[DriverCcMaxEdges]] a driver union-find resolves the summary graph
    * (the same class of move as broadcasting a dimension table — GraphX
    * Pregel pays ~10 s of per-iteration scheduling even on a 150-vertex
    * graph); past the cap the distributed GraphX path runs. */
  private[graft] def componentsFromEdges(spark: SparkSession,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    // persist: the size probe below plus the guarded collect (or RDD
    // conversion) would otherwise run the whole upstream edge pipeline
    // twice (measured 2.3 s of the 4.8 s m8 total).
    // Partition-LOCAL streaming dedup (no shuffle): callers skip the
    // global distinct (the union-find dedups anyway), but when the edge
    // list arrives partitioned by one endpoint — as the DBSCAN label
    // graph does — duplicates are co-located and this filter collapses
    // them before they are collected/serialized to the driver.
    val eDs = edges.select(col("l1").cast("long"), col("l2").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
        it.filter(seen.add)
      }
      // tracked: the GraphX (past-cap) path below returns with eDs
      // still feeding the lazy result — only Caches.drain releases it
      .transform(graft.Caches.track)
    val probe = collectUpTo(eDs, DriverCcMaxEdges)
    if (probe.isDefined) {
      eDs.unpersist(blocking = false)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val next = parent.getOrElse(c, c); parent(c) = r; c = next
        }
        r
      }
      probe.get.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val out = parent.keys.toSeq.map(v => (v, find(v)))
      spark.createDataset(out).toDF("v", "component")
    } else {
      val vRdd = eDs.rdd.flatMap { case (a, b) => Iterator(a, b) }
        .distinct().map(v => (v, v))
      val eRdd = eDs.rdd.map { case (a, b) => Edge(a, b, ()) }
      Graph(vRdd, eRdd).connectedComponents().vertices
        .toDF("v", "component")
    }
  }

  /** Size-guarded collect: `Some(rows)` iff the input holds <= cap rows,
    * `None` past the cap. Driver-safe by construction: every task ships
    * at most `cap / numPartitions` rows plus one bounded count, so the
    * worst-case single-job driver transfer is O(cap) — independent of
    * input size. (An r4 single-job `limit(cap+1)` probe with
    * initialNumPartitions bumped to 1e6 could ship cap+1 rows PER TASK
    * on over-cap inputs, blowing spark.driver.maxResultSize in exactly
    * the case the probe exists to detect — and it mutated session-global
    * SQL conf to do it.) The common case stays ONE job: a second
    * (cache-backed) collect runs only when the total is under the cap
    * but some partition overflowed its per-task share — a skew shape the
    * bounded first job cannot distinguish without risking the transfer. */
  private def collectUpTo(ds: Dataset[(Long, Long)],
      cap: Long): Option[Array[(Long, Long)]] = {
    val capInt = cap.toInt
    val rdd = ds.rdd
    val perTask =
      math.max(capInt / math.max(rdd.getNumPartitions, 1) + 1, 4096)
    val chunks = rdd.mapPartitions { it =>
      val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
      var n = 0L
      while (it.hasNext && n <= capInt) {
        val e = it.next(); n += 1
        if (buf.length < perTask) buf += e
      }
      Iterator((n, buf.toArray))
    }.collect()
    val total = chunks.iterator.map(_._1).sum
    if (total > cap) None
    else if (chunks.forall { case (n, a) => n == a.length })
      Some(chunks.flatMap(_._2))
    else Some(ds.collect())
  }

  private def emptyResult(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Boolean)].toDF("id", "component", "is_core")
  }

  /** M6-flavored wrapper: DBSCAN where distance is Jaccard distance over
    * '-'-separated token sets (the reference approximates this with LSH
    * pair distances, `Src/dbscan.py:125-158`; here exact).
    *
    * The distance depends only on the token SET, so values are
    * canonicalized to their sorted distinct-token form first — the
    * weighted-dedup in [[run]] then collapses every session with the
    * same action set into one representative (at sf0.1 this turns ~10k
    * distinct paths into ≤ 2^|action types| set representatives). */
  def jaccardDbscan(spark: SparkSession, points: Dataset[(Long, String)],
      eps: Double, minPts: Int): DataFrame = {
    import spark.implicits._
    val canon = points.map { case (id, v) =>
      (id, v.split("-").distinct.sorted.mkString("-"))
    }
    // cell scan: intern tokens into a local dictionary; with <= 64
    // distinct tokens per cell (the common case — token vocab is the
    // action alphabet) each value is one Long bitmask and the Jaccard
    // test is two popcounts. Identical arithmetic to the string form:
    // |∩|/|∪| as Int→Double division, union 0 → dist 1.
    val scan = new PairScan {
      def prepare(vals: Array[String]): (Int, Int) => Boolean = {
        val dict = scala.collection.mutable.HashMap.empty[String, Int]
        // NO empty-token filtering: Scala "".split("-") yields [""], and
        // the string-form metric counts "" as a token — keep exact parity
        val sets = vals.map(_.split("-")
          .map(t => dict.getOrElseUpdate(t, dict.size)).distinct)
        if (dict.size <= 64) {
          val masks = sets.map(_.foldLeft(0L)((m, t) => m | (1L << t)))
          (i, j) => {
            val inter = java.lang.Long.bitCount(masks(i) & masks(j))
            val union = java.lang.Long.bitCount(masks(i) | masks(j))
            if (union == 0) 1.0 <= eps else 1.0 - inter.toDouble / union <= eps
          }
        } else {
          val bs = sets.map(s => { val b = new java.util.BitSet(); s.foreach(b.set); b })
          (i, j) => {
            val a = bs(i).clone().asInstanceOf[java.util.BitSet]
            a.and(bs(j))
            val inter = a.cardinality()
            val union = bs(i).cardinality() + bs(j).cardinality() - inter
            if (union == 0) 1.0 <= eps else 1.0 - inter.toDouble / union <= eps
          }
        }
      }
    }
    run(spark, canon, eps, minPts, dist = (a, b) => {
      val sa = TokenCache.get(a).toSet
      val sb = TokenCache.get(b).toSet
      val union = (sa ++ sb).size
      if (union == 0) 1.0 else 1.0 - (sa & sb).size.toDouble / union
    }, pairScan = scan)
  }

  /** M7: DBSCAN with unit-cost token-level Levenshtein over
    * '-'-separated euler strings (intended semantics of
    * `Src/utils.py:32-71`; the reference's active DP is off-by-one and
    * returns 0 everywhere — documented divergence, SURVEY.md §2.9).
    *
    * Ring assignment uses the exact distance (the triangle-inequality
    * argument needs it); the O(ring²) pair scan only needs a
    * "<= eps" test, so it uses the banded DP with early exit
    * ([[graft.functions.tokenLevenshteinBounded]]) — O(eps·n) per pair
    * instead of O(n²). */
  def editDistanceDbscan(spark: SparkSession, points: Dataset[(Long, String)],
      eps: Double, minPts: Int): DataFrame = {
    val k = math.ceil(eps).toInt
    // cell scan: tokenize + intern once per value, banded DP over int
    // arrays (int equality instead of string equality per DP cell;
    // no hash lookups inside the pair loop)
    val scan = new PairScan {
      def prepare(vals: Array[String]): (Int, Int) => Boolean = {
        val dict = scala.collection.mutable.HashMap.empty[String, Int]
        val toks = vals.map(_.split("-")
          .map(t => dict.getOrElseUpdate(t, dict.size)))
        (i, j) => graft.functions.intLevenshteinBounded(toks(i), toks(j), k) <= eps
      }
    }
    run(spark, points, eps, minPts,
      (a, b) => graft.functions.tokenLevenshtein(
        TokenCache.get(a), TokenCache.get(b)).toDouble,
      pairScan = scan)
    // NOTE: scanKey length-bucketing was tried here and reverted — for
    // edit distance the pivot rings already correlate with token length,
    // so the extra key mostly duplicated each cell (measured 2x slower).
  }
}
