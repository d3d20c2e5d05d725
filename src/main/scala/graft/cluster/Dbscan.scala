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
      dist: (String, String) => Double): DataFrame = {
    import spark.implicits._

    // normalize column names — callers pass tuples under arbitrary names
    val pts = points.toDF("id", "value")

    // 0. collapse duplicates: representative id + multiplicity per value
    val reps = pts.groupBy("value")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("w"))
      .select(col("rep"), col("value"), col("w")).as[(Long, String, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (reps.isEmpty) return emptyResult(spark)

    // 1. deterministic pivot = value of the min-rep point (one-row action)
    val pivot = reps.orderBy(col("rep")).head()._2

    // 2. ring duplication + per-ring quadratic scan over distinct values
    val ringed = reps.flatMap { case (rep, v, w) =>
      val ring = math.floor(dist(v, pivot) / eps).toLong
      Seq((ring, rep, v, w), (ring + 1L, rep, v, w))
    }
    val nbrPairs = ringed.groupByKey(_._1).flatMapGroups { (_, it) =>
      val arr = it.toArray
      for {
        i <- arr.indices.iterator
        j <- arr.indices
        if i != j && dist(arr(i)._3, arr(j)._3) <= eps
      } yield (arr(i)._2, arr(j)._2, arr(j)._4)
    }.toDF("rep", "nbr", "nw").dropDuplicates("rep", "nbr")

    // 3. eps-ball weight (self multiplicity + neighbor multiplicities);
    //    core iff ball weight >= minPts. Values with no external
    //    neighbor can still be core through their own duplicates.
    val ball = nbrPairs.groupBy("rep")
      .agg(sum(col("nw")).as("nbrW"), collect_set(col("nbr")).as("ns"))
    val ballAll = reps.toDF("rep", "value", "w")
      .join(ball, Seq("rep"), "left")
      .select(col("rep"), col("w"),
        coalesce(col("nbrW"), lit(0L)).as("nbrW"),
        coalesce(col("ns"), array().cast("array<long>")).as("ns"))
    val cores = ballAll.filter(col("w") + col("nbrW") >= minPts)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val labels = cores.select(col("rep").as("label"),
      explode(array_union(array(col("rep")), col("ns"))).as("pt"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (labels.isEmpty) { reps.unpersist(); return emptyResult(spark) }

    // 4. merge co-occurring labels via connected components (star edges)
    val edges = labels.groupBy("pt")
      .agg(min(col("label")).as("l1"), collect_set(col("label")).as("ls"))
      .select(col("l1"), explode(col("ls")).as("l2"))
      .filter(col("l1") =!= col("l2"))
      .select("l1", "l2").distinct()
    val comp = connectedComponents(spark,
      labels.select(col("label").as("v")).distinct(), edges)

    val repComp = labels
      .join(comp, col("label") === col("v"))
      .groupBy("pt").agg(min(col("component")).as("component"))
      .select(col("pt").as("rep"), col("component"))
    val repOut = reps.toDF("rep", "value", "w")
      .join(repComp, Seq("rep"), "left")
      .join(cores.select(col("rep"), lit(true).as("is_core")), Seq("rep"), "left")
      .select(col("value").as("__v"),
        coalesce(col("component"), lit(-1L)).as("component"),
        coalesce(col("is_core"), lit(false)).as("is_core"))

    val out = pts.join(repOut, col("value") === col("__v"))
      .select(col("id"), col("component"), col("is_core"))
    reps.unpersist()
    out
  }

  /** M8: GraphX connected components over a (v: long) vertex frame and
    * (l1, l2) edge frame; returns (v, component = min member id). */
  def connectedComponents(spark: SparkSession, vertices: DataFrame,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val vRdd = vertices.select(col("v").cast("long")).as[Long]
      .rdd.map(v => (v, v))
    val eRdd = edges.select(col("l1").cast("long"), col("l2").cast("long"))
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val g = Graph(vRdd, eRdd)
    g.connectedComponents().vertices
      .toDF("v", "component")
  }

  private def emptyResult(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Boolean)].toDF("id", "component", "is_core")
  }

  /** M6-flavored wrapper: DBSCAN where distance is Jaccard distance over
    * '-'-separated token sets (the reference approximates this with LSH
    * pair distances, `Src/dbscan.py:125-158`; here exact). */
  def jaccardDbscan(spark: SparkSession, points: Dataset[(Long, String)],
      eps: Double, minPts: Int): DataFrame =
    run(spark, points, eps, minPts, (a, b) => {
      val sa = a.split("-").toSet
      val sb = b.split("-").toSet
      val union = (sa ++ sb).size
      if (union == 0) 1.0 else 1.0 - (sa & sb).size.toDouble / union
    })

  /** M7: DBSCAN with unit-cost token-level Levenshtein over
    * '-'-separated euler strings (intended semantics of
    * `Src/utils.py:32-71`; the reference's active DP is off-by-one and
    * returns 0 everywhere — documented divergence, SURVEY.md §2.9). */
  def editDistanceDbscan(spark: SparkSession, points: Dataset[(Long, String)],
      eps: Double, minPts: Int): DataFrame =
    run(spark, points, eps, minPts, (a, b) =>
      graft.functions.tokenLevenshtein(
        a.split("-").toIndexedSeq, b.split("-").toIndexedSeq).toDouble)
}
