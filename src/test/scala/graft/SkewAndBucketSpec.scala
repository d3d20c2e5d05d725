package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-salted join equivalence + bucketed co-located join (no shuffle
  * on the join key when both sides are bucketed and sorted on it). */
class SkewAndBucketSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("saltedJoin equals the plain join on a skewed fixture") {
    import spark.implicits._
    // 10k facts, 90% on one hot key
    val big = spark.range(10000)
      .select((when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100))
        .as("k"), col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    // force a sort-merge join — broadcast would sidestep bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v1"))
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("bt_left")
    spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("v2"))
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("bt_right")
    val joined = spark.table("bt_left").join(spark.table("bt_right"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle; plan:\n$plan")
    assert(joined.count() == 1000)
    val row = joined.filter(col("k") === 10).head()
    assert(row.getLong(1) == 20 && row.getLong(2) == 30)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the library's skew story has two layers: STATIC salting
    // (Skew.saltedJoin, above) when the hot keys are known, and AQE's
    // runtime skew-join split when they are not. This locks the
    // runtime layer: a 90%-hot-key join under a small skew threshold
    // must execute with skew-split shuffle reads, not one straggler
    // partition. (The bench session disables AQE for latency reasons —
    // this spec is exactly why the LIBRARY default keeps it on.)
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = spark.range(200000)
        .select((when(col("id") % 10 < 9, 7L).otherwise(col("id") % 1000))
          .as("k"), md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(1000)
        .select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = big.join(dim, Seq("k"))
      // collect(), not count(): count() wraps a NEW query execution and
      // the join's own adaptive plan would never finalize
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not run:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("s17 registered query: no exchange on the bucketed join key") {
    // the only exchanges allowed are ABOVE the join (the nationkey agg
    // and the presentation sort) — never a re-partition of either
    // bucketed input on its custkey
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("s17_bucketed_join")(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(c_custkey") &&
        !plan.contains("Exchange hashpartitioning(o_custkey"),
        s"bucketed inputs must not re-shuffle on the join key:\n$plan")
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("rankAdjacency: sharded hub ranking equals the per-src window") {
    import spark.implicits._
    // a hub (src=1) whose dsts straddle several 2^16 dst-range
    // buckets, plus small srcs — the sharded construction must emit
    // idx values identical to row_number() OVER (PARTITION BY src
    // ORDER BY dst) - 1
    val hub = (0L until 5000L).map(i => (1L, i * 37L + 3L))
    val rest = (0L until 50L).flatMap(s =>
      (0L until 7L).map(d => (s + 100L, d * 99991L)))
    val sym = (hub ++ rest).toDF("src", "dst")
    def res(sharded: Boolean) =
      graft.ops.Cluster.rankAdjacency(sym, sharded).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (plain, shard) = (res(false), res(true))
    assert(plain == shard,
      s"sharded ranking diverges: ${shard.diff(plain).take(5)} / " +
        s"${plain.diff(shard).take(5)}")
    // sanity: the hub's ranks are the dense 0..4999 sequence by dst
    val hubIdx = plain.filter(_._1 == 1L).toSeq.sortBy(_._2).map(_._3)
    assert(hubIdx == (0L until 5000L), "hub ranks must be dense in dst order")
  }

  test("coActivityEdges: hot-cell cap bounds pairs, keeps planted edges") {
    import spark.implicits._
    // one hot cell: 40 users share (hour 0, 'x') → C(40,2)=780 pairs
    // uncapped; a planted pair (100, 101) co-occurs in 3 quiet cells
    val hot = (0L until 40L).map(u => (u, 0L, "x"))
    val planted = (0L until 3L).flatMap(h =>
      Seq((100L, h, "p"), (101L, h, "p")))
    val ue = (hot ++ planted).toDF("user_id", "hour", "event_type")
    def edges(minShared: Long, cap: Option[Int]) =
      graft.ops.Cluster.coActivityEdges(ue, minShared, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val un1 = edges(1, None)
    assert(un1.size == 780 + 1, s"uncapped: ${un1.size}")
    val cap1 = edges(1, Some(8))
    // hot cell bounded at C(8,2)=28; quiet 2-user cells untouched
    assert(cap1.size == 28 + 1, s"capped: ${cap1.size}")
    assert(cap1.subsetOf(un1), "capped edges must be a subset")
    // the ≥3-shared-cell edge survives the cap (its cells are quiet)
    assert(edges(3, Some(8)) == Set((100L, 101L)))
    // and the registered uncapped form agrees
    assert(edges(3, None) == Set((100L, 101L)))
    // degenerate inputs: empty frame and a lone user yield no edges
    val empty = Seq.empty[(Long, Long, String)]
      .toDF("user_id", "hour", "event_type")
    val lone = Seq((7L, 0L, "x")).toDF("user_id", "hour", "event_type")
    for (ue0 <- Seq(empty, lone); cap <- Seq(None, Some(8))) {
      assert(graft.ops.Cluster.coActivityEdges(ue0, 1, cap).count() == 0)
    }
  }
}
