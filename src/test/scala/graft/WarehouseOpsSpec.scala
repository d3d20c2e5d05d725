package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture specs for the warehouse operators whose registered
  * queries run on clean harness data (where every violation counter is
  * legitimately zero): prove the detectors actually FIRE. */
class WarehouseOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("cdcDiff classifies planted inserts, deletes, and updates") {
    import spark.implicits._
    val v1 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "p")
    val v2 = Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)).toDF("k", "p")
    val got = graft.ops.Relational.cdcDiff(v1, v2, "k", "p").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 deleted, 2 unchanged (absent), 3 updated, 4 inserted
    assert(got == Map(1L -> "D", 3L -> "U", 4L -> "I"), s"got $got")
  }

  test("cdcDiff distinguishes NULL payloads from missing rows") {
    import spark.implicits._
    val v1 = Seq((1L, Option.empty[Double]), (2L, Some(20.0)),
      (3L, Option.empty[Double]), (5L, Some(50.0))).toDF("k", "p")
    val v2 = Seq((2L, Option.empty[Double]), (3L, Option.empty[Double]),
      (4L, Option.empty[Double]), (5L, Some(50.0))).toDF("k", "p")
    val got = graft.ops.Relational.cdcDiff(v1, v2, "k", "p").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: NULL payload present only in v1 → D (payload-nullness logic
    //    called this I); 2: value→NULL → U (dropped before — the
    //    inequality evaluated to NULL); 3: NULL→NULL unchanged;
    //    4: NULL payload inserted → I; 5: unchanged value
    assert(got == Map(1L -> "D", 2L -> "U", 4L -> "I"), s"got $got")
  }

  test("burstHours fires on a planted spike and only there") {
    import spark.implicits._
    val h = 3600000000000L
    // user 1: 5 quiet hours of 2 events + one hour of 9 (median 2,
    // 9 > 4 → burst). user 2: flat 3/hour — never flagged.
    val rows =
      (0 until 5).flatMap(i => Seq.fill(2)((1L, i * h + 1))) ++
        Seq.fill(9)((1L, 5 * h + 1)) ++
        (0 until 6).flatMap(i => Seq.fill(3)((2L, i * h + 1)))
    val got = graft.ops.Trace.burstHours(rows.toDF("user_id", "ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq((1L, 5L, 9L, 4L)), s"got ${got.toSeq}")
  }

  test("trendStats signs match planted rising/flat/falling series") {
    import spark.implicits._
    val wk = 604800000000000L
    // weekly counts: up = 1,2,3,4; flat = 3,3,3,3; down = 4,3,2,1
    def series(tp: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)((tp, i * wk + 1)) }
    val events = (series("up", Seq(1, 2, 3, 4)) ++
      series("flat", Seq(3, 3, 3, 3)) ++
      series("down", Seq(4, 3, 2, 1))).toDF("event_type", "ts")
    val got = graft.ops.Trace.trendStats(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // n=4, x=0..3: sxx-part den = 4*14 - 36 = 20 for all three
    assert(got("up") == ((20L, 20L, true)), s"up: $got")   // slope +1
    assert(got("flat") == ((0L, 20L, false)), s"flat: $got")
    assert(got("down") == ((-20L, 20L, false)), s"down: $got")
  }

  test("expectationsOf counts every planted violation class") {
    import spark.implicits._
    val orders = Seq(
      // (orderkey, custkey, totalprice, orderdate, status)
      (1L, 100L, 50.0, Date.valueOf("2024-01-01"), "O"),   // clean
      (1L, 100L, 60.0, Date.valueOf("2024-01-02"), "F"),   // dup key
      (2L, 999L, 70.0, Date.valueOf("2024-01-03"), "P"),   // orphan cust
      (3L, 101L, -5.0, Date.valueOf("2024-01-04"), "O"),   // bad price
      (4L, 101L, 2000000.0, Date.valueOf("2024-01-05"), "O"), // bad price
      (5L, 100L, 80.0, null.asInstanceOf[Date], "O"),      // null date
      (6L, 101L, 90.0, Date.valueOf("2024-01-06"), "X"))   // bad status
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderstatus")
    val customer = Seq(100L, 101L).toDF("c_custkey")
    val r = graft.ops.Relational.expectationsOf(orders, customer).head()
    assert(r.getLong(0) == 7, "n_rows")
    assert(r.getLong(1) == 1, s"n_dup_keys = ${r.getLong(1)}")
    assert(r.getLong(2) == 2, s"n_price_range_viol = ${r.getLong(2)}")
    assert(r.getLong(3) == 1, s"n_null_date = ${r.getLong(3)}")
    assert(r.getLong(4) == 1, s"n_bad_status = ${r.getLong(4)}")
    assert(r.getLong(5) == 1, s"n_orphan_custkey = ${r.getLong(5)}")
  }

  test("quarantineLabeled routes each dirty row to its first failed check") {
    import spark.implicits._
    val orders = Seq(
      (1L, 100L, 50.0, Date.valueOf("2024-01-01"), "O"),   // ok
      (2L, 999L, 70.0, Date.valueOf("2024-01-03"), "P"),   // orphan
      (3L, 101L, -5.0, null.asInstanceOf[Date], "X"),      // price wins
      (5L, 100L, 80.0, null.asInstanceOf[Date], "O"),      // null date
      (6L, 101L, 90.0, Date.valueOf("2024-01-06"), "X"))   // bad status
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderstatus")
    val customer = Seq(100L, 101L).toDF("c_custkey")
    val got = graft.ops.Relational.quarantineLabeled(orders, customer)
      .select("o_orderkey", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // row 3 violates three checks; the FIRST (price_range) must win
    assert(got == Map(1L -> "ok", 2L -> "orphan_custkey",
      3L -> "price_range", 5L -> "null_date", 6L -> "bad_status"),
      s"got $got")
  }

  test("madOutlierStats fires on a planted extreme value") {
    import spark.implicits._
    // 21 values tightly packed around 1000 plus one planted extreme
    // (22 values → median interpolates to 1000.5, MAD to 5.5 — the
    // exact-halves arithmetic the integer-input design guarantees);
    // the extreme's deviation 99.5 > 3·5.5 → exactly one outlier.
    // The harness data is tail-free, so a22's oracle only ever
    // confirms n_outliers = 0 — this proves the detector detects.
    val vals = ((-10 to 10).map(d => 1000L + d) :+ 1100L)
      .map(("G", _))
    val r = graft.ops.Relational
      .madOutlierStats(vals.toDF("flag", "pc")).head()
    assert(r.getDouble(1) == 1000.5, s"median ${r.getDouble(1)}")
    assert(r.getDouble(2) == 5.5, s"MAD ${r.getDouble(2)}")
    assert(r.getLong(3) == 1, s"n_outliers ${r.getLong(3)}")
    assert(r.getLong(4) == 22)
  }

  test("SCD2 versions tile the timeline: j16 matches every order once") {
    // registered-query-level invariant on harness data: the temporal
    // join emits exactly one version row per (filtered) order
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("j16_temporal_join")(spark, sfDir)
    val n = out.count()
    val expected = Tables.orders(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("o_custkey") % 40 === 0)
      .count()
    assert(n == expected, s"temporal join emitted $n rows for $expected orders")
    assert(out.select("o_orderkey").distinct().count() == expected,
      "some order matched more than one version")
  }
}
