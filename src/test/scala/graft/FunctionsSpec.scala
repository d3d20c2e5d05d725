package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property suite for the pure building blocks (SURVEY.md §5.3):
  * token Levenshtein is a metric and matches a naive reference DP;
  * Jaccard is bounded and symmetric; base-26 ids and n-grams behave.
  * Properties use seeded random sampling (deterministic, offline). */
class FunctionsSpec extends AnyFunSuite {
  import graft.functions._

  private def randToks(rnd: Random): IndexedSeq[String] =
    IndexedSeq.fill(rnd.nextInt(9))(Seq("a", "b", "c", "d")(rnd.nextInt(4)))

  /** Naive exponential-recursion Levenshtein — the reference's intended
    * semantics (`Src/utils.py:32-71`, the commented-out version). */
  private def naive(s: IndexedSeq[String], t: IndexedSeq[String]): Int =
    if (s.isEmpty) t.length
    else if (t.isEmpty) s.length
    else {
      val cost = if (s.head == t.head) 0 else 1
      math.min(math.min(
        naive(s.tail, t) + 1,
        naive(s, t.tail) + 1),
        naive(s.tail, t.tail) + cost)
    }

  test("tokenLevenshtein: metric axioms + naive-DP equivalence (300 samples)") {
    val rnd = new Random(42)
    for (_ <- 1 to 300) {
      val (x, y, z) = (randToks(rnd), randToks(rnd), randToks(rnd))
      assert(tokenLevenshtein(x, x) == 0, s"identity on $x")
      assert(tokenLevenshtein(x, y) == tokenLevenshtein(y, x),
        s"symmetry on $x / $y")
      assert(tokenLevenshtein(x, z) <=
        tokenLevenshtein(x, y) + tokenLevenshtein(y, z),
        s"triangle on $x / $y / $z")
      assert(tokenLevenshtein(x, y) == naive(x, y),
        s"naive equivalence on $x / $y")
    }
  }

  test("tokenLevenshteinBounded: exact within bound, >bound beyond (300 samples)") {
    val rnd = new Random(43)
    for (_ <- 1 to 300) {
      val (x, y) = (randToks(rnd), randToks(rnd))
      val exact = tokenLevenshtein(x, y)
      for (k <- 0 to 6) {
        val b = tokenLevenshteinBounded(x, y, k)
        if (exact <= k) assert(b == exact, s"k=$k x=$x y=$y")
        else assert(b > k, s"k=$k x=$x y=$y exact=$exact got=$b")
      }
    }
  }

  test("intLevenshteinBounded: parity with the string DP under interning (300 samples)") {
    val rnd = new Random(44)
    for (_ <- 1 to 300) {
      val (x, y) = (randToks(rnd), randToks(rnd))
      // intern exactly like the DBSCAN cell scan does
      val dict = scala.collection.mutable.HashMap.empty[String, Int]
      def enc(ts: IndexedSeq[String]): Array[Int] =
        ts.map(t => dict.getOrElseUpdate(t, dict.size)).toArray
      val (xi, yi) = (enc(x), enc(y))
      val exact = tokenLevenshtein(x, y)
      for (k <- 0 to 6) {
        val b = intLevenshteinBounded(xi, yi, k)
        if (exact <= k) assert(b == exact, s"k=$k x=$x y=$y")
        else assert(b > k, s"k=$k x=$x y=$y exact=$exact got=$b")
      }
    }
  }

  test("tokenLevenshtein: known distances") {
    assert(tokenLevenshtein(IndexedSeq("1A", "1B", "0B", "0A"),
      IndexedSeq("1A", "1C", "0C", "0A")) == 2)
    assert(tokenLevenshtein(IndexedSeq(), IndexedSeq("x", "y")) == 2)
  }

  test("jaccardSim: bounds, symmetry, known values (column-level)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x"), Seq("y"))
    ).toDF("a", "b")
    val rows = df.select(
      jaccardSim(col("a"), col("b")).as("ab"),
      jaccardSim(col("b"), col("a")).as("ba")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(0) == r.getDouble(1), "symmetry")
    }
    assert(rows(0).getDouble(0) == 0.5)   // |∩|=2, |∪|=4
    assert(rows(1).getDouble(0) == 1.0)
    assert(rows(2).getDouble(0) == 1.0)   // both empty => defined as 1
    assert(rows(3).getDouble(0) == 0.0)
  }

  test("base26Id: A..Z then AA..") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = Seq(0, 1, 25, 26, 27, 51, 52).toDF("r")
      .select(base26Id(col("r"))).as[String].collect()
    assert(ids.toSeq == Seq("A", "B", "Z", "AA", "AB", "AZ", "BA"))
  }

  test("wordNgrams: sliding trigrams, short arrays empty") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Seq(Seq("w1", "w2", "w3", "w4"), Seq("w1", "w2"))
      .toDF("t").select(wordNgrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(out(0).toSeq == Seq("w1 w2 w3", "w2 w3 w4"))
    assert(out(1).isEmpty)
  }

  test("cosineSim: orthogonal, identical, zero vectors") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))
    ).toDF("a", "b")
      .select(round(cosineSim(col("a"), col("b")), 9).as("c"))
      .as[Double].collect()
    assert(out.toSeq == Seq(0.0, 1.0, 0.0))
  }

  test("a18 sketch-mode approx quantiles track a14 exact within 1%") {
    val spark = TestSpark.spark
    val sfDir = "/root/testdata/sf0.001"
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // accuracy 5000 = the bounded-state sketch path a 100 TB run uses;
    // the registered a18 query runs accuracy 1e7 (exact, DuckDB-oracled)
    val approx = toMap(graft.ops.Relational.approxQuantilesByFlag(
      graft.Tables.lineitem(spark, sfDir), 5000))
    val exact = toMap(SparkEntry.queries("a14_percentiles")(spark, sfDir))
    assert(approx.keySet == exact.keySet)
    for ((flag, (a50, a90, a99)) <- approx) {
      val (e50, e90, e99) = exact(flag)
      for (((a, e), tag) <- Seq((a50, e50), (a90, e90), (a99, e99))
             .zip(Seq("p50", "p90", "p99")))
        assert(math.abs(a - e) / e < 0.01,
          s"$flag $tag: approx $a vs exact $e drifts past 1%")
    }
  }

  test("zorderBits: known interleaves, and z-sort tightens 2-D extents") {
    val spark = TestSpark.spark
    import spark.implicits._
    val known = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (5L, 3L, 27L), (65535L, 0L, 0x55555555L), (0L, 65535L, 0xAAAAAAAAL))
    val got = known.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(zorderBits(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == known.map(_._3), s"interleave mismatch: $got")

    // locality: bucketing a 64x64 grid by z-value gives far tighter
    // per-bucket y-extents than bucketing the x-sorted order (which is
    // perfectly tight on x but spans ALL of y in every bucket)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"), zorderBits(col("x"), col("y")).as("z"))
    def meanYExtent(bucket: org.apache.spark.sql.Column): Double =
      grid.groupBy(bucket.as("b"))
        .agg((max("y") - min("y")).as("ey"))
        .agg(avg("ey")).head().getDouble(0)
    val zExtent = meanYExtent(expr("z div 256"))      // 16 z-buckets
    val xExtent = meanYExtent(expr("(x * 64 + y) div 256")) // x-major
    assert(zExtent < xExtent / 4,
      s"z-order extents $zExtent not tighter than x-sort $xExtent")
  }
}
