package graft

import graft.plans.{ArrayDotProduct, GraftExtensions, TokenLevenshteinExpr}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expression specs: results match the Column-level /
  * Scala implementations, codegen path included (dataframes exercise
  * whole-stage codegen), and the SQL registration works. */
class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("ArrayDotProduct matches the fold-based dot (codegen path)") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.5), Seq(2.0, 2.0)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val out = df.select(
      graft.plans.NativeFunctions.arrayDot(col("a"), col("b")).as("nat"),
      aggregate(zip_with(col("a"), col("b"), (p, q) => p * q), lit(0.0),
        (acc, x) => acc + x).as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(out(0).getDouble(0) == 32.0)
  }

  test("TokenLevenshteinExpr matches the Scala implementation") {
    import spark.implicits._
    val df = Seq(
      ("1A-1B-0B-0A", "1A-1C-0C-0A"),
      ("a-b-c", "a-b-c"),
      ("", "x-y")
    ).toDF("l", "r")
    val out = df.select(
      graft.plans.NativeFunctions.tokenLevenshtein(col("l"), col("r")).as("d"))
      .as[Int].collect()
    assert(out.toSeq == Seq(2, 0, 2))
  }

  test("MinHash64 matches the per-lane HOF minhash and handles empties") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Seq(11L, -42L, 987654321L, 7L)),
      Tuple1(Seq(5L)),
      Tuple1(Seq.empty[Long])
    ).toDF("hs")
    val rows = df.select(
      graft.plans.NativeFunctions.minhash64(col("hs")).as("mh")).collect()
    // reference model of one lane: min over mix(x*A(l)+B(l))
    def lane(hs: Seq[Long], l: Int): Long =
      if (hs.isEmpty) Long.MaxValue
      else hs.map { x =>
        var v = x * graft.plans.MinHash64.A(l) + graft.plans.MinHash64.B(l)
        v = (v ^ (v >>> 31)) * 0x7fb5d329728ea185L
        v ^ (v >>> 27)
      }.min
    val inputs = Seq(Seq(11L, -42L, 987654321L, 7L), Seq(5L), Seq.empty[Long])
    rows.zip(inputs).foreach { case (r, hs) =>
      val mh = r.getSeq[Long](0)
      assert(mh.length == 64)
      Seq(0, 1, 31, 63).foreach(l => assert(mh(l) == lane(hs, l)))
    }
    // determinism: same input → same signature across evaluations
    val again = df.select(
      graft.plans.NativeFunctions.minhash64(col("hs")).as("mh")).collect()
    assert(rows.map(_.getSeq[Long](0)).toSeq ==
      again.map(_.getSeq[Long](0)).toSeq)
  }

  test("GraftExtensions registers SQL functions on a fresh session") {
    // the shared session was built without extensions; apply the same
    // builders through its function registry to validate registration
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    reg.registerFunction(
      FunctionIdentifier("token_levenshtein"),
      new ExpressionInfo(classOf[TokenLevenshteinExpr].getName,
        "token_levenshtein"),
      (children) => TokenLevenshteinExpr(children(0), children(1)))
    reg.registerFunction(
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children) => ArrayDotProduct(children(0), children(1)))
    val d = spark.sql(
      "SELECT token_levenshtein('1A-1B-0B-0A', '1A-1C-0C-0A') AS d").head().getInt(0)
    assert(d == 2)
    val dot = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS s").head().getDouble(0)
    assert(dot == 11.0)
    reg.registerFunction(
      FunctionIdentifier("minhash64"),
      new ExpressionInfo(classOf[graft.plans.MinHash64].getName, "minhash64"),
      (children) => graft.plans.MinHash64(children(0)))
    val mh = spark.sql(
      "SELECT minhash64(array(7L, 11L)) AS m").head().getSeq[Long](0)
    assert(mh.length == 64)
    // composed function as a direct Catalyst tree (no Expression class)
    reg.registerFunction(
      FunctionIdentifier("zorder"),
      new ExpressionInfo("graft.functions", "zorder"),
      (children) => graft.plans.GraftExtensions.zorderExpr(
        children(0), children(1)))
    val z = spark.sql("SELECT zorder(5L, 3L) AS z").head().getLong(0)
    assert(z == 27L)
    // ngram_hash64: the n argument folds from an INT literal; SQL-side
    // values must agree with the Column-DSL NativeFunctions entry
    reg.registerFunction(
      FunctionIdentifier("ngram_hash64"),
      new ExpressionInfo(classOf[graft.plans.NgramHash64].getName,
        "ngram_hash64"),
      (children) => children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) =>
          graft.plans.NgramHash64(children(0), v)
        case other => throw new IllegalArgumentException(other.toString)
      })
    val nh = spark.sql(
      "SELECT ngram_hash64(array('a','b','c'), 2) AS h").head().getSeq[Long](0)
    assert(nh.length == 2)
    val viaDsl = spark.range(1)
      .select(graft.plans.NativeFunctions.ngramHash64(
        array(lit("a"), lit("b"), lit("c")), 2).as("h"))
      .head().getSeq[Long](0)
    assert(nh == viaDsl)
    // and the extension class itself wires without throwing
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("JaroWinklerExpr: textbook values, axioms, codegen path") {
    import graft.plans.JaroWinklerExpr.{compute => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // the canonical record-linkage textbook triples (also DuckDB's values)
    assert(math.abs(jw(u("MARTHA"), u("MARHTA")) - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw(u("DWAYNE"), u("DUANE")) - 0.84) < 1e-12)
    assert(math.abs(jw(u("DIXON"), u("DICKSONX")) - 0.8133333333333332) < 1e-12)
    // empties are 0 (DuckDB convention), identity is 1, symmetry holds
    assert(jw(u(""), u("abc")) == 0.0 && jw(u(""), u("")) == 0.0)
    assert(jw(u("widget"), u("widget")) == 1.0)
    // boost fires only above 0.7 jaro, prefix capped at 4
    assert(jw(u("aaaaaaaaaa"), u("aaaaabbbbb")) == 2.0 / 3.0) // j=2/3 ≤ .7
    val rnd = new scala.util.Random(41)
    (1 to 200).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val x = jw(u(a), u(b))
      assert(x >= 0.0 && x <= 1.0 && x == jw(u(b), u(a)))
    }
    // dataframe path (whole-stage codegen) agrees with the static call
    import spark.implicits._
    val df = Seq(("cold widget", "old widget"), ("MARTHA", "MARHTA"))
      .toDF("a", "b")
    val out = df.select(graft.plans.NativeFunctions
      .jaroWinkler(col("a"), col("b")).as("j")).collect()
    assert(math.abs(out(0).getDouble(0) -
      jw(u("cold widget"), u("old widget"))) == 0.0)
    assert(math.abs(out(1).getDouble(0) - 0.9611111111111111) < 1e-12)
  }

  test("NfcNormalizeExpr: composes decomposed sequences, idempotent") {
    import graft.plans.NfcNormalizeExpr.{compute => nfc}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val decomposed = "cafe\u0301 A\u030A over" // e+acute, A+ring
    val composed = "caf\u00E9 \u00C5 over"
    assert(nfc(u(decomposed)).toString == composed)
    assert(nfc(u(composed)).toString == composed)          // idempotent
    assert(nfc(u("plain ascii")).toString == "plain ascii") // fast path
    // codepoint accounting: each composition removes one combining mark
    import spark.implicits._
    val out = Seq(decomposed).toDF("s")
      .select(length(col("s")).as("raw"),
        length(graft.plans.NativeFunctions.nfcNormalize(col("s")))
          .as("norm")).head()
    assert(out.getInt(0) - out.getInt(1) == 2)
  }
}
