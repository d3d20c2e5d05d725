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
    // and the extension class itself wires without throwing
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
