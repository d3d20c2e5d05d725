package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot scalar paths
  * (SURVEY.md §7.3 "optional Catalyst Expression"): both participate in
  * whole-stage codegen via `doGenCode`, unlike Scala UDFs (serialized
  * row-at-a-time) or higher-order-function compositions (interpreted
  * per element). */

/** Dot product of two double-array columns — the inner loop of cosine
  * similarity / ANN scoring. Null elements count as 0; result is null
  * only when an input array is null. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  // inputs must already be array<double> (AbstractDataType is
  // private[sql], so no implicit-cast contract can be declared here;
  // callers cast explicitly)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"array_dot requires two array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // static call, NOT inline codegen: an expression instantiated many
  // times in one projection (e.g. 64 hyperplane dots) would redeclare
  // inline locals ("Redefinition of local variable i" — janino fails and
  // the WHOLE stage silently falls back to interpreted execution)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.ArrayDotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }
}

/** Unit-cost token-level Levenshtein over '-'-separated strings — the
  * reference's intended `process_string_edit_distance` semantics
  * (`Src/utils.py:32-71`), codegen'd as a static call. */
case class TokenLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_levenshtein"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"token_levenshtein requires two string inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenLevenshteinExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.TokenLevenshteinExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

object TokenLevenshteinExpr {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Int =
    graft.functions.tokenLevenshtein(
      a.toString.split("-").toIndexedSeq,
      b.toString.split("-").toIndexedSeq)
}

/** 63-bit SimHash signature from an array of 64-bit token hashes: bit b
  * of the result is set iff the majority vote Σ ±1 (by bit b of each
  * hash) is positive. The doubly-nested vote loop is exactly the kind of
  * computation interpreted HOF lambdas do worst (measured ~10 s for 5000
  * docs); as generated code it is a tight JIT'd loop. */
case class SimHash63(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"simhash63 requires array<bigint>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash63.compute(input.asInstanceOf[ArrayData])

  // static call — see ArrayDotProduct.doGenCode for why inline locals
  // are unsafe when the expression appears more than once per stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.plans.SimHash63.compute($h)")

  override protected def withNewChildInternal(newChild: Expression): SimHash63 =
    copy(child = newChild)
}

object SimHash63 {
  /** Shared by interpreted eval and generated code. */
  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val cnt = new Array[Int](63)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val v = hs.getLong(i)
        var b = 0
        while (b < 63) {
          cnt(b) += (if (((v >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 63) { if (cnt(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** 64-lane MinHash signature from an array of 64-bit token hashes:
  * lane i is min over tokens of a per-lane universal hash
  * `mix(x * A(i) + B(i))`. One pass over the token hashes computes all
  * 64 lanes — the equivalent HOF form (`transform(seq, i ->
  * array_min(transform(hs, ...)))`) is interpreted per element per lane
  * (64× the array traffic, measured ~14 s for the sf0.1 corpus vs ~1 s
  * native). Empty/null-only arrays yield Long.MaxValue lanes. */
case class MinHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"minhash64 requires array<bigint>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.plans.MinHash64.compute($h)")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {
  val Lanes = 64

  /** Per-lane multipliers/offsets from splitmix64 of the lane index —
    * deterministic across JVMs; multipliers forced odd. */
  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  val A: Array[Long] = Array.tabulate(Lanes)(i => splitmix(2L * i) | 1L)
  val B: Array[Long] = Array.tabulate(Lanes)(i => splitmix(2L * i + 1))

  /** Shared by interpreted eval and generated code. */
  def compute(hs: ArrayData): ArrayData = {
    val mins = Array.fill(Lanes)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val x = hs.getLong(i)
        var l = 0
        while (l < Lanes) {
          var v = x * A(l) + B(l)
          v = (v ^ (v >>> 31)) * 0x7fb5d329728ea185L
          v ^= (v >>> 27)
          if (v < mins(l)) mins(l) = v
          l += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** Element-wise xxhash64 of an array<string> — value-identical to
  * `transform(arr, t -> xxhash64(t))` (XXH64 of the UTF-8 bytes, seed
  * 42; a null element hashes to the seed, matching `xxhash64(NULL)`)
  * but fully codegen'd: the HOF form pays the interpreted-lambda tax
  * per ELEMENT, measured 3.3 s for the sf0.1 shingle corpus (~5M
  * elements) vs ~0.3 s native — it was the hottest single expression
  * in the round-6 bench, shared by every MinHash consumer (d3, m2,
  * m3, t10, the trace pipeline). */
case class ArrayXxhash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_xxhash64"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"array_xxhash64 requires array<string>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayXxhash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.ArrayXxhash64.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): ArrayXxhash64 =
    copy(child = newChild)
}

object ArrayXxhash64 {
  /** xxhash64's fixed seed (`XxHash64` default). */
  private val Seed = 42L

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) Seed
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-API entry points for the native expressions. */
object NativeFunctions {
  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  def arrayDot(a: Column, b: Column): Column =
    B.toColumn(ArrayDotProduct(B.toExpression(a), B.toExpression(b)))

  def tokenLevenshtein(a: Column, b: Column): Column =
    B.toColumn(TokenLevenshteinExpr(B.toExpression(a), B.toExpression(b)))

  def simhash63(hashes: Column): Column =
    B.toColumn(SimHash63(B.toExpression(hashes)))

  def minhash64(hashes: Column): Column =
    B.toColumn(MinHash64(B.toExpression(hashes)))

  def arrayXxhash64(tokens: Column): Column =
    B.toColumn(ArrayXxhash64(B.toExpression(tokens)))

  def jaroWinkler(a: Column, b: Column): Column =
    B.toColumn(JaroWinklerExpr(B.toExpression(a), B.toExpression(b)))

  def nfcNormalize(s: Column): Column =
    B.toColumn(NfcNormalizeExpr(B.toExpression(s)))

  def ngramHash64(tokens: Column, n: Int): Column =
    B.toColumn(NgramHash64(B.toExpression(tokens), n))
}

/** Session extension registering the engine's native functions so SQL
  * can call them: `SELECT token_levenshtein(a, b)`, `array_dot(x, y)`.
  * Enable with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def binary(name: String, make: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => make(a, b)
    case other => throw new IllegalArgumentException(
      s"$name requires exactly 2 arguments, got ${other.size}")
  }

  private def unary(name: String, make: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => make(a)
    case other => throw new IllegalArgumentException(
      s"$name requires exactly 1 argument, got ${other.size}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("token_levenshtein"),
      new ExpressionInfo(classOf[TokenLevenshteinExpr].getName,
        "token_levenshtein"),
      binary("token_levenshtein", TokenLevenshteinExpr(_, _))))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      binary("array_dot", ArrayDotProduct(_, _))))
    ext.injectFunction((
      FunctionIdentifier("simhash63"),
      new ExpressionInfo(classOf[SimHash63].getName, "simhash63"),
      unary("simhash63", SimHash63(_))))
    ext.injectFunction((
      FunctionIdentifier("minhash64"),
      new ExpressionInfo(classOf[MinHash64].getName, "minhash64"),
      unary("minhash64", MinHash64(_))))
    ext.injectFunction((
      FunctionIdentifier("array_xxhash64"),
      new ExpressionInfo(classOf[ArrayXxhash64].getName, "array_xxhash64"),
      unary("array_xxhash64", ArrayXxhash64(_))))
    ext.injectFunction((
      FunctionIdentifier("ngram_hash64"),
      new ExpressionInfo(classOf[NgramHash64].getName, "ngram_hash64"),
      binary("ngram_hash64", (a, n) => n match {
        // n is part of the generated code, so it must be a literal —
        // same restriction SQL built-ins with codegen'd shape params have
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => NgramHash64(a, v)
        case other => throw new IllegalArgumentException(
          s"ngram_hash64's second argument must be an INT literal, " +
            s"got $other")
      })))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      binary("jaro_winkler", JaroWinklerExpr(_, _))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      unary("nfc_normalize", NfcNormalizeExpr(_))))
    // composed functions ride the same registry, but the builder must
    // hand the analyzer a RESOLVED Catalyst tree — a Column-DSL
    // composition arrives as unresolved ColumnNodes that the
    // function-builder path never analyzes (learned the hard way)
    ext.injectFunction((
      FunctionIdentifier("zorder"),
      new ExpressionInfo("graft.functions", "zorder"),
      binary("zorder", (a, b) => GraftExtensions.zorderExpr(a, b))))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast,
    Literal, ShiftLeft, ShiftRightUnsigned}
  import org.apache.spark.sql.types.{IntegerType, LongType}

  /** The zorderBits interleave as a direct Catalyst tree (same
    * arithmetic as `graft.functions.zorderBits`): bit i of x → 2i,
    * bit i of y → 2i+1, over the low 16 bits. */
  private[graft] def zorderExpr(x: Expression, y: Expression)
      : Expression = {
    def lane(v: Expression, i: Int, off: Int): Expression =
      ShiftLeft(
        BitwiseAnd(
          ShiftRightUnsigned(Cast(v, LongType), Literal(i, IntegerType)),
          Literal(1L, LongType)),
        Literal(2 * i + off, IntegerType))
    (0 until 16).flatMap(i => Seq(lane(x, i, 0), lane(y, i, 1)))
      .reduce[Expression]((l, r) => Add(l, r))
  }
}

/** Jaro-Winkler similarity, codegen'd as a static call. Standard
  * textbook semantics, verified bit-compatible with DuckDB's
  * `jaro_winkler_similarity` on 5k fuzz pairs: match window
  * `max(|a|,|b|)/2 - 1` (floored at 0), greedy left-to-right matching,
  * transpositions = half the out-of-order matches, prefix boost
  * `l*0.1*(1-j)` with `l ≤ 4` applied only when `j > 0.7` (strict),
  * empty input → 0. The record-linkage scorer for d14's blocked
  * entity-resolution join — exact per UTF-16 unit (identical to
  * codepoints for the ASCII name columns it scores). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"jaro_winkler requires two string inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + w)
      var j = math.max(0, i - w)
      var open = true
      while (j <= hi && open) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          bm(j) = true; am(i) = true; m += 1; open = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // evaluation order matches the verified-against-DuckDB reference
    val j0 = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (j0 > 0.7) {
      val lim = math.min(4, math.min(la, lb))
      var l = 0
      while (l < lim && a.charAt(l) == b.charAt(l)) l += 1
      j0 + l * 0.1 * (1.0 - j0)
    } else j0
  }
}

/** Unicode NFC normalization (JDK `java.text.Normalizer`) — the first
  * step of any web-scale text-curation pipeline (decomposed accent
  * sequences, compatibility forms from copy-paste sources). Verified
  * against DuckDB's `nfc_normalize` (both implement UAX #15 canonical
  * composition). Codegen'd static call; the JDK normalizer is
  * allocation-light for already-normalized ASCII (the common case at
  * scan time: `Normalizer.isNormalized` fast-path avoids the copy). */
case class NfcNormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case StringType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"nfc_normalize requires string, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NfcNormalizeExpr.compute($s)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalizeExpr = copy(child = newChild)
}

object NfcNormalizeExpr {
  import java.text.Normalizer

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Fused sliding-window n-gram hashing of a token array: per-token
  * xxhash64 (seed 42, null element → seed — ArrayXxhash64's
  * convention) followed by a multiplicative xor-fold + splitmix
  * finalizer over each window of `n` consecutive token hashes, fully
  * codegen'd. Semantically a 64-bit fingerprint of the n-gram AS A
  * TOKEN SEQUENCE — the drop-in replacement for
  * `xxhash64(array_join(slice(...)))` wherever only n-gram IDENTITY
  * matters (d15's prefix-filter join): those consumers accept the
  * same 64-bit-collision trade either way, and the interpreted-HOF
  * form (`transform` + `slice` + `array_join` building every n-gram
  * string, then hashing it) measured 39 s of d15's 44 s at sf1 —
  * string materialization for values that exist only to be hashed. */
case class NgramHash64(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  require(n >= 1, s"ngram_hash64 needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash64"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"ngram_hash64 requires array<string>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    NgramHash64.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.NgramHash64.compute($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHash64 =
    copy(child = newChild)
}

object NgramHash64 {
  private val Seed = 42L
  /** splitmix64 increment — odd, high-entropy multiplier. */
  private val Mult = -7046029254386353131L

  /** Shared by interpreted eval and generated code. Arrays shorter
    * than n yield an empty array (wordNgrams' convention). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) =
        if (arr.isNullAt(i)) Seed
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = Seed
      var k = 0
      while (k < n) { h = (h ^ th(i + k)) * Mult; k += 1 }
      // splitmix64 finalizer: adjacent windows share n-1 token hashes,
      // so the fold alone would leave structured low-bit correlation
      h ^= h >>> 30; h *= -4658895280553007687L
      h ^= h >>> 27; h *= -7723592293110705685L
      h ^= h >>> 31
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
