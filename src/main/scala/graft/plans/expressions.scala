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

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  if (!$a.isNullAt(i) && !$b.isNullAt(i)) {
         |    sum += $a.getDouble(i) * $b.getDouble(i);
         |  }
         |}
         |${ev.value} = sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
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

/** Column-API entry points for the native expressions. */
object NativeFunctions {
  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  def arrayDot(a: Column, b: Column): Column =
    B.toColumn(ArrayDotProduct(B.toExpression(a), B.toExpression(b)))

  def tokenLevenshtein(a: Column, b: Column): Column =
    B.toColumn(TokenLevenshteinExpr(B.toExpression(a), B.toExpression(b)))
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
  }
}
