package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd vector pair math for the ANN verification hot path.
  *
  * The composed form — `aggregate(zip_with(a, b, _ * _), 0.0d, _ + _)` —
  * is a higher-order-function chain: interpreted lambda dispatch per
  * element, per candidate pair, in every ANN query's exact-rank stage.
  * These expressions evaluate the identical math (float products widened
  * AFTER the float multiply, matching both the HOF evaluation and the
  * DuckDB oracles' `sum(CAST(x * y AS DOUBLE))`) in one JVM pass with
  * `doGenCode` emitting a static [[ExprKernels]] call.
  *
  * Dimension mismatch fails fast (same convention as `CosinesExpr`) —
  * a silently null/zero cosine would rank plausible-but-wrong neighbors.
  * Mixed float/double sides reproduce the implicit-cast behavior of the
  * HOF form: floats widen BEFORE the multiply; both-float sides multiply
  * in float and widen after, like zip_with did.
  */
private[graft] trait PairMath extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def floatOf(dt: DataType, side: String): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName: $side side must be array<float|double>, got $other")
  }
  @transient protected lazy val aFloat: Boolean = floatOf(left.dataType, "left")
  @transient protected lazy val bFloat: Boolean = floatOf(right.dataType, "right")
}

case class DotPairExpr(left: Expression, right: Expression) extends PairMath {
  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.dotPair(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ExprKernels.dotPair($a, $b, $aFloat, $bFloat);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotPairExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_pair"
}

case class CosinePairExpr(left: Expression, right: Expression) extends PairMath {
  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.cosinePair(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ExprKernels.cosinePair($a, $b, $aFloat, $bFloat);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosinePairExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_pair"
}

object PairMathExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def dotPair(a: Column, b: Column): Column =
    ColumnBridge.column(DotPairExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosinePair(a: Column, b: Column): Column =
    ColumnBridge.column(CosinePairExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
