package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Z-order (Morton) curve value: bit-interleave of two integral columns'
  * low 32 bits (x gets the even bit positions, y the odd ones).
  *
  * This is the data-LAYOUT primitive: range-partition + sort a table by
  * `zorder2(a, b)` before writing and the parquet files become tiles of
  * the (a, b) plane — per-file min/max stats then prune a 2-D predicate
  * down to the touched tiles, where single-column sorting can only prune
  * one of the two dimensions. The bit-spread uses the public
  * binary-magic-numbers method (Stanford Bit Twiddling Hacks).
  *
  * Values are masked to their low 32 bits (keys beyond 2^32 would need a
  * 128-bit curve; negative values are a caller error this masks rather
  * than propagates — layout keys are surrogate/natural ids, never
  * negative in this engine).
  */
case class ZOrderExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def integral(dt: DataType, side: String): Unit = dt match {
    case LongType | IntegerType | ShortType | ByteType => ()
    case other => throw new IllegalArgumentException(
      s"zorder2: $side side must be an integral type, got $other")
  }
  @transient private lazy val checked: Boolean = {
    integral(left.dataType, "left"); integral(right.dataType, "right"); true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    require(checked)
    ExprKernels.zorder2(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    require(checked)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ExprKernels.zorder2((long)($a), (long)($b));")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrderExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder2"
}

object ZOrderExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
