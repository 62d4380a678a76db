package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact 6dp running product: folds per-row integer factors
  * `f6 ∈ [0, 10^6]` (a probability on the house 1e-6 grid) into
  * `acc' = acc * f6 div 10^6`, starting from `acc = 10^6` — the
  * Kaplan–Meier product-limit recurrence ([[graft.operators.Survival]])
  * in pure BIGINT math. `acc, f6 ≤ 10^6`, so the intermediate product
  * is ≤ 10^12 and never overflows a long; every engine computes the
  * identical integers (the same fold DuckDB replays as a recursive
  * CTE), so the result is hash-stable across engines and partitionings.
  *
  * ORDERED-FOLD CONTRACT: floor division makes the fold
  * NON-ASSOCIATIVE, so this aggregate is only meaningful where rows
  * arrive in a defined order — a window with an ORDER BY and a
  * running (unbounded-preceding → current-row) frame, where Spark's
  * `UnboundedPrecedingWindowFunctionFrame` feeds rows incrementally
  * in frame order and NEVER merges partial buffers. That execution
  * shape is what turns the estimator's old collect_list-prefix fold
  * (O(T²) in distinct durations) into one O(T) pass. [[merge]]
  * fails loud: a groupBy/partial-aggregate use would be
  * partition-order-dependent and is therefore a planning bug, not a
  * degraded mode.
  *
  * Null factors are identity (skipped) so censored-only times can
  * ride in the fold unfiltered; out-of-range factors fail loud (a
  * factor outside [0, 10^6] means the caller's grid math is wrong
  * and silent wraparound would corrupt every later row).
  */
case class Product6FoldAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Product6FoldAgg.Buffer]
    with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Product6FoldAgg.Buffer =
    new Product6FoldAgg.Buffer(1000000L)

  override def update(buf: Product6FoldAgg.Buffer,
                      input: InternalRow): Product6FoldAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val f = v.asInstanceOf[Long]
      if (f < 0L || f > 1000000L) throw new IllegalStateException(
        s"product6_fold: factor $f outside the [0, 1e6] 6dp grid — " +
          "caller's factor arithmetic is broken")
      buf.acc = buf.acc * f / 1000000L
    }
    buf
  }

  override def merge(b1: Product6FoldAgg.Buffer,
                     b2: Product6FoldAgg.Buffer): Product6FoldAgg.Buffer =
    throw new UnsupportedOperationException(
      "product6_fold is an ORDERED fold (floor-division products are not " +
        "associative): use it only over a running window frame, never in " +
        "a groupBy/partial aggregate")

  override def eval(buf: Product6FoldAgg.Buffer): Any = buf.acc

  override def serialize(buf: Product6FoldAgg.Buffer): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8)
    out.putLong(buf.acc); out.array()
  }

  override def deserialize(bytes: Array[Byte]): Product6FoldAgg.Buffer =
    new Product6FoldAgg.Buffer(java.nio.ByteBuffer.wrap(bytes).getLong)

  override def withNewMutableAggBufferOffset(newOffset: Int): Product6FoldAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Product6FoldAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Product6FoldAgg =
    copy(child = newChild)

  override def prettyName: String = "product6_fold"
}

object Product6FoldAgg {

  /** Mutable one-long state: the running 6dp product. */
  final class Buffer(var acc: Long)

  /** Running 6dp product of `factor6` — pair with
    * `.over(Window.orderBy(...))` (running frame). */
  def product6(factor6: Column): Column =
    ColumnBridge.column(
      Product6FoldAgg(ColumnBridge.expression(factor6)).toAggregateExpression())
}
