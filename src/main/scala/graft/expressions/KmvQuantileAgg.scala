package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k (KMV) quantile sketch as a custom Catalyst aggregate: keep the
  * `k` rows whose id-hash is smallest, then read quantiles off that uniform
  * sample. The classic k-minimum-values construction (Bar-Yossef et al.
  * 2002) applied to row sampling rather than distinct counting.
  *
  * Why this beats `percentile_approx` at scale:
  *  - **Partition-order independent.** The kept set is a pure function of
  *    the DATA (the k smallest id-hashes), so any partitioning, any merge
  *    order, any AQE re-plan produces the SAME result bit for bit —
  *    `percentile_approx`'s QuantileSummaries compactions depend on merge
  *    order, so its answer can drift between runs of the same query.
  *    Re-run-stable metrics are what you want in a regression gate.
  *  - O(k) state per group, one pass, mergeable (union, keep k smallest)
  *    — the same executor-memory story as any sketch.
  *
  * Error: the sample is k rows uniform-by-hash, so a quantile's rank error
  * is O(1/sqrt(k)) (binomial); k=1024 gives ~1.6% rank error at the
  * median. Exactness: if the group has <= k rows the sample IS the group
  * and quantiles are exact (lower-value convention).
  *
  * `id` must uniquely identify a row (a key column or expression); hashing
  * the VALUE would collapse duplicates and bias skewed data. Supported id
  * types: long/int/string.
  */
case class KmvQuantileAgg(value: Expression, id: Expression, k: Int,
                          probs: Seq[Double],
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]]
    with BinaryLike[Expression] {

  require(k >= 1, "k must be >= 1")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "probs must be in [0, 1]")

  override def left: Expression = value
  override def right: Expression = id

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  private def hashId(v: Any): Long = id.dataType match {
    case LongType    => ShingleHashing.mix(v.asInstanceOf[Long])
    case IntegerType => ShingleHashing.mix(v.asInstanceOf[Int].toLong)
    case StringType  =>
      val b = v.asInstanceOf[UTF8String].getBytes
      var h = 0xCBF29CE484222325L // FNV-1a 64
      var i = 0
      while (i < b.length) { h ^= (b(i) & 0xFFL); h *= 0x100000001B3L; i += 1 }
      h
    case other => throw new UnsupportedOperationException(
      s"kmv_quantiles: unsupported id type $other")
  }

  // max-heap on the UNSIGNED hash: head is the largest kept hash, the one
  // a smaller incoming hash evicts
  private def heapOrdering: Ordering[(Long, Double)] =
    Ordering.by { case (h, _) => h ^ Long.MinValue }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def update(buf: mutable.PriorityQueue[(Long, Double)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val v = value.eval(input)
    val idv = id.eval(input)
    if (v != null && idv != null) {
      val h = hashId(idv)
      val d = v.asInstanceOf[Double]
      if (buf.size < k) buf.enqueue((h, d))
      else if ((h ^ Long.MinValue) < (buf.head._1 ^ Long.MinValue)) {
        buf.dequeue(); buf.enqueue((h, d))
      }
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Long, Double)],
                     b2: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    b2.foreach { case (h, d) =>
      if (b1.size < k) b1.enqueue((h, d))
      else if ((h ^ Long.MinValue) < (b1.head._1 ^ Long.MinValue)) {
        b1.dequeue(); b1.enqueue((h, d))
      }
    }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any = {
    val vals = buf.toArray.map(_._2).sorted
    val n = vals.length
    val out = probs.map { p =>
      if (n == 0) Double.NaN
      else vals(math.min(n - 1, math.max(0, math.ceil(p * n).toInt - 1)))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, d) => out.writeLong(h); out.writeDouble(d) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readLong(), in.readDouble())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KmvQuantileAgg =
    copy(value = newLeft, id = newRight)

  override def prettyName: String = "kmv_quantiles"
}

object KmvQuantileAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: array<double> of the requested quantiles, read off
    * the deterministic k-minimum-id-hash row sample. */
  def kmvQuantiles(value: Column, id: Column, k: Int, probs: Seq[Double]): Column =
    ColumnBridge.column(KmvQuantileAgg(
      ColumnBridge.expression(value.cast("double")),
      ColumnBridge.expression(id), k, probs).toAggregateExpression())
}
