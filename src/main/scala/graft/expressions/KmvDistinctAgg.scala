package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** K-minimum-values DISTINCT sketch (Bar-Yossef et al. 2002) as a custom
  * Catalyst aggregate: keep the `k` smallest distinct 64-bit hashes (by
  * UNSIGNED order) seen in the group. The classic mergeable summary of a
  * SET — supports distinct-count estimation and, crucially, SET-OPERATION
  * estimates across groups: the Jaccard of two sets is estimated from
  * their two sketches alone ([[graft.operators.CorpusOverlap]]), which is
  * how corpus-overlap questions ("how much does source A share with B?")
  * get answered at 100 TB WITHOUT a corpus-sized pair join — the sketches
  * are group-count x k longs, driver-safe.
  *
  * Everything is deterministic: the kept set is a pure function of the
  * data (the k smallest hashes), so any partitioning / merge order / AQE
  * re-plan yields the SAME sketch bit for bit — and since the input hash
  * is itself replayable (FNV-1a via [[ShingleHashSetExpr]]), a DuckDB
  * oracle reproduces the sketch and its estimates EXACTLY: a hard
  * equality check on a sketch, not a tolerance band.
  *
  * Input: LONG (one hash per row) or ARRAY<LONG> (per-row hash sets from
  * a scan-side expression — no explode, elements folded here). State:
  * O(k) per group, heap-merged. Output: the sketch as array<long> sorted
  * ASCENDING BY UNSIGNED VALUE, each element SHIFTED by Long.MinValue
  * (h ^ 2^63) so the signed order downstream builtins use (array_sort,
  * sort_array) coincides with the unsigned hash order. Consumers compare
  * elements only for equality/order, so the shift is a pure order
  * normalization; replays apply the same xor.
  */
case class KmvDistinctAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvDistinctAgg.Buffer]
    with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  private def elementWise: Boolean = child.dataType.isInstanceOf[ArrayType]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvDistinctAgg.Buffer =
    new KmvDistinctAgg.Buffer(k)

  override def update(buf: KmvDistinctAgg.Buffer,
                      input: InternalRow): KmvDistinctAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      if (elementWise) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) { buf.offer(arr.getLong(i)); i += 1 }
      } else buf.offer(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: KmvDistinctAgg.Buffer,
                     b2: KmvDistinctAgg.Buffer): KmvDistinctAgg.Buffer = {
    b2.foreach(b1.offer)
    b1
  }

  override def eval(buf: KmvDistinctAgg.Buffer): Any = {
    val hs = buf.toArray
    java.util.Arrays.sort(hs) // hs is already shifted: signed sort = unsigned hash order
    new GenericArrayData(hs.map(h => h: Any))
  }

  override def serialize(buf: KmvDistinctAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val hs = buf.toArray
    out.writeInt(hs.length)
    hs.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvDistinctAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.offerShifted(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)

  override def prettyName: String = "kmv_distinct_sketch"
}

object KmvDistinctAgg {

  /** Bounded distinct-min-k state: max-heap over the SHIFTED hash (so
    * signed comparisons order by unsigned hash) plus a membership set for
    * distinctness. All internal storage is shifted; [[offer]] shifts raw
    * hashes on the way in. */
  final class Buffer(k: Int) {
    private val heap = mutable.PriorityQueue.empty[Long] // max-heap (shifted)
    private val seen = new java.util.HashSet[java.lang.Long]()

    def offer(rawHash: Long): Unit = offerShifted(rawHash ^ Long.MinValue)

    def offerShifted(s: Long): Unit = {
      if (!seen.contains(s)) {
        if (heap.size < k) { heap.enqueue(s); seen.add(s) }
        else if (s < heap.head) {
          seen.remove(heap.dequeue()); heap.enqueue(s); seen.add(s)
        }
      }
    }

    def foreach(f: Long => Unit): Unit = heap.foreach(s => f((s ^ Long.MinValue)))
    def toArray: Array[Long] = heap.toArray
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: the KMV distinct sketch (sorted array<long> of
    * order-normalized hashes) of a LONG or ARRAY<LONG> hash column. */
  def kmvDistinctSketch(hashes: Column, k: Int): Column =
    ColumnBridge.column(KmvDistinctAgg(
      ColumnBridge.expression(hashes), k).toAggregateExpression())
}
