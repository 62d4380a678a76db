package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min sketch as a custom Catalyst aggregate
  * (`TypedImperativeAggregate`): a `depth x width` grid of counters,
  * O(depth*width) memory regardless of input size, mergeable across
  * partitions by elementwise sum (integer addition — partition and merge
  * order free, so the sketch is DETERMINISTIC for a given input set,
  * unlike order-sensitive sketches). The frequency-estimation complement
  * of [[MisraGriesAgg]]: MG returns the heavy keys themselves; CMS
  * answers point frequency queries for ANY key with a one-sided
  * guarantee (Cormode & Muthukrishnan 2005):
  *
  *   exact <= est <= exact + eps*N   with eps = e/width,
  *   prob >= 1 - (1/2)^depth per query (here deterministic given the
  *   fixed hash family).
  *
  * Hashing happens SCAN-SIDE, not in the aggregate: [[CountMin.buckets]]
  * derives the depth bucket indices with codegen'd Spark expressions
  * (the house md5-prefix convention, `h32(j + ":" + key) mod width`), so
  * the JVM buffer only increments — no per-row digest work outside
  * whole-stage codegen, and an external engine (the DuckDB oracle)
  * reproduces the sketch bit-for-bit from the same relational
  * definition: `cell[j][b] = count of rows hashing to (j, b)`.
  *
  * Scale: one aggregation pass with map-side partial sketches; the merge
  * tree moves `depth*width` longs per partition, never keys. Probing a
  * collected sketch is a scan-side `least(element_at(...))` over a
  * literal array — zero joins, zero shuffles.
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2 && width <= (1 << 20), "width must be in [2, 2^20]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(a.numElements() == depth,
        s"count_min: bucket array must have $depth elements")
      // a null key hashes to null buckets — skip the row (count(*) of
      // non-null keys, the aggregate-input convention). Plain while
      // loops: this runs once per input row.
      var anyNull = false
      var j = 0
      while (j < depth && !anyNull) { anyNull = a.isNullAt(j); j += 1 }
      if (!anyNull) {
        j = 0
        while (j < depth) {
          // Validate BEFORE truncating: a caller-supplied bucket
          // expression with a mismatched modulus must fail loudly, not
          // land in another depth row's cell and silently corrupt the
          // sketch (per-row mass conservation would break undetected).
          val b = a.getLong(j)
          require(b >= 0L && b < width,
            s"count_min: bucket $b at depth row $j out of range [0, $width)" +
              " — bucket expression modulus must match the sketch width")
          buf(j * width + b.toInt) += 1L
          j += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)

  override def prettyName: String = "count_min"
}

object CountMin {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** The depth bucket indices of `key` as a codegen'd array<long>:
    * `bucket_j = h32_j(key) mod width` where h32_j reads the j-th
    * DISJOINT 8-hex-digit slice of ONE md5 digest — one hash per row
    * (not depth), with the slices acting as the independent hash family
    * (md5's 128 bits give four uncorrelated 32-bit words). DuckDB
    * replays it verbatim:
    * `CAST(concat('0x', substr(md5(key), 1 + 8*j, 8)) AS BIGINT) % width`.
    * The 32-hex digest bounds this family at depth 4. */
  def buckets(key: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= 4,
      "md5-slice bucket family supports depth in [1, 4]")
    val digest = md5(key.cast("string"))
    array((0 until depth).map { j =>
      pmod(conv(substring(digest, 1 + 8 * j, 8), 16, 10)
        .cast("long"), lit(width.toLong))
    }: _*)
  }

  /** Aggregate Column: the flattened depth*width counter grid
    * (row-major: cell (j, b) at index j*width + b). */
  def countMin(key: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(buckets(key, depth, width)),
        depth, width).toAggregateExpression())

  /** Point-frequency estimate of `key` against a materialized sketch
    * (as a literal array Column, e.g. `typedLit(collected)`): the min
    * over the key's depth cells. Scan-side only — probing a corpus of
    * keys against a collected sketch never shuffles. */
  def estimate(sketch: Column, key: Column, depth: Int, width: Int): Column = {
    val bs = buckets(key, depth, width)
    val cells = (0 until depth).map { j =>
      element_at(sketch, (lit(j.toLong * width) +
        element_at(bs, j + 1)).cast("int") + lit(1))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
