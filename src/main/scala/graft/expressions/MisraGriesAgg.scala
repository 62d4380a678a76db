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
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a custom Catalyst aggregate
  * (`TypedImperativeAggregate`): at most `k` counters per buffer, O(k)
  * memory regardless of input size, mergeable across partitions (the
  * published mergeable-summaries construction: sum counters, then subtract
  * the (k+1)-th largest and drop non-positives).
  *
  * Guarantee: every key with true frequency > N/(k+1) is present in the
  * result; reported counts are lower bounds (undercount <= N/(k+1)). The
  * sketch is therefore a CANDIDATE generator — `HeavyHitters.exact`
  * re-counts candidates exactly so the final operator output is
  * deterministic (sketch contents depend on partition merge order; the
  * guaranteed superset property does not).
  *
  * Key types: long/int/string (the id/category columns heavy-hitter
  * analysis runs on).
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  private def keyType: DataType = child.dataType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", keyType), StructField("count_lb", LongType))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from an unsafe row points into a reused buffer — copy
      val key = v match { case s: UTF8String => s.clone(); case x => x }
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // classic MG: decrement every counter, drop zeros
          val dead = mutable.ArrayBuffer[Any]()
          buf.foreach { case (kk, c) => if (c <= 1) dead += kk else buf.update(kk, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Any, Long], b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (kk, c) => b1.update(kk, b1.getOrElse(kk, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from all, keep positives
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer[Any]()
      b1.foreach { case (kk, c) => if (c - cut <= 0) dead += kk else b1.update(kk, c - cut) }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val rows = buf.toArray.sortBy(-_._2).map { case (kk, c) =>
      InternalRow(kk, c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) =>
      keyType match {
        case LongType => out.writeLong(kk.asInstanceOf[Long])
        case IntegerType => out.writeInt(kk.asInstanceOf[Int])
        case StringType =>
          val bytes = kk.asInstanceOf[UTF8String].getBytes
          out.writeInt(bytes.length); out.write(bytes)
        case other => throw new UnsupportedOperationException(
          s"misra_gries: unsupported key type $other")
      }
      out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    (0 until n).foreach { _ =>
      val key: Any = keyType match {
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case StringType =>
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        case other => throw new UnsupportedOperationException(
          s"misra_gries: unsupported key type $other")
      }
      buf.update(key, in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: array<struct<key, count_lb>> of <= k candidates. */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
