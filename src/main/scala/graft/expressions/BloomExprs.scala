package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd scalar expression.
  *
  * The filter rides the plan as a serialized byte array (bounded by the
  * builder's expectedItems/fpp — ~1.2 MB per 10^6 items at 1% fpp) and is
  * deserialized ONCE per executor via a plan reference object, not per
  * row. `mightContain` is a pure bit-probe: no false negatives ever, false
  * positives at the configured rate — so as a scan-side prune it can only
  * pass extra rows, never lose one, and an exact check downstream restores
  * exactness (the composition [[graft.operators.Dedup.contaminationBloomPruned]]
  * uses).
  *
  * The bit pattern is a pure function of the inserted SET (bits are OR'd),
  * so the expression is deterministic across partitioning and merge order.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case LongType   => filter.mightContainLong(input.asInstanceOf[Long])
    case other => throw new UnsupportedOperationException(
      s"bloom_might_contain: unsupported type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val filterRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = $filterRef.mightContainBinary(($c).getBytes());"
      case LongType   => s"${ev.value} = $filterRef.mightContainLong($c);"
      case other => throw new UnsupportedOperationException(
        s"bloom_might_contain: unsupported type $other")
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Serialize a built filter for embedding in a plan. */
  def toBytes(filter: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }

  def mightContain(c: Column, filter: BloomFilter): Column =
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expression(c), toBytes(filter)))
}
