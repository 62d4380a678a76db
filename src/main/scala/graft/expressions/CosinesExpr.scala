package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of a vector column against N LITERAL rows (hyperplane
  * normals, IVF centroids) in one JVM pass per input row.
  *
  * The composed built-in form — N separate `aggregate(zip_with(...))`
  * higher-order expressions — is interpreted (no whole-stage codegen) and
  * walks the vector N times through lambda dispatch; this expression walks
  * it once and reuses the input norm for all N rows. Same math bit-for-bit:
  * elements widened to double, sequential accumulation, `0.0` when either
  * norm is zero (the `Similarity.cosine` convention).
  *
  * `rows` is a Seq-of-Seq (not arrays) so the expression canonicalizes
  * structurally and plan caching/CSE work.
  */
case class CosinesExpr(child: Expression, rows: Seq[Seq[Double]])
    extends UnaryExpression {

  require(rows.nonEmpty, "at least one literal row required")
  require(rows.forall(_.length == rows.head.length),
    "literal rows must share one dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val mat: Array[Array[Double]] = rows.map(_.toArray).toArray
  @transient private lazy val rowNorms: Array[Double] =
    mat.map { r =>
      var s = 0.0; var i = 0
      while (i < r.length) { s += r(i) * r(i); i += 1 }
      math.sqrt(s)
    }
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosines: expected array<float|double> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ExprKernels.cosines(input.asInstanceOf[ArrayData], mat, rowNorms, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("cosinesMat", mat, "double[][]")
    val normsRef = ctx.addReferenceObj("cosinesNorms", rowNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ExprKernels.cosines($c, $matRef, $normsRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): CosinesExpr =
    copy(child = newChild)

  override def prettyName: String = "cosines_lit"
}

/** Pack the sign bits of an array<double> into a long: bit i set iff
  * element i >= 0. Composed with CosinesExpr this is the hyperplane-LSH
  * bucket id in one evaluation (the when/bitwiseOR fold would re-evaluate
  * the interpreted cosine array once per plane). */
case class SignBitsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprKernels.signBits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ExprKernels.signBits($c);")

  override protected def withNewChildInternal(newChild: Expression): SignBitsExpr =
    copy(child = newChild)
  override def prettyName: String = "sign_bits"
}

/** Index of the maximum element of an array<double> (first on ties). */
case class ArgMaxExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprKernels.argMax(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ExprKernels.argMax($c);")

  override protected def withNewChildInternal(newChild: Expression): ArgMaxExpr =
    copy(child = newChild)
  override def prettyName: String = "argmax"
}

/** Indices of the k largest elements of an array<double>, descending
  * (ties by lower index first). k is tiny (nprobe), selection is O(n*k). */
case class TopKIndicesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprKernels.topKIndices(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ExprKernels.topKIndices($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): TopKIndicesExpr =
    copy(child = newChild)
  override def prettyName: String = "topk_indices"
}

object CosinesExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def cosines(c: Column, rows: Seq[Array[Float]]): Column =
    ColumnBridge.column(CosinesExpr(ColumnBridge.expression(c),
      rows.map(_.toSeq.map(_.toDouble))))

  def cosinesD(c: Column, rows: Seq[Array[Double]]): Column =
    ColumnBridge.column(CosinesExpr(ColumnBridge.expression(c), rows.map(_.toSeq)))

  def signBits(c: Column): Column =
    ColumnBridge.column(SignBitsExpr(ColumnBridge.expression(c)))

  def argMax(c: Column): Column =
    ColumnBridge.column(ArgMaxExpr(ColumnBridge.expression(c)))

  def topKIndices(c: Column, k: Int): Column =
    ColumnBridge.column(TopKIndicesExpr(ColumnBridge.expression(c), k))
}
