package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    extends UnaryExpression with CodegenFallback {

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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // fail loudly on dimension mismatch: silently truncating the dot while
    // dividing by the full row norm would give plausible-but-wrong cosines
    if (n != mat.head.length) throw new IllegalArgumentException(
      s"cosines: input vector has $n dims, literal rows have ${mat.head.length}")
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i); i += 1 }
    var vNormSq = 0.0
    i = 0
    while (i < n) { vNormSq += v(i) * v(i); i += 1 }
    val vNorm = math.sqrt(vNormSq)
    val out = new Array[Any](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * row(j); j += 1 }
      val denom = vNorm * rowNorms(r)
      out(r) = if (denom > 0) dot / denom else 0.0
      r += 1
    }
    new GenericArrayData(out)
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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var bits = 0L
    var i = 0
    val n = math.min(arr.numElements(), 64)
    while (i < n) { if (arr.getDouble(i) >= 0) bits |= (1L << i); i += 1 }
    bits
  }
  override protected def withNewChildInternal(newChild: Expression): SignBitsExpr =
    copy(child = newChild)
  override def prettyName: String = "sign_bits"
}

/** Index of the maximum element of an array<double> (first on ties). */
case class ArgMaxExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var best = 0; var bestV = Double.NegativeInfinity
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getDouble(i)
      if (v > bestV) { bestV = v; best = i }
      i += 1
    }
    best
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMaxExpr =
    copy(child = newChild)
  override def prettyName: String = "argmax"
}

/** Indices of the k largest elements of an array<double>, descending
  * (ties by lower index first). k is tiny (nprobe), selection is O(n*k). */
case class TopKIndicesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val taken = new Array[Boolean](n)
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    var r = 0
    while (r < kk) {
      var best = -1; var bestV = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) { val v = arr.getDouble(i); if (v > bestV) { bestV = v; best = i } }
        i += 1
      }
      if (best < 0) {
        // all remaining elements are NaN (NaN > -Inf is false): take the
        // lowest untaken index deterministically instead of crashing
        var i2 = 0
        while (best < 0 && i2 < n) { if (!taken(i2)) best = i2; i2 += 1 }
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
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
