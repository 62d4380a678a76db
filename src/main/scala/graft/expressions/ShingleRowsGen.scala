package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a Catalyst GENERATOR (UDTF): one
  * `(pos, gram)` OUTPUT ROW per window, streamed — never a
  * materialized per-document array.
  *
  * `explode(shingles(text, n))` builds the whole shingle array in
  * memory before the Generate node fans it out: a pathological
  * document (100 MB of text) allocates its full gram list as one
  * value. This generator yields windows lazily from the token array,
  * so peak memory per row is the token list, not the gram list, and
  * the Generate machinery streams rows downstream — the right shape
  * for the long-tail documents a 100 TB corpus always contains.
  * Completes the custom-extension surface next to the scalar
  * expressions (ShingleExpr), the TypedImperativeAggregates (KMV,
  * Misra–Gries, Count–Min), the whole-operator strategy
  * (TopKPerKeyExec), and the optimizer rules (RangeJoinRule,
  * TopKRewriteRule).
  *
  * Semantics: every window IN ORDER with its 1-based position
  * (`distinct = false` ShingleExpr semantics plus position); texts
  * with fewer than `n` tokens yield one row: all tokens joined.
  * Evaluation is interpreted (CodegenFallback) — Generate inputs
  * sit outside whole-stage codegen in Spark anyway. */
case class ShingleRowsGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (toks.length < n) {
      Iterator.single(InternalRow(1,
        UTF8String.fromString(toks.mkString(" "))))
    } else {
      (0 to toks.length - n).iterator.map { i =>
        InternalRow(i + 1, UTF8String.fromString(
          toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleRowsGen =
    copy(child = c)

  override def prettyName: String = "shingle_rows"
}
