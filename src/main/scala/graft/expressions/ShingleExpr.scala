package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Word n-gram shingles of lowercased text, as a single Catalyst expression.
  *
  * Semantics identical to the composed built-in form
  * (`array_distinct(transform(sequence(...), i -> concat_ws(" ", ...)))` over
  * `split(lower(text), " ", -1)`), but one JVM pass per document instead of
  * one interpreted lambda dispatch per shingle — higher-order functions don't
  * participate in whole-stage codegen, and profiling showed them dominating
  * MinHash end-to-end (11s of a 16s run at sf0.1). Custom `Expression`
  * chosen per the preference order: built-ins first, expression when the
  * built-in form is the measured bottleneck.
  *
  * Distinct (the default) keeps first occurrence (array_distinct
  * semantics); `distinct = false` keeps every window occurrence in order
  * (for occurrence-counting rules like the top-bigram repetition filter).
  * Texts with fewer than `n` tokens yield one shingle: all tokens joined
  * by a space.
  */
case class ShingleExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // toString, not a UTF8String cast: tolerates any child type (the
  // ExpectsInputTypes route is closed — AbstractDataType is sql-private).
  override def nullSafeEval(input: Any): Any =
    ExprKernels.shingles(input.toString, n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      s"${ev.value} = graft.expressions.ExprKernels.shingles($in, $n, $distinct);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleExpr =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

/** Per-document repetition statistics in ONE pass per row: `[total, top]`
  * word n-gram occurrence counts (all windows, and the most frequent
  * gram's count). The composed form — explode(shingles) → groupBy(doc, g)
  * → groupBy(doc) — shuffles every (doc, gram) pair twice for what is a
  * per-document statistic; at corpus scale that shuffle is the dominant
  * cost of the Gopher repetition rule (reference-class rule, see
  * SURVEY.md §2 LLM ops). Same one-pass-per-row family as
  * [[MinHashSigExpr]]. */
case class TopGramStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprKernels.topGramStats(input.toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      s"${ev.value} = graft.expressions.ExprKernels.topGramStats($in, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): TopGramStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "top_gram_stats"
}

object ShingleExpr {
  import org.apache.spark.sql.Column

  /** Column wrapper (classic API: Column <-> Expression bridge). */
  def shingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleExpr(ColumnBridge.expression(c), n))
  }

  /** All window occurrences, duplicates kept (occurrence counting). */
  def shinglesAll(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleExpr(ColumnBridge.expression(c), n, distinct = false))
  }

  /** One-pass repetition stats: array(total_windows, top_gram_count). */
  def topGramStats(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TopGramStatsExpr(ColumnBridge.expression(c), n))
  }
}
