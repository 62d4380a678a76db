package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation attrition report: attribute every document to the
  * FIRST filter stage that would drop it, then tabulate per source — the
  * "where did my data go" accounting every large-scale cleaning pipeline
  * publishes next to its corpus (C4, Gopher, RefinedWeb all report
  * per-stage removal rates). Differs from a plain pass/fail flag table:
  * stages are ordered, a document charged to `dup` never also counts
  * under `short`, so the report's columns sum to the corpus exactly.
  *
  * Stage order (the conventional cheap-to-expensive pipeline order):
  *   1. `dup`        — exact content duplicate, keep-first by doc id
  *   2. `lang`       — language metadata != the target language
  *   3. `short`      — fewer than `minTokens` whitespace tokens
  *   4. `repetitive` — the most frequent word 2-gram exceeds
  *                     `maxTopBigramFrac` of all 2-gram occurrences
  *                     (the Gopher/MassiveText repetition family)
  *   5. `kept`       — survived everything
  *
  * Determinism: ratios snap to the 6dp grid with the house
  * floor(x*1e6+0.5) rule; the repetition statistic is
  * [[graft.expressions.TopGramStatsExpr]] — one codegen'd pass per row,
  * same gram semantics the q47 oracle replays with strings.
  *
  * Scale (100 TB): repetition and token counts are scan-side
  * expressions (zero shuffle); the only corpus-keyed work is the
  * content-digest keep-first aggregation and its join back (both
  * digest-keyed, map-side combined) plus the final tiny report
  * aggregation. The share window runs over the AGGREGATED report
  * (sources x stages rows), never the corpus.
  */
object Curation {

  def funnel(df: DataFrame, textCol: String, idCol: String,
             langCol: String, sourceCol: String,
             targetLang: String = "en", minTokens: Long = 40L,
             maxTopBigramFrac: Double = 0.08): DataFrame = {
    val grid = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)

    // null text folds to "" and null lang counts as a lang miss, so the
    // stages PARTITION the corpus exactly (the documented invariant) —
    // a null would otherwise drop the row at the digest join / fall
    // through the three-valued lang comparison
    val txt = coalesce(col(textCol), lit(""))
    // keep-first exact dedup verdict: md5-keyed min id
    val firstOf = df
      .groupBy(md5(coalesce(col(textCol), lit(""))).as("__h"))
      .agg(min(col(idCol)).as("__first"))
    // per-doc [total, top] 2-gram occurrence counts, one pass per row
    val st = graft.expressions.ShingleExpr.topGramStats(txt, 2)

    val staged = df
      .join(firstOf, md5(txt) === col("__h"))
      .withColumn("__st", st)
      .withColumn("__nt", size(split(txt, " ", -1)).cast("long"))
      .withColumn("__frac", grid(
        col("__st").getItem(1).cast("double") / col("__st").getItem(0).cast("double")))
      .withColumn("stage",
        when(col(idCol) =!= col("__first"), lit("dup"))
          .when(not(col(langCol) <=> targetLang), lit("lang"))
          .when(col("__nt") < minTokens, lit("short"))
          .when(col("__frac") > maxTopBigramFrac, lit("repetitive"))
          .otherwise(lit("kept")))

    val report = staged
      .groupBy(col(sourceCol).as("source"), col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
    // share over the aggregated frame only (sources x stages rows)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    report
      .withColumn("share",
        grid(col("n_docs").cast("double") / sum(col("n_docs")).over(w).cast("double")))
      .select("source", "stage", "n_docs", "n_tokens", "share")
  }
}
