package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The end-to-end training-corpus preparation a 100 TB pipeline actually
  * runs, as ONE composable operator: quality floor → repetition filter →
  * exact dedup (keep-first) → per-source cap → PII scrub. Every stage is
  * an engine primitive that is independently oracle-checked (q42/q47/
  * q30/q49/q46); the composition itself is hash-checked end to end as
  * q83.
  *
  * Scale shape: the quality and repetition stages are per-row expressions
  * on the scan (zero shuffle — `TopGramStatsExpr`); dedup shuffles a
  * 16-byte digest; the cap shuffles (source, digest-ordered rank); the
  * scrub is a codegen'd regex chain on the survivors. Two shuffles total
  * for the whole pipeline.
  */
object CorpusPipeline {

  /** Survivor rows with a scrubbed text column (`clean_text`), plus the
    * original id and source columns. Deterministic and engine-portable:
    * dedup keeps the smallest id per digest; the cap keeps the first
    * `perSourceCap` docs per source in (md5, id) order. */
  def prepare(docs: DataFrame, textCol: String, idCol: String,
              sourceCol: String, minTokens: Int = 10,
              maxTopShare: Double = 0.2, perSourceCap: Int = 50): DataFrame = {
    val text: Column = col(textCol)
    val st = graft.expressions.ShingleExpr.topGramStats(text, 2)
    val kept = docs
      .filter(TextAnalysis.tokenCount(text) >= minTokens)
      .withColumn("__st", st)
      // UNROUNDED share, strict mirror of the oracle's max(c)/sum(c)
      .filter(col("__st").getItem(1).cast("double") / col("__st").getItem(0)
        <= maxTopShare)
      .drop("__st")
    val byDigest = Window.partitionBy(md5(text)).orderBy(col(idCol).asc)
    val deduped = kept.withColumn("__rn", row_number().over(byDigest))
      .filter(col("__rn") === 1).drop("__rn")
    val bySource = Window.partitionBy(col(sourceCol))
      .orderBy(md5(text).asc, col(idCol).asc)
    deduped.withColumn("__rk", row_number().over(bySource))
      .filter(col("__rk") <= perSourceCap).drop("__rk")
      .withColumn("clean_text", TextAnalysis.scrubPii(text))
      .drop(textCol)
  }

  /** Filter-attrition report: how many documents each pipeline stage
    * admits — the per-filter accounting every corpus-construction run
    * publishes (which rule is doing the work? did a threshold change
    * silently halve the corpus?).
    *
    * Stages (sequential — each applies to the SURVIVORS of the previous,
    * which is what makes it a funnel and not three independent counts):
    *   1. quality  — the Gopher-style band rules (word count, mean word
    *      length, symbol ratio, duplicate-segment ratio);
    *   2. exact_dedup — keep-first on the md5 digest, computed among
    *      stage-1 survivors only;
    *   3. source_cap — at most `perSourceCap` survivors per source in
    *      content-hash order (C4-style domain downsampling).
    *
    * ONE-PASS construction: no stage filters the frame; later stages see
    * earlier flags through windows — "min surviving id per digest" makes
    * the dedup flag, "running count of survivors per source in hash
    * order" makes the cap rank. Two window shuffles (digest, source) +
    * one single-row aggregate; the funnel never rescans the corpus.
    *
    * Output: (stage, n_in, n_out), n_in of stage k = n_out of k-1. */
  def attritionReport(docs: DataFrame, textCol: String, idCol: String,
                      sourceCol: String, perSourceCap: Int): DataFrame = {
    val text = col(textCol)
    val f1 = TextAnalysis.gopherRules(text).pass

    val byDigest = Window.partitionBy(col("__h"))
    val bySource = Window.partitionBy(col(sourceCol))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = docs
      .withColumn("__h", md5(text))
      .withColumn("__f1", f1)
      .withColumn("__f2", col("__f1") &&
        col(idCol) === min(when(col("__f1"), col(idCol))).over(byDigest))
      .withColumn("__rk", sum(when(col("__f2"), 1L).otherwise(0L)).over(bySource))
      .withColumn("__f3", col("__f2") && col("__rk") <= perSourceCap)
    flagged.agg(
        count(lit(1)).as("n0"),
        sum(when(col("__f1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__f2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("__f3"), 1L).otherwise(0L)).as("n3"))
      .selectExpr("stack(3, 'quality', n0, n1, 'exact_dedup', n1, n2," +
        " 'source_cap', n2, n3) AS (stage, n_in, n_out)")
  }
}
