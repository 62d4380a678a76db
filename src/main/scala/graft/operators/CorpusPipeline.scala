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
}
