package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * the same key and rightTime <= leftTime (inclusive) — the operator behind
  * "state of the account when the event happened".
  *
  * Spark has no built-in as-of join; per the preference order this composes
  * built-ins rather than adding a physical operator: tag both sides, union,
  * and take a running `last(_, ignoreNulls=true)` over (key, time). That is
  * ONE shuffle on the key plus a per-partition sort — the same cost profile
  * as a sort-merge join, with no range-explosion. It scales exactly like
  * any windowed aggregation (skewed keys fall to AQE).
  *
  * Ties (several right rows at the same timestamp for one key) are resolved
  * deterministically by `rightTieBreak` descending — callers that need
  * engine-portable results should pre-dedupe the right side the same way.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String], rightTieBreak: String): DataFrame = {
    // Deterministic one-row-per-(key,time) on the right. Null keys are
    // dropped: SQL equality (and DuckDB's ASOF) never matches NULL = NULL,
    // but Window.partitionBy would group them together.
    val tieW = Window.partitionBy(col(rightKey), col(rightTime))
      .orderBy(col(rightTieBreak).desc)
    val rightDedup = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("__tn", row_number().over(tieW)).filter(col("__tn") === 1).drop("__tn")

    val leftCols = left.columns.toSeq
    val lSchema = left.schema
    val rSchema = rightDedup.select(rightCols.map(col): _*).schema

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rSchema).as("__r"))
    val r = rightDedup.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lSchema).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))

    // Right rows sort before left rows at equal time => "<=" semantics.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
