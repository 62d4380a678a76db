package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing: merge overlapping/touching per-key time intervals
  * and report coverage — the classic gaps-and-islands operator behind
  * utilization reports, incident-window rollups, and per-entity "time
  * actually covered" metrics.
  *
  * Algorithm (the standard running-max island construction, expressed as
  * two window passes so it stays a single hash shuffle on the key):
  *   1. order intervals per key by (start, end);
  *   2. an interval STARTS a new island iff its start is strictly greater
  *      than the running max of all previous ends (touching intervals
  *      merge: [1,5] and [5,9] coalesce — half-open semantics);
  *   3. the island id is the running sum of those start-flags;
  *   4. per (key, island): min(start), max(end).
  *
  * All timestamp arithmetic happens on epoch-microsecond longs — exact
  * integer comparisons, no float rounding, engine-portable.
  *
  * Scale: ONE hash shuffle on the key; both windows and the final
  * aggregation share that partitioning (Catalyst reuses the Exchange).
  * Per-key interval counts are what bound the window sort — keys are
  * entities (users/devices), so the per-partition sort is the same
  * memory class as sessionization (EventStreams.sessionize).
  */
object Intervals {

  /** Merged islands, one row per coalesced interval:
    * (key, island, start_us, end_us, n_source). */
  def merge(df: DataFrame, keyCol: String, startUs: Column, endUs: Column): DataFrame = {
    val ordered = Window.partitionBy(col(keyCol)).orderBy(col("start_us"), col("end_us"))
    val prevEnds = ordered.rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol), startUs.as("start_us"), endUs.as("end_us"))
      // strictly-greater: an interval touching the running frontier
      // (start == max prior end) still merges (half-open convention)
      .withColumn("new_island",
        when(col("start_us") > max(col("end_us")).over(prevEnds), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("island", sum(col("new_island")).over(ordered))
      .groupBy(col(keyCol), col("island"))
      .agg(
        min(col("start_us")).as("start_us"),
        max(col("end_us")).as("end_us"),
        count(lit(1)).as("n_source"))
  }

  /** Per-key coverage rollup over the merged islands:
    * (key, n_raw, n_merged, covered_us, span_us). `covered_us` is the
    * union length (sum of island lengths); `span_us` is last end - first
    * start — their ratio is the key's duty cycle. */
  def coverage(df: DataFrame, keyCol: String, startUs: Column, endUs: Column): DataFrame =
    merge(df, keyCol, startUs, endUs)
      .groupBy(col(keyCol))
      .agg(
        sum(col("n_source")).as("n_raw"),
        count(lit(1)).as("n_merged"),
        sum(col("end_us") - col("start_us")).as("covered_us"),
        (max(col("end_us")) - min(col("start_us"))).as("span_us"))
}
