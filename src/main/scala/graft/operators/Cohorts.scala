package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention: group users by the week of their FIRST event and
  * measure, for each later week, what fraction of the cohort is still
  * active — the standard product-analytics retention triangle.
  *
  * Construction (shuffle budget: one hash shuffle on the user key, then
  * one on the (cohort, offset) output key — both unavoidable, both
  * map-side combined):
  *   1. distinct (user, activity_week) — the dedup rides the same user
  *      shuffle as step 2;
  *   2. cohort week = min(activity_week) over the user's rows (window on
  *      the user partitioning — no second scan, no self-join);
  *   3. offset = (activity_week - cohort_week) in whole weeks — both are
  *      Monday-truncated dates, so the day difference is exactly
  *      divisible by 7 (integer division, engine-portable);
  *   4. per (cohort_week, offset): distinct active users;
  *   5. retention = active / cohort_size. Every user is active at offset
  *      0 by construction, so cohort_size IS the offset-0 count — taken
  *      from a window over the cohort partition, not a self-join.
  *
  * The ratio follows the house grid rule (floor(x*1e6 + 0.5)/1e6 on a
  * value computed with one division) so DuckDB and Spark agree bit-for-bit.
  */
object Cohorts {

  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = events
      .select(col(userCol).as("user"), date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
    val byUser = Window.partitionBy(col("user"))
    val withCohort = weeks
      .withColumn("cohort_week", min(col("wk")).over(byUser))
      .withColumn("week_offset", (datediff(col("wk"), col("cohort_week")) / 7).cast("long"))
    val counts = withCohort
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user")).as("n_active"))
    val byCohort = Window.partitionBy(col("cohort_week"))
    counts
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(byCohort))
      .withColumn("retention",
        floor(col("n_active").cast("double") / col("cohort_size").cast("double") * lit(1e6)
          + lit(0.5)) / lit(1e6))
  }
}
