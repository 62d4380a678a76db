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

  /** Rolling active users: for every day whose trailing `windowDays`-day
    * window contains any activity, the EXACT count of distinct users
    * active in that window (WAU for windowDays=7), next to that day's DAU.
    *
    * Sliding distinct counts don't decompose over windows (a user active
    * twice in the window counts once), so each (user, day) activity pair
    * is expanded to the `windowDays` window-end days it contributes to —
    * a CONSTANT fan-out of the deduplicated (user, day) frame, never of
    * raw events — and distinct users are counted per window-end day.
    * Window-end days past the last observed day are clipped (their window
    * is not fully formed... they'd also be misleading).
    *
    * Shuffles: dedup to (user, day); constant-width explode scan-side;
    * count-distinct per day (two-phase under the hood); a day-keyed join
    * with DAU. All post-dedup frames are (users x days)-sized. */
  /** CUPED variance-reduced A/B readout (Deng et al. 2013): adjust the
    * experiment metric with a pre-period covariate,
    * `Y' = Y - θ(X - x̄)` with `θ = cov(X,Y)/var(X)` POOLED across
    * arms (the unbiasedness requirement — per-arm θ would leak the
    * treatment into the adjustment). Arm means of Y' need only the
    * arm-level sums: `ȳ_a - θ(x̄_a - x̄)` — nothing per-user
    * materializes. All covariance pieces are exact integer cent sums
    * (one map-side-combined aggregation over the per-user frame); θ
    * and the means land on the 6dp grid through one fixed IEEE
    * sequence. `var_reduction = θ²·var(X)/var(Y)` — the fraction of
    * metric variance the covariate removed. Long-sum headroom:
    * n·Σxy < 2⁶³ holds to ~10⁴ users at ~10⁶ cents each; widen to
    * decimal beyond.
    *
    * Input: one row per user with (armCol, xCents, yCents) integer
    * columns. Output: one row per arm + pooled theta / reduction. */
  def cupedAbTest(perUser: DataFrame, armCol: String): DataFrame = {
    val pooled = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val varXn = col("n") * col("sxx") - col("sx") * col("sx")
    val varYn = col("n") * col("syy") - col("sy") * col("sy")
    val theta = when(varXn > 0L,
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        / varXn.cast("double")).otherwise(lit(0.0d))
    val byArm = perUser.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sxa"),
        sum(col("y")).as("sya"))
    val g6 = (c: Column) => floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
    byArm.join(broadcast(pooled))
      .select(col("arm"), col("n_users"),
        g6(col("sya").cast("double") / col("n_users").cast("double")
          / lit(100.0d)).as("mean_y"),
        g6((col("sya").cast("double") / col("n_users").cast("double")
          - theta * (col("sxa").cast("double") / col("n_users").cast("double")
            - col("sx").cast("double") / col("n").cast("double")))
          / lit(100.0d)).as("mean_y_cuped"),
        g6(theta).as("theta"),
        when(varYn > 0L, g6(theta * theta * varXn.cast("double")
          / varYn.cast("double"))).as("var_reduction"))
  }

  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int = 7): DataFrame = {
    val ud = events.select(col(userCol).as("u"),
      date_trunc("day", col(tsCol)).cast("date").as("d")).distinct()
    val maxDay = ud.agg(max(col("d")).as("max_d"))
    val dau = ud.groupBy(col("d").as("day")).agg(countDistinct(col("u")).as("dau"))
    val wau = ud
      .select(col("u"), explode(sequence(col("d"),
        date_add(col("d"), windowDays - 1), expr("interval 1 day"))).as("day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_d"))
      .groupBy(col("day"))
      .agg(countDistinct(col("u")).as(s"active_$windowDays"))
    // left join: a day inside someone's trailing window but with no
    // activity of its own has DAU 0, not a missing row
    wau.join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        col(s"active_$windowDays"))
  }

  /** Longest consecutive-day activity streak per user (plus total active
    * days) — the gaps-and-islands construction: within a user, consecutive
    * days share the anchor `day - row_number` (both walk in lockstep), so
    * the streak is the largest anchor-group. One shuffle on the user key;
    * the window and both aggregations share its partitioning. */
  def streaks(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ud = events.select(col(userCol).as("user_id"),
      date_trunc("day", col(tsCol)).cast("date").as("d")).distinct()
    val rn = row_number().over(Window.partitionBy(col("user_id")).orderBy(col("d")))
    ud.withColumn("anchor", date_sub(col("d"), rn))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"), max(col("len")).as("longest_streak"))
  }

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
