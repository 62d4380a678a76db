package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — the principled replacement for
  * naive retention curves (q117/q127): right-censored subjects (users
  * still active when observation ends) stay in the risk set up to their
  * censoring time instead of being miscounted as churned.
  *
  * Scale: the estimator runs entirely over PRE-AGGREGATED per-duration
  * counts (bounded by the calendar window, never by users), so the one
  * global cumulative window is a tiny post-aggregation pass — the
  * aggregate-then-window discipline. Per-subject reduction is one
  * map-side-combined min/max groupBy over the raw events.
  */
object Survival {

  /** Per-subject lifetimes from an event log: duration in days from
    * first to last event; a subject whose last event falls within
    * `censorDays` of the GLOBAL observation end is right-censored
    * (still alive — their true lifetime is only known to exceed the
    * observed one). The global end rides in on a broadcast single-row
    * aggregate. Output: (subject, duration_days, observed). */
  def lifetimes(events: DataFrame, subjectCol: String, tsCol: String,
                censorDays: Int = 7): DataFrame = {
    require(censorDays >= 0, "censorDays must be >= 0")
    val spans = events.groupBy(col(subjectCol).as("subject"))
      .agg(min(date_trunc("day", col(tsCol)).cast("date")).as("first_day"),
        max(date_trunc("day", col(tsCol)).cast("date")).as("last_day"))
    val end = events.agg(
      max(date_trunc("day", col(tsCol)).cast("date")).as("obs_end"))
    spans.join(broadcast(end))
      .select(col("subject"),
        datediff(col("last_day"), col("first_day")).cast("long")
          .as("duration_days"),
        (datediff(col("obs_end"), col("last_day")) >= censorDays)
          .as("observed"))
  }

  /** Gap-based session lifetimes — the short-horizon subject for K-M
    * when users outlive the observation window (a 30-day extract where
    * every user is still active censors EVERY user-level lifetime; the
    * session curve is the one with actual deaths). A new session starts
    * after `gapSeconds` of silence (same rule as the q51 sessionizer);
    * duration is whole minutes first-to-last event; a session whose
    * last event is within `gapSeconds` of the global observation end is
    * right-censored (it may still be open). One windowed pass per user
    * partition + one groupBy — both shuffle on user_id only. */
  def sessionLifetimes(events: DataFrame, subjectCol: String, tsCol: String,
                       tieCol: String, gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be > 0")
    val byUser = Window.partitionBy(col(subjectCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val gapUs = gapSeconds * 1000000L
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(byUser)
    val isNew = when(prev.isNull || us - prev > gapUs, 1L).otherwise(0L)
    val runningW = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val end = events.agg(max(unix_micros(col(tsCol))).as("obs_end_us"))
    events
      .withColumn("session_id", sum(isNew).over(runningW))
      .groupBy(col(subjectCol).as("subject"), col("session_id"))
      .agg(min(us).as("__first"), max(us).as("__last"))
      .join(broadcast(end))
      .select(col("subject"), col("session_id"),
        ((col("__last") - col("__first")) / lit(60000000L)).cast("long")
          .as("duration_min"),
        (col("obs_end_us") - col("__last") >= gapUs).as("observed"))
  }

  /** Kaplan–Meier product-limit estimator over (duration, observed)
    * rows: at each distinct event time t_i with d_i observed deaths and
    * n_i at risk (duration >= t_i, censored included),
    * `S(t_i) = Π (1 - d_j/n_j)` for j <= i.
    *
    * Portable arithmetic: each factor becomes a 9dp-grid integer log
    * term `floor(ln((n_i-d_i)/n_i)*1e9+0.5)` (ln of a ratio of exact
    * integers), the product a running integer sum, and the survival one
    * final `exp` onto the 6dp grid — no compounding float drift, and
    * the oracle replays the identical sequence. A time where the whole
    * risk set dies (n_i = d_i) pins survival to exactly 0. Only event
    * times (d_i > 0) are emitted, per convention. */
  def kaplanMeier(lifetimes: DataFrame,
                  durationCol: String = "duration_days"): DataFrame = {
    val perT = lifetimes.groupBy(col(durationCol).as("t"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leaving"))
    val wAsc = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = lifetimes.agg(count(lit(1)).as("n_total"))
    perT.join(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
      .withColumn("__term9", when(col("n_risk") > col("d"),
        floor(log((col("n_risk") - col("d")).cast("double")
          / col("n_risk").cast("double")) * lit(1e9) + lit(0.5d)).cast("long")))
      .withColumn("__zero", max(when(col("n_risk") === col("d"), 1L)
        .otherwise(0L)).over(wAsc))
      .withColumn("__cum9", sum(col("__term9")).over(wAsc))
      .filter(col("d") > 0L)
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_events"),
        when(col("__zero") === 1L, lit(0.0d))
          .otherwise(floor(exp(col("__cum9").cast("double") / lit(1e9))
            * lit(1e6) + lit(0.5d)) / lit(1e6)).as("survival"))
  }
}
