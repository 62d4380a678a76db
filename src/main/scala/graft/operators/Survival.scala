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
    * Engine-exact arithmetic — NO transcendentals: each factor is the
    * exact 6dp integer `(n_i - d_i) * 10^6 div n_i` (BIGINT floor
    * division), and the running product is folded in pure integer math,
    * `acc' = acc * f div 10^6` (acc, f ≤ 10^6 so the product ≤ 10^12
    * never overflows a long). Every engine computes the identical
    * integers — no libm, no .5-grid ulp hazards (the previous ln/exp
    * 9dp-grid form flipped a hash when JVM Math.log and DuckDB libm
    * disagreed at a grid boundary). A time where the whole risk set
    * dies (n_i = d_i) yields factor 0, pinning survival to exactly 0
    * from then on. Only event times (d_i > 0) are emitted, per
    * convention; censored-only times carry factor 10^6 (identity) so
    * they can stay in the fold unfiltered.
    *
    * Output carries the survival probability TWICE: `survival_p6` is
    * the exact 6dp integer (BIGINT — the hash-stable column a
    * cross-engine compare should key on; an integer cannot diverge
    * under any float-canonicalization scheme) and `survival` is the
    * derived double convenience view (`p6 / 1e6`, one IEEE division).
    *
    * Scale: the product is a [[graft.expressions.Product6FoldAgg]]
    * running-window fold — O(T) in the number of DISTINCT durations
    * (previously an O(T²) collect_list prefix fold), and T is bounded
    * by the calendar window (days/minutes), never by subjects. */
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
      .withColumn("__f6", expr("((n_risk - d) * 1000000L) div n_risk"))
      .withColumn("__p6",
        graft.expressions.Product6FoldAgg.product6(col("__f6")).over(wAsc))
      .filter(col("d") > 0L)
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_events"),
        col("__p6").as("survival_p6"),
        (col("__p6").cast("double") / lit(1000000)).as("survival"))
  }

  /** Two-group log-rank test over (duration, observed, group) rows —
    * "do these two cohorts have the same survival curve", the
    * hypothesis test completing the K-M estimator pair (q252/q282):
    * at each event time the observed group-1 deaths are compared to
    * the hypergeometric expectation given the pooled risk set, and
    * `chi2 = (O1 - E1)² / V` on one degree of freedom.
    *
    * Engine-exact: at-risk and death counts are exact integers from
    * one grid of distinct durations × 2 groups (the kaplanMeier
    * window shape); the per-time expectation and variance land on the
    * house 9dp grid through ONE fixed IEEE sequence each
    * (`d·(n1/n)·1e9`, `d·(n1/n)·(n2/n)·((n-d)/(n-1))·1e9` — doubles,
    * identical order in the oracle), so their sums are order-free
    * integer sums and chi2 is a single rounded division.
    *
    * Scale: grid size = distinct durations (calendar-bounded, the K-M
    * contract); windows ordered over that bounded grid only. */
  def logRank(lifetimes: DataFrame, groupCol: String,
              durationCol: String = "duration_days"): DataFrame = {
    val perTG = lifetimes.groupBy(col(durationCol).as("t"),
        col(groupCol).as("g1"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leaving"))
      .select(col("t"), when(col("g1"), col("d")).otherwise(lit(0L)).as("d1"),
        when(!col("g1"), col("d")).otherwise(lit(0L)).as("d2"),
        when(col("g1"), col("leaving")).otherwise(lit(0L)).as("l1"),
        when(!col("g1"), col("leaving")).otherwise(lit(0L)).as("l2"))
      .groupBy(col("t"))
      .agg(sum(col("d1")).as("d1"), sum(col("d2")).as("d2"),
        sum(col("l1")).as("l1"), sum(col("l2")).as("l2"))
    val tot = lifetimes.agg(
      sum(when(col(groupCol), 1L).otherwise(0L)).as("nt1"),
      sum(when(!col(groupCol), 1L).otherwise(0L)).as("nt2"))
    val wPrev = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = perTG.join(broadcast(tot))
      .withColumn("n1",
        col("nt1") - coalesce(sum(col("l1")).over(wPrev), lit(0L)))
      .withColumn("n2",
        col("nt2") - coalesce(sum(col("l2")).over(wPrev), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("n", col("n1") + col("n2"))
      .filter(col("d") > 0L && col("n") > 1L)
      // ONE fixed IEEE sequence per term, mirrored by the oracle
      .withColumn("e9", floor(col("d").cast("double")
        * (col("n1").cast("double") / col("n").cast("double"))
        * lit(1e9) + lit(0.5d)).cast("long"))
      .withColumn("v9", floor(col("d").cast("double")
        * (col("n1").cast("double") / col("n").cast("double"))
        * (col("n2").cast("double") / col("n").cast("double"))
        * ((col("n") - col("d")).cast("double")
          / (col("n") - 1L).cast("double"))
        * lit(1e9) + lit(0.5d)).cast("long"))
    grid.agg(sum(col("d1")).as("o1"), sum(col("e9")).as("__e9"),
        sum(col("v9")).as("__v9"))
      .crossJoin(broadcast(tot))
      .select(col("nt1").as("n_group1"), col("nt2").as("n_group2"),
        col("o1").as("observed1"),
        (col("__e9").cast("double") / 1e9).as("expected1"),
        // V = 0 (every event time degenerate: one subject at risk, or a
        // single-group grid) leaves chi2 undefined — explicit NULL on
        // both engines, never an engine-specific inf/nan
        when(col("__v9") =!= 0L,
          round((col("o1").cast("double") * lit(1e9) - col("__e9").cast("double"))
            * (col("o1").cast("double") * lit(1e9) - col("__e9").cast("double"))
            / (lit(1e9) * col("__v9").cast("double")), 6))
          .otherwise(lit(null).cast("double")).as("chi2"))
  }
}
