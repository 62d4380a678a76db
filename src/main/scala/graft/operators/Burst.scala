package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kleinberg two-state burst detection over a per-series daily count
  * sequence — "which days was this event type bursting", the temporal
  * anomaly screen (crawl spikes, incident windows, topic bursts) that
  * CUSUM (q190) and Pettitt (q291) approximate with a SINGLE change
  * point; the automaton instead labels every day with its optimal
  * base/burst state (Kleinberg 2002, the batched two-state variant).
  *
  * Model: state 0 emits Poisson(μ), state 1 emits Poisson(s·μ) with
  * μ the series' observed mean daily rate; entering the burst state
  * costs γ, leaving is free. The optimal state sequence is the
  * min-cost path (Viterbi). Dropping the state-independent ln(v!)
  * term, per-day emission costs are `μ·1e9 − v·ln(μ)·1e9` — snapped
  * to the house 9dp integer grid ONCE per series (two ln calls on
  * grid-shared doubles; the PPMI/NB precedent), so the entire DP is
  * exact integer arithmetic both engines replay: forward costs via an
  * `aggregate` fold over the day array (the Kaplan–Meier idiom),
  * backtrack via a reverse fold over stored (d0, d1) pairs with fixed
  * tie rules (ties prefer the base state at the end, the current
  * state's predecessor mid-path).
  *
  * Scale: one (series, day) count aggregation, one series-keyed
  * collect of the day array — bounded by the calendar window, never
  * by events (the K-M contract). The DP itself is O(T) per series on
  * a ≤ calendar-length array; no shuffle after the collect. */
object Burst {

  /** daily: (series, day, v). Output: (series, day, v, burst). */
  def kleinberg(daily: DataFrame, s: Double = 3.0,
                gamma9: Long = 1000000000L): DataFrame = {
    val g = s"${gamma9}L"
    val st = daily.groupBy(col("series"))
      .agg(count(lit(1)).as("t_days"), sum(col("v")).as("tot"))
      .withColumn("mu", col("tot").cast("double") / col("t_days").cast("double"))
      .select(col("series"),
        floor(col("mu") * lit(1e9) + lit(0.5d)).cast("long").as("a9"),
        floor(log(col("mu")) * lit(1e9) + lit(0.5d)).cast("long").as("b9"),
        floor(col("mu") * lit(s) * lit(1e9) + lit(0.5d)).cast("long").as("a19"),
        floor(log(col("mu") * lit(s)) * lit(1e9) + lit(0.5d)).cast("long")
          .as("b19"))
    // fail-loud above the BIGINT-exact emission bound (the ccf lesson:
    // DuckDB raises on BIGINT overflow, the JVM wraps silently — the
    // engines must never diverge quietly): per-term |e| stays under
    // 2.4e16 so even a 366-step DP sum cannot wrap
    val guard = daily.join(broadcast(st), Seq("series"))
      .agg(max(abs(col("v")) * greatest(abs(col("b9")), abs(col("b19"))))
        .as("__mx")).select(
        when(col("__mx") > 24000000000000000L, raise_error(concat(
          lit("Burst.kleinberg: emission term exceeds the integer-exact" +
            " bound; counts too large for the 9dp grid: "), col("__mx"))))
          .otherwise(lit(1L)).as("__ok"))
    // day-sorted per-series array of (day, v, e0, e1); emission costs
    // are per-row projections (cheap, shuffle-free), the collect is
    // keyed on series and bounded by the calendar
    val packed = daily.join(broadcast(st), Seq("series"))
      .join(broadcast(guard), expr("__ok = 1"))
      .withColumn("e0", col("a9") - col("v") * col("b9"))
      .withColumn("e1", col("a19") - col("v") * col("b19"))
      .groupBy(col("series"))
      .agg(sort_array(collect_list(
        struct(col("day"), col("v"), col("e0"), col("e1")))).as("arr"))
    // forward Viterbi: ds[i] = (d0, d1) optimal costs ending at day i
    // in base/burst; start in base (burst start pays gamma)
    val fwd = s"""aggregate(arr,
      named_struct(
        'ds', CAST(array() AS array<struct<d0: bigint, d1: bigint>>),
        'p0', 0L, 'p1', $g),
      (acc, x) -> named_struct(
        'ds', concat(acc.ds, array(named_struct(
          'd0', least(acc.p0, acc.p1) + x.e0,
          'd1', least(acc.p0 + $g, acc.p1) + x.e1))),
        'p0', least(acc.p0, acc.p1) + x.e0,
        'p1', least(acc.p0 + $g, acc.p1) + x.e1),
      acc -> acc.ds)"""
    // backtrack: final state = argmin (tie -> base); predecessor of a
    // burst day is burst iff d1 <= d0 + gamma, of a base day is base
    // iff d0 <= d1 — the exact integer comparisons the oracle mirrors
    val bwd = s"""aggregate(
      IF(size(ds) > 1, sequence(size(ds) - 1, 1, -1),
        CAST(array() AS array<int>)),
      named_struct(
        'cur', IF(element_at(ds, size(ds)).d1 < element_at(ds, size(ds)).d0,
          1, 0),
        'st', array(IF(element_at(ds, size(ds)).d1
          < element_at(ds, size(ds)).d0, 1, 0))),
      (acc, t) -> named_struct(
        'cur', IF(acc.cur = 1,
          IF(element_at(ds, t).d1 <= element_at(ds, t).d0 + $g, 1, 0),
          IF(element_at(ds, t).d0 <= element_at(ds, t).d1, 0, 1)),
        'st', concat(acc.st, array(IF(acc.cur = 1,
          IF(element_at(ds, t).d1 <= element_at(ds, t).d0 + $g, 1, 0),
          IF(element_at(ds, t).d0 <= element_at(ds, t).d1, 0, 1))))),
      acc -> reverse(acc.st))"""
    packed
      .withColumn("ds", expr(fwd))
      .withColumn("states", expr(bwd))
      // states is an attribute by the time the Generate runs (its own
      // projection below), so per-generated-row access is O(1) — the
      // q288 generator-re-evaluation trap does not apply
      .select(col("series"), col("states"), posexplode(col("arr")))
      .select(col("series"), col("col.day").as("day"), col("col.v").as("v"),
        (element_at(col("states"), col("pos") + 1) === 1).as("burst"))
  }
}
