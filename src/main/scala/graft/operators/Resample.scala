package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream to a fixed daily
  * grid per key, filling gaps and carrying the last observation forward —
  * the standard prep step before any per-entity time-series model or
  * day-over-day comparison (raw event streams have holes; models want a
  * dense axis).
  *
  * Construction:
  *   1. daily aggregate per (key, day) — one shuffle, map-side combined;
  *   2. per-key [min_day, max_day] bounds — key-count-sized aggregate;
  *   3. grid = explode(sequence(min_day, max_day, 1 day)) — the fan-out is
  *      NARROW (generated from the one bounds row per key, never a join
  *      against a calendar table);
  *   4. left join daily observations onto the grid on (key, day);
  *   5. forward fill = last(value, ignoreNulls) over (key, day rows
  *      unbounded-preceding..current).
  *
  * Scale: output size is sum over keys of day-span — explicit and
  * predictable (entities x axis length), not data-dependent explosion.
  * Shuffles: (key, day) for step 1, key for step 2, (key, day) for the
  * grid join, key for the fill window. All are output-sized, tiny relative
  * to the event scan. A pathological key with a multi-decade span fans out
  * to ~10^4 rows — still bounded; cap spans upstream if the axis is
  * user-supplied.
  *
  * Doubles follow the repo convention: the daily total is an EXACT cents
  * sum divided once (never an order-dependent double sum), and the fill
  * only COPIES that value — no further float arithmetic, so engines
  * agree bit-for-bit.
  */
object Resample {

  /** (key, day, n_events, daily_total, filled_total, is_observed) —
    * one row per key per day in the key's observed span. */
  def dailyForwardFill(events: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), date_trunc("day", col(tsCol)).cast("date").as("day"),
        col(valueCol).as("v"))
      .groupBy(col("key"), col("day"))
      // exact-cents sum (the IncrementalAgg/TWAP discipline): a raw
      // double sum is addition-order-dependent and can flip a .005
      // boundary between engines; the single division of an exact
      // integer cannot
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("v").cast("double") * 100d + 0.5d).cast("long"))
          .cast("double") / 100d).as("daily_total"))
    val grid = daily
      .groupBy(col("key"))
      .agg(min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .select(col("key"),
        explode(sequence(col("min_day"), col("max_day"), expr("interval 1 day"))).as("day"))
    val fillW = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("key", "day"), "left")
      .select(
        col("key"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("daily_total"),
        last(col("daily_total"), ignoreNulls = true).over(fillW).as("filled_total"),
        col("daily_total").isNotNull.as("is_observed"))
  }

  /** Debounce: drop events that arrive within `gapSeconds` of the
    * PREVIOUS event of the same key — duplicate-click / sensor-chatter
    * suppression. Semantics: the gap is measured against the previous
    * RAW event (one lag window — deterministic, one pass), not the
    * previous KEPT event; for kept-based throttling compose with
    * sessionization (a kept event is then each gap-session's first).
    *
    * Scale: one hash shuffle on the key columns; the lag window is the
    * only operation. Returns the input rows that survive. */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
               idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    events
      .withColumn("__prev_us", prevUs)
      .filter(col("__prev_us").isNull ||
        unix_micros(col(tsCol)) - col("__prev_us") > gapSeconds * 1000000L)
      .drop("__prev_us")
  }

  /** Time-weighted average (TWAP): per key, the mean of `valueCol` where
    * each observation is weighted by how LONG it was the current value —
    * duration until the next observation. The last observation carries no
    * weight (its holding period is unknown); keys with a single event
    * therefore report no row.
    *
    * EXACT-ARITHMETIC design (the repo's grid discipline): values snap to
    * cents (floor(x*100 + 0.5) BIGINT), durations are epoch-µs deltas
    * integrally divided to ms — the weighted sum is then exact integer
    * math carried in DECIMAL(38,0) (HUGEINT on the oracle side), immune
    * to float summation order; the single final division lands on the
    * 6dp grid.
    *
    * Scale: one hash shuffle on the key; the lead window and the per-key
    * aggregation share it. Output is keys-many rows. */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val segs = events
      .select(col(keyCol).as("key"), col(tsCol).as("__ts"), col(idCol).as("__id"),
        floor(col(valueCol).cast("double") * 100d + 0.5d).cast("long").as("__cents"))
      .withColumn("__next_us", lead(unix_micros(col("__ts")), 1).over(
        Window.partitionBy(col("key")).orderBy(col("__ts"), col("__id"))))
      .filter(col("__next_us").isNotNull)
      .withColumn("__dur_ms",
        expr("(__next_us - unix_micros(__ts)) div 1000"))
    segs.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("__dur_ms").cast("decimal(38,0)")).cast("long").as("total_ms"),
        // widen BEFORE multiplying: cents x a multi-year ms duration
        // overflows Int64; decimal(18)*decimal(18) is exact at any scale
        sum(col("__cents").cast("decimal(18,0)") * col("__dur_ms").cast("decimal(18,0)"))
          .cast("decimal(38,0)").as("__wsum"))
      .withColumn("twap",
        when(col("total_ms") > 0,
          floor(col("__wsum").cast("double") / col("total_ms").cast("double")
            / 100d * lit(1e6) + lit(0.5d)) / lit(1e6))
          .otherwise(lit(null).cast("double")))
      .drop("__wsum")
  }

  /** LINEAR interpolation over a daily series with gaps — the two-sided
    * complement of [[dailyForwardFill]]: a missing day takes the value
    * on the straight line between its nearest observed neighbors,
    *   `(pv*(nd - d) + nv*(d - pd)) / (nd - pd)`
    * — integer numerator and denominator (values are exact longs, days
    * are epoch ints), one division snapped to the 6dp grid, so the
    * filled series is bit-identical across engines. Forward fill
    * answers "what was the last known state"; interpolation answers
    * "what was the likely level" — the right gap policy for rates and
    * gauges rather than step-state.
    *
    * Input: (series, day, v) observed daily rows — one row per
    * (series, day) (an AGGREGATED series; duplicate days would fan out
    * through the grid join). Output: one row per day in each series'
    * observed span — (series, day, value, is_observed); edges are
    * always observed by construction (the grid spans min..max observed
    * day).
    *
    * Scale: the dailyForwardFill discipline — grid join + four windows
    * over the (series, day) axis, all output-sized, one series-keyed
    * shuffle. */
  def interpolateLinear(daily: DataFrame): DataFrame = {
    val obs = daily.select(col("series"), col("day"),
      col("v").cast("long").as("v"))
    val grid = obs.groupBy(col("series"))
      .agg(min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .select(col("series"),
        explode(sequence(col("min_day"), col("max_day"),
          expr("interval 1 day"))).as("day"))
    val wPrev = Window.partitionBy(col("series")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("series")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val epoch = (c: org.apache.spark.sql.Column) =>
      datediff(c, lit("1970-01-01").cast("date")).cast("long")
    grid.join(obs, Seq("series", "day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wNext))
      .select(col("series"), col("day"),
        when(col("v").isNotNull, col("v").cast("double"))
          .otherwise(
            floor((col("pv") * (epoch(col("nd")) - epoch(col("day")))
              + col("nv") * (epoch(col("day")) - epoch(col("pd"))))
              .cast("double")
              / (epoch(col("nd")) - epoch(col("pd"))).cast("double")
              * lit(1e6) + lit(0.5d)) / lit(1e6))
          .as("value"),
        col("v").isNotNull.as("is_observed"))
  }
}
