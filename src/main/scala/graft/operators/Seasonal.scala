package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (the moving-average STL
  * ancestor: trend by centered MA, seasonal by period-position means of
  * the detrended series, residual as the remainder — Cleveland et al.'s
  * decomposition baseline, the "is this metric drifting or just
  * weekly-cyclic" diagnostic behind ingestion-volume monitoring).
  *
  * Determinism is the design problem: naive double sums make trend and
  * seasonal means partition-order dependent. Here every sum is EXACT
  * integer arithmetic until one final division:
  *  - daily values quantize to cents (`floor(v*100+0.5)`, the q162
  *    convention) and sum as longs;
  *  - the detrended series is kept as `d7 = period*v - sum_period`
  *    (cents x period, exact), so seasonal means are one division of an
  *    exact long sum;
  *  - the few remaining double combines land on the house 6dp grid
  *    (round-then-combine), so engines and row orders agree bit for bit.
  *
  * Scale: the raw-event aggregation is the only corpus-sized stage
  * (map-side combined). Every window — centered MA, period-position
  * means — runs over the AGGREGATED (key, day) series: thousands of
  * rows per key, never events. The classic aggregate-then-window
  * discipline; a per-event window would be the scale bug.
  *
  * Output (interior rows only — where the full MA window exists):
  * (key, d, idx, value, trend, seasonal, residual).
  */
object Seasonal {

  def maDecompose(df: DataFrame, tsCol: String, valueCol: String,
                  keyCol: String, period: Int = 7, half: Int = 3): DataFrame = {
    require(period >= 2 && half >= 1 && 2 * half + 1 >= period - 1,
      "MA window (2*half+1) should cover ~one period")
    val win = 2 * half + 1
    val grid = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
    val den = win * 100.0 // cents -> value units across the MA division

    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("d"))
      .agg(sum(floor(col(valueCol) * 100 + lit(0.5d)).cast("long")).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("d"))
      .rowsBetween(-half, half)
    val base = daily
      // pmod (always non-negative) — the oracle mirrors it with
      // ((x % p) + p) % p so pre-1970 dates agree across engines
      .withColumn("idx", pmod(datediff(col("d"), lit("1970-01-01")), lit(period)))
      .withColumn("s7", sum(col("v")).over(w))
      .withColumn("c7", count(lit(1)).over(w))
      .filter(col("c7") === win)
      .withColumn("d7", lit(win) * col("v") - col("s7"))
    val seas = base.groupBy(col("key"), col("idx"))
      .agg(round(sum(col("d7")).cast("double")
        / (lit(den) * count(lit(1)).cast("double")), 6).as("s6"))
    val center = seas.groupBy(col("key"))
      .agg((floor(round(sum(col("s6")), 6) / lit(period) * lit(1e6) + lit(0.5d))
        / lit(1e6)).as("mt"))
    base
      .join(seas, Seq("key", "idx"))
      .join(center, Seq("key"))
      .select(col("key"), col("d"), col("idx").cast("long").as("idx"),
        (col("v") / lit(100.0)).as("value"),
        grid(col("s7") / lit(den)).as("trend"),
        (col("s6") - col("mt")).as("seasonal"),
        grid(col("d7") / lit(den) - (col("s6") - col("mt"))).as("residual"))
  }

  /** Seasonality-aware anomaly summary: decompose, then flag days whose
    * RESIDUAL deviates more than `nSigma` robust deviations (MAD) from
    * the residual median — the alerting rule that doesn't fire on the
    * weekly cycle or the trend, only on genuine surprises. Medians use
    * the engine-portable lower-value rank convention `v[ceil(p*n)]`
    * (q187's), so the whole summary is hash-stable.
    *
    * Caveats, documented honestly: this is the NON-robust decomposition
    * (classical MA, not iterated STL), so an extreme outlier smears into
    * its MA window and its period-position class — those neighbors can
    * co-flag (the spec pins the exact blast shape). And on perfectly
    * cyclic data every residual ties, MAD collapses to 0, and the
    * strict `> nSigma*mad` rule flags ANY deviation — degenerate input,
    * degenerate rule, by design.
    *
    * Scale: everything below the [[maDecompose]] call operates on the
    * aggregated (key, day) series — two rank windows (median, MAD) and
    * one summary aggregation per key, never raw events. Output:
    * (key, n_days, med, mad, n_anomalies). */
  def seasonalAnomalies(df: DataFrame, tsCol: String, valueCol: String,
                        keyCol: String, period: Int = 7, half: Int = 3,
                        nSigma: Double = 5.0): DataFrame = {
    val dec = maDecompose(df, tsCol, valueCol, keyCol, period, half)
      .select(col("key"), col("d"), col("residual"))
    def medianOf(in: DataFrame, valCol: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col(valCol).asc, col("d").asc)
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
      in.withColumn("__rk", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(wc))
        .groupBy(col("key"))
        .agg(min(when(col("__rk") >= ceil(lit(0.5) * col("__n")), col(valCol)))
          .as(out))
    }
    val med = medianOf(dec, "residual", "med")
    val withDev = dec.join(med, Seq("key"))
      .withColumn("adev", round(abs(col("residual") - col("med")), 6))
    val mad = medianOf(withDev, "adev", "mad")
    withDev.join(mad, Seq("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"), min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("adev") > lit(nSigma) * col("mad"), 1L).otherwise(0L))
          .as("n_anomalies"))
  }

  /** CUSUM changepoint detection per key: the day where the cumulative
    * deviation from the series mean peaks — the classic "when did this
    * metric shift level" answer (Page 1954's cumulative-sum chart,
    * offline max-|CUSUM| form).
    *
    * Exactness: CUSUM_t = prefix_t - t*mean is held as the EXACT long
    * `n*prefix_t - t*total` (cents x n) — no running double sum, so the
    * argmax is unambiguous and engine-portable; ties break on the
    * earliest day. One final division converts to value units on the
    * 6dp grid.
    *
    * Scale: same aggregate-then-window discipline as [[maDecompose]] —
    * the prefix sum and the argmax rank run over the (key, day) series,
    * never raw events. Output: (key, n_days, change_d, max_dev). */
  def cusumChangepoint(df: DataFrame, tsCol: String, valueCol: String,
                       keyCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("d"))
      .agg(sum(floor(col(valueCol) * 100 + lit(0.5d)).cast("long")).as("v"))
    val st = daily.groupBy(col("key"))
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("d"))
    val c = daily
      .withColumn("prefix", sum(col("v"))
        .over(wp.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(wp).cast("long"))
      .join(st, Seq("key"))
      .withColumn("absc", abs(col("n") * col("prefix") - col("t") * col("total")))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("absc").desc, col("d").asc)
    c.withColumn("rk", row_number().over(rk))
      .filter(col("rk") === 1)
      .select(col("key"), col("n").as("n_days"), col("d").as("change_d"),
        (floor(col("absc") / (lit(100.0) * col("n")) * lit(1e6) + lit(0.5d))
          / lit(1e6)).as("max_dev"))
  }

  /** Additive Holt-Winters (triple exponential smoothing, Winters 1960)
    * over an ALREADY-AGGREGATED (series, day, n) frame — level + trend +
    * period-`m` seasonal state folded through the classic updates:
    *
    *   l_t = a*(y_t - s_{t-m}) + (1-a)*(l + b)
    *   b_t = B*(l_t - l) + (1-B)*b
    *   s_t = g*(y_t - l_t) + (1-g)*s_{t-m}
    *
    * Initialization is the textbook deterministic one: l0 = mean of
    * season 1, b0 = (mean season 2 - mean season 1)/m, s0_i = y_i - l0.
    * EVERY state component lands on the house 6dp grid after each
    * update, so the fold's inputs — and therefore its outputs — are
    * bit-identical across engines (the oracle replays all updates as a
    * recursive CTE); unrounded exponential smoothing would compound
    * last-ulp drift multiplicatively.
    *
    * Scale: the whole fold is ONE `aggregate` higher-order expression
    * per series over its collected day array (days-sized by
    * construction — the aggregate-then-fold discipline; the corpus
    * never sorts). Series shorter than 2m+1 days are dropped (no
    * second season to initialize the trend). Output: (series, n_days,
    * level, trend, forecast_next) — forecast_next the one-step-ahead
    * l + b + s_{next}.
    *
    * The default smoothing constants are DYADIC (1/4, 1/8, 1/4) on
    * purpose: 1-a is then exact in binary, so the oracle's decimal
    * literals are the identical doubles (1.0 - 0.3 is NOT the double
    * 0.7 — a non-dyadic constant would put every update one ulp off
    * the replay). */
  def holtWinters(daily: DataFrame, alpha: Double = 0.25, beta: Double = 0.125,
                  gamma: Double = 0.25, m: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1 &&
      gamma > 0 && gamma < 1, "smoothing constants must be in (0, 1)")
    require(m >= 2, "period must be >= 2")
    val grid = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
    val series = daily
      .groupBy(col("series"))
      .agg(transform(array_sort(collect_list(struct(col("day"), col("n")))),
        s => s.getField("n").cast("double")).as("y"))
      .filter(size(col("y")) >= 2 * m + 1)
    val a1 = aggregate(slice(col("y"), 1, m), lit(0.0d), _ + _) / m
    val a2 = aggregate(slice(col("y"), m + 1, m), lit(0.0d), _ + _) / m
    val l0 = grid(a1)
    val b0 = grid((a2 - a1) / m)
    val s0 = transform(slice(col("y"), 1, m), v => grid(v - l0))
    val zero = struct(lit(m).as("t"), l0.as("lvl"), b0.as("tr"), s0.as("seas"))
    def step(st: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) = {
      val idx = pmod(st("t"), lit(m))
      val sOld = element_at(st("seas"), idx + 1)
      val nl = grid(lit(alpha) * (v - sOld) +
        lit(1.0 - alpha) * (st("lvl") + st("tr")))
      val nt = grid(lit(beta) * (nl - st("lvl")) + lit(1.0 - beta) * st("tr"))
      val ns = grid(lit(gamma) * (v - nl) + lit(1.0 - gamma) * sOld)
      struct((st("t") + 1).as("t"), nl.as("lvl"), nt.as("tr"),
        concat(slice(st("seas"), lit(1), idx), array(ns),
          slice(st("seas"), idx + 2, lit(m) - idx - 1)).as("seas"))
    }
    val fin = aggregate(
      slice(col("y"), lit(m + 1), size(col("y")) - m), zero, step)
    series.select(col("series"), size(col("y")).cast("long").as("n_days"),
        fin.as("f"))
      .select(col("series"), col("n_days"),
        col("f.lvl").as("level"), col("f.tr").as("trend"),
        grid(col("f.lvl") + col("f.tr") +
          element_at(col("f.seas"), pmod(col("f.t"), lit(m)) + 1))
          .as("forecast_next"))
  }

  /** THEIL–SEN robust trend per series (Theil 1950, Sen 1968): slope =
    * median of all pairwise slopes `(y_j - y_i)/(x_j - x_i)`, intercept
    * = median of `y_i - slope * x_i` — a 29% breakdown point, so a
    * burst of anomalous days cannot drag the trend the way it drags an
    * OLS fit (the q113 regr_* family's known weakness on dirty series).
    *
    * Both medians are LOWER medians over 6dp-grid values with day-index
    * ties (the house order-statistic convention — exact data values, no
    * interpolation, bit-identical across engines). x is the epoch day,
    * y the exact integer daily value.
    *
    * Scale: the pair join is PER SERIES over the aggregated daily rows
    * — O(days²) per series where `days` is a calendar-bounded window,
    * never raw events; the median ranks run over those same pair rows
    * (uniform series keys). Input: (series, day, v) daily rows.
    * Output: (series, n_days, slope, intercept). A series with a
    * single observed day has no pairwise slope — it is absent from the
    * output (no trend is estimable), not emitted with nulls. */
  /** Pettitt changepoint test (Pettitt 1979): the rank-based "did the
    * level shift, and when" complement of CUSUM (q190, which needs a
    * mean) and the drift gates (which need a reference window). The
    * statistic `U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j)` peaks at the
    * most probable split; `p ≈ 2·exp(−6K²/(T³+T²))`.
    *
    * NO pair join: by antisymmetry `U_t = Σ_{i≤t} V_i` with
    * `V_i = #{x_j < x_i} − #{x_j > x_i}` — pure rank algebra on the
    * per-series distinct-value grid (one aggregation + one bounded
    * window), then a prefix sum over days. All integers until the one
    * exp onto the 6dp grid (exact-integer ratio argument, the house
    * HBOS idiom). Ties at the peak break to the earliest day. */
  def pettittChangepoint(daily: DataFrame): DataFrame = {
    val t = daily.groupBy(col("series")).agg(count(lit(1)).as("t_days"))
    val grid = daily.groupBy(col("series"), col("v"))
      .agg(count(lit(1)).as("n_eq"))
    val wVal = Window.partitionBy(col("series")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBelow = grid.withColumn("cb",
      coalesce(sum(col("n_eq")).over(wVal), lit(0L)))
    val wDay = Window.partitionBy(col("series")).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = daily
      .join(withBelow, Seq("series", "v"))
      .join(broadcast(t), Seq("series"))
      .withColumn("__vi",
        col("cb") - (col("t_days") - col("cb") - col("n_eq")))
      .withColumn("__u", sum(col("__vi")).over(wDay))
      .withColumn("__mxday", max(col("day"))
        .over(Window.partitionBy(col("series"))))
      .filter(col("day") < col("__mxday"))
    u.withColumn("__k",
        max(abs(col("__u"))).over(Window.partitionBy(col("series"))))
      .groupBy(col("series"), col("t_days"))
      .agg(max(col("__k")).as("k"),
        min(when(abs(col("__u")) === col("__k"), col("day")))
          .as("change_day"))
      .withColumn("p", floor(lit(2.0d) * exp(lit(-6.0d)
          * (col("k") * col("k")).cast("double")
          / (col("t_days") * col("t_days") * col("t_days")
            + col("t_days") * col("t_days")).cast("double"))
        * lit(1e6) + lit(0.5d)) / lit(1e6))
      .select(col("series"), col("t_days"), col("k"), col("change_day"),
        col("p"))
  }

  def theilSen(daily: DataFrame): DataFrame = {
    val a = daily.select(col("series"),
      datediff(col("day"), lit("1970-01-01").cast("date")).cast("long").as("xi"),
      col("v").cast("long").as("yi"))
    val b = a.select(col("series"), col("xi").as("xj"), col("yi").as("yj"))
    val slopes = a.join(b, Seq("series")).filter(col("xj") > col("xi"))
      .select(col("series"), col("xi"), col("xj"),
        floor((col("yj") - col("yi")).cast("double")
          / (col("xj") - col("xi")).cast("double") * lit(1e6) + lit(0.5d))
          .cast("long").as("s6"))
    def lowerMedian(in: DataFrame, valCol: String, tie: Seq[String],
                    out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("series"))
        .orderBy(col(valCol).asc +: tie.map(col(_).asc): _*)
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("series"))
      in.withColumn("__rk", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(wc))
        .groupBy(col("series"))
        .agg(min(when(col("__rk") >= ceil(lit(0.5) * col("__n")), col(valCol)))
          .as(out))
    }
    val slope = lowerMedian(slopes, "s6", Seq("xi", "xj"), "slope6")
    val resid = a.join(slope, Seq("series"))
      .select(col("series"), col("xi"),
        floor((col("yi").cast("double")
          - col("slope6").cast("double") / lit(1e6) * col("xi").cast("double"))
          * lit(1e6) + lit(0.5d)).cast("long").as("b6"))
    val icept = lowerMedian(resid, "b6", Seq("xi"), "b6m")
    a.groupBy(col("series")).agg(count(lit(1)).as("n_days"))
      .join(slope, Seq("series")).join(icept, Seq("series"))
      .select(col("series"), col("n_days"),
        (col("slope6").cast("double") / lit(1e6)).as("slope"),
        (col("b6m").cast("double") / lit(1e6)).as("intercept"))
  }

  /** Sample autocorrelation per series at calendar lags 1..maxLag —
    * the seasonality detector that complements the fixed-period
    * decomposition (q189): a weekly cycle shows as an r_7 spike without
    * assuming the period up front.
    *
    * Exact-integer algebra: with S = Σx, S2 = Σx², P_k = Σ x_t·x_{t+k},
    * Q_k = Σ(x_t + x_{t+k}) and c_k pairs at lag k, the mean-centered
    * sums scale by n² into pure integers
    *   num_k = n²·P_k − n·S·Q_k + c_k·S²,   den = n²·S2 − n·S²
    * so both engines divide the SAME two integers — one IEEE division
    * onto the 6dp grid, no running float accumulation. Lag pairs come
    * from one equi-join on (series, day + k) with k exploded, so
    * partial days / gaps simply drop pairs (calendar lags, not row
    * lags). A constant series (den = 0) yields null acf.
    *
    * Scale: everything runs over the AGGREGATED daily rows (bounded by
    * calendar × series, never raw events); the join shuffles on
    * (series, day). Integer overflow needs n²·Σx² ≳ 2⁶³ — at 30-day
    * windows that means ~10⁹-per-day counts; re-bucket to wider periods
    * before that. Input: (series, day, v); output one row per
    * (series, lag). */
  /** Siegel REPEATED-median trend per series — the 50%-breakdown
    * upgrade over Theil–Sen's 29% (q230): first the median slope PER
    * POINT (over all partners), then the median of those medians, so
    * even half the days being garbage cannot drag the trend. Same
    * conventions as theilSen: 6dp-grid slopes, lower medians (rank >=
    * ceil(n/2)) with deterministic tie-breaks, pair join over the
    * aggregated daily rows (O(days²) per series, calendar-bounded).
    * Input (series, day, v); output (series, n_days, slope,
    * intercept). */
  def siegelTrend(daily: DataFrame): DataFrame = {
    val a = daily.select(col("series"),
      datediff(col("day"), lit("1970-01-01").cast("date")).cast("long").as("xi"),
      col("v").cast("long").as("yi"))
    val b = a.select(col("series"), col("xi").as("xj"), col("yi").as("yj"))
    val slopes = a.join(b, Seq("series")).filter(col("xj") =!= col("xi"))
      .select(col("series"), col("xi"), col("xj"),
        floor((col("yj") - col("yi")).cast("double")
          / (col("xj") - col("xi")).cast("double") * lit(1e6) + lit(0.5d))
          .cast("long").as("s6"))
    val wI = Window.partitionBy(col("series"), col("xi"))
      .orderBy(col("s6").asc, col("xj").asc)
    val wIc = Window.partitionBy(col("series"), col("xi"))
    val perPoint = slopes
      .withColumn("__rk", row_number().over(wI).cast("long"))
      .withColumn("__n", count(lit(1)).over(wIc))
      .groupBy(col("series"), col("xi"))
      .agg(min(when(col("__rk") >= ceil(lit(0.5) * col("__n")), col("s6")))
        .as("mi6"))
    def seriesMedian(in: DataFrame, valCol: String, tie: String,
                     out: String): DataFrame = {
      val w = Window.partitionBy(col("series"))
        .orderBy(col(valCol).asc, col(tie).asc)
      val wc = Window.partitionBy(col("series"))
      in.withColumn("__rk", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(wc))
        .groupBy(col("series"))
        .agg(min(when(col("__rk") >= ceil(lit(0.5) * col("__n")), col(valCol)))
          .as(out))
    }
    val slope = seriesMedian(perPoint, "mi6", "xi", "slope6")
    val resid = a.join(slope, Seq("series"))
      .select(col("series"), col("xi"),
        floor((col("yi").cast("double")
          - col("slope6").cast("double") / lit(1e6) * col("xi").cast("double"))
          * lit(1e6) + lit(0.5d)).cast("long").as("b6"))
    val icept = seriesMedian(resid, "b6", "xi", "b6m")
    a.groupBy(col("series")).agg(count(lit(1)).as("n_days"))
      .join(slope, Seq("series")).join(icept, Seq("series"))
      .select(col("series"), col("n_days"),
        (col("slope6").cast("double") / lit(1e6)).as("slope"),
        (col("b6m").cast("double") / lit(1e6)).as("intercept"))
  }

  /** Cross-correlation between every pair of series at calendar lags
    * -maxLag..maxLag — the lead–lag detector ("clicks lead purchases
    * by 2 days") ACF can't see. Pearson correlation over lag-PAIRED
    * samples: all five sums are exact integers per (pair, lag), the
    * one float step is `num / sqrt(d1*d2)` onto the 6dp grid.
    * `ccf(x,y,k) = ccf(y,x,-k)`, so only `series_x < series_y` pairs
    * emit. Runs on aggregated daily rows (one equi-join on
    * (day+lag)); the variance terms are cast to double INDIVIDUALLY
    * before multiplying — a 64-bit `d1*d2` would wrap silently in the
    * JVM past ~10⁴/day counts while the oracle engine raises, a
    * silent-divergence hazard; the double product cannot wrap and
    * both engines round it identically (IEEE). A lag with < 3
    * overlapping days or a constant side yields null. */
  def ccf(daily: DataFrame, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val a = daily.select(col("series").as("sx"), col("day"), col("v").as("x"))
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("day_b", date_add(col("day"), col("lag")))
    val b = daily.select(col("series").as("sy"), col("day").as("day_b"),
      col("v").as("y"))
    val g = a.join(b, Seq("day_b")).filter(col("sx") < col("sy"))
      .groupBy(col("sx").as("series_x"), col("sy").as("series_y"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x")).as("sx1"), sum(col("y")).as("sy1"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val num = g("n_pairs") * col("sxy") - col("sx1") * col("sy1")
    val d1 = g("n_pairs") * col("sxx") - col("sx1") * col("sx1")
    val d2 = g("n_pairs") * col("syy") - col("sy1") * col("sy1")
    g.select(col("series_x"), col("series_y"), col("lag").cast("long").as("lag"),
      col("n_pairs"),
      when(col("n_pairs") >= 3L && d1 > 0L && d2 > 0L,
        floor(num.cast("double") / sqrt(d1.cast("double") * d2.cast("double"))
          * lit(1e6) + lit(0.5d)) / lit(1e6))
        .otherwise(lit(null).cast("double")).as("ccf"))
  }

  def acf(daily: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val stats = daily.groupBy(col("series"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("s2"))
    val a = daily.select(col("series"), col("day"), col("v").as("xa"))
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("day_b", date_add(col("day"), col("lag")))
    val b = daily.select(col("series"), col("day").as("day_b"),
      col("v").as("xb"))
    val lagged = a.join(b, Seq("series", "day_b"))
      .groupBy(col("series"), col("lag"))
      .agg(sum(col("xa") * col("xb")).as("p"),
        sum(col("xa") + col("xb")).as("q"),
        count(lit(1)).as("c"))
    lagged.join(stats, Seq("series"))
      .select(col("series"), col("lag").cast("long").as("lag"),
        col("c").as("n_pairs"),
        when(col("n") * col("n") * col("s2") - col("n") * col("s") * col("s") =!= 0L,
          floor((col("n") * col("n") * col("p")
              - col("n") * col("s") * col("q")
              + col("c") * col("s") * col("s")).cast("double")
            / (col("n") * col("n") * col("s2")
              - col("n") * col("s") * col("s")).cast("double")
            * lit(1e6) + lit(0.5d)) / lit(1e6))
          .otherwise(lit(null).cast("double")).as("acf"))
  }
}
