package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling: per-column null counts, distinct counts, min/max —
  * the data-quality pass every ingest pipeline runs before trusting a
  * source. One job for the whole table: all per-column aggregates sit in a
  * single global aggregation (exact distinct adds an expand, still one
  * pass over the scan), then unpivot to one row per column.
  *
  * `approxProfile` swaps exact distinct for HyperLogLog++
  * (`approx_count_distinct`) — at 100 TB the exact expand on dozens of
  * columns is the difference between one pass and an expensive shuffle per
  * column; HLL keeps it strictly one map-side pass.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        distinctAgg(c).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      wide.select(
        lit(c).as("col_name"),
        (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    stacked.reduce(_ unionByName _)
  }

  /** Equi-width histogram of a numeric column: `bins` buckets spanning
    * [min, max], bucket `b = min(bins-1, floor((x - mn) / w))` with
    * `w = (mx - mn) / bins` (the max lands in the last bucket). Empty
    * buckets are absent from the output (no densify).
    *
    * Scale: pass 1 is a 2-value global aggregate (min/max) collected to
    * the driver so the bounds enter the plan as LITERALS — the binning
    * pass is then scan → project → one map-side-combined aggregation on
    * the bucket id (bins-many rows shuffled). Degenerate case mn == mx
    * puts everything in bucket 0.
    */
  /** Winsorized statistics per group WITHOUT sorting any group: clamp
    * bounds come from an md5-threshold SAMPLE (`h32(id) < 2^32/rate` —
    * the house content-hash sampler, so the sample is a pure scan
    * predicate, deterministic across runs/engines/partitionings), the
    * rank window runs over the SAMPLE only, and the winsorized mean is
    * one exact-cents aggregation over the FULL data with values clamped
    * to the sample's [pLo, pHi] — the robust-mean answer ("mean without
    * the tail garbage") at the cost of two scans and zero stratum sorts.
    *
    * Bounds are sample-quantiles (lower-value rank convention), so they
    * carry O(1/sqrt(sample)) rank error — the winsorized mean itself is
    * exact GIVEN the bounds, which is the deterministic contract the
    * oracle replays. Output: (group, n, lo, hi, winsorized_mean).
    *
    * Groups with NO sampled rows (possible for small groups at high
    * sampleDenom) fall back to the UNCLAMPED mean with null lo/hi — a
    * left join keeps them, and since both Spark and the oracle's SQL
    * `least`/`greatest` ignore nulls, `greatest(least(v, null), null)`
    * is `v`: the fallback costs zero extra expressions. */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
                      idCol: String, pLo: Double = 0.05, pHi: Double = 0.95,
                      sampleDenom: Int = 16): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi, "need 0 < pLo < pHi < 1")
    require(sampleDenom >= 1, "sampleDenom must be >= 1")
    val h32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val cents = floor(col(valueCol) * 100 + lit(0.5d)).cast("long")
    val sample = df
      .filter(h32 < lit(4294967296L / sampleDenom))
      .select(col(groupCol).as("grp"), cents.as("v"),
        col(idCol).cast("string").as("__id"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v").asc, col("__id").asc)
    val wc = Window.partitionBy(col("grp"))
    val bounds = sample
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wc))
      .groupBy(col("grp"))
      .agg(min(when(col("rk") >= ceil(lit(pLo) * col("n")), col("v"))).as("lo_c"),
        min(when(col("rk") >= ceil(lit(pHi) * col("n")), col("v"))).as("hi_c"))
    df.select(col(groupCol).as("grp"), cents.as("v"))
      .join(bounds, Seq("grp"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        (min(col("lo_c")) / lit(100.0)).as("lo"),
        (min(col("hi_c")) / lit(100.0)).as("hi"),
        (floor(sum(greatest(least(col("v"), col("hi_c")), col("lo_c")))
          .cast("double") / count(lit(1)) / lit(100.0) * lit(1e6) + lit(0.5d))
          / lit(1e6)).as("winsorized_mean"))
  }

  def histogram(df: DataFrame, valueCol: String, bins: Int = 20): DataFrame = {
    require(bins >= 1, "need at least one bin")
    val r = df.agg(min(col(valueCol)).cast("double"),
      max(col(valueCol)).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val w = (mx - mn) / bins
    val bucket =
      if (w == 0.0) lit(0L)
      else least(lit(bins - 1L), floor((col(valueCol) - lit(mn)) / lit(w)))
    df.select(bucket.cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", lit(mn) + col("bucket").cast("double") * lit(w))
  }

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation), and the count of values beyond `k` robust sigmas
    * (`|x - med| > k * 1.4826 * MAD`, 1.4826 being the normal-consistency
    * constant) — the standard outlier screen that, unlike mean/stddev,
    * is not itself dragged by the outliers it is measuring.
    *
    * Both medians are LOWER medians (the `(n+1) div 2`-th order
    * statistic): an exact data value, no midpoint interpolation — which
    * makes the result bit-identical across engines and summation orders
    * (interpolated medians differ in the last ulp between
    * implementations, poisoning every downstream comparison).
    *
    * Scale: two ordered windows over the same group partitioning (one
    * Exchange, value-sort then deviation-sort) plus a broadcast join of
    * the groups-sized median frame, then one final aggregation. Exact
    * medians sort each group; at 100 TB with huge groups swap in
    * `percentile_approx` (the q24 path) — the outlier rule is unchanged.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     k: Double = 3.0): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val medOf = (frame: DataFrame, c: String, out: String) => {
      val ranked = frame
        .withColumn("__r", row_number().over(byGroup.orderBy(col(c))))
        .withColumn("__n", count(lit(1)).over(byGroup))
      ranked.filter(col("__r") === expr("(__n + 1) DIV 2"))
        .select(col(groupCol), col(c).as(out))
    }
    val med = medOf(df.select(col(groupCol), col(valueCol)), valueCol, "med")
    val dev = df.select(col(groupCol), col(valueCol))
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__d", abs(col(valueCol) - col("med")))
    val mad = medOf(dev.select(col(groupCol), col("__d")), "__d", "mad")
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__d") > lit(k) * lit(1.4826d) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Exact grouped quantiles by RANK selection (percentile_disc
    * semantics): the p-quantile is the value at rank ceil(p*n) in the
    * group's sort order — an actual data value, no interpolation, and
    * with RATIONAL p (num/den) the rank is exact integer arithmetic:
    * `rank = (num*n + den - 1) div den`. Float-free, tie-stable (equal
    * values at the boundary rank are equal by definition),
    * engine-portable — where `percentile()` interpolates in
    * engine-specific float order, this selects.
    *
    * Output: (group, p_label, n, value) — groups x quantiles rows.
    *
    * Scale: one Exchange on the group key; the sort ranks each group
    * once and EVERY requested quantile reads from that single ranked
    * pass (the quantile list rides as a literal array, exploded
    * scan-side). Exact quantiles sort the group — for huge groups swap
    * in percentile_approx (q24) — the selection rule is unchanged. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     ps: Seq[(String, Long, Long)]): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(valueCol).as("v"))
      .withColumn("__rn", row_number().over(byGroup.orderBy(col("v"))))
      .withColumn("__n", count(lit(1)).over(byGroup))
    val quantiles = array(ps.map { case (lbl, num, den) =>
      struct(lit(lbl).as("p_label"), lit(num).as("num"), lit(den).as("den"))
    }: _*)
    ranked
      .select(col(groupCol), col("v"), col("__rn"), col("__n"),
        explode(quantiles).as("q"))
      .filter(expr("__rn = (q.num * __n + q.den - 1) div q.den"))
      .select(col(groupCol), col("q.p_label").as("p_label"),
        col("__n").as("n"), col("v").as("value"))
  }

  /** Daily-volume anomaly detection: per series (e.g. event type), each
    * day's count z-scored against its own trailing `windowDays`-day
    * window — the ingest-monitoring primitive ("did this source's volume
    * spike or crater today?"). Population mean/variance over the trailing
    * window INCLUDING the current day, so a single wild day partially
    * masks itself — the conservative convention; exclude-current is the
    * same window shifted one row.
    *
    * Determinism: daily counts are exact BIGINTs, so windowed sum /
    * sum-of-squares are exact; mean and variance derive from them in a
    * FIXED IEEE op sequence, then the z lands on the 6dp grid. A window
    * with zero variance (constant counts) z-scores to 0, not NaN.
    *
    * Scale: one map-side-combined aggregation to (series, day) — output
    * is series x days rows, independent of event volume; the window sorts
    * per series on that tiny frame. */
  def dailyAnomalies(events: DataFrame, seriesCol: String, tsCol: String,
                     windowDays: Int = 7, threshold: Double = 2.0): DataFrame =
    anomaliesFromDaily(events
      .select(col(seriesCol).as("series"),
        date_trunc("day", col(tsCol)).cast("date").as("day"))
      .groupBy(col("series"), col("day")).agg(count(lit(1)).as("n")),
      windowDays, threshold)

  /** The scoring pass alone, over an ALREADY-MAINTAINED (series, day, n)
    * frame — the shape an incrementally-kept rollup (IncrementalAgg /
    * a streaming foreachBatch state) feeds directly: anomaly detection
    * over 100 TB of history without rescanning it. */
  def anomaliesFromDaily(daily: DataFrame,
                         windowDays: Int, threshold: Double): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    val s = sum(col("n")).over(w)
    val s2 = sum(col("n") * col("n")).over(w)
    val cnt = count(lit(1)).over(w)
    val m = s.cast("double") / cnt.cast("double")
    val v = s2.cast("double") / cnt.cast("double") - m * m
    val z = when(v > 0d,
      floor((col("n").cast("double") - m) / sqrt(v) * lit(1e6) + lit(0.5d)) / lit(1e6))
      .otherwise(lit(0.0d))
    daily
      .withColumn("mean_w", floor(m * lit(1e6) + lit(0.5d)) / lit(1e6))
      .withColumn("z", z)
      .withColumn("is_anomaly", abs(col("z")) >= threshold)
  }

  /** HBOS (histogram-based outlier score, Goldstein & Dengel 2012):
    * per feature, bin the value and score `ln(N / count(bin))` — rare
    * bins are surprising; the row score is the sum over independent
    * features. The multivariate screen that needs NO pairwise distances
    * (vs q91's cluster-confined search): per feature one bounded
    * groupBy (numeric features share a single min/max aggregate) and
    * one broadcast join back, so the whole thing is scan + broadcast —
    * no data-sized shuffle at any scale. Top-k by (score desc, id) via
    * sort-limit (`TakeOrderedAndProject`).
    *
    * `numFeatures` get equi-width `bins` over their observed [min,max]
    * (degenerate range -> one bin); `catFeatures` are (name, expr)
    * used as-is. Each ln term lands on the 6dp grid before summing. */
  def hbosTopK(df: DataFrame, idCol: String, numFeatures: Seq[String],
               catFeatures: Seq[(String, Column)], bins: Int = 20,
               k: Int = 100): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    require(numFeatures.nonEmpty || catFeatures.nonEmpty, "need features")
    val rangeAgg = df.agg(count(lit(1)).as("__n"),
      numFeatures.flatMap(f => Seq(min(col(f)).cast("double").as(s"__mn_$f"),
        max(col(f)).cast("double").as(s"__mx_$f"))): _*)
    val base = df.join(broadcast(rangeAgg))
    val binned = numFeatures.foldLeft(base) { (d, f) =>
      d.withColumn(s"__b_$f",
        when(col(s"__mx_$f") > col(s"__mn_$f"),
          least(lit(bins - 1).cast("long"),
            floor((col(f).cast("double") - col(s"__mn_$f"))
              / (col(s"__mx_$f") - col(s"__mn_$f")) * bins).cast("long")))
          .otherwise(lit(0L)))
    }
    val withCats = catFeatures.foldLeft(binned) { case (d, (name, e)) =>
      d.withColumn(s"__b_$name", e) }
    val featNames = numFeatures ++ catFeatures.map(_._1)
    val scored = featNames.foldLeft(withCats) { (d, f) =>
      val counts = d.groupBy(col(s"__b_$f")).agg(count(lit(1)).as(s"__c_$f"))
      d.join(broadcast(counts), Seq(s"__b_$f"))
    }
    val score6 = featNames.map(f =>
      floor(log(col("__n").cast("double") / col(s"__c_$f").cast("double"))
        * lit(1e6) + lit(0.5d)).cast("long")).reduce(_ + _)
    scored.withColumn("__s6", score6)
      .orderBy(col("__s6").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), (col("__s6").cast("double") / 1e6).as("hbos"))
  }

  /** Lorenz curve + Gini coefficient of a non-negative integer mass
    * column — the corpus-concentration audit ("what share of total
    * characters sits in the smallest 30% of documents"; a Gini near 1
    * means a few megadocs dominate the training mix, the imbalance
    * q49/q92's source caps exist to fix, measured instead of assumed).
    *
    * Exact integer algebra on the distinct-value grid: Lorenz point k
    * uses rank `m_k = k·N div bins`; the doc at that rank sits in the
    * unique grid row with `cdBelow < m_k ≤ cdBelow+n_eq`, so the
    * bottom-m_k mass is `cvBelow + (m_k−cdBelow)·v` — no per-row sort,
    * no interpolation. Gini from the sorted-rank identity
    * `G = (2·Σ i·x_(i) − (N+1)·Σx) / (N·Σx)` with the rank sum per
    * value as `v·(n_eq·cdBelow + n_eq(n_eq+1)/2)` in decimal(38,0),
    * one double division onto the 6dp grid.
    *
    * Scale: one grid aggregation, cumulative sums through
    * [[Ranks.cumSums]] (two-pass above 2²⁰ distinct values), a
    * bins-row broadcast join. */
  def lorenzGini(df: DataFrame, valueCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val grid = df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_eq"))
      .withColumn("mass", col("v") * col("n_eq"))
    val cum = Ranks.cumSums(grid, Nil, "v",
      Seq(("n_eq", "cdb", false), ("mass", "cvb", false)),
      totals = Seq(("n_eq", "nt"), ("mass", "st")))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val gini = cum.agg(
      // the triangular term widens BEFORE the multiply: n_eq(n_eq+1)
      // in long wraps silently past ~4.3e9 duplicates of one value
      // while the oracle's HUGEINT stays exact
      sum(d(col("v")) * (d(col("n_eq")) * d(col("cdb"))
        + expr("(CAST(n_eq AS DECIMAL(38,0)) * (n_eq + 1)) / 2")
          .cast("decimal(38,0)"))).as("__six"),
      max(col("nt")).as("nt"), max(col("st")).as("st"))
      .select((floor((d(lit(2)) * col("__six")
          - d(col("nt") + 1) * d(col("st"))).cast("double")
          / (d(col("nt")) * d(col("st"))).cast("double")
          * lit(1e6) + lit(0.5d)) / lit(1e6)).as("gini"))
    val deciles = df.sparkSession.range(1, bins).toDF("decile")
    deciles.crossJoin(broadcast(cum.agg(max(col("nt")).as("nt"),
        max(col("st")).as("st"))))
      .withColumn("m_k", expr("(decile * nt) div " + bins))
      .filter(col("m_k") >= 1L)
      .join(cum.select(col("v"), col("n_eq"), col("cdb"), col("cvb")),
        col("cdb") < col("m_k") && col("m_k") <= col("cdb") + col("n_eq"))
      .withColumn("__chars", col("cvb") + (col("m_k") - col("cdb")) * col("v"))
      .crossJoin(broadcast(gini))
      .select(col("decile"), col("m_k").as("n_docs"),
        // decimal(38) numerators: mass·10⁶ overflows a long at ~10¹³
        // total mass — real at corpus scale
        (expr("(cast(m_k as decimal(38,0)) * 1000000) div nt")
          .cast("double") / 1e6).as("cum_doc_share"),
        (expr("(cast(__chars as decimal(38,0)) * 1000000) div st")
          .cast("double") / 1e6).as("cum_mass_share"),
        col("gini"))
  }

  /** ECOD-style tail-probability outliers (Li et al. 2022's
    * "unsupervised outlier detection using empirical cumulative
    * distribution functions", the parameter-free complement of HBOS's
    * binned density): per feature the row's tail probability is
    * `min(P(X <= x), P(X >= x))` from the EXACT empirical CDF (no
    * bins, no bandwidth), the per-feature surprisal is the 9dp-grid
    * `ln(n / tailCount)` (a ratio of exact integers — the HBOS idiom),
    * and the outlier score sums surprisals across features. Top-k by
    * (score desc, id asc) via sort-limit.
    *
    * Scale: one aggregate-then-cumsum per feature over DISTINCT values
    * (routed through [[Ranks.cumSums]], so a continuous feature takes
    * the two-pass path instead of one partition), joined back
    * scan-side on the value; the final top-k plans as
    * TakeOrderedAndProject. Values are integerized by the caller's
    * column expressions (cents, day numbers — the house convention). */
  def ecodTopK(df: DataFrame, idCol: String, features: Seq[(String, Column)],
               k: Int = 100): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val n = df.agg(count(lit(1)).as("__n"))
    val base = df.select(col(idCol) +:
      features.map { case (f, e) => e.cast("long").as(s"__v_$f") }: _*)
      .join(broadcast(n))
    val joined = features.foldLeft(base) { case (d, (f, e)) =>
      val per = df.groupBy(e.cast("long").as(s"__v_$f"))
        .agg(count(lit(1)).as(s"__nv_$f"))
      val grid = Ranks.cumSums(per, Nil, s"__v_$f",
        Seq((s"__nv_$f", s"__cle_$f", true)))
      d.join(grid, Seq(s"__v_$f"))
    }
    val score9 = features.map { case (f, _) =>
      val cle = col(s"__cle_$f")
      val cge = col("__n") - cle + col(s"__nv_$f")
      floor(log(col("__n").cast("double") / least(cle, cge).cast("double"))
        * lit(1e9) + lit(0.5d)).cast("long")
    }.reduce(_ + _)
    joined.withColumn("__s9", score9)
      .orderBy(col("__s9").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), (col("__s9").cast("double") / 1e9).as("ecod"))
  }

  /** Pearson standardized residuals for every (row, col) contingency
    * cell — `z = (obs - exp)/sqrt(exp)`, `exp = rowTot*colTot/N` — with
    * a logistic-approximation two-sided p-value
    * `p = 2/(1 + exp(1.702*|z|))` so no erf is needed on either
    * engine. All from ONE count aggregation (cell counts; margins are
    * re-aggregated from the cells, never a second scan); z and p land
    * on the 6dp grid. Output one row per observed cell. */
  def pearsonResidualTests(df: DataFrame, rowCol: String,
                           colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("obs"))
    val rows = cells.groupBy(col("r")).agg(sum(col("obs")).as("rt"))
    val colsT = cells.groupBy(col("c")).agg(sum(col("obs")).as("ct"))
    val n = cells.agg(sum(col("obs")).as("n"))
    val ex = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
    val z = (col("obs").cast("double") - ex) / sqrt(ex)
    cells.join(broadcast(rows), Seq("r")).join(broadcast(colsT), Seq("c"))
      .join(broadcast(n))
      .withColumn("expected", floor(ex * lit(1e6) + lit(0.5d)) / lit(1e6))
      .withColumn("z", floor(z * lit(1e6) + lit(0.5d)) / lit(1e6))
      .withColumn("p6", floor(lit(2.0d)
        / (lit(1.0d) + exp(lit(1.702d) * abs(z))) * lit(1e6) + lit(0.5d))
        .cast("long"))
      .select(col("r"), col("c"), col("obs"), col("expected"), col("z"),
        col("p6"))
  }

  /** Poisson bootstrap 95% CI for a mean — THE distributed bootstrap:
    * classic resampling needs n draws per replicate (a shuffle per
    * replicate); the Poisson approximation gives every (row, replicate)
    * an independent Poisson(1) weight, so ALL `reps` replicates ride
    * ONE pass over the data (explode + map-side-combined groupBy on the
    * replicate id). Weights come from the md5-uniform hash through the
    * exact Poisson(1) inverse CDF (literal thresholds, identical on
    * both engines — no RNG, run-stable); replicate means use exact
    * integer cent/weight sums; the CI bounds are house order
    * statistics (smallest value with rank >= ceil(p*B)) over the B
    * replicate means. Output: one row. */
  def poissonBootstrapMeanCI(df: DataFrame, valueCol: String, idCol: String,
                             reps: Int = 200): DataFrame = {
    require(reps >= 20 && reps <= 10000, "reps in [20, 10000]")
    // P(Poisson(1) <= k) for k = 0..5 at 16-bit resolution, as 4-char
    // hex thresholds: `slice/65536 < c  <=>  slice_hex < hex(floor(
    // 65536c)+1)` — a pure lexicographic compare on the md5 substring,
    // no radix conversion per row (conv() was half the query's cost).
    val cdf = Seq("5e2e", "bc5b", "eb72", "fb24", "ff11", "ffda")
    val rows = df.select(col(idCol).cast("string").as("id"),
      floor(col(valueCol) * 100 + lit(0.5d)).cast("long").as("cents"))
    // one md5 serves EIGHT replicates (16-bit hex slices — plenty of
    // resolution for the 6-step inverse CDF). The digest MATERIALIZES
    // between the group explode and the slice explode, so it is
    // computed once per (row, group) — 8x fewer hash evaluations than
    // md5-per-rep, and the hash dominates this whole query at scale.
    require(reps % 8 == 0, "reps must be a multiple of 8 (digest slicing)")
    val u = col("__digest").substr(col("__s") * 4 + 1, lit(4))
    // reverse so the SMALLEST threshold is the outermost when — the
    // chain must test u < P(0) before u < P(<=1)
    val w = cdf.zipWithIndex.reverse.foldLeft(lit(6L)) { case (acc, (c, k)) =>
      when(u < c, k.toLong).otherwise(acc) }
    // the explode multiplies rows by reps IN PLACE: without a
    // repartition the handful of scan partitions (one small parquet
    // file) would do all n*B work on as many cores — spread the cheap
    // input rows BEFORE the blow-up
    val perRep = rows
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("__g", explode(sequence(lit(0), lit(reps / 8 - 1))))
      .withColumn("__digest", md5(concat(col("__g").cast("string"), lit("|"),
        col("id"))))
      .withColumn("__s", explode(sequence(lit(0), lit(7))))
      .withColumn("rep", (col("__g") * 8 + col("__s") + 1).cast("long"))
      .withColumn("__w", w)
      .groupBy(col("rep"))
      .agg(sum(col("__w")).as("__sw"), sum(col("__w") * col("cents")).as("__sv"))
      .filter(col("__sw") > 0L)
      .select(col("rep"),
        floor(col("__sv").cast("double") / col("__sw").cast("double")
          / lit(100.0d) * lit(1e6) + lit(0.5d)).cast("long").as("m6"))
    val wAsc = Window.orderBy(col("m6").asc, col("rep").asc)
    val ranked = perRep.withColumn("rk", row_number().over(wAsc).cast("long"))
      .join(broadcast(perRep.agg(count(lit(1)).as("nb"))))
    val full = rows.agg(count(lit(1)).as("n_rows"),
      floor(sum(col("cents")).cast("double") / count(lit(1)).cast("double")
        / lit(100.0d) * lit(1e6) + lit(0.5d)).cast("long").as("mean6"))
    ranked.agg(max(col("nb")).as("n_reps"),
        (min(when(col("rk") >= ceil(lit(0.025d) * col("nb")), col("m6")))
          .cast("double") / 1e6).as("lo95"),
        (min(when(col("rk") >= ceil(lit(0.975d) * col("nb")), col("m6")))
          .cast("double") / 1e6).as("hi95"))
      .join(broadcast(full))
      .select(col("n_rows"), col("n_reps"),
        (col("mean6").cast("double") / 1e6).as("mean"),
        col("lo95"), col("hi95"))
  }

  /** Cramér's V association strength between two categorical columns —
    * the EFFECT SIZE the raw chi-square (q155) lacks: chi2 grows with N
    * even for trivial association, V ∈ [0,1] does not. One exact cell
    * aggregation (margins re-aggregated from cells), 6dp-grid chi2
    * terms summed as integers, then `V = sqrt(chi2 / (N*min(r-1,c-1)))`
    * as one portable IEEE sequence. Output: a single row. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val ra = cells.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val cb = cells.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val n = cells.agg(sum(col("obs")).as("n"),
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
    val ex = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
    val t6 = floor((col("__obs").cast("double") - ex)
      * (col("__obs").cast("double") - ex) / ex * lit(1e6) + lit(0.5d))
      .cast("long")
    // chi2 runs over the FULL r×c margin grid — zero cells contribute
    // exp, and a deterministic mapping is mostly zero cells
    ra.crossJoin(broadcast(cb))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("__obs", coalesce(col("obs"), lit(0L)))
      .join(broadcast(n))
      .withColumn("__t6", t6)
      .agg(max(col("n")).as("n"), max(col("r")).as("r"), max(col("c")).as("c"),
        sum(col("__t6")).as("__chi6"))
      .select(lit(aCol).as("col_a"), lit(bCol).as("col_b"),
        col("n"), col("r"), col("c"),
        (col("__chi6").cast("double") / 1e6).as("chi2"),
        (floor(sqrt((col("__chi6").cast("double") / lit(1e6))
          / (col("n") * least(col("r") - 1L, col("c") - 1L)).cast("double"))
          * lit(1e6) + lit(0.5d)) / lit(1e6)).as("v"))
  }

  /** Exact WEIGHTED quantiles per group — each row counts `weight`
    * times (token-weighted length medians, quantity-weighted price
    * quartiles): the q-quantile is the smallest value whose cumulative
    * weight reaches `ceil(p·W)`, with p carried as a RATIONAL
    * (num/den) so the target is pure integer ceil-division — the house
    * order-statistic convention, no interpolation, no float boundary.
    * Aggregate-then-window: one (group, value) weight aggregation
    * (map-side combined), a per-group cumulative window over DISTINCT
    * values only. */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                        weightCol: String,
                        probs: Seq[(Long, Long)] = Seq((1L, 4L), (1L, 2L), (3L, 4L))): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (n, d) => n > 0 && n < d },
      "probs must be proper fractions")
    val per = df.groupBy(col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"))
      .agg(sum(col(weightCol).cast("long")).as("w"))
    // scale-adaptive per-group cumulative (two-pass above 1M distinct
    // (grp, v) rows); group totals ride along from the same bounded
    // subtotal collect instead of a whole-partition window
    val cum = Ranks.cumSums(per, Seq("grp"), "v", Seq(("w", "cw", true)),
      totals = Seq(("w", "tw")))
    // integer ceil-div (n*W + d - 1) div d
    val aggs = probs.map { case (n, d) =>
      min(when(col("cw") >= expr(s"($n * tw + ${d - 1}) div $d"), col("v")))
        .as(s"p${n}_$d") }
    val allAggs = max(col("tw")).as("total_weight") +: aggs
    cum.groupBy(col("grp")).agg(allAggs.head, allAggs.tail: _*)
  }

  /** Exact ROC AUC from a 6dp-grid score column — the rank-sum
    * (Mann–Whitney U) form with average ranks for ties, so the result
    * is EXACT integer algebra until one final division:
    * `AUC = (ΣR2_pos - n_pos(n_pos+1)) / (2·n_pos·n_neg)` where per
    * distinct score `R2 = n_pos_s·(2·cumBelow + n_s + 1)` (twice the
    * average rank mass). Runs aggregate-then-window: one groupBy on
    * the score grid (bounded by 1e6 distinct scores, never rows), a
    * tiny cumulative window, three scalars out. The threshold-free
    * discrimination summary completing calibration (q195). */
  def rocAuc(df: DataFrame, score6Col: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(score6Col).as("s6"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("np"))
    // scale-adaptive cumulative: plain window on bounded grids, the
    // two-pass globalRank shape above 1M distinct scores
    Ranks.cumSums(per, Nil, "s6", Seq(("n", "cp", false)))
      .agg(sum(col("np")).as("n_pos"), sum(col("n") - col("np")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cp") + col("n") + 1L)).as("__r2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          floor((col("__r2") - col("n_pos") * (col("n_pos") + 1L))
            .cast("double")
            / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")
            * lit(1e6) + lit(0.5d)) / lit(1e6)).as("auc"))
  }

  /** Cumulative gains / lift table by model-score decile: rows ranked
    * by (score desc, id) through the scalable two-pass global rank
    * (Linkage.globalRank — offsets per PARTITION, no single-partition
    * window over data), deciles by integer ceil-division, then one
    * bounded aggregation: per decile the positives captured, cumulative
    * gain (share of all positives) and lift vs random. The "how deep
    * must I score to catch X% of the good documents" view completing
    * AUC (q267) and calibration (q195). */
  def cumulativeGains(df: DataFrame, score6Col: String, labelCol: String,
                      idCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val ranked = Linkage.globalRank(
      df.select(col(idCol).cast("long").as("rid"),
        (-col(score6Col)).as("negs"), col(labelCol).as("y")),
      Seq("negs"), "rid")
    val tot = ranked.agg(count(lit(1)).as("nt"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("pt"))
    val perBin = ranked.join(broadcast(tot))
      .withColumn("decile",
        expr(s"(rank * $bins + nt - 1) div nt"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        max(col("nt")).as("nt"), max(col("pt")).as("pt"))
    val wCum = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_pos"),
        when(col("pt") > 0L, floor(col("cum_pos").cast("double")
          / col("pt").cast("double") * lit(1e6) + lit(0.5d)) / lit(1e6))
          .as("gain"),
        when(col("pt") > 0L, floor((col("cum_pos") * col("nt")).cast("double")
          / (col("cum_n") * col("pt")).cast("double") * lit(1e6) + lit(0.5d))
          / lit(1e6)).as("lift"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test: does group A
    * sit systematically higher/lower than B? The location-shift
    * complement of the KS drift gate (q237, which reacts to ANY shape
    * difference). Rank algebra is exact: average ranks via the
    * `2·avgRank = 2·cumBelow + n_v + 1` tie identity over distinct
    * values (aggregate-then-window), the tie-corrected variance from
    * the exact integer `nA·nB·((N+1)N(N−1) − Σ(t³−t))` (decimal(38) —
    * N³-sized), z through one fixed IEEE sequence, p via the house
    * logistic normal approximation. Output: one row. */
  def mannWhitney(df: DataFrame, isA: Column, valueCol: String): DataFrame = {
    val per = df.select(isA.as("a"), col(valueCol).cast("long").as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("nv"),
        sum(when(col("a"), 1L).otherwise(0L)).as("na_v"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    // scale-adaptive cumulative: plain window on bounded grids, the
    // two-pass globalRank shape above 1M distinct values
    val g = Ranks.cumSums(per, Nil, "v", Seq(("nv", "cb", false)))
      .agg(sum(col("na_v")).as("na"), sum(col("nv") - col("na_v")).as("nb"),
        sum(d(col("na_v")) * d(lit(2L) * col("cb") + col("nv") + 1L)).as("r2a"),
        sum(d(col("nv")) * d(col("nv")) * d(col("nv")) - d(col("nv"))).as("tt"))
    val n = col("na") + col("nb")
    val u2 = (col("r2a") - d(col("na")) * d(col("na") + 1L)).cast("double")
    val varNum = (d(col("na")) * d(col("nb"))
      * (d(n + 1L) * d(n) * d(n - 1L) - col("tt")))
    val varDen = d(lit(12L)) * d(n) * d(n - 1L)
    val z = ((u2 - (col("na") * col("nb")).cast("double"))
      / (lit(2.0d) * sqrt(varNum.cast("double") / varDen.cast("double"))))
    val ok = col("na") > 0L && col("nb") > 0L && varNum > 0
    g.select(col("na").as("n_a"), col("nb").as("n_b"),
      (u2 / lit(2.0d)).as("u"),
      when(ok, floor(z * lit(1e6) + lit(0.5d)) / lit(1e6)).as("z"),
      when(ok, floor(lit(2.0d) / (lit(1.0d) + exp(lit(1.702d) * abs(z)))
        * lit(1e6) + lit(0.5d)) / lit(1e6)).as("p"))
  }

  /** Spearman rank correlation per group — the monotone-association
    * complement of q110's Pearson: immune to outliers and nonlinearity,
    * it correlates RANKS (average ranks for ties, held as the exact
    * integer `2·avgRank = 2·cumBelow + n_v + 1` — the rocAuc tie
    * algebra). Rank assignment is aggregate-then-window over DISTINCT
    * values per group, joined back scan-side; the five moment sums
    * accumulate as decimal(38,0) (rank products overflow long at
    * ~10⁶ rows/group), with one double division at the end. */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    def ranks2(valCol: String, out: String): DataFrame = {
      val per = df.groupBy(col(groupCol).as("grp"),
          col(valCol).cast("long").as("v"))
        .agg(count(lit(1)).as("nv"))
      val wPrev = Window.partitionBy(col("grp")).orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      per.withColumn(out,
          lit(2L) * coalesce(sum(col("nv")).over(wPrev), lit(0L))
            + col("nv") + 1L)
        .select(col("grp"), col("v"), col(out))
    }
    val rows = df.select(col(groupCol).as("grp"),
      col(xCol).cast("long").as("xv"), col(yCol).cast("long").as("yv"))
    val withR = rows
      .join(ranks2(xCol, "rx").withColumnRenamed("v", "xv"), Seq("grp", "xv"))
      .join(ranks2(yCol, "ry").withColumnRenamed("v", "yv"), Seq("grp", "yv"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val g = withR.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(d(col("rx"))).as("sx"),
        sum(d(col("ry"))).as("sy"),
        sum(d(col("rx")) * d(col("ry"))).as("sxy"),
        sum(d(col("rx")) * d(col("rx"))).as("sxx"),
        sum(d(col("ry")) * d(col("ry"))).as("syy"))
    val num = (d(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
    val d1 = (d(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val d2 = (d(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")
    g.select(col("grp"), col("n"),
      when(d1 > 0.0d && d2 > 0.0d,
        floor(num / sqrt(d1 * d2) * lit(1e6) + lit(0.5d)) / lit(1e6))
        .otherwise(lit(null).cast("double")).as("rho"))
  }

  /** Benjamini–Hochberg step-up FDR control over a (tiny, aggregated)
    * table of tests with a 6dp-grid `p6` column: rank p ascending
    * (ties by the test key), find the largest rank r with
    * `p_r <= alpha * r / m`, flag ranks <= r as discoveries. The
    * threshold comparison is PURE INTEGER (`p6 * m * denom <= num *
    * 1e6 * r` with alpha = num/denom) — no float boundary anywhere.
    * Runs aggregate-then-window: the input is one row per test, never
    * raw data. */
  def bhAdjust(tests: DataFrame, keyCols: Seq[String],
               alphaNum: Long, alphaDenom: Long): DataFrame = {
    require(alphaNum > 0 && alphaDenom > 0 && alphaNum < alphaDenom,
      "alpha must be in (0,1) as num/denom")
    // scale-adaptive rank: a tests table is bounded by construction
    // (one row per hypothesis), so the plain window is the normal
    // path; a degenerate mega-suite routes through the two-pass
    // globalRank instead of funnelling into one partition
    val cut = Lineage.cut(tests)
    val ranked0 =
      if (cut.count() <= 1048576L) {
        val w = Window.orderBy(col("p6").asc +: keyCols.map(col(_).asc): _*)
        cut.withColumn("rank", row_number().over(w).cast("long"))
      } else if (keyCols.isEmpty) Linkage.globalRank(cut, Nil, "p6")
      else Linkage.globalRank(cut, "p6" +: keyCols.init, keyCols.last)
    val ranked = ranked0
      .join(broadcast(cut.agg(count(lit(1)).as("m"))))
      .withColumn("__pass",
        col("p6") * col("m") * lit(alphaDenom) <= lit(alphaNum * 1000000L) * col("rank"))
    val kmax = ranked.agg(coalesce(max(when(col("__pass"), col("rank"))), lit(0L))
      .as("__kmax"))
    ranked.join(broadcast(kmax))
      .withColumn("discovery", col("rank") <= col("__kmax"))
      .drop("__pass", "__kmax", "m")
  }
}
