package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture control: temperature-weighted downsampling across strata
  * (sources, languages, domains).
  *
  * Training corpora mix heterogeneous sources whose raw sizes differ by
  * orders of magnitude; sampling each stratum proportionally to
  * `count^alpha` (alpha in [0,1] — the "temperature" of multilingual /
  * multi-corpus mixing, e.g. the exponent-smoothed sampling popularized by
  * multilingual pretraining) flattens the head without discarding the tail:
  * alpha=1 is proportional (no rebalance), alpha=0 is uniform per stratum.
  *
  * Semantics: with budget `B = floor(total * budgetNum / budgetDen)` rows,
  * stratum `s` (with `n_s` rows) gets an integer quota
  * `q_s = floor(B * n_s^alpha / sum_t n_t^alpha)`, and KEEPS exactly
  * `min(q_s, n_s)` rows — the ones ranked first by `(md5(text), id)`.
  * Hash-order selection makes the sample content-deterministic: re-runs,
  * engine ports, and row-order changes all pick the same rows (the same
  * convention as the per-source cap / stratified-sampling operators).
  *
  * Scale: pass 1 is a groupBy(stratum).count() — the result is strata-many
  * rows (tiny), collected to the driver so the quotas enter the plan as a
  * LITERAL map (no join, no second scan of the big side for rates). Pass 2
  * hash-threshold-prunes each stratum to ~quota+margin candidate rows and
  * ranks ONLY those ([[prunedStratumRank]]) — exact selection, but no
  * stage ever sorts a whole stratum, so a dominant stratum at 100 TB
  * costs a sort of its QUOTA, not its size. Where binomially-approximate
  * counts suffice, [[hashThresholdSample]] drops the window entirely;
  * the quota math is shared.
  */
object CorpusMix {

  /** Null strata are real strata (unlabeled documents are a population,
    * not an error): fold them into a sentinel so counting, quota lookup,
    * and the rank window all agree. (A literal-map lookup on null would
    * otherwise silently drop every unlabeled row.) */
  private val NullStratum = "__null__"
  private def stratumOf(c: org.apache.spark.sql.Column) =
    coalesce(c, lit(NullStratum))

  /** Fail-loud cap on stratum cardinality: every sampler here collects
    * one row per stratum to build its literal quota map, which is only
    * sane when strata are languages/sources/shards — not when a caller
    * mistakes an id column for a stratum. At 100 TB that mistake must
    * throw, not OOM the driver. */
  val MaxStrata: Int = 65536

  /** The strata-count collect behind every sampler, fetched with
    * `limit(cap + 1)` so at most cap+1 tiny rows ever reach the driver
    * regardless of the group column's true cardinality. */
  private def stratumCounts(df: DataFrame, stratumCol: String): Seq[(String, Long)] = {
    val rows = df.groupBy(stratumOf(col(stratumCol)).as("s")).count()
      .limit(MaxStrata + 1).collect()
    require(rows.length <= MaxStrata,
      s"CorpusMix: more than $MaxStrata distinct strata in '$stratumCol' — " +
        "strata must be driver-bounded (languages, sources, shards); " +
        "check the stratum column")
    rows.map(r => r.getString(0) -> r.getLong(1)).toSeq
  }

  /** Integer quotas per stratum: floor(B * n^alpha / sum(n^alpha)).
    * Strata are folded in lexicographic order so the double sum is
    * reproducible across runs and engines. */
  private[graft] def quotas(counts: Seq[(String, Long)], alpha: Double,
                            budgetNum: Long, budgetDen: Long): Map[String, Long] = {
    val sorted = counts.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val budget = total * budgetNum / budgetDen
    val sumW = sorted.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    sorted.map { case (s, n) =>
      s -> math.floor(budget * math.pow(n.toDouble, alpha) / sumW).toLong
    }.toMap
  }

  /** EXACT per-stratum top-`need(s)` ranking WITHOUT sorting whole strata:
    * the threshold-prune + boundary-rank hybrid behind every exact sampler
    * here. Returns `df` filtered to candidate rows with a `rk` column equal
    * to each row's rank within its FULL stratum under `(md5(text), id)`.
    *
    * Why the pruned rank is exact, not approximate: a candidate is any row
    * with `h32(text) < T_s` where `h32` is the md5 prefix's first 8 hex
    * chars as an integer. Fixed-width lowercase hex sorts lexicographically
    * exactly as it sorts numerically, so EVERY candidate orders strictly
    * before EVERY non-candidate of its stratum — the candidate set is a
    * prefix of the stratum's (md5, id) order, and ranking candidates alone
    * yields the same ranks as sorting the whole stratum. The only failure
    * mode is too few candidates (an unlucky hash draw under the binomial
    * margin); that is DETECTED by a cheap count pass and repaired by
    * escalating the margin — never silently wrong. A margin of
    * `6*sqrt(need)+64` puts the first-try failure probability below the
    * 6-sigma binomial tail, so the escalation loop is all but dead code.
    *
    * Scale: two aggregate scans (quota counts happen in the caller; the
    * candidate-count verify here) plus one window over ~need(s)+margin rows
    * per stratum — a dominant stratum at 100 TB contributes a sort of
    * roughly its QUOTA, not its size. The full-stratum sort this replaces
    * was the one plan-level scale-killer in the sampling family. */
  private[graft] def prunedStratumRank(df: DataFrame, stratumCol: String,
                                       textCol: String, idCol: String,
                                       need: Map[String, Long],
                                       counts: Map[String, Long]): DataFrame = {
    val two32 = BigInt(2).pow(32)
    val h32 = conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long")
    var margin: Map[String, Long] = need.map { case (s, k) =>
      s -> (6L * math.ceil(math.sqrt(k.toDouble)).toLong + 64L)
    }
    while (true) {
      val thr: Map[String, Long] = need.map { case (s, k) =>
        val n = counts(s)
        val t =
          if (n == 0L) BigInt(0)
          else (BigInt(k + margin(s)) * two32 / BigInt(n)) + 1
        s -> t.min(two32).toLong
      }
      val cand = df
        .withColumn("__thr", element_at(typedLit(thr), stratumOf(col(stratumCol))))
        .filter(h32 < col("__thr"))
        .drop("__thr")
      val candCounts = cand.groupBy(stratumOf(col(stratumCol)).as("s")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val deficient = need.keySet.filter { s =>
        candCounts.getOrElse(s, 0L) < math.min(need(s), counts(s))
      }
      if (deficient.isEmpty) {
        val w = Window.partitionBy(stratumOf(col(stratumCol)))
          .orderBy(md5(col(textCol)).asc, col(idCol).asc)
        return cand.withColumn("rk", row_number().over(w).cast("long"))
      }
      margin = margin.map { case (s, m) =>
        s -> (if (deficient(s)) m * 8L else m)
      }
    }
    sys.error("unreachable")
  }

  /** Leakage-guarded train/validation split: a deterministic content-hash
    * split, corrected so near-duplicate documents NEVER straddle the
    * boundary — the classic eval-contamination bug where a validation doc
    * has a near-copy in train.
    *
    * Rule: base split = `md5(text) < valThreshold` (first 4 hex chars, so
    * `"199a"` ≈ 10% val — the repo's standard content-hash sampling
    * convention). Every near-dup cluster (connected components over
    * `pairs`, the minhash/LSH pair output) is then moved WHOLE to the base
    * split of its representative (= min-id member, which IS the cluster
    * label both component operators produce). Singletons keep their base
    * split. Deterministic, engine-portable, re-run-stable.
    *
    * Output: (id, split 'train'|'val', moved — true when the cluster rule
    * overrode the row's own hash).
    *
    * Scale: the base split is a zero-shuffle scan expression; clusters come
    * from the O(log n)-round star contraction; both correction joins put
    * ONLY pair-touched tables on the build side — the cluster membership
    * table and the rep-value lookup (base semi-joined down to the actual
    * representatives, a small fraction of the corpus, broadcast-able in
    * practice). Rows outside any cluster resolve via coalesce to their own
    * base_val, so the corpus itself is never shuffled or self-joined. */
  def leakageGuardedSplit(df: DataFrame, textCol: String, idCol: String,
                          pairs: DataFrame,
                          valThreshold: String = "199a"): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      (substring(md5(col(textCol)), 1, 4) < valThreshold).as("base_val"))
    // cut: consumed by the representative lookup AND the final join —
    // without it the star-contraction CC (and the caller's pair
    // derivation feeding it) runs twice
    val cl = graft.operators.Lineage.cut(
      Dedup.clustersStar(pairs)) // (id, cluster_id = min member)
    val repVals = base
      .join(cl.select(col("cluster_id").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id").as("cluster_id"), col("base_val").as("rep_val"))
    base.join(cl, Seq("id"), "left")
      .join(repVals, Seq("cluster_id"), "left")
      .withColumn("eff_val", coalesce(col("rep_val"), col("base_val")))
      .select(col("id"),
        when(col("eff_val"), "val").otherwise("train").as("split"),
        (col("eff_val") =!= col("base_val")).as("moved"))
  }

  /** Temperature mixing WITH upsampling: where [[temperatureSample]] can
    * only downsample (a stratum whose quota exceeds its size silently
    * under-fills the budget), this emits REPEATED rows — the "rare
    * high-quality source trains for N epochs" semantics of real mixture
    * schedules. Each stratum's quota `q_s` maps to per-row copy counts:
    * every row gets `q_s div n_s` copies, and the `q_s mod n_s` rows
    * ranked first by `(md5(text), id)` get one more — so the stratum
    * contributes EXACTLY `q_s` rows and repetition is spread
    * deterministically, not concentrated on arbitrary rows. Output rows
    * carry `epoch` (1-based copy index).
    *
    * Scale: the base copies (`q_s div n_s` per row) are a pure scan with a
    * narrow `explode(sequence(...))` — no rank needed, fan-out happens
    * scan-side and is never shuffled at multiplicity. Only the boundary
    * rows (the `q_s mod n_s` that get one extra copy) need an order, and
    * they come from [[prunedStratumRank]] — so, as in
    * [[temperatureSample]], no stage sorts a whole stratum. */
  def temperatureEpochs(df: DataFrame, stratumCol: String, textCol: String,
                        idCol: String, alpha: Double,
                        budgetNum: Long, budgetDen: Long): DataFrame = {
    val counts = stratumCounts(df, stratumCol)
    val q = quotas(counts, alpha, budgetNum, budgetDen)
    val nMap = counts.toMap
    // Split the copy schedule into a rank-free base and a ranked boundary:
    // every row of stratum s gets `q_s div n_s` copies (a pure scan — no
    // sort anywhere near the full corpus), and ONLY the `q_s mod n_s`
    // boundary rows (top-ranked by (md5, id), found via the pruned rank)
    // get one more, emitted as the final epoch. The union is row-for-row
    // the schedule the single full-stratum window produced.
    val base = df
      .withColumn("quota", element_at(typedLit(q), stratumOf(col(stratumCol))))
      .withColumn("n_stratum",
        element_at(typedLit(nMap), stratumOf(col(stratumCol))))
      .withColumn("__b", expr("quota DIV n_stratum"))
      .filter(col("__b") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__b"))))
      .drop("quota", "n_stratum", "__b")
    val boundaryNeed = q.map { case (s, qs) =>
      val n = nMap(s); s -> (if (n == 0L) 0L else qs % n)
    }
    val boundary = prunedStratumRank(df, stratumCol, textCol, idCol,
        boundaryNeed, nMap)
      .withColumn("quota", element_at(typedLit(q), stratumOf(col(stratumCol))))
      .withColumn("n_stratum",
        element_at(typedLit(nMap), stratumOf(col(stratumCol))))
      .filter(col("rk") <= pmod(col("quota"), col("n_stratum")))
      .withColumn("epoch", expr("quota DIV n_stratum") + lit(1L))
      .drop("rk", "quota", "n_stratum")
    base.unionByName(boundary)
  }

  /** SORT-FREE temperature sampling: the 100 TB form of
    * [[temperatureSample]]. The exact rank path sorts every stratum
    * inside its window — correct, but a dominant stratum becomes one
    * near-global (spill-heavy) sort. Here membership is a pure scan
    * predicate: keep a row iff its 32-bit content hash falls under the
    * stratum's threshold
    *
    *   `h32(text) < T_s`  where  `T_s = floor(q_s * 2^32 / n_s)`
    *
    * with `T_s` computed EXACTLY (BigInt) on the driver from the same
    * literal quota map — zero shuffles beyond the tiny counts pass, zero
    * sorts, same md5-content determinism (re-runs, engines, and row
    * orders agree). The trade: the kept count is binomially close to
    * `q_s`, not exactly `q_s` — the documented approximate variant, to
    * be preferred whenever exact-to-the-row quotas don't matter. A
    * stratum whose quota exceeds its size keeps everything (threshold
    * caps at 2^32). */
  def hashThresholdSample(df: DataFrame, stratumCol: String, textCol: String,
                          idCol: String, alpha: Double,
                          budgetNum: Long, budgetDen: Long): DataFrame = {
    val counts = stratumCounts(df, stratumCol)
    val q = quotas(counts, alpha, budgetNum, budgetDen)
    val nMap = counts.toMap
    val two32 = BigInt(2).pow(32)
    val thresholds: Map[String, Long] = q.map { case (s, qs) =>
      val n = nMap(s)
      s -> (if (n == 0L) 0L else (BigInt(qs) * two32 / BigInt(n)).min(two32).toLong)
    }
    val h32 = conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long")
    df.withColumn("__thr", element_at(typedLit(thresholds), stratumOf(col(stratumCol))))
      .filter(h32 < col("__thr"))
      .drop("__thr")
  }

  /** Temperature-sample `df` to `budgetNum/budgetDen` of its rows,
    * rebalanced across `stratumCol` with exponent `alpha`. Output = the
    * kept rows plus their stratum `quota` column — exactly `min(q_s, n_s)`
    * rows per stratum, the ones ranked first by `(md5(text), id)`.
    *
    * Plan shape: the exact selection runs through [[prunedStratumRank]] —
    * a hash-threshold filter prunes each stratum to ~quota+margin
    * candidates BEFORE the rank window, so no stage ever sorts a whole
    * stratum (the selected set is provably identical; see the helper's
    * doc). For workloads that tolerate binomially-approximate counts,
    * [[hashThresholdSample]] drops the window entirely. */
  def temperatureSample(df: DataFrame, stratumCol: String, textCol: String,
                        idCol: String, alpha: Double,
                        budgetNum: Long, budgetDen: Long): DataFrame = {
    val counts = stratumCounts(df, stratumCol)
    val q = quotas(counts, alpha, budgetNum, budgetDen)
    prunedStratumRank(df, stratumCol, textCol, idCol, q, counts.toMap)
      .withColumn("quota", element_at(typedLit(q), stratumOf(col(stratumCol))))
      .filter(col("rk") <= col("quota"))
      .drop("rk")
  }

  /** Per-stratum cap: keep at most `k` rows per stratum, chosen by the
    * deterministic `(md5(text), id)` content-hash order — the C4-style
    * per-domain downsampling step. Same pruned-rank plan as
    * [[temperatureSample]]: the window sorts ~k+margin candidate rows per
    * stratum, never the stratum itself. */
  def perSourceCap(df: DataFrame, stratumCol: String, textCol: String,
                   idCol: String, k: Long): DataFrame = {
    val counts = stratumCounts(df, stratumCol).toMap
    val need = counts.map { case (s, n) => s -> math.min(k, n) }
    prunedStratumRank(df, stratumCol, textCol, idCol, need, counts)
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** The WATER-FILLING level for a total budget: the largest integer C
    * with `Σ_s min(n_s, C) <= budget` (all of every stratum when the
    * budget covers the corpus). Small strata keep everything; larger
    * strata are clipped at one common level — the max-min-fair
    * allocation, vs [[perSourceCap]]'s fixed-k cap that must be guessed
    * and [[quotas]]' power-law shares that never saturate. Driver-side
    * over the bounded stratum counts; the unique level falls out of one
    * pass over the counts sorted ascending (ties by stratum name, the
    * engine-portable order). Residual budget below one more unit per
    * unsaturated stratum is left unspent — deterministic, documented. */
  private[graft] def waterFillLevel(counts: Seq[(String, Long)],
                                    budget: Long): Long = {
    require(budget >= 0, "budget must be >= 0")
    val sorted = counts.sortBy(c => (c._2, c._1))
    val s = sorted.length
    val total = sorted.map(_._2).sum
    if (budget >= total) return sorted.map(_._2).max
    var pj = 0L
    var res = -1L
    for (j <- 0 until s) {
      if (res < 0L) {
        val nj = if (j == 0) 0L else sorted(j - 1)._2
        val nj1 = sorted(j)._2
        val cand = (budget - pj) / (s - j)
        if (cand >= nj && cand < nj1) res = cand
      }
      pj += sorted(j)._2
    }
    require(res >= 0L, "water-filling level not found (impossible)")
    res
  }

  /** Budget-constrained max-min-fair selection: keep `min(n_s, C)` rows
    * per stratum at the water-filling level C, rows chosen by the house
    * content-hash order `(md5(text), id)` — deterministic and
    * engine-portable. Ranking goes through [[prunedStratumRank]], so a
    * dominant stratum sorts ~its QUOTA, never its size. */
  def waterFillSelect(df: DataFrame, stratumCol: String, textCol: String,
                      idCol: String, budget: Long): DataFrame = {
    val countSeq = stratumCounts(df, stratumCol)
    val counts = countSeq.toMap
    val level = waterFillLevel(countSeq, budget)
    val need = counts.map { case (s, n) => s -> math.min(n, level) }
    prunedStratumRank(df, stratumCol, textCol, idCol, need, counts)
      .filter(col("rk") <= lit(level))
      .drop("rk")
  }

  /** Deterministic weighted sampling without replacement: priority
    * sampling (Duffield/Lund/Thorup). Each row gets `priority = w / u`
    * with `u` a content-derived uniform in (0, 1] (first 32 md5 bits of
    * `keyCol`, +1, over 2^32 — the same md5 determinism convention as the
    * other samplers: re-runs, engines, and row orders all agree); the
    * sample is the top-`k` priorities. Heavier rows draw proportionally
    * larger priorities, so inclusion probability scales with weight —
    * the weighted generalization of hash-threshold sampling, usable for
    * quality-weighted corpus subsetting and (with the k+1-th priority as
    * the threshold) unbiased subset-sum estimation.
    *
    * Scale: priority is a scan-side expression; top-k plans as
    * `TakeOrderedAndProject` (per-partition heaps, never a global sort).
    * Pure IEEE division throughout — no transcendental functions, whose
    * last-ulp differences across libms would poison cross-engine parity.
    */
  def prioritySample(df: DataFrame, weightCol: String, keyCol: String,
                     idCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    df.withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("priority"))
  }

  /** Deterministic training-order shuffle: the "globally shuffle the
    * corpus before training" step, expressed as sharding rather than a
    * global sort. Each row draws a content-deterministic 32-bit hash of
    * `keyCol` (the md5-prefix convention shared by every sampler here);
    * `shard = h mod nShards`, and the position within a shard is the rank
    * of `(h, id)` — so the full order is reproducible across re-runs,
    * engines, and input row orders, yet no stage ever sorts more than one
    * shard. `global_pos = pos * nShards + shard` defines the round-robin
    * interleave a training loader reads the shards back in: consecutive
    * global positions come from different shards, which is exactly the
    * source-decorrelation a shuffle exists to provide.
    *
    * Scale: one hash shuffle on `shard`, then nShards INDEPENDENT
    * per-shard sorts (each corpus/nShards rows — size nShards so a shard
    * fits an executor; at 100 TB that is thousands of shards, each a few
    * GB). A literal global sort would funnel the corpus through one
    * ordering stage; this never materializes any order wider than a
    * shard. */
  /** Neyman-optimal stratified sample allocation: stratum h gets
    * `budget * N_h*sigma_h / Σ N*sigma` draws — variance-minimizing for
    * a fixed budget (Neyman 1934), vs the max-min fairness of
    * `waterFillLevel` (q228): spread-out strata earn MORE budget, not
    * just large ones. Selection inside each stratum follows the house
    * run-stable hash order (md5 hex, id tie-break).
    *
    * Portable integer algebra end-to-end: sigma lands on the 6dp grid
    * from exact integer sums (`sqrt(n*S2 - S²)/n`), weights are
    * `N_h * sigma6`, and the rounding is largest-remainder — base
    * shares by integer floor-division, the leftover seats by integer
    * remainder rank (ties by stratum name) — so allocations sum to
    * exactly `budget` with no float boundary anywhere. Allocations are
    * capped at the stratum size (no redistribution — undersized strata
    * report `n_selected < alloc`).
    *
    * Scale: stratum stats are one map-side-combined groupBy (output
    * bounded by #strata); the largest-remainder pass runs entirely on
    * that bounded table; selection is one per-stratum window rank over
    * the data partitioned by stratum. */
  def neymanAllocate(df: DataFrame, stratumCol: String, valueCol: String,
                     idCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val strata = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("__s"),
        sum(col(valueCol).cast("long") * col(valueCol).cast("long")).as("__s2"))
      .withColumn("__sigma6",
        floor(sqrt((col("n_rows") * col("__s2") - col("__s") * col("__s"))
          .cast("double")) / col("n_rows").cast("double") * lit(1e6)
          + lit(0.5d)).cast("long"))
      .withColumn("__w", col("n_rows") * col("__sigma6"))
    val tw = strata.agg(sum(col("__w")).as("__tw"))
    val based = strata.join(broadcast(tw))
      .withColumn("__base", when(col("__tw") > 0L,
        expr(s"($budget * __w) div __tw")).otherwise(lit(0L)))
      .withColumn("__rem", when(col("__tw") > 0L,
        expr(s"($budget * __w) % __tw")).otherwise(lit(0L)))
    val extra = based.agg((lit(budget) - sum(col("__base"))).as("__extra"))
    val wRem = Window.orderBy(col("__rem").desc, col("stratum").asc)
    val alloc = based.join(broadcast(extra))
      .withColumn("__rk", row_number().over(wRem).cast("long"))
      .withColumn("alloc", col("__base")
        + when(col("__rk") <= col("__extra"), 1L).otherwise(0L))
    val wSel = Window.partitionBy(col(stratumCol))
      .orderBy(substring(md5(col(idCol).cast("string")), 1, 16).asc,
        col(idCol).asc)
    val picked = df
      .withColumn("__sel_rk", row_number().over(wSel).cast("long"))
      .join(broadcast(alloc.select(col("stratum"), col("alloc"))),
        col(stratumCol) === col("stratum"))
      .filter(col("__sel_rk") <= col("alloc"))
      .groupBy(col("stratum").as("__g"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col(valueCol).cast("long")).as("__sel_sum"))
    alloc.join(picked, col("stratum") === col("__g"), "left")
      .select(col("stratum"), col("n_rows"),
        (col("__sigma6").cast("double") / 1e6).as("sigma"),
        col("alloc"), coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        when(coalesce(col("n_selected"), lit(0L)) > 0L,
          floor(col("__sel_sum").cast("double")
            / col("n_selected").cast("double") * lit(1e6) + lit(0.5d))
            / lit(1e6)).as("mean_selected"))
  }

  def shardedTrainingOrder(df: DataFrame, keyCol: String, idCol: String,
                           nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .withColumn("global_pos", col("pos") * nShards + col("shard"))
      .drop("__h")
  }
}
