package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Round-10 text-quality operators on crafted fixtures: Flesch
  * readability, mixed-script homoglyph screen. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("flesch: easy prose scores high, dense polysyllabic prose scores low") {
    val docs = Seq(
      (1L, "the cat sat. the dog ran. we go now."),
      (2L, "organizational restructuring necessitates comprehensive reevaluation immediately"))
      .toDF("id", "text")
    val f = TextAnalysis.fleschStats(col("text"))
    val r = docs.select(col("id"), f.nWords.as("w"), f.nSentences.as("s"),
      f.nSyllables.as("y"), (f.flesch6 / 1e6).as("score"), f.band)
      .as[(Long, Long, Long, Long, Double, String)].collect()
      .map(t => t._1 -> t).toMap
    val (_, w1, s1, _, sc1, b1) = r(1L)
    assert(w1 == 9L && s1 == 3L, "9 words, 3 sentence runs")
    assert(sc1 > 90 && b1 == "very_easy", s"monosyllables read easy, got $sc1")
    val (_, _, s2, y2, sc2, b2) = r(2L)
    assert(s2 == 1L, "no terminator: sentence count floors at 1")
    assert(y2 >= 20L, "polysyllabic words pile up vowel groups")
    assert(sc2 < 0 && b2 == "very_difficult", s"dense prose reads hard, got $sc2")
  }

  test("mixed-script: confusable substitution is flagged, pure scripts are not") {
    val docs = Seq(
      (1L, "pay with раypal now"), // 'раypal' mixes Cyrillic ра + Latin ypal
      (2L, "plain ascii text only"),
      (3L, "чисто русский текст")) // pure Cyrillic: no MIXED tokens
      .toDF("id", "text")
    val ms = TextAnalysis.mixedScriptStats(col("text"))
    val r = docs.select(col("id"), ms.nTokens, ms.nCyrillic, ms.nMixed, ms.spoof)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(r(1L) == (4L, 1L, 1L, true))
    assert(r(2L) == (4L, 0L, 0L, false))
    assert(r(3L) == (3L, 3L, 0L, false), "pure Cyrillic is not a spoof")
  }

  test("acf: a period-2 alternating series spikes negative at lag 1, positive at lag 2") {
    val base = java.time.LocalDate.of(2024, 1, 1)
    val daily = (0 until 20).map(i =>
      ("s", java.sql.Date.valueOf(base.plusDays(i)),
        if (i % 2 == 0) 10L else 2L)).toDF("series", "day", "v")
    val r = graft.operators.Seasonal.acf(daily, maxLag = 2)
      .select("lag", "acf").as[(Long, Option[Double])].collect().toMap
    assert(r(1L).get < -0.9, s"alternation anti-correlates at lag 1: ${r(1L)}")
    assert(r(2L).get > 0.85, s"period 2 re-correlates at lag 2: ${r(2L)}")
    val const = (0 until 10).map(i =>
      ("c", java.sql.Date.valueOf(base.plusDays(i)), 5L)).toDF("series", "day", "v")
    val rc = graft.operators.Seasonal.acf(const, maxLag = 1)
      .select("acf").as[Option[Double]].collect()
    assert(rc.forall(_.isEmpty), "constant series: zero variance -> null acf")
  }

  test("kaplan-meier: censored subjects stay at risk but add no death") {
    // durations: deaths at 1 (2 of 5 at risk), censor at 2, death at 3
    // (1 of 2 at risk)
    val lt = Seq((1L, 1L, true), (2L, 1L, true), (3L, 2L, false),
      (4L, 3L, true), (5L, 3L, false)).toDF("subject", "duration_min", "observed")
    val r = graft.operators.Survival.kaplanMeier(lt, durationCol = "duration_min")
      .select("t_days", "n_risk", "n_events", "survival")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.map(t => (t._1, t._2, t._3)).toSeq == Seq((1L, 5L, 2L), (3L, 2L, 1L)),
      "only event times emitted; the t=2 censor holds the risk set at 2 for t=3")
    assert(math.abs(r(0)._4 - 0.6) < 1e-6, "S(1) = 1 - 2/5")
    assert(math.abs(r(1)._4 - 0.3) < 1e-6, "S(3) = 0.6 * (1 - 1/2)")
  }

  test("hbos: the rare-bin row wins the outlier ranking") {
    val rows = (1 to 99).map(i => (i.toLong, 10.0 + (i % 10) * 0.1, "common")) :+
      (100L, 1000.0, "rare")
    val df = rows.toDF("id", "v", "cat")
    val top = graft.operators.Profiler.hbosTopK(df, "id",
      numFeatures = Seq("v"), catFeatures = Seq(("cat", col("cat"))),
      bins = 10, k = 3).select("id").as[Long].collect()
    assert(top.head == 100L, "lone extreme value + lone category scores highest")
  }

  test("benjamini-hochberg: step-up keeps everything below the largest passing rank") {
    // m=4, alpha=1/10: thresholds r/40 = .025 .05 .075 .1
    // p = .001 .07 .06 .5 -> sorted .001 .06 .07 .5; rank3 p=.07<=.075
    // passes, so ranks 1..3 are discoveries even though rank2 (.06>.05)
    // fails its own threshold — the step-up subtlety.
    val tests = Seq(("a", 1000L), ("b", 70000L), ("c", 60000L), ("d", 500000L))
      .toDF("k", "p6")
    val r = graft.operators.Profiler.bhAdjust(tests, Seq("k"), 1L, 10L)
      .select("k", "discovery").as[(String, Boolean)].collect().toMap
    assert(r == Map("a" -> true, "b" -> true, "c" -> true, "d" -> false))
  }

  test("neyman: allocations sum to budget and favor the high-variance stratum") {
    val rows = (1 to 50).map(i => ("flat", i.toLong, 100L)) ++
      (51 to 100).map(i => ("spread", i.toLong, if (i % 2 == 0) 10L else 500L))
    val df = rows.toDF("src", "id", "v")
    val r = graft.operators.CorpusMix.neymanAllocate(df, "src", "v", "id", 30L)
      .select("stratum", "alloc", "n_selected").as[(String, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r.values.map(_._1).sum == 30L, "largest-remainder sums exactly to budget")
    assert(r("spread")._1 == 30L && r("flat")._1 == 0L,
      "zero-variance stratum earns nothing under Neyman")
    assert(r("spread")._2 == 30L, "selection honors the allocation")
  }

  test("skyline: dominated points drop, ties and duplicate points survive") {
    val pts = Seq((10L, 1L), (5L, 5L), (5L, 5L), (1L, 10L),
      (4L, 4L), (10L, 1L), (2L, 5L)).toDF("x", "y")
    val r = graft.operators.Skyline.skyline2D(pts, "x", "y", buckets = 4)
      .as[(Long, Long, Long)].collect().toSet
    // (4,4) dominated by (5,5); (2,5) dominated by (5,5); dups counted
    assert(r == Set((10L, 1L, 2L), (5L, 5L, 2L), (1L, 10L, 1L)))
  }

  test("adamic-adar: rare shared neighbor outscores hub, edges excluded") {
    // path 1-2-3 plus hub 9 connected to 4,5,6,7: pair (1,3) shares the
    // degree-2 node 2; pairs under the hub share only degree-4 node 9
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 4L), (9L, 5L), (9L, 6L), (9L, 7L))
      .toDF("u", "v")
    val r = graft.operators.Graphs.adamicAdar(edges, "u", "v")
      .select("id_a", "id_b", "aa").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(r((1L, 3L)) - 1.0 / math.log(2.0)) < 1e-6)
    assert(r((4L, 5L)) < r((1L, 3L)), "hub-mediated pairs score lower")
    assert(!r.contains((1L, 2L)), "existing edges are never predicted")
  }

  test("fd discovery: a real dependency holds, a violated one reports its mass") {
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"), (4L, "b", "z"))
      .toDF("id", "k", "v")
    val r = graft.operators.Validate.fdDiscovery(df,
      Seq(("id", "k"), ("k", "v")))
      .select("lhs", "n_violating_groups", "n_violating_rows", "holds")
      .as[(String, Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    assert(r("id") == ("id", 0L, 0L, true))
    assert(r("k") == ("k", 1L, 3L, false), "group 'a' maps to two values over 3 rows")
  }

  test("cramers-v: a deterministic mapping scores 1, independence scores ~0") {
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"), ("c", "z"))
      .toDF("p", "q")
    val v1 = graft.operators.Profiler.cramersV(dep, "p", "q")
      .select("v").as[Double].head()
    assert(math.abs(v1 - 1.0) < 1e-6, s"perfect association, got $v1")
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("p", "q")
    val v0 = graft.operators.Profiler.cramersV(ind, "p", "q")
      .select("v").as[Double].head()
    assert(v0 < 1e-6, s"exact independence, got $v0")
  }

  test("mi: a source-exclusive term outranks a universal one") {
    val docs = Seq((1L, "zebra common", "s1"), (2L, "zebra common", "s1"),
      (3L, "other common", "s2"), (4L, "other common", "s2"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextIndex.miTermSource(docs, "text", "doc_id",
      "source", k = 3).select("term", "mi").as[(String, Double)].collect()
    val m = r.toMap
    assert(m("zebra") > 0.6 && m("other") > 0.6, "exclusive terms carry ~ln 2 bits")
    assert(m.getOrElse("common", 0.0) < 1e-6, "a term in every doc carries none")
  }

  test("transition entropy: a deterministic cycle scores 0, a fair coin ln 2") {
    val mk = (u: Long, types: Seq[String]) => types.zipWithIndex.map {
      case (t, i) => (u, i.toLong, new java.sql.Timestamp(i * 60000L), t) }
    val ev = (mk(1L, Seq("a", "b", "a", "b", "a", "b", "a", "b", "a")) ++
      mk(2L, Seq("a", "a", "b", "b", "a", "b", "b", "a", "a", "b", "a", "b",
        "b", "a", "a", "b", "b")))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = graft.operators.Paths.transitionEntropy(ev, "user_id", "ts",
      "event_id", "event_type")
      .select("user_id", "cond_entropy").as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.0, "strict alternation is fully predictable")
    assert(r(2L) > 0.6, s"mixed transitions approach ln 2, got ${r(2L)}")
  }

  test("jsd drift: identical groups score ~0, disjoint vocabularies score high") {
    val docs = (1 to 40).map(i => (i.toLong,
      if (i <= 20) "alpha beta gamma delta" else "omega psi chi phi",
      if (i <= 20) "same1" else "diff")) ++
      (41 to 60).map(i => (i.toLong, "alpha beta gamma delta", "same2"))
    val r = graft.operators.Dsir.jsdDrift(docs.toDF("doc_id", "text", "source"),
      "text", "source").select("grp", "jsd").as[(String, Double)].collect().toMap
    assert(math.abs(r("same1") - r("same2")) < 0.02,
      "two groups with the same distribution drift equally (vs the mixed corpus)")
    assert(r("diff") > r("same1") * 0.5 && r("diff") > 0.05,
      s"a disjoint vocabulary drifts far more: $r")
  }

  test("ccf: a shifted copy peaks exactly at its lag") {
    val base = java.time.LocalDate.of(2024, 1, 1)
    val xs = (0 until 30).map(i => (i * 7919) % 13 + 1)
    val daily = xs.zipWithIndex.flatMap { case (v, i) =>
      Seq(("a", java.sql.Date.valueOf(base.plusDays(i)), v.toLong)) ++
        (if (i >= 2) Seq(("b", java.sql.Date.valueOf(base.plusDays(i)),
          xs(i - 2).toLong)) else Nil)
    }.toDF("series", "day", "v")
    val r = graft.operators.Seasonal.ccf(daily, maxLag = 3)
      .select("lag", "ccf").as[(Long, Option[Double])].collect().toMap
    assert(math.abs(r(2L).get - 1.0) < 1e-6, "b trails a by 2 days -> ccf=1 at lag 2")
    assert(r(0L).get < 0.9, "no contemporaneous correlation")
  }

  test("distributed BPE training learns the same merges as the driver-side trainer") {
    val docs = Seq((1L, "lower lower lowest newer newer newer wider"),
      (2L, "low low lowest newest wide wide"))
      .toDF("doc_id", "text")
    val dist = graft.operators.Bpe.distributedMerges(docs, "text", nMerges = 4)
      .orderBy("step").select("sym_a", "sym_b")
      .as[(String, String)].collect().toSeq
    val words = graft.operators.Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val ref = graft.operators.Bpe.trainFromCounts(words, nMerges = 4)
    assert(dist == ref, s"in-plan trainer diverged: $dist vs $ref")
  }

  test("BPE merge fold is left-to-right non-overlapping on runs") {
    // word 'aaa' x5: merge 1 is (a,a) with 10 pairs (two per word). The
    // fold must produce [aa, a, </w>] — so round 2 sees (aa,a):5 and
    // (a,</w>):5, tie-breaking to the lexicographically smaller
    // (a,</w>) AT COUNT 5. An overlapping fold ([aa, aa…]) would break
    // either the pair set or the count.
    val docs = Seq((1L, "aaa aaa aaa aaa aaa")).toDF("doc_id", "text")
    val r = graft.operators.Bpe.distributedMerges(docs, "text", nMerges = 2)
      .orderBy("step").select("sym_a", "sym_b", "pair_count")
      .as[(String, String, Long)].collect().toSeq
    assert(r.head == ("a", "a", 10L))
    assert(r(1) == ("a", "</w>", 5L),
      s"after [aa, a, </w>] the tie at 5 breaks to (a,</w>), got ${r(1)}")
  }

  test("poisson bootstrap: CI brackets the sample mean and tightens with n") {
    val small = (1 to 50).map(i => (i.toLong, 100.0 + (i % 10))).toDF("id", "v")
    val big = (1 to 5000).map(i => (i.toLong, 100.0 + (i % 10))).toDF("id", "v")
    def ci(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Profiler.poissonBootstrapMeanCI(df, "v", "id", reps = 96)
        .select("mean", "lo95", "hi95").as[(Double, Double, Double)].head()
    val (ms, los, his) = ci(small)
    val (mb, lob, hib) = ci(big)
    assert(los <= ms && ms <= his, s"CI brackets the mean: $los $ms $his")
    assert(lob <= mb && mb <= hib)
    assert(hib - lob < his - los, "100x the data gives a tighter interval")
  }

  test("decayed aggregates: fresh events count fully, week-old events half") {
    val now = 1700000000000000L
    val ev = Seq(
      (1L, new java.sql.Timestamp(now / 1000L), "a", 10.0),
      (2L, new java.sql.Timestamp((now - 604800000000L) / 1000L), "b", 10.0))
      .toDF("event_id", "ts", "event_type", "value")
    val gmax = ev.agg(max(unix_micros(col("ts"))).as("gmax"))
    val r = ev.crossJoin(broadcast(gmax))
      .withColumn("w6", floor(exp(lit(-0.6931471805599453d)
        * (col("gmax") - unix_micros(col("ts"))).cast("double")
        / lit(604800000000.0d)) * lit(1e6) + lit(0.5d)).cast("long"))
      .select("event_type", "w6").as[(String, Long)].collect().toMap
    assert(r("a") == 1000000L, "zero age -> weight exactly 1")
    assert(math.abs(r("b") - 500000L) <= 1L, "one half-life -> weight 0.5")
  }

  test("expectation suite: null verdicts are violations; one row per check") {
    val df = Seq[(java.lang.Long, String)]((1L, "ok"), (2L, null), (-5L, "ok"))
      .toDF("v", "s")
    val r = graft.operators.Validate.expectationSuite(df, Seq(
      ("v_positive", col("v") > 0),
      ("s_known", col("s").isin("ok"))))
      .select("check", "n_rows", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    assert(r("v_positive") == ("v_positive", 3L, 1L, false))
    assert(r("s_known") == ("s_known", 3L, 1L, false),
      "a NULL comparison is unknown, and unknown is not a pass")
  }

  test("cuped: a correlated covariate shrinks the adjusted gap, theta is cov/var") {
    // y = 2x + arm-noise: pooled theta ~= 2, adjustment removes the
    // covariate imbalance between arms
    val rows = (1 to 100).map { i =>
      val x = (i % 10) * 100L
      val arm = if (i % 2 == 0) "A" else "B"
      val y = 2 * x + (if (arm == "A") 50L else 0L)
      (arm, x, y)
    }
    val r = graft.operators.Cohorts.cupedAbTest(rows.toDF("arm", "x", "y"), "arm")
      .select("arm", "theta", "mean_y_cuped", "var_reduction")
      .as[(String, Double, Double, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    assert(math.abs(r("A")._2 - 2.0) < 0.05, s"theta ~= slope 2, got ${r("A")._2}")
    assert(r("A")._4.get > 0.9, "a near-deterministic covariate removes >90% variance")
    val gap = math.abs(r("A")._3 - r("B")._3)
    assert(math.abs(gap - 0.5) < 0.05,
      s"adjusted gap isolates the 50-cent arm effect, got $gap")
  }

  test("plan shapes: hbos is scan+broadcast+sort-limit; skyline never sorts the input") {
    val dir = sf()
    val hbos = graft.SparkEntry.queries("q253_hbos")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(hbos.contains("TakeOrderedAndProject"), "top-k must be sort-limit")
    assert(!hbos.contains("SortMergeJoin"),
      "every hbos join must broadcast — a data-sized shuffle join means a count table exploded")
    val sky = graft.SparkEntry.queries("q256_skyline")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!sky.toLowerCase.contains("rangepartitioning"),
      "skyline must not globally sort the input; the sweep runs on pruned candidates")
  }

  test("weighted quantiles: weights shift the median where row quantiles can't see") {
    // values 1..4; value 4 carries 97 of 100 total weight -> every
    // weighted quartile is 4, while the row median would be 2
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 97L))
      .toDF("grp", "v", "w")
    val r = graft.operators.Profiler.weightedQuantiles(df, "grp", "v", "w")
      .select("total_weight", "p1_4", "p1_2", "p3_4")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((100L, 4L, 4L, 4L)))
    // uniform weights reduce to the plain order statistic
    val u = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 1L))
      .toDF("grp", "v", "w")
    val r2 = graft.operators.Profiler.weightedQuantiles(u, "grp", "v", "w")
      .select("p1_4", "p1_2", "p3_4").as[(Long, Long, Long)].head()
    assert(r2 == ((1L, 2L, 3L)), "ceil(p*4) targets -> ranks 1, 2, 3")
  }

  test("topic segments: a mid-document vocabulary shift is a boundary") {
    val twoTopic = (Seq.fill(30)("alpha") ++ Seq.fill(30)("omega")).mkString(" ")
    val oneTopic = Seq.fill(60)("alpha").mkString(" ")
    val docs = Seq((1L, twoTopic), (2L, oneTopic), (3L, "short text"))
      .toDF("doc_id", "text")
    // non-overlapping 10-token blocks: the alpha|omega halves meet at a
    // zero-cosine gap
    val r = graft.operators.TextIndex.topicSegments(docs, "text", "doc_id",
      w = 10, stride = 10, threshold = 0.5)
      .select("doc_id", "n_windows", "n_boundaries")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) == (6L, 1L), "disjoint halves meet at exactly one zero-cos boundary")
    assert(r(2L) == (6L, 0L), "a single-topic doc has identical windows, no dips")
    assert(r(3L) == (0L, 0L), "sub-window docs report zero windows, not errors")
  }

  test("siegel repeated median survives 40% corrupted days where the data demands it") {
    val base = java.time.LocalDate.of(2024, 1, 1)
    // true line y = 3x + 10 on 10 days; days 6..9 are garbage spikes
    val daily = (0 until 10).map { i =>
      val y = if (i >= 6) 1000L + i * 37L else 10L + 3L * i
      ("s", java.sql.Date.valueOf(base.plusDays(i)), y)
    }.toDF("series", "day", "v")
    val r = graft.operators.Seasonal.siegelTrend(daily)
      .select("slope").as[Double].head()
    assert(math.abs(r - 3.0) < 0.2,
      s"per-point medians shrug off 4/10 corrupted days, got slope $r")
  }

  test("t-closeness: a skewed class is flagged, a corpus-like class passes") {
    // corpus anchored by a big 75/25 class; 'fair' mirrors that mix,
    // 'skew' is all-bucket-0. Corpus p0 = (45+15+20)/100 = 0.8, so
    // emd(skew) = |1-0.8| = 0.2, emd(fair) = |0.75-0.8| = 0.05.
    val rows =
      (1 to 60).map(i => ("big", if (i <= 45) 0L else 1L)) ++
      (1 to 20).map(i => ("fair", if (i <= 15) 0L else 1L)) ++
      (1 to 20).map(_ => ("skew", 0L))
    val r = graft.operators.Privacy.tClosenessAudit(rows.toDF("cls", "sv"),
      Seq("cls"), "sv", t = 0.15).select("cls", "emd", "t_ok")
      .as[(String, Double, Boolean)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(!r("skew")._2 && math.abs(r("skew")._1 - 0.2) < 1e-6,
      s"skewed class leaks: $r")
    assert(r("fair")._2 && math.abs(r("fair")._1 - 0.05) < 1e-6,
      "the corpus-like class passes with the exact expected distance")
  }

  test("laplace mechanism: replayable noise, scale tracks 1/epsilon") {
    val df = (1 to 100).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "x")
    def run(eps: Double) = graft.operators.Privacy
      .laplaceNoisyCounts(df, "g", eps, seed = "spec")
      .select("grp", "n", "noise", "noisy_n")
      .as[(String, Long, Double, Long)].collect().sortBy(_._1)
    val a = run(1.0); val b = run(1.0); val tight = run(100.0)
    assert(a.toSeq == b.toSeq, "same seed -> identical release")
    assert(a.map(_._2).sum == 100L)
    a.zip(tight).foreach { case ((_, _, n1, _), (_, _, n100, _)) =>
      assert(math.abs(n100 - n1 / 100.0) < 1e-6,
        "noise scales exactly with 1/epsilon for the same uniform draw") }
    tight.foreach { case (_, n, _, nn) =>
      assert(math.abs(nn - n) <= 1L, "epsilon=100 noise rounds to ~0") }
  }

  test("spearman: monotone nonlinear is exactly 1, reversal is -1, ties stay sane") {
    val up = (1 to 50).map(i => ("up", i.toLong, i.toLong * i * i))
    val dn = (1 to 50).map(i => ("dn", i.toLong, -(i.toLong * i)))
    val r = graft.operators.Profiler.spearman((up ++ dn).toDF("grp", "x", "y"),
      "grp", "x", "y").select("grp", "rho").as[(String, Option[Double])]
      .collect().toMap
    assert(r("up").get == 1.0, "any strictly increasing map has rho exactly 1")
    assert(r("dn").get == -1.0)
    val tied = Seq(("t", 1L, 5L), ("t", 2L, 5L), ("t", 3L, 5L))
      .toDF("grp", "x", "y")
    val rt = graft.operators.Profiler.spearman(tied, "grp", "x", "y")
      .select("rho").as[Option[Double]].head()
    assert(rt.isEmpty, "constant side -> zero rank variance -> null, not NaN")
  }

  test("gains: a perfect ranker captures all positives in the top deciles") {
    // 100 rows, 20 positives, score = label (perfect separation)
    val df = (1 to 100).map(i => (i.toLong,
      if (i <= 20) 1000000L else 500000L, if (i <= 20) 1 else 0))
      .toDF("id", "s6", "y")
    val g = graft.operators.Profiler.cumulativeGains(df, "s6", "y", "id")
      .select("decile", "cum_pos", "gain", "lift")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(g(0) == ((1L, 10L, 0.5, 5.0)), "top decile: half the positives, lift 5")
    assert(g(1) == ((2L, 20L, 1.0, 5.0)), "second decile completes them")
    assert(g(9)._3 == 1.0 && g(9)._4 == 1.0, "full depth always ends at gain=lift=1")
  }

  test("conformal: empirical coverage meets the 1-alpha guarantee") {
    val docs = graft.Tables.load(spark, sf("sf0.01"), "documents")
    val labeled = docs.withColumn("__y",
      when(col("lang") === "en", 1).otherwise(0))
    val (w, b) = graft.operators.QualityModel.train(labeled, "text", "__y",
      iters = 5, lr = 0.5)
    def run(alpha: Double) = {
      val r = graft.operators.QualityModel.conformalSets(labeled, "text",
        "doc_id", "__y", w, b, alpha)
        .select("n_docs", "n_covered", "q_hat")
        .as[(Long, Long, Double)].collect()
      (r.map(_._2).sum.toDouble / r.map(_._1).sum, r.map(_._3).max)
    }
    val (covLoose, qLoose) = run(0.3)
    val (covTight, qTight) = run(0.05)
    assert(covLoose >= 0.55, f"alpha=0.3 keeps most labels, got $covLoose%.3f")
    assert(qTight > qLoose && covTight > covLoose,
      f"smaller alpha widens q_hat and raises coverage: " +
        f"$covLoose%.3f@$qLoose -> $covTight%.3f@$qTight")
    assert(covTight >= 0.88,
      f"alpha=0.05 coverage near its guarantee on this split, got $covTight%.3f")
  }

  test("mann-whitney: separated samples reject, identical samples do not") {
    val sep = ((1 to 40).map(i => (true, 100L + i)) ++
      (1 to 40).map(i => (false, i.toLong))).toDF("a", "v")
    val r1 = graft.operators.Profiler.mannWhitney(sep, col("a"), "v")
      .select("u", "z", "p").as[(Double, Double, Double)].head()
    assert(r1._1 == 1600.0, "complete separation: U = nA*nB")
    assert(r1._2 > 5 && r1._3 < 1e-4, s"strong shift rejects, got $r1")
    val same = ((1 to 40).map(i => (true, i.toLong % 7)) ++
      (1 to 40).map(i => (false, i.toLong % 7))).toDF("a", "v")
    val r2 = graft.operators.Profiler.mannWhitney(same, col("a"), "v")
      .select("z", "p").as[(Double, Double)].head()
    assert(math.abs(r2._1) < 1e-6 && r2._2 > 0.99,
      s"identical tied samples: z=0, p~1, got $r2")
  }

  test("chao1: singletons project unseen species, exhaustive corpora add none") {
    // 4-gram species over 5-token docs: each doc contributes 2 grams
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextIndex.chao1(docs, "text", "doc_id", n = 4)
      .select("v", "v1", "v2", "chao1").as[(Long, Long, Long, Double)].head()
    // grams: 'a b c d'x2, 'b c d e'x2, 'f g h i'x1, 'g h i j'x1
    assert(r == ((4L, 2L, 2L, 5.0)), s"V=4, V1=2, V2=2 -> 4 + 4/4 = 5, got $r")
  }
}
