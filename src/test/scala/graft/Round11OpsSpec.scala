package graft

import org.apache.spark.sql.functions._

/** Round-11 fixes on crafted fixtures: engine-exact Kaplan–Meier (no
  * transcendentals anywhere in the plan), Adamic–Adar hub-degree cap,
  * user-level right-censored lifetimes. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kaplan-meier: zero transcendental calls in the analyzed plan") {
    val lt = Seq((1L, 1L, true), (2L, 2L, false), (3L, 3L, true))
      .toDF("subject", "duration_days", "observed")
    val plan = graft.operators.Survival.kaplanMeier(lt)
      .queryExecution.analyzed.toString.toLowerCase
    // libm-dependent ops would reintroduce the q252 portability flake
    assert(!"""\b(log|ln|exp|log10|log2|pow|power)\(""".r
      .findFirstIn(plan).isDefined,
      s"transcendental found in plan:\n$plan")
  }

  test("kaplan-meier: whole-risk-set death pins survival to exactly 0") {
    val lt = Seq((1L, 1L, true), (2L, 2L, true), (3L, 2L, true))
      .toDF("subject", "duration_days", "observed")
    val r = graft.operators.Survival.kaplanMeier(lt)
      .select("t_days", "survival").as[(Long, Double)].collect().toMap
    assert(r(1L) == (1000000L * 2 / 3).toDouble / 1e6, "S(1) = floor grid 2/3")
    assert(r(2L) == 0.0, "n_risk = d zeroes the product, exactly")
  }

  test("user lifetimes: last-week actives are censored, early quitters observed") {
    val ts = (d: Int, h: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    val ev = Seq(
      ("a", ts(1, 9)), ("a", ts(3, 9)),   // last day 3, end 20 -> observed
      ("b", ts(2, 9)), ("b", ts(18, 9)),  // last day 18, gap 2 < 7 -> censored
      ("c", ts(20, 9))                    // defines obs end; gap 0 -> censored
    ).toDF("user_id", "ts")
    val r = graft.operators.Survival.lifetimes(ev, "user_id", "ts",
      censorDays = 7)
      .select("subject", "duration_days", "observed")
      .as[(String, Long, Boolean)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    assert(r("a") == (2L, true))
    assert(r("b") == (16L, false))
    assert(r("c") == (0L, false))
  }

  test("adamic-adar: hub cap drops hub-centered wedges, keeps the rest exact") {
    // path 1-2-3 (center 2, deg 2) + hub 9 over 4..7 (deg 4)
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 4L), (9L, 5L), (9L, 6L), (9L, 7L))
      .toDF("u", "v")
    val capped = graft.operators.Graphs.adamicAdar(edges, "u", "v",
      maxCenterDegree = 3L)
      .select("id_a", "id_b", "aa", "dropped_centers")
      .as[(Long, Long, Double, Long)].collect()
    assert(capped.forall(_._4 == 1L), "the deg-4 hub is counted as dropped")
    val pairs = capped.map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs.keySet == Set((1L, 3L)), "hub-mediated pairs are gone")
    assert(math.abs(pairs((1L, 3L)) - 1.0 / math.log(2.0)) < 1e-6,
      "non-hub wedge score unchanged by the cap")
    val uncapped = graft.operators.Graphs.adamicAdar(edges, "u", "v")
      .select("dropped_centers").as[Long].collect()
    assert(uncapped.forall(_ == 0L), "default cap fires on nothing here")
  }

  test("ranks: two-pass cumulative equals the plain window, no global window") {
    val rows = (1 to 300).map(i =>
      ("g" + (i % 3), (i * 7919 % 97).toLong, (i % 5 + 1).toLong))
    val per = rows.toDF("grp", "v", "w0").groupBy("grp", "v")
      .agg(sum("w0").as("w"))
    def run(threshold: Long) = graft.operators.Ranks.cumSums(per,
        Seq("grp"), "v", Seq(("w", "cw", true), ("w", "cb", false)),
        largeDomain = threshold)
      .select("grp", "v", "cw", "cb").as[(String, Long, Long, Long)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    val small = run(1000000L)
    val big = run(1L)
    assert(small == big, "two-pass path must be bit-identical to the window")
    // above the threshold, no cumulative window may run on ONE partition
    // (contract: the input is a DISTINCT-value grid)
    val perV = per.groupBy("v").agg(sum("w").as("w"))
    val twoPass = graft.operators.Ranks.cumSums(perV, Nil, "v",
      Seq(("w", "cb", false)), largeDomain = 1L)
    val bad = twoPass.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, "large-domain path must not plan a global window")
    // ungrouped exclusive cumsum agrees with a hand computation
    val vals = twoPass.select("v", "cb").as[(Long, Long)].collect()
      .sortBy(_._1).toSeq
    val per2 = perV.select("v", "w").as[(Long, Long)].collect()
      .sortBy(_._1).toSeq
    val expect = per2.map(_._2).scanLeft(0L)(_ + _).init
    assert(vals.map(_._2) == expect)
  }

  test("nb langid: learned word-class association classifies held-in docs") {
    val docs = Seq((1L, "aa bb aa", "x"), (2L, "aa bb", "x"),
      (3L, "cc dd cc", "y"), (4L, "cc dd", "y")).toDF("doc_id", "text", "lang")
    val g = graft.operators.LangModel.naiveBayesGuess(docs, "doc_id",
        "text", "lang")
      .select("doc_id", "lang_label", "lang_guess")
      .as[(Long, String, String)].collect()
    assert(g.length == 4 && g.forall(t => t._2 == t._3),
      s"disjoint vocabularies separate perfectly, got ${g.toSeq}")
  }

  test("graph ann: beam search finds the planted axis-aligned neighbors") {
    // 64 vectors in 8 groups: group g = unit axis 8g with a tiny
    // deterministic per-id jitter on axis 8g+1 — nearest neighbors of
    // any vector are exactly its 7 group-mates
    val vecs = (0 until 64).map { i =>
      val v = Array.fill(64)(0.0f)
      v(8 * (i % 8)) = 1.0f
      v(8 * (i % 8) + 1) = 0.001f * (i / 8 + 1)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val g = graft.operators.GraphAnn.knnGraph(vecs, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 2)
    val seeds = graft.operators.GraphAnn.lshSeeds(vecs,
      vecs.filter(col("vec_id") < 3), "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, entries = Seq(0L, 1L, 2L, 3L))
    val r = graft.operators.GraphAnn.beamTopK(vecs,
        vecs.filter(col("vec_id") < 3), g, seeds, "vec_id", "embedding",
        rounds = 4, beamWidth = 8)
      .filter(col("rank") <= 7)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    for (q <- 0L until 3L)
      assert(r(q) == (0 until 64).filter(i => i % 8 == q && i != q)
        .map(_.toLong).toSet, s"query $q walks to its own group: ${r(q)}")
  }

  test("graph ann recall >= ivf-pq recall on the real embeddings") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val qs = e.filter(col("vec_id") < 5)
    val exact = graft.operators.Similarity.bruteForceTopK(e, qs, "vec_id",
      "embedding", k = 10).select("query_id", "vec_id")
    val g = graft.operators.GraphAnn.knnGraph(e, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 16, refine = 3)
    val seeds = graft.operators.GraphAnn.lshSeeds(e, qs, "vec_id",
      "embedding", dim = 64, planes = 4, tables = 2,
      entries = (0L until 16L).toSeq)
    val ann = graft.operators.GraphAnn.beamTopK(e, qs, g, seeds, "vec_id",
        "embedding", rounds = 8, beamWidth = 32)
      .filter(col("rank") <= 10).select("query_id", "vec_id")
    val pq = graft.operators.Similarity.ivfPqTopK(e, qs, "vec_id",
        "embedding", dim = 64, k = 10, nlist = 16, nprobe = 4,
        m = 8, ksub = 16, pqIters = 1, rerank = 40)
      .select("query_id", "vec_id")
    val gHits = exact.join(ann, Seq("query_id", "vec_id"), "left_semi").count()
    val pqHits = exact.join(pq, Seq("query_id", "vec_id"), "left_semi").count()
    assert(gHits >= pqHits,
      s"graph ANN recall ($gHits/50) must not trail IVF-PQ ($pqHits/50)")
    assert(gHits >= 40L, s"graph corpus recall >= 0.8, got $gHits/50")
  }

  test("compressibility: repetitive docs flag, prose and short docs keep") {
    val docs = Seq(
      (1L, "a b a b a b"),              // 5 windows, 2 distinct -> 0.6
      (2L, "one two three four five"),  // all distinct -> 0.0
      (3L, "word")                      // short text: 1 window, mass 0
    ).toDF("doc_id", "text")
    val r = graft.operators.Dedup.compressibility(docs, "text", "doc_id",
        spanN = 2, maxRepeatMass = 0.1)
      .select("doc_id", "n_windows", "n_distinct", "repeat_mass", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 5L, 2L, 0.6, false)))
    assert(r(2L) == ((2L, 4L, 4L, 0.0, true)))
    assert(r(3L) == ((3L, 1L, 1L, 0.0, true)))
  }

  test("prepare: the opt-in compressibility screen drops cyclic boilerplate") {
    val cycle = (0 until 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$cycle $cycle", "s1"),  // 20 tokens, repeat mass ~0.42, top share ~0.1
      (2L, (0 until 20).map(i => s"u$i").mkString(" "), "s1")
    ).toDF("doc_id", "text", "source")
    val off = graft.operators.CorpusPipeline.prepare(docs, "text", "doc_id",
      "source").select("doc_id").as[Long].collect().toSet
    val on = graft.operators.CorpusPipeline.prepare(docs, "text", "doc_id",
      "source", maxRepeatMass = 0.3).select("doc_id").as[Long].collect().toSet
    assert(off == Set(1L, 2L), "screen off: both docs survive")
    assert(on == Set(2L), "screen on: the cyclic doc drops, prose stays")
  }

  test("ecod: the two-sided tail extreme tops the ranking") {
    // values clustered at 50 with one low and one high extreme; ECOD
    // must rank BOTH tails high (HBOS-style one-sided density would
    // miss a dense-bin edge case, ECOD never does)
    val rows = (1 to 98).map(i => (i.toLong, 50L + (i % 3))) ++
      Seq((99L, 1L), (100L, 999L))
    val df = rows.toDF("id", "v")
    val top = graft.operators.Profiler.ecodTopK(df, "id",
      Seq(("v", col("v"))), k = 2).select("id").as[Long].collect()
    assert(top.toSet == Set(99L, 100L), s"both tails win, got ${top.toSeq}")
  }

  test("hits: the fan-out hub and the shared authority hit exactly 1.0") {
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("s", "d")
    val r = graft.operators.Graphs.hits(edges, "s", "d", iters = 3)
      .select("node", "hub", "authority")
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    assert(r(1L)._1 == 1.0, "node 1 points at everything: max hub")
    assert(r(10L)._2 == 1.0, "node 10 is cited by both hubs: max authority")
    assert(r(10L)._2 > r(11L)._2, "two citers beat one")
    assert(r(10L)._1 == 0.0 && r(1L)._2 == 0.0, "pure hub / pure authority")
  }

  test("winnowing: a shared k+w-1 run leaves a shared fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"omega psi $shared chi phi"),
      (3L, "completely different content with nothing in common here"))
      .toDF("doc_id", "text")
    val ov = graft.operators.Dedup.winnowOverlap(docs, "text", "doc_id",
        k = 8, w = 4, maxDf = 10)
      .select("id_a", "id_b", "n_shared").as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(ov.contains((1L, 2L)) && ov((1L, 2L)) >= 3L,
      s"the shared passage must fingerprint-collide: $ov")
    assert(!ov.contains((1L, 3L)) && !ov.contains((2L, 3L)),
      "disjoint docs share nothing")
  }

  test("rake: multiword phrases outscore their member words") {
    val docs = Seq(
      (1L, "the neural network training of deep neural network models"),
      (2L, "neural network training is the key and neural network wins"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextIndex.rakeKeywords(docs, "text", "doc_id",
        topK = 10)
      .select("phrase", "n_words", "score")
      .as[(String, Long, Double)].collect()
    val byPhrase = r.map(t => t._1 -> t).toMap
    assert(byPhrase.contains("neural network training"),
      s"stopword-delimited phrase extracted: ${r.map(_._1).toSeq}")
    val top = r.maxBy(t => (t._3, t._1))
    assert(top._2 > 1, s"a multiword phrase tops the list, got $top")
    // phrase score is the sum of member word scores -> strictly above
    // any single member's score
    val single = r.filter(_._2 == 1).map(_._3)
    assert(single.forall(_ < top._3))
  }

  test("benford: observed shares and deviations on a hand-checked sample") {
    // first digits: 1 x5, 2 x3, 9 x2 (from cents values)
    val vals = Seq(100L, 150L, 19L, 12L, 1999L, 2L, 25L, 299L, 9L, 90L)
    val df = vals.map(Tuple1(_)).toDF("cents")
    val r = graft.operators.Validate.benfordAudit(df, col("cents"))
      .select("digit", "n", "observed", "expected")
      .as[(Long, Long, Double, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.size == 9, "all nine digits present, zero-count included")
    assert(r(1L)._2 == 5L && r(1L)._3 == 0.5)
    assert(r(2L)._2 == 3L && r(9L)._2 == 2L && r(3L)._2 == 0L)
    assert(math.abs(r(1L)._4 - 0.30103) < 1e-5, "Benford P(1) = log10(2)")
  }

  test("pettitt: a planted level shift is found at the boundary day") {
    val base = java.time.LocalDate.of(2024, 1, 1)
    val daily = (0 until 20).map(i => ("s",
      java.sql.Date.valueOf(base.plusDays(i)),
      if (i < 10) 5L else 50L)).toDF("series", "day", "v")
    val r = graft.operators.Seasonal.pettittChangepoint(daily)
      .select("series", "t_days", "k", "change_day", "p")
      .as[(String, Long, Long, java.sql.Date, Double)].collect().head
    assert(r._2 == 20L)
    assert(r._3 == 100L, s"U peaks at 10x10 crossing pairs, got ${r._3}")
    assert(r._4 == java.sql.Date.valueOf(base.plusDays(9)),
      "the last low day is the change point")
    assert(r._5 < 0.01, s"a clean shift is significant, p=${r._5}")
  }

  test("ppmi: a planted collocation tops the ranking") {
    // "new york" always adjacent; fillers vary so marginals stay low
    val docs = (1 to 30).map(i =>
      (i.toLong, s"w$i new york x$i y$i z$i")).toDF("doc_id", "text")
    val r = graft.operators.TextIndex.ppmiCollocations(docs, "text",
        "doc_id", window = 2, minCount = 5L, topK = 5)
      .select("w1", "w2", "c12", "ppmi")
      .as[(String, String, Long, Double)].collect()
    assert(r.nonEmpty && r.head._1 == "new" && r.head._2 == "york",
      s"the collocation wins, got ${r.toSeq}")
    assert(r.head._3 == 30L, "30 adjacent co-occurrences")
    assert(r.head._4 > 0.0)
  }

  test("lorenz/gini: uniform mass scores 0, the curve is the diagonal") {
    val df = (1 to 10).map(i => (i.toLong, 10L)).toDF("id", "sz")
    val r = graft.operators.Profiler.lorenzGini(df, "sz")
      .select("decile", "cum_doc_share", "cum_mass_share", "gini")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(r.length == 9)
    assert(r.forall(_._4 == 0.0), "equal sizes: zero concentration")
    assert(r.forall(t => t._2 == t._3), "Lorenz curve on the diagonal")
    assert(r(2)._2 == 0.3)
    // one megadoc: bottom 90% of docs hold far less than 90% of mass
    val skew = ((1 to 9).map(i => (i.toLong, 1L)) :+ (10L, 991L))
      .toDF("id", "sz")
    val g = graft.operators.Profiler.lorenzGini(skew, "sz")
      .select("decile", "cum_mass_share", "gini")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(g.last._2 == 0.009 && g.head._3 > 0.85,
      s"bottom 9 docs hold 9/1000 of mass, gini near 1: ${g.toSeq}")
  }

  test("nb langid beats the stopword heuristic on the labeled corpus") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val mOff = graft.operators.LangModel.naiveBayesGuess(docs, "doc_id",
        "text", "lang")
      .filter(col("lang_guess") =!= col("lang_label")).count()
    val hOff = docs.select(col("lang").as("l"),
        graft.functions.TextAnalysis.langId(col("text")).as("g"))
      .filter(col("g") =!= col("l")).count()
    assert(mOff < hOff,
      s"trained model must misclassify fewer docs: model $mOff vs heuristic $hOff")
  }
}
