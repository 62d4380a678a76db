package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Similarity}

/** Round-9 operators on crafted fixtures: label propagation, shot
  * boundaries, LOO nearest-centroid eval. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("label propagation: triangle absorbs its pendant, isolate keeps its label") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val r = Graphs.labelPropagation(edges, "a", "b", nodes, "id", iters = 2)
      .select("node", "community", "csize")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // sync rounds: 1..4 converge to label 1 (min-label tie-breaks),
    // the isolated node 5 stays its own community of one
    assert((1L to 4L).forall(n => r(n) == (1L, 4L)))
    assert(r(5L) == (5L, 1L))
  }

  test("shot boundaries: cuts where the luminance jump exceeds threshold") {
    val frames = Seq(
      (1L, 0L, 10.0), (1L, 1L, 15.0), (1L, 2L, 200.0), (1L, 3L, 205.0),
      (2L, 0L, 50.0)).toDF("media_id", "frame_idx", "mean_gray")
    val r = graft.multimodal.Multimodal.shotBoundaries(frames, threshold = 100.0)
      .select("media_id", "frame_idx", "is_boundary", "shot_id")
      .as[(Long, Long, Boolean, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(r((1L, 0L)) == (false, 0L), "first frame is never a cut")
    assert(r((1L, 1L)) == (false, 0L))
    assert(r((1L, 2L)) == (true, 1L), "185-luma jump cuts")
    assert(r((1L, 3L)) == (false, 1L), "same shot continues")
    assert(r((2L, 0L)) == (false, 0L), "single-frame video: one shot")
  }

  test("LOO centroid eval: separable labels classify, a planted mislabel is flagged") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(1.0f, 0.1f), 0),
      (4L, Array(0.0f, 1.0f), 1), (5L, Array(0.1f, 0.9f), 1),
      (6L, Array(0.0f, 0.9f), 1),
      (7L, Array(1.0f, 0.0f), 1) // planted mislabel: an A point tagged B
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidLooEval(vecs, "vec_id", "embedding", "label")
      .select("vec_id", "correct").as[(Long, Boolean)].collect().toMap
    assert((1L to 6L).forall(r(_)), "clean points classify correctly")
    assert(!r(7L), "the planted mislabel is flagged")
  }

  test("MMR rerank: a duplicate of pick 1 loses to a diverse candidate") {
    // query (1,0); id 10 is the best match, id 11 its exact duplicate,
    // id 12 a diverse direction. Plain top-2 = {10, 11}; MMR must pick
    // {10, 12}: 11's penalty (sim 1.0 to pick 1) sinks it.
    val corpus = Seq(
      (10L, Array(0.99f, 0.141f)), (11L, Array(0.99f, 0.141f)),
      (12L, Array(0.5f, -0.866f))).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val picks = graft.operators.Retrieval
      .mmrRerank(corpus, queries, "vec_id", "embedding", poolK = 3, k = 2)
      .select("pick", "vec_id").as[(Long, Long)].collect().toMap
    assert(picks == Map(1L -> 10L, 2L -> 12L))
  }

  test("CDC chunking: boundaries are content-defined and survive a prefix edit") {
    // reference replay of the boundary rule + chunking, in-test
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def chunksOf(text: String): Seq[Seq[String]] = {
      val tk = text.split(" ", -1).toSeq
      val bs = (2 to tk.length - 2).filter(p =>
        h32(s"${tk(p - 2)} ${tk(p - 1)} ${tk(p)}") % 8 == 0)
      val starts = 0 +: bs.map(_ + 1)
      val ends = bs :+ (tk.length - 1)
      starts.zip(ends).map { case (s, e) => tk.slice(s, e + 1) }
    }
    val base = spark.read.parquet(sf() + "/documents.parquet")
      .orderBy("doc_id").limit(3).select("text").as[String].collect()
      .mkString(" ")
    val shifted = "zzz " + base
    val cA = chunksOf(base)
    val cB = chunksOf(shifted)
    assert(cA.length >= 3, "fixture long enough to have boundaries")
    // the operator agrees with the in-test replay
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val got = graft.operators.Dedup.cdcChunkStats(df, "text", "doc_id")
      .select("doc_id", "n_chunks", "n_dup_chunks")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // global first-occurrence replay over the ordered chunk stream
    val seen = scala.collection.mutable.Set[String]()
    val dups = scala.collection.mutable.Map(1L -> 0L, 2L -> 0L)
    for ((d, cs) <- Seq((1L, cA), (2L, cB)); c <- cs)
      if (!seen.add(c.mkString(" "))) dups(d) += 1
    assert(got(1L) == (cA.length.toLong, dups(1L)))
    assert(got(2L) == (cB.length.toLong, dups(2L)))
    assert(dups(2L) >= (cA.length - 2).toLong, "the shifted copy mostly dedups")
  }

  test("keep-best dedup keeps the higher-scored member, not the smaller id") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river", 1L),
      (2L, "the quick brown fox jumps over the lazy dog near the river", 5L),
      (3L, "entirely unrelated text about shuffle partitions and codegen", 2L)
    ).toDF("doc_id", "text", "qscore")
    val kept = graft.operators.Dedup
      .dedupCorpusKeepBest(docs, "text", "doc_id", "qscore", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), "id 2 wins its cluster on score")
  }

  test("rendezvous sharding: growing the ring moves only the new shard's wins") {
    val keys = (0L until 2000L).toDF("k")
    val r = keys.select(
        graft.etl.DataLayout.rendezvousShard($"k", 8).as("s8"),
        graft.etl.DataLayout.rendezvousShard($"k", 9).as("s9"))
      .as[(Long, Long)].collect()
    assert(r.forall { case (s8, s9) => s9 == s8 || s9 == 8L },
      "a key either stays put or moves to the NEW shard — never laterally")
    val movedFrac = r.count { case (s8, s9) => s8 != s9 }.toDouble / r.length
    assert(movedFrac > 0.05 && movedFrac < 0.18,
      s"~1/9 of keys move, got $movedFrac")
    assert(r.map(_._1).distinct.length == 8, "all 8 shards occupied")
  }

  test("water-filling level: saturation regimes and exact budgets") {
    import graft.operators.CorpusMix.waterFillLevel
    val counts = Seq("de" -> 71L, "zh" -> 74L, "es" -> 80L,
      "fr" -> 82L, "en" -> 193L)
    // nothing saturates: C = floor(350/5)
    assert(waterFillLevel(counts, 350L) == 70L)
    // four strata saturate: C = 420 - 307 = 113
    assert(waterFillLevel(counts, 420L) == 113L)
    assert(counts.map { case (_, n) => math.min(n, 113L) }.sum == 420L)
    // budget covers the corpus: level = max count
    assert(waterFillLevel(counts, 500L) == 193L)
    assert(waterFillLevel(counts, 5000L) == 193L)
    // degenerate: zero budget
    assert(waterFillLevel(counts, 0L) == 0L)
    // selection kept-counts match min(n, C) per stratum
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val kept = graft.operators.CorpusMix
      .waterFillSelect(docs, "lang", "text", "doc_id", 420L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept == Map("de" -> 71L, "zh" -> 74L, "es" -> 80L,
      "fr" -> 82L, "en" -> 113L))
  }

  test("k-core peeling: the triangle survives, the tail chain peels away") {
    // triangle 1-2-3 plus a chain 3-4-5: 4 and 5 never reach degree 2
    // among survivors; peeling needs TWO rounds to remove 4 (degree 2
    // until 5 goes) — exercising the iteration, not just one pass
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val nodes = (1L to 6L).toDF("id")
    val r = graft.operators.Graphs
      .kCore(edges, "a", "b", nodes, "id", k = 2, rounds = 4)
      .select("node", "in_core", "core_deg")
      .as[(Long, Boolean, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert((1L to 3L).forall(n => r(n) == (true, 2L)), "triangle is the 2-core")
    assert((4L to 6L).forall(n => r(n) == (false, 0L)), "chain and isolate peel")
  }

  test("Theil-Sen: one wild outlier day cannot drag the trend") {
    // y = 2x + 1 on 10 days, except day 5 spikes to 1000. The pairwise
    // slope median stays exactly 2, intercept exactly 1 — an OLS fit
    // would be dragged far off both.
    val daily = (0 to 9).map { x =>
      ("s", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.toLong)),
        if (x == 5) 1000L else 2L * x + 1L)
    }.toDF("series", "day", "v")
    val r = graft.operators.Seasonal.theilSen(daily)
      .select("series", "n_days", "slope", "intercept")
      .as[(String, Long, Double, Double)].head()
    assert(r == (("s", 10L, 2.0, 1.0)))
  }

  test("fixed-width source: exact offsets, trim, quarantine, coerce-null") {
    import graft.sources.FixedWidth, FixedWidth.FwField
    import org.apache.spark.sql.types.{LongType, StringType}
    val dir = tmpDir("fw-spec")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/data.txt"),
      ("42        en   00000157\n" + // clean
        "7         de   notanum!\n" + // cast failure -> null field
        "short\n" + // truncated -> quarantined whole
        "1234567890zh   00000001extra trailing junk ok\n")
        .getBytes("UTF-8"))
    val rows = FixedWidth.read(spark, s"$dir/data.txt", Seq(
        FwField("id", 1, 10, LongType), FwField("lang", 11, 5, StringType),
        FwField("n", 16, 8, LongType)))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(rows.contains((Some(42L), Some("en"), Some(157L), None)))
    assert(rows.contains((Some(7L), Some("de"), None, None)),
      "bad numeric coerces to null, row survives")
    assert(rows.contains((None, None, None, Some("short"))),
      "short line quarantines whole")
    assert(rows.contains((Some(1234567890L), Some("zh"), Some(1L), None)),
      "longer-than-width lines parse their declared slice")
  }

  test("pair forensics: counts add up and the witness is the rarest shared gram") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "alpha beta gamma unrelated words here entirely")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = graft.operators.Dedup.explainPairs(docs, "text", "doc_id", pairs)
      .select("id_a", "id_b", "inter", "only_a", "only_b", "rare_shared")
      .as[(Long, Long, Long, Long, Long, String)].head()
    // docs 1/2: 4 shingles each, 3 shared; "alpha beta gamma" also
    // appears in doc 3 (df 3) while the other two shared grams have
    // df 2 — the witness must be the lexicographically first df-2 gram
    assert(r == ((1L, 2L, 3L, 1L, 1L, "beta gamma delta")))
  }

  test("LOO centroid eval: single-member label cannot vote for itself") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.95f, 0.05f), 0),
      (3L, Array(0.0f, 1.0f), 7) // the only member of label 7
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidLooEval(vecs, "vec_id", "embedding", "label")
      .select("vec_id", "pred").as[(Long, Long)].collect().toMap
    assert(r(3L) == 0L, "lone member must be assigned the OTHER label")
  }
}
