package graft

import org.apache.spark.sql.functions._

/** Round-11 second wave on crafted fixtures: Cohen's kappa, NDCG@k,
  * rollup profiling, label-centroid cosine drift, Markov stationary. */
class Round11cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kappa: perfect agreement is 1, disjoint labels go negative") {
    val perfect = Seq(("en", "en"), ("es", "es"), ("en", "en"))
      .toDF("g1", "g2")
    val k1 = graft.operators.Agreement.cohenKappa(perfect, "g1", "g2")
      .select("kappa").as[Double].head()
    assert(k1 == 1.0, s"perfect agreement, got $k1")
    // systematic disagreement: chance-corrected score < 0
    val swapped = Seq(("en", "es"), ("es", "en"), ("en", "es"), ("es", "en"))
      .toDF("g1", "g2")
    val k2 = graft.operators.Agreement.cohenKappa(swapped, "g1", "g2")
      .select("kappa").as[Double].head()
    assert(k2 < 0.0, s"anti-agreement must be negative, got $k2")
  }

  test("kappa: hand-checked 2x2 table") {
    // cells: (a,a)=20 (a,b)=5 (b,a)=10 (b,b)=15; N=50, agree=35
    // rows: a=25 b=25; cols: a=30 b=20; S=25*30+25*20=1250
    // kappa = (50*35-1250)/(50*50-1250) = 500/1250 = 0.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = graft.operators.Agreement
      .cohenKappa(rows.toDF("g1", "g2"), "g1", "g2")
      .select("n_total", "agree_n", "kappa")
      .as[(Long, Long, Double)].head()
    assert(r == ((50L, 35L, 0.4)), s"got $r")
  }

  test("ndcg: score order matching gain order gives exactly 1.0") {
    // d1 holds both terms (rel 2, highest score); d2/d3 tie on rel and
    // on score — both orders break ties by doc_id, so NDCG is exact 1
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "b"), (4L, "c c"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextIndex.ndcgAtK(docs, "text", "doc_id",
        Seq(("q", Seq("a", "b"))), k = 10)
      .select("qid", "n_hits", "ndcg").as[(String, Long, Double)].head()
    assert(r._2 == 3L, s"three docs hit, got ${r._2}")
    assert(r._3 == 1.0, s"ideal ranking scores 1.0, got $r")
  }

  test("ndcg: a long high-rel doc outranked by short low-rel docs") {
    // d1 holds both terms but 200 tokens of padding crush its length
    // norm; d2's dense short hit and the d3/d4 b-hits all outscore it
    // -> actual rank (d2,d3,d4,d1) vs ideal (d1,d2,d3,d4); expected
    // value exact from the shared 9dp weights
    val pad = Seq.fill(200)("z").mkString(" ")
    val docs = Seq((1L, s"a b $pad"), (2L, "a a a a a a"),
      (3L, "b z"), (4L, "b z")).toDF("doc_id", "text")
    val out = graft.operators.TextIndex.ndcgAtK(docs, "text", "doc_id",
        Seq(("q", Seq("a", "b"))), k = 10)
      .select("dcg", "idcg", "ndcg").as[(Double, Double, Double)].head()
    val w = graft.operators.TextIndex.ndcgWeights9(10).toMap
    val dcg9 = 1L * w(1L) + 1L * w(2L) + 1L * w(3L) + 3L * w(4L)
    val idcg9 = 3L * w(1L) + 1L * w(2L) + 1L * w(3L) + 1L * w(4L)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._1 == r6(dcg9 / 1e9), s"dcg, got $out")
    assert(out._2 == r6(idcg9 / 1e9), s"idcg, got $out")
    assert(out._3 == r6(dcg9.toDouble / idcg9.toDouble) && out._3 < 1.0,
      s"swapped ranking NDCG, got $out")
  }

  test("markov: a deterministic alternating chain") {
    val ts = (m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val ev = Seq((1L, ts(1), 10L, "A"), (2L, ts(2), 10L, "B"),
        (3L, ts(3), 10L, "A"), (4L, ts(4), 10L, "B"), (5L, ts(5), 10L, "A"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.operators.Markov
      .stationary(ev, "user_id", "ts", "event_id", "event_type", iters = 4)
      .select("src", "dst", "n", "p", "src_pi")
      .as[(String, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(("A", "B", 2L, 1.0, 0.5), ("B", "A", 2L, 1.0, 0.5)),
      s"got ${r.toSeq}")
  }

  test("centroid cosine: hand-checked 2-d labels") {
    // A: (1,0) x2; B: (0,1) x1 -> global sum (2,1)
    // cos(A) = 2/sqrt(5) = 0.894427..; cos(B) = 1/sqrt(5) = 0.447213..
    val df = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
        (3L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity
      .labelCentroidCosine(df, "embedding", "label")
      .select("label", "n_vecs", "cos_to_corpus", "centroid_norm")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(r(0) == ((0, 2L, 0.894427, 1.0)), s"got ${r(0)}")
    assert(r(1) == ((1, 1L, 0.447214, 1.0)), s"got ${r(1)}")
  }

  test("burst: a planted 3-day spike is labeled, base days are not") {
    val base = java.time.LocalDate.of(2024, 3, 1)
    val daily = (0 until 23).map(i => ("s",
      java.sql.Date.valueOf(base.plusDays(i)),
      if (i >= 20) 50L else 5L)).toDF("series", "day", "v")
    val r = graft.operators.Burst.kleinberg(daily)
      .select("day", "burst").as[(java.sql.Date, Boolean)].collect().toMap
    assert(r.size == 23)
    (0 until 23).foreach { i =>
      val expect = i >= 20
      assert(r(java.sql.Date.valueOf(base.plusDays(i))) == expect,
        s"day $i burst should be $expect")
    }
  }

  test("burst: a flat series never enters the burst state") {
    val base = java.time.LocalDate.of(2024, 3, 1)
    val daily = (0 until 10).map(i => ("s",
      java.sql.Date.valueOf(base.plusDays(i)), 7L)).toDF("series", "day", "v")
    val r = graft.operators.Burst.kleinberg(daily)
      .select("burst").as[Boolean].collect()
    assert(r.length == 10 && r.forall(!_))
  }

  test("label suspects: a mislabeled doc tops the queue") {
    val docs = Seq(
      (1L, "the and of the and", "en"), (2L, "the of and the", "en"),
      (3L, "and the of of", "en"),
      (4L, "el la de el la", "es"), (5L, "la de el la", "es"),
      (6L, "de el la de", "es"),
      (7L, "el la de el la de", "en") // wrong label
    ).toDF("doc_id", "text", "lang")
    val r = graft.operators.LangModel
      .labelSuspects(docs, "doc_id", "text", "lang", k = 5)
      .select("doc_id", "lang_label", "best_guess", "margin")
      .as[(Long, String, String, Double)].collect()
    assert(r.nonEmpty && r.head._1 == 7L && r.head._3 == "es",
      s"doc 7 should lead the queue, got ${r.toSeq}")
    assert(r.head._4 > 0.0, "margin is strictly positive for a flip")
  }

  test("snapshot diff: added and removed rows are exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdiff")
    val root = s"$tmp/t"
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    graft.etl.ManifestTable.publish(spark, root, Map("x" -> v1))
    graft.etl.ManifestTable.deleteWhere(spark, root, "x", col("k") === 2L)
    graft.etl.ManifestTable.appendNew(spark, root, "x",
      Seq((9L, "z")).toDF("k", "s"), key = Seq("k"))
    val d = graft.etl.ManifestTable.snapshotDiff(spark, root, "x", 1L, 3L)
      .select("k", "s", "change").as[(Long, String, String)]
      .collect().sortBy(_._1)
    graft.etl.IncrementalLoad.deleteRecursively(tmp)
    assert(d.toSeq == Seq((2L, "b", "removed"), (9L, "z", "added")),
      s"got ${d.toSeq}")
    // identical snapshots diff to nothing — run against a fresh root
    // is implied by v3 vs v3
  }

  test("dbscan: planted clusters, a border point, and noise") {
    // all angles chosen so each family shares its sign-LSH buckets
    // under the literal splitmix planes (verified against planeRows):
    // cluster A at 0/3/-3 deg, cluster C at 30/33/36, border at 50
    // (one eps-neighbor < minPts), noise at 80 (bucket-mates rescore
    // below tau)
    def v(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    }
    val df = Seq(
      (1L, v(0.0)), (2L, v(3.0)), (3L, v(-3.0)),
      (10L, v(30.0)), (11L, v(33.0)), (12L, v(36.0)),
      (13L, v(50.0)), (20L, v(80.0))).toDF("vec_id", "embedding")
    val r = graft.operators.Dbscan.dbscan(df, "vec_id", "embedding",
        dim = 8, planes = 1, tables = 2, tau = 0.96, minPts = 2)
      .select("vec_id", "role", "cluster_id")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (10L, "core", 10L), (11L, "core", 10L), (12L, "core", 10L),
      (13L, "border", 10L), (20L, "noise", -1L)), s"got ${r.toSeq}")
  }

  test("frequent sequences: hand-counted trigrams with user support") {
    val ts = (m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    // user 10: v c p v c p  -> v>c>p x2, c>p>v x1, p>v>c x1
    // user 20: v c p        -> v>c>p x1
    val ev = (Seq("v", "c", "p", "v", "c", "p").zipWithIndex.map {
      case (e, i) => (i.toLong, ts(i), 10L, e)
    } ++ Seq("v", "c", "p").zipWithIndex.map {
      case (e, i) => (100L + i, ts(i), 20L, e)
    }).toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.operators.Funnel.frequentSequences(ev, "user_id", "ts",
        "event_id", "event_type", n = 3, topK = 10)
      .as[(String, Long, Long)].collect()
    assert(r.head == (("v>c>p", 3L, 2L)), s"got ${r.toSeq}")
    assert(r.toSet == Set(("v>c>p", 3L, 2L), ("c>p>v", 1L, 1L),
      ("p>v>c", 1L, 1L)), s"got ${r.toSeq}")
  }

  test("shingle_rows generator: windows in order, short-text collapse") {
    val df = Seq((1L, "A b c d"), (2L, "x"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("__sg")
    val r = spark.sql(
      "SELECT doc_id, pos, gram FROM __sg " +
        "LATERAL VIEW shingle_rows(text, 2) t AS pos, gram")
      .as[(Long, Int, String)].collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq((1L, 1, "a b"), (1L, 2, "b c"), (1L, 3, "c d"),
      (2L, 1, "x")), s"got ${r.toSeq}")
    // and the plan is a Generate over the UDTF, not explode(array)
    val plan = spark.sql("SELECT gram FROM __sg " +
      "LATERAL VIEW shingle_rows(text, 2) t AS pos, gram")
      .queryExecution.executedPlan.toString
    assert(plan.contains("shingle_rows"), s"generator missing:\n$plan")
  }

  test("log-rank: symmetric groups score 0, separated groups hand-check") {
    val same = Seq((1L, 1L, true, true), (2L, 2L, true, true),
        (3L, 1L, true, false), (4L, 2L, true, false))
      .toDF("subject", "duration_days", "observed", "grp")
    val r0 = graft.operators.Survival.logRank(same, "grp")
      .select("observed1", "expected1", "chi2")
      .as[(Long, Double, Double)].head()
    assert(r0 == ((2L, 2.0, 0.0)), s"got $r0")
    // A dies at t=1 (both), B at t=5: E1 = 1, V = 1/3, chi2 = 3
    val split = Seq((1L, 1L, true, true), (2L, 1L, true, true),
        (3L, 5L, true, false), (4L, 5L, true, false))
      .toDF("subject", "duration_days", "observed", "grp")
    val r1 = graft.operators.Survival.logRank(split, "grp")
      .select("observed1", "expected1", "chi2")
      .as[(Long, Double, Double)].head()
    assert(r1._1 == 2L && r1._2 == 1.0 && r1._3 == 3.0, s"got $r1")
  }

  test("prf: expansion surfaces a doc the seed query cannot reach") {
    val docs = Seq(
      (1L, "alpha beta beta noise1"), (2L, "beta beta gamma noise2"),
      (3L, "alpha noise3"), (4L, "delta epsilon noise4"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextIndex.prfExpandedTopK(docs, "text",
        "doc_id", Seq("alpha"), fbDocs = 2, fbTerms = 1, k = 4)
      .select("doc_id", "rank", "expanded")
      .as[(Long, Long, String)].collect()
    assert(r.head._3 == "beta",
      s"feedback docs 1/3 must mine 'beta', got ${r.head._3}")
    assert(r.map(_._1).contains(2L),
      s"doc 2 (no 'alpha') must enter via expansion: ${r.toSeq}")
  }

  test("cumSums two-pass path keeps NULL-stratum offsets (null-safe join)") {
    val rows = (1 to 300).map(i =>
      (if (i % 3 == 0) null else "g" + (i % 2), i.toLong, (i % 5 + 1).toLong))
    val per = rows.toDF("grp", "v", "w0").groupBy("grp", "v")
      .agg(sum("w0").as("w"))
    def run(threshold: Long) = graft.operators.Ranks.cumSums(per,
        Seq("grp"), "v", Seq(("w", "cw", true)), largeDomain = threshold)
      .select("grp", "v", "cw").as[(String, Long, Long)]
      .collect().sortBy(t => (Option(t._1).getOrElse(""), t._2)).toSeq
    assert(run(1000000L) == run(1L),
      "NULL-group rows must carry cross-partition offsets on both paths")
  }

  test("personalized pagerank: mass stays in the seed component") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L))
      .toDF("src", "dst")
    val r = graft.operators.PageRank.personalized(e, seeds = Seq(1L),
        iters = 4).as[(Long, Double)].collect().toMap
    assert(r(4L) == 0.0 && r(5L) == 0.0,
      s"unreachable nodes must stay exactly 0: $r")
    assert(r(1L) > 0.0 && r(2L) > 0.0 && r(3L) > 0.0)
    assert(r(1L) > r(3L), s"the seed holds the restart mass: $r")
  }

  test("rollup profile covers all three grains with consistent totals") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val r = SparkEntry.queries("q296_rollup_profile")(spark, sf("sf0.001"))
      .select("source", "lang", "gid", "n_docs").collect()
    val total = docs.count()
    val grand = r.filter(_.getLong(2) == 3L)
    assert(grand.length == 1 && grand.head.getLong(3) == total)
    val bySource = r.filter(_.getLong(2) == 1L).map(_.getLong(3)).sum
    val leaves = r.filter(_.getLong(2) == 0L).map(_.getLong(3)).sum
    assert(bySource == total && leaves == total,
      "every grain re-adds to the corpus")
  }
}
