package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Similarity}

/** Dedup, similarity and text-analysis operator specs on crafted inputs. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),   // exact dup of 1
    (5L, "el gato duerme en la casa de la abuela todos los dias que puede")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val r = Dedup.exact(docs, "text", "doc_id")
    assert(r.count() == 4)
    val dupGroup = r.filter($"n" === 2).collect()
    assert(dupGroup.length == 1 && dupGroup.head.getAs[Long]("keep_id") == 1L)
    val kept = Dedup.exactKeep(docs, "text", "doc_id")
    assert(kept.count() == 4)
    assert(kept.filter($"doc_id" === 4L).isEmpty, "doc 4 deduped away")
  }

  test("minhash LSH finds exact and near duplicates, agrees with true jaccard") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
      bands = 16, rowsPerBand = 2, threshold = 0.5)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 4L)), "exact dup pair found")
    assert(got.contains((1L, 2L)) && got.contains((2L, 4L)), "near-dup pairs found")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc not paired")
    val j14 = pairs.filter($"id_a" === 1L && $"id_b" === 4L)
      .select("jaccard").as[Double].head()
    assert(j14 == 1.0, "identical docs have jaccard 1")
  }

  test("ngram jaccard (exact) matches minhash-verified jaccard values") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toMap2
    val mh = Dedup.minhashPairs(docs, "text", "doc_id", bands = 16, rowsPerBand = 2,
      threshold = 0.5).select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toMap2
    assert(exact.keySet == mh.keySet)
    exact.foreach { case (k, v) => assert(math.abs(mh(k) - v) < 1e-9) }
  }

  test("prefix-filtered setsim join equals the exact all-pairs join") {
    // Lossless prefix filtering: the PPJoin-style candidate rule must
    // reproduce EVERY exact pair at the threshold — on the crafted
    // fixture and on the real corpus slice.
    for ((df, thr) <- Seq((docs, 0.5), (docs, 0.35),
        (spark.read.parquet(sf() + "/documents.parquet"), 0.5))) {
      val exact = Dedup.ngramJaccardPairs(df, "text", "doc_id",
          threshold = thr, maxPostings = Int.MaxValue)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toMap2
      val pp = graft.operators.SetSimJoin.prefixFilteredPairs(
          df, "text", "doc_id", threshold = thr)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toMap2
      assert(pp.keySet == exact.keySet, s"pair sets differ at t=$thr")
      exact.foreach { case (k, v) => assert(math.abs(pp(k) - v) < 1e-9) }
    }
  }

  implicit class Tup3Ops(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("simhash: identical docs at hamming 0, near-dups close, unrelated far") {
    val sh = Dedup.simhash(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(4L), "identical docs -> identical simhash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 8, "near-dups within small hamming distance")
    assert(ham(sh(1L), sh(3L)) > 8, "unrelated docs far apart")
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("contamination flags only docs overlapping the eval set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // heavy overlap
      (2L, "completely unrelated text about database engines and planners"),
      (3L, "the quick brown fox sleeps") // 2 shared 3-grams only
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val flagged = Dedup.contamination(corpus, eval, "text", "doc_id",
        shingleN = 3, minOverlap = 3)
      .select("doc_id", "n_overlap").as[(Long, Long)].collect().toMap
    assert(flagged.keySet == Set(1L), s"got $flagged")
    assert(flagged(1L) >= 6, "doc 1 shares most of its 3-grams")
    // the bloom-pruned plan is output-identical by construction (no false
    // negatives in the prune; exact verify strips false positives)
    val bloomed = Dedup.contaminationBloomPruned(corpus, eval, "text", "doc_id",
        shingleN = 3, minOverlap = 3)
      .select("doc_id", "n_overlap").as[(Long, Long)].collect().toMap
    assert(bloomed == flagged, s"bloom-pruned diverged: $bloomed vs $flagged")
  }

  test("quality classifier: GD training separates planted classes; scoring is scan-only") {
    import graft.operators.QualityModel
    // planted classes: stopword-rich prose vs digit/punct spam — the
    // trainer must find weights separating them from labels alone
    val good = (1 to 60).map(i => (i.toLong,
      s"the quick brown fox $i jumps over the lazy dog and runs to the " +
        "forest in the morning while the sun is high", 1))
    val bad = (61 to 120).map(i => (i.toLong,
      s"$i 0123 4567 89!!! ??? ;;; 999 888 777 !!! 000 111 222;;;", 0))
    val df = (good ++ bad).toDF("id", "text", "label")
    val (w, b) = QualityModel.train(df, "text", "label", iters = 50, lr = 1.0)
    val scored = QualityModel.score(df, "text", w, b)
    val acc = scored
      .filter(($"quality_prob" >= 0.5) === ($"label" === 1))
      .count().toDouble / 120
    assert(acc >= 0.95, s"train accuracy $acc with w=$w b=$b")

    // the 100 TB claim: scoring a real table is scan → project, no
    // Exchange anywhere in the plan
    val plan = QualityModel.score(Tables.load(spark, sf(), "documents"),
      "text", Seq(0.35, 4.0, -8.0, -3.0), -1.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be shuffle-free:\n$plan")
  }

  test("training is bit-reproducible: partitioning cannot wiggle the fitted weights") {
    import graft.operators.QualityModel
    val docs = Tables.load(spark, sf(), "documents")
      .withColumn("label", when($"lang" === "en", 1).otherwise(0))
    // exact-integer gradients: long sums are order-free, so radically
    // different partition layouts MUST produce identical doubles
    val (w1, b1) = QualityModel.train(docs.repartition(1), "text", "label",
      iters = 5, lr = 0.5)
    val (w2, b2) = QualityModel.train(
      docs.repartition(17, $"doc_id"), "text", "label", iters = 5, lr = 0.5)
    assert(w1.map(_.toString) == w2.map(_.toString) && b1.toString == b2.toString,
      s"weights diverged: $w1/$b1 vs $w2/$b2")
    assert(w1.exists(_ != 0.0), "training moved off the origin")
  }

  test("PII scrub redacts emails and phone-shaped runs, leaves text intact") {
    val r = Seq(
      (1L, "mail me at a.b+tag@ex-ample.co.uk or call +44 (0) 7911 123456 now"),
      (2L, "no pii here, just words and the number 42")
    ).toDF("id", "t")
      .select($"id", TextAnalysis.scrubPii($"t").as("c"))
      .as[(Long, String)].collect().toMap
    assert(r(1L).contains("<EMAIL>") && r(1L).contains("<PHONE>"))
    assert(!r(1L).contains("@") && !r(1L).contains("7911"))
    assert(r(1L).startsWith("mail me at ") && r(1L).endsWith(" now"))
    assert(r(2L) == "no pii here, just words and the number 42",
      "short numbers and plain text untouched")
  }

  test("extended PII scrub redacts IPv4, SSN-format, card-format runs") {
    val r = Seq(
      (1L, "from 192.168.0.255 ssn 078-05-1120 card 4111 1111 1111 1111 ok"),
      (2L, "card run 4111111111111111 and version 1.2.3 stays? no: ip-like"),
      (3L, "odometer 123456 and year 2024 survive; 999.999.999.999 is not an ip")
    ).toDF("id", "t")
      .select($"id", TextAnalysis.scrubPiiExtended($"t").as("c"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "from <IP> ssn <SSN> card <CC> ok")
    assert(r(2L).contains("<CC>") && !r(2L).contains("4111111111111111"))
    assert(r(2L).contains("version 1.2.3"), "three-part versions are not IPv4")
    assert(r(3L).contains("odometer 123456") && r(3L).contains("year 2024"),
      "short digit runs survive")
    assert(r(3L).contains("999.999.999.999"), "out-of-range octets are not IPv4")
  }

  test("custom expressions are SQL functions (SparkSessionExtensions)") {
    docs.createOrReplaceTempView("docs_ext")
    val r = spark.sql(
      """SELECT doc_id, size(shingles(text, 3)) AS n_sh,
        |  simhash(text, 2) AS sh, size(minhash_sig(text, 3, 16)) AS k
        |FROM docs_ext""".stripMargin)
      .as[(Long, Int, Long, Int)].collect()
    assert(r.length == 5 && r.forall(_._4 == 16))
    // SQL surface and Scala API are the same expression
    val api = Dedup.simhash(docs, "text", "doc_id").as[(Long, Long)].collect().toMap
    r.foreach { case (id, _, sh, _) => assert(api(id) == sh) }
    // non-literal size argument fails loudly, not silently
    intercept[Exception] {
      spark.sql("SELECT shingles(text, doc_id) FROM docs_ext").collect()
    }
    // round-3 additions: repetition stats and vector pair math in SQL
    val tg = spark.sql(
      "SELECT doc_id, top_gram_stats(text, 2) AS st FROM docs_ext")
      .as[(Long, Seq[Long])].collect()
    assert(tg.forall(_._2.length == 2))
    val cp = spark.sql(
      """SELECT cosine_pair(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       dot_pair(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |                array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS d""".stripMargin)
      .as[(Double, Double)].head()
    assert(cp == ((1.0, 23.0)))
  }

  private val vecs = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f)),   // close to 1
    (3L, Array(0f, 1f, 0f, 0f)),       // orthogonal to 1
    (4L, Array(-1f, 0f, 0f, 0f)),      // opposite of 1
    (5L, Array(1f, 0.01f, 0f, 0f))     // closest to 1
  ).toDF("vec_id", "embedding")

  test("cosine expression is mathematically correct") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(c((1L, 1L)) - 1.0) < 1e-6)
    assert(math.abs(c((1L, 3L))) < 1e-6)
    assert(math.abs(c((1L, 4L)) + 1.0) < 1e-6)
    assert(c((1L, 2L)) > 0.99 && c((1L, 2L)) < 1.0)
  }

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(5L, 2L, 3L), s"expected 5,2,3 got $top")
  }

  test("LSH top-k returns a subset ranked consistently with brute force") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 3).select("vec_id", "cosine")
      .as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", dim = 4, k = 3, planes = 2)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    assert(lsh.nonEmpty, "LSH finds at least one neighbor")
    lsh.foreach { case (id, c) =>
      assert(!brute.contains(id) || math.abs(brute(id) - c) < 1e-9,
        "cosine values agree with brute force")
    }
  }

  test("embedding near-dup finds the close pair only") {
    val nd = Dedup.embeddingNearDup(vecs, "embedding", "vec_id",
      dim = 4, planes = 2, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 5L)) || nd.contains((1L, 2L)), "close pair found")
    assert(!nd.exists(p => p._2 == 4L || p._1 == 4L), "opposite vector not a near-dup")
  }

  test("text analysis: tokens, langid, quality, fingerprint") {
    val r = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text").as("nt"),
      TextAnalysis.langId($"text").as("lang"),
      TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(r(1L)._2 == 14)
    assert(r(1L)._3 == "en", "English detected via stopwords")
    assert(r(5L)._3 == "es", "Spanish detected via stopwords")
    assert(r(1L)._4 == r(4L)._4, "identical docs share fingerprint")
    // fingerprint invariant to case/punct/whitespace noise
    val noisy = Seq((9L, "The  QUICK, brown fox!! jumps over the lazy dog near the river bank today."))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint($"text")).as[String].head()
    assert(noisy == r(1L)._4)
  }

  test("bpe-ish token count counts words and symbols") {
    val n = Seq(Tuple1("hello, world! x2")).toDF("text")
      .select(TextAnalysis.bpeishTokenCount($"text")).as[Long].head()
    // hello , world ! x2 -> 5
    assert(n == 5, s"got $n")
  }

  test("fuzzyPairs blocks, dedupes names, bounds edit distance") {
    val rows = Seq(
      (1L, "cold anvil"), (2L, "old anvil"), (3L, "red anvil"),
      (4L, "cold anvil"),                     // duplicate name: no self-pair
      (5L, "cold widget"), (6L, "gold widget"),
      (7L, "lonely bolt")                     // alone in its block
    ).toDF("id", "name")
    val pairs = graft.etl.EntityResolution.fuzzyPairs(rows, "name",
        org.apache.spark.sql.functions.split($"name", " ").getItem(1), maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pairs == Set(
      ("cold anvil", "old anvil", 1L),
      ("old anvil", "red anvil", 2L),
      ("cold widget", "gold widget", 1L)))
    // "cold anvil" vs "red anvil" is distance 3: excluded by maxDist;
    // cross-block pairs (anvil vs widget) never generated
  }

  test("temperature mixing: quota math, exact selection, alpha monotone") {
    import graft.operators.CorpusMix
    // quota math: alpha=1 is proportional, alpha=0 splits evenly
    val counts = Seq("a" -> 900L, "b" -> 100L)
    assert(CorpusMix.quotas(counts, 1.0, 1, 2) == Map("a" -> 450L, "b" -> 50L))
    assert(CorpusMix.quotas(counts, 0.0, 1, 2) == Map("a" -> 250L, "b" -> 250L))
    // alpha=0.5: sqrt weighting lifts the minority stratum
    val q = CorpusMix.quotas(counts, 0.5, 1, 2)
    assert(q("b") > 50L && q("a") < 450L && q("a") > q("b"))
    // dataframe path: keeps exactly quota rows per stratum, deterministic
    val docs = (1 to 80).map(i =>
      (i.toLong, s"text body $i", if (i <= 60) "big" else "small"))
      .toDF("doc_id", "text", "lang")
    val kept = CorpusMix.temperatureSample(docs, "lang", "text", "doc_id",
      alpha = 0.5, budgetNum = 1, budgetDen = 2)
    val perStratum = kept.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val expected = CorpusMix.quotas(Seq("big" -> 60L, "small" -> 20L), 0.5, 1, 2)
    assert(perStratum == expected.filter(_._2 > 0))
    val again = CorpusMix.temperatureSample(docs, "lang", "text", "doc_id",
      alpha = 0.5, budgetNum = 1, budgetDen = 2)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept.select($"doc_id").as[Long].collect().sorted.toSeq)
  }

  test("sequence packing: next-fit fold, exact fit, oversized doc alone") {
    import graft.operators.SequencePack
    // single shard (ids all ≡ 0 mod 1): weights 10,90,100,150,40,60 at
    // capacity 100 pack as [10+90][100][150][40+60]
    val docs = Seq((0L, 10L), (1L, 90L), (2L, 100L), (3L, 150L),
      (4L, 40L), (5L, 60L)).toDF("doc_id", "w")
    val out = SequencePack.packNextFit(docs, "doc_id", "w", 100L, 1)
      .select($"doc_id", $"bin", $"offset").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(0L -> (0L, 0L), 1L -> (0L, 10L), 2L -> (1L, 0L),
      3L -> (2L, 0L), 4L -> (3L, 0L), 5L -> (3L, 40L)))
    // sharding: bins are per-shard and every doc appears exactly once
    val many = (0L until 40L).map(i => (i, 30L)).toDF("doc_id", "w")
    val sharded = SequencePack.packNextFit(many, "doc_id", "w", 100L, 4)
      .select($"doc_id", $"shard", $"bin").as[(Long, Long, Long)].collect()
    assert(sharded.length == 40 && sharded.map(_._1).distinct.length == 40)
    sharded.groupBy(_._2).values.foreach { rows =>
      // 10 docs of 30 per shard: 3 per bin -> bins 0..3
      assert(rows.map(_._3).toSet == Set(0L, 1L, 2L, 3L))
    }
    // manifest: per-bin doc counts, packed weight, utilization
    val mani = SequencePack.binManifest(docs, "doc_id", "w", 100L, 1)
      .select($"bin", $"n_docs", $"packed_w", $"utilization")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(mani(0L) == (0L, 2L, 100L, 1.0))     // 10+90: full bin
    assert(mani(2L) == (2L, 1L, 150L, 1.5))     // oversized doc alone
    assert(mani(3L) == (3L, 2L, 100L, 1.0))
  }

  test("leakage-guarded split: no near-dup pair straddles train/val") {
    import graft.operators.{CorpusMix, Dedup}
    val d = Tables.load(spark, sf("sf0.001"), "documents")
    val pairs = Dedup.minhashPairs(d, "text", "doc_id",
      bands = 16, rowsPerBand = 2, threshold = 0.35)
    val out = CorpusMix.leakageGuardedSplit(d, "text", "doc_id", pairs)
    val splits = out.select($"id", $"split").as[(Long, String)].collect().toMap
    assert(splits.size == 500)
    // the guarded invariant: every detected near-dup pair is same-side
    pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().foreach {
      case (a, b) => assert(splits(a) == splits(b), s"pair ($a,$b) straddles")
    }
    // the base hash split targets ~10% val; the correction only nudges it
    val nVal = splits.values.count(_ == "val")
    assert(nVal > 20 && nVal < 90, s"val fraction off: $nVal/500")
    // moved rows exist on this corpus and every one belongs to a cluster
    val movedIds = out.filter($"moved").select($"id").as[Long].collect().toSet
    assert(movedIds.nonEmpty)
    val paired = pairs.select($"id_a").union(pairs.select($"id_b"))
      .as[Long].collect().toSet
    assert(movedIds.subsetOf(paired))
  }

  test("dup-span stats: shared spans counted cross-doc, short docs whole-text") {
    import graft.operators.Dedup
    val shared = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens
    val docs = Seq(
      (1L, shared + " tail one uniq1"),       // shares spans with doc 2
      (2L, shared + " tail two uniq2"),
      (3L, (1 to 15).map(i => s"z$i").mkString(" ")), // fully unique
      (4L, "tiny doc"),                        // <10 tokens: whole-text span
      (5L, "tiny doc")                         // exact short dup of 4
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, "text", "doc_id", spanN = 10)
      .select($"doc_id", $"n_spans", $"n_dup_spans", $"keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // docs 1/2: 15 tokens -> 6 windows each; the first 4 windows lie
    // inside the identical 13-token prefix (shared + "tail"), the last 2
    // diverge at "one"/"two"
    assert(out(1L)._2 == 6 && out(2L)._2 == 6)
    assert(out(1L)._3 == out(2L)._3 && out(1L)._3 >= 3)
    assert(out(3L)._3 == 0 && out(3L)._4)
    // whole-text spans of the two short duplicates match each other
    assert(out(4L) == (4L, 1L, 1L, false) && out(5L) == (5L, 1L, 1L, false))
    // plan shape: df counting is an agg + hash join on the uniform span
    // hash — no Window and no Sort anywhere (the window form sorted the
    // whole postings table by span hash)
    val plan = Dedup.dupSpanStats(docs, "text", "doc_id", spanN = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"dupSpanStats must not sort postings:\n${plan.take(1200)}")
  }

  test("epoch mixing: exact quota met via repeats, spread deterministically") {
    import graft.operators.CorpusMix
    // 12 'big' docs + 3 'small' docs, uniform target (alpha=0), full
    // budget: each stratum quota = 7; small must repeat (7 = 2*3 + 1)
    val docs = ((1 to 12).map(i => (i.toLong, s"b $i", "big")) ++
      (13 to 15).map(i => (i.toLong, s"s $i", "small")))
      .toDF("doc_id", "text", "lang")
    val out = CorpusMix.temperatureEpochs(docs, "lang", "text", "doc_id",
      alpha = 0.0, budgetNum = 1, budgetDen = 1)
    val perStratum = out.groupBy($"lang")
      .agg(count(lit(1)).as("rows"), countDistinct($"doc_id").as("docs"),
        max($"epoch").as("maxe"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // big: 7 of 12 docs once; small: all 3 docs, one of them 3 times
    assert(perStratum("big") == ("big", 7L, 7L, 1L))
    assert(perStratum("small") == ("small", 7L, 3L, 3L))
    // per-doc copy counts differ by at most 1 within a stratum
    val smallCopies = out.filter($"lang" === "small").groupBy($"doc_id")
      .count().as[(Long, Long)].collect().map(_._2)
    assert(smallCopies.sorted.toSeq == Seq(2L, 2L, 3L))
  }

  test("mixing treats null stratum as a population, not a dropped error") {
    import graft.operators.CorpusMix
    val docs = Seq(
      (1L, "a 1", "x"), (2L, "a 2", "x"), (3L, "a 3", "x"), (4L, "a 4", "x"),
      (5L, "n 5", null), (6L, "n 6", null), (7L, "n 7", null), (8L, "n 8", null)
    ).toDF("doc_id", "text", "lang")
    val kept = CorpusMix.temperatureSample(docs, "lang", "text", "doc_id",
      alpha = 1.0, budgetNum = 1, budgetDen = 2)
    // alpha=1, half budget: 2 of each stratum INCLUDING the null one
    val byLang = kept.groupBy($"lang").count()
      .as[(Option[String], Long)].collect().toMap
    assert(byLang == Map(Some("x") -> 2L, None -> 2L))
  }
}
