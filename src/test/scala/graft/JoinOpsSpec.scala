package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, SkewJoin}

/** As-of join, salted skew join, and dedup cluster resolution specs. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: most recent right row at or before left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 50.0)
    ).toDF("qkey", "qts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:05:00")),  // equal time -> 101 (inclusive)
      (11L, 1L, ts("2024-01-01 10:07:30")),  // between -> 101
      (12L, 1L, ts("2024-01-01 11:00:00")),  // after all -> 102
      (13L, 2L, ts("2024-01-01 10:00:00")),  // before any quote -> null
      (14L, 3L, ts("2024-01-01 10:00:00"))   // key with no quotes -> null
    ).toDF("trade_id", "tkey", "tts")

    val r = AsOfJoin.asof(trades, quotes, "tkey", "qkey", "tts", "qts",
        rightCols = Seq("price"), rightTieBreak = "qts")
      .select($"trade_id", $"price").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(r(10L).contains(101.0), "equal timestamp is inclusive")
    assert(r(11L).contains(101.0))
    assert(r(12L).contains(102.0))
    assert(r(13L).isEmpty, "left rows before any right row keep null")
    assert(r(14L).isEmpty, "unmatched key keeps null")
  }

  test("asof join ties resolve deterministically by tie-break desc") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "low"),
      (1L, ts("2024-01-01 10:00:00"), 9L, "high")
    ).toDF("k", "rts", "seq", "tag")
    val left = Seq((100L, 1L, ts("2024-01-01 10:30:00"))).toDF("id", "k2", "lts")
    val r = AsOfJoin.asof(left, right, "k2", "k", "lts", "rts",
      rightCols = Seq("tag"), rightTieBreak = "seq")
    assert(r.select("tag").as[String].head() == "high")
  }

  test("salted join result set equals the plain join") {
    val dir = sf("sf0.001")
    val li = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedJoin(li, p, "l_partkey", "p_partkey", saltFactor = 4)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(plain == salted)
    // NoProbe skips the sampling jobs and must plan the plain join
    val noProbe = SkewJoin.saltedJoin(li, p, "l_partkey", "p_partkey",
      probe = SkewJoin.NoProbe)
    assert(!noProbe.queryExecution.executedPlan.toString.contains("__salt"))
    assert(noProbe.groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap == plain)
  }

  test("saltedJoin on a deliberately skewed key matches the plain join") {
    // one hot key (0) holds half the big side; small side is a dimension
    val big = spark.range(0, 20000)
      .select((when($"id" % 2 === 0, 0L).otherwise($"id" % 50)).as("k"), $"id".as("payload"))
    val small = spark.range(0, 50).select($"id".as("sk"), concat(lit("d"), $"id").as("name"))
    val plain = big.join(small, $"k" === $"sk")
      .groupBy("name").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    // sampled hot-key detection (full sample -> deterministic: key 0 is hot)
    val sampled = SkewJoin.saltedJoin(big, small, "k", "sk",
        saltFactor = 4, sampleFraction = 1.0)
      .groupBy("name").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(sampled == plain)
    // caller-supplied hot keys take the same two-path shape
    val supplied = SkewJoin.saltedJoin(big, small, "k", "sk",
        saltFactor = 4, hotKeys = Seq(0L))
      .groupBy("name").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(supplied == plain)
  }

  test("interval join matches the naive range predicate, end-exclusive") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 100L))
      .toDF("pid", "t")
    val ivals = Seq((10L, 10L, 20L), (20L, 0L, 6L), (30L, 90L, 95L))
      .toDF("iid", "s", "e")
    val got = operators.RangeJoin.intervalJoin(points, ivals, "t", "s", "e", bucket = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivals, $"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 20L), (2L, 10L), (3L, 10L)), "end-exclusive: t=20 not in [10,20)")
    // an interval wider than maxBuckets*bucket fails fast instead of
    // silently dropping matches
    val tooWide = Seq((9L, 0L, 1000L)).toDF("iid", "s", "e")
    intercept[Exception] {
      operators.RangeJoin.intervalJoin(points, tooWide, "t", "s", "e",
        bucket = 7L, maxBuckets = 4).count()
    }
    // inverted/empty intervals match nothing (and must not replicate
    // through a descending bucket sequence)
    val inverted = Seq((8L, 1000L, 0L), (7L, 5L, 5L)).toDF("iid", "s", "e")
    assert(operators.RangeJoin.intervalJoin(points, inverted, "t", "s", "e",
      bucket = 7L).isEmpty)
  }

  test("interval join is exact above 2^53 (epoch-nanos range)") {
    // double-based floor(x/bucket) rounds above 2^53 and can put a point
    // and its interval in different buckets; the integer floor-division
    // bucket id must keep them co-bucketed. Values straddle 2^53 where
    // double representation gaps are 2.
    val base = 9007199254740992L // 2^53
    val points = (0L until 40L).map(i => (i, base + i)).toDF("pid", "t")
    val ivals = (0L until 20L).map(i => (i, base + 2 * i, base + 2 * i + 3))
      .toDF("iid", "s", "e")
    val got = operators.RangeJoin.intervalJoin(points, ivals, "t", "s", "e", bucket = 5L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivals, $"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive && naive.nonEmpty)
    // negative values floor (not truncate) toward -infinity
    val negP = Seq((1L, -3L), (2L, -11L)).toDF("pid", "t")
    val negI = Seq((1L, -5L, -1L), (2L, -12L, -10L)).toDF("iid", "s", "e")
    val gotNeg = operators.RangeJoin.intervalJoin(negP, negI, "t", "s", "e", bucket = 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(gotNeg == Set((1L, 1L), (2L, 2L)))
    // non-integral time columns fail fast instead of silently truncating
    intercept[IllegalArgumentException] {
      operators.RangeJoin.intervalJoin(
        points.withColumn("t", $"t".cast("double")), ivals, "t", "s", "e", 5L)
    }
  }

  test("saltedJoin works when both sides name the key identically") {
    val big = spark.range(0, 1000)
      .select((when($"id" % 2 === 0, 0L).otherwise($"id" % 10)).as("k"), $"id".as("payload"))
    val small = spark.range(0, 10).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val n = operators.SkewJoin.saltedJoin(big, small, "k", "k", hotKeys = Seq(0L)).count()
    val plain = big.join(small, big("k") === small("k")).count()
    assert(n == plain)
  }

  test("saltedJoin survives an empty or all-null big side") {
    val emptyBig = spark.range(0).select($"id".as("k"), $"id".as("payload"))
    val small = spark.range(0, 5).select($"id".as("sk"), concat(lit("d"), $"id").as("name"))
    assert(operators.SkewJoin.saltedJoin(emptyBig, small, "k", "sk").isEmpty)
    val nullBig = spark.range(0, 10)
      .select(lit(null).cast("long").as("k"), $"id".as("payload"))
    assert(operators.SkewJoin.saltedJoin(nullBig, small, "k", "sk").isEmpty)
  }

  test("clusters uses reliable checkpoint storage when configured") {
    val dir = tmpDir("ckpt")
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      val cl = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
      assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      assert(new java.io.File(dir).listFiles().nonEmpty, "checkpoint files written to reliable storage")
    } finally spark.conf.unset("spark.graft.checkpoint.dir")
  }

  test("dedupCorpus keeps one survivor per near-dup group") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "completely different content about spark query engines and shuffles"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (5L, "el gato duerme en la casa de la abuela todos los dias que puede")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "text", "doc_id", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L), s"got $kept")
  }

  test("dedupCorpusKeepBest keeps the highest-scoring member, ties to min id") {
    import graft.operators.Dedup
    val dup = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, dup, 5L),
      (2L, dup, 9L), // best of the {1,2,4} cluster
      (3L, "completely different content about spark query engines and shuffles", 1L),
      (4L, dup, 7L),
      (5L, "el gato duerme en la casa de la abuela todos los dias que puede", 2L)
    ).toDF("doc_id", "text", "score")
    val kept = Dedup.dedupCorpusKeepBest(docs, "text", "doc_id", "score",
        threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 5L), s"got $kept")
    // tie on score -> smallest id survives
    val tied = Seq((7L, dup, 4L), (6L, dup, 4L), (8L, dup, 3L))
      .toDF("doc_id", "text", "score")
    val keptTied = Dedup.dedupCorpusKeepBest(tied, "text", "doc_id", "score",
        threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTied == Set(6L), s"got $keptTied")
  }

  test("dropped stop-shingle buckets are counted, not silent") {
    // 30 identical docs: every band bucket holds 30 rows; maxBucket=10
    // drops them all (correct policy) and the recorded stats must say so
    val docs = (1L to 30L).map(i => (i, "the same boilerplate text again and again"))
      .toDF("doc_id", "text")
    val pairs = operators.Dedup.minhashPairs(docs, "text", "doc_id",
      bands = 16, rowsPerBand = 2, threshold = 0.35, maxBucket = 10)
    assert(pairs.isEmpty, "all buckets over the cap -> no candidates")
    val stats = operators.Dedup.bucketStats("graft.dedup.minhash.buckets").get
    assert(stats.droppedRows == 16L * 30, s"16 bands x 30 docs all dropped, got $stats")
    assert(stats.maxBucketSize == 30L, s"got $stats")
    // under a sufficient cap the same corpus records zero drops
    operators.Dedup.minhashPairs(docs, "text", "doc_id",
      bands = 16, rowsPerBand = 2, threshold = 0.35, maxBucket = 100).count()
    val ok = operators.Dedup.bucketStats("graft.dedup.minhash.buckets").get
    assert(ok.droppedRows == 0L && ok.maxBucketSize == 30L, s"got $ok")
  }

  test("star contraction handles deep chains label propagation refuses") {
    // a path graph of diameter 120: label propagation would need 120
    // rounds (maxIter 50 -> refuses loudly); star contraction converges
    // in O(log n) rounds
    val path = (0L until 120L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] { operators.Dedup.clusters(path).collect() }
    val labels = operators.Dedup.clustersStar(path)
      .as[(Long, Long)].collect()
    assert(labels.length == 121)
    assert(labels.forall(_._2 == 0L), "every chain node labels to the min id")
    // and on a multi-component graph it agrees with label propagation
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("id_a", "id_b")
    val a = operators.Dedup.clusters(pairs).as[(Long, Long)].collect().toSet
    val b = operators.Dedup.clustersStar(pairs).as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("cluster resolution: transitive pairs collapse to one cluster") {
    // 1-2, 2-3, 3-4 chain + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val c = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(Set(1L, 2L, 3L, 4L).map(c) == Set(1L), "chain collapses to min id")
    assert(Set(10L, 11L).map(c) == Set(10L))
    val resolved = Dedup.resolve(pairs)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(resolved(1L) == (4L, 1L), "cluster 1: 4 members, survivor 1")
    assert(resolved(10L) == (2L, 10L))
  }

  test("interval overlap join: dedup across buckets, key isolation, end-exclusive") {
    import graft.operators.RangeJoin
    val left = Seq(
      (1L, "L1", 0L, 250L),   // spans buckets 0,1,2 (bucket=100)
      (1L, "L2", 300L, 400L),
      (2L, "L3", 0L, 250L)    // other key: must not pair with key-1 rights
    ).toDF("k", "lid", "ls", "le")
    val right = Seq(
      (1L, "R1", 50L, 260L),  // overlaps L1 in buckets 0,1,2 -> ONE match
      (1L, "R2", 400L, 500L), // touches L2 at 400 (end-exclusive): no match
      (1L, "R3", 390L, 395L)  // inside L2
    ).toDF("k", "rid", "rs", "re")
    val r = RangeJoin.intervalOverlapJoin(left, right, Seq("k"),
      "ls", "le", "rs", "re", bucket = 100L, maxBuckets = 16)
    val got = r.select("lid", "rid").as[(String, String)].collect().toSet
    assert(got == Set(("L1", "R1"), ("L2", "R3")))
    // multi-bucket pair counted exactly once
    assert(r.filter($"lid" === "L1").count() == 1L)
  }
}
