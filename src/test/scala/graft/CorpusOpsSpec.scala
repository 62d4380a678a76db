package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextIndex, Validate}

/** Round-4 corpus/validation operators on crafted inputs: line-level
  * dedup, collocation mining, label centroids, table checksums. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashThresholdSample: zero-sort plan, binomially-accurate quotas, deterministic") {
    import graft.operators.CorpusMix
    // synthetic two-strata corpus big enough for tight binomial bounds
    val docs = spark.range(0L, 12000L)
      .select($"id".as("doc_id"),
        when($"id" < 10000L, "big").otherwise("small").as("src"),
        concat(lit("document text number "), $"id").as("text"))
    val out = CorpusMix.hashThresholdSample(docs, "src", "text", "doc_id",
      alpha = 0.5, budgetNum = 1, budgetDen = 2)
    // THE claim: membership is a scan predicate — no window, no sort,
    // no shuffle beyond the tiny stratum-counts pass
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.toLowerCase.contains("sort"), s"sort in plan:\n$plan")
    // kept counts land binomially close to the exact quotas
    val kept = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val q = CorpusMix.quotas(Seq("big" -> 10000L, "small" -> 2000L),
      alpha = 0.5, budgetNum = 1, budgetDen = 2)
    q.foreach { case (s, qs) =>
      val k = kept.getOrElse(s, 0L)
      assert(math.abs(k - qs) <= qs / 10,
        s"stratum $s kept $k vs quota $qs (>10% off)")
    }
    // content-hash determinism: a re-run (different row order) keeps
    // the exact same id set
    val again = CorpusMix.hashThresholdSample(
      docs.orderBy($"doc_id".desc), "src", "text", "doc_id",
      alpha = 0.5, budgetNum = 1, budgetDen = 2)
    assert(out.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    // a quota >= stratum size caps the threshold and keeps everything
    val all = CorpusMix.hashThresholdSample(docs, "src", "text", "doc_id",
      alpha = 0.5, budgetNum = 1, budgetDen = 1)
    assert(all.filter($"src" === "small").count() == 2000L,
      "alpha<1 over-quota stratum keeps all rows")
  }

  test("exact samplers: threshold-prune feeds the rank window, selection identical") {
    import graft.operators.CorpusMix
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Window => LWindow}
    import org.apache.spark.sql.expressions.Window
    val docs = spark.range(0L, 12000L)
      .select($"id".as("doc_id"),
        when($"id" < 10000L, "big").otherwise("small").as("src"),
        concat(lit("document text number "), $"id").as("text"))
    val nullSrc = coalesce($"src", lit("__null__"))
    val counts = Seq("big" -> 10000L, "small" -> 2000L)

    val out = CorpusMix.temperatureSample(docs, "src", "text", "doc_id",
      alpha = 0.5, budgetNum = 1, budgetDen = 10)

    // THE plan claim: every rank window sits on top of the hash-threshold
    // candidate filter — no whole-stratum sort anywhere
    val lp = out.queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty, s"expected a boundary-rank window:\n$lp")
    windows.foreach { w =>
      val pruned = w.child.collect {
        case f: LFilter if f.condition.toString.contains("element_at") &&
          f.condition.toString.contains("md5") => f
      }
      assert(pruned.nonEmpty, s"window not fed by a threshold filter:\n$lp")
    }
    // and the pruning is real: candidates are a small fraction of the corpus
    val q = CorpusMix.quotas(counts, 0.5, 1, 10)
    val cand = CorpusMix.prunedStratumRank(docs, "src", "text", "doc_id",
      q, counts.toMap)
    val nCand = cand.count()
    assert(nCand < 3000L && nCand >= q.values.sum,
      s"candidates $nCand vs quotas ${q.values.sum} of 12000 rows")

    // selection identical to the full-stratum window sort it replaced
    val fullW = Window.partitionBy(nullSrc)
      .orderBy(md5($"text").asc, $"doc_id".asc)
    val ref = docs
      .withColumn("quota", element_at(typedLit(q), nullSrc))
      .withColumn("rk", row_number().over(fullW).cast("long"))
      .filter($"rk" <= $"quota")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      ref.select("doc_id").as[Long].collect().sorted.toSeq)
    assert(out.columns.contains("quota"))

    // epochs: base copies + ranked boundary == the single-window schedule
    val qe = CorpusMix.quotas(counts, 0.0, 1, 1)
    val epochs = CorpusMix.temperatureEpochs(docs, "src", "text", "doc_id",
      alpha = 0.0, budgetNum = 1, budgetDen = 1)
    val refEpochs = docs
      .withColumn("rk", row_number().over(fullW).cast("long"))
      .withColumn("quota", element_at(typedLit(qe), nullSrc))
      .withColumn("n_stratum", element_at(typedLit(counts.toMap), nullSrc))
      .withColumn("copies", expr("quota DIV n_stratum") +
        when($"rk" <= pmod($"quota", $"n_stratum"), 1L).otherwise(0L))
      .filter($"copies" > 0)
      .withColumn("epoch", explode(sequence(lit(1L), $"copies")))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"epoch").as[(Long, Long)].collect().sorted.toSeq
    assert(pairs(epochs) == pairs(refEpochs))

    // per-source cap: same rows as the full-window cap
    val capped = CorpusMix.perSourceCap(docs, "src", "text", "doc_id", k = 40L)
    val refCap = docs.withColumn("rk", row_number().over(fullW).cast("long"))
      .filter($"rk" <= 40L)
    assert(capped.select("doc_id").as[Long].collect().sorted.toSeq ==
      refCap.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("line dedup drops cross-doc duplicate lines, keeps canonical copy") {
    // 4-word lines; docs 1 and 2 share their first line exactly;
    // doc 1 also repeats a line INTERNALLY (df=1 -> kept twice).
    val docs = Seq(
      (1L, "a b c d x y z w a b c d"),
      (2L, "a b c d q r s t"),
      (3L, "only unique words here")
    ).toDF("doc_id", "text")
    val r = Dedup.lineDedup(docs, "text", "doc_id", wordsPerLine = 4)
      .orderBy("doc_id").collect()
    val rows = r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq
    assert(rows == Seq(
      (1L, 3L, 3L, "a b c d x y z w a b c d"), // canonical owner keeps all
      (2L, 2L, 1L, "q r s t"),                 // shared line removed here
      (3L, 1L, 1L, "only unique words here")))
  }

  test("line dedup: short doc becomes a single whole-text line") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val r = Dedup.lineDedup(docs, "text", "doc_id", wordsPerLine = 8)
      .orderBy("doc_id").collect()
    assert(r.map(_.getString(3)).toSeq == Seq("tiny doc", ""))
  }

  test("collocations rank adjacent pairs by lift, exact counts") {
    // "new york" always adjacent (lift high); "the the" frequent but
    // independent tokens (lift ~ low); minCount prunes rare pairs
    val docs = Seq(
      (1L, "new york new york new york new york new york"),
      (2L, "the a the b the c the d the e the f the g the h")
    ).toDF("doc_id", "text")
    val r = TextIndex.collocations(docs, "text", "doc_id", minCount = 4L, k = 10)
      .collect()
    val byPair = r.map(x => (x.getString(0), x.getString(1)) ->
      (x.getLong(2), x.getDouble(5))).toMap
    assert(byPair.contains(("new", "york")) && byPair(("new", "york"))._1 == 5L)
    assert(!byPair.keys.exists(_ == ("york", "new")) ||
      byPair(("york", "new"))._1 == 4L) // 4 wrap-around adjacencies
    // lift of a perfectly-coupled pair ~ N/(n_a*n_b)*n_ab: here
    // n_new = n_york = 5, N = 26 tokens total, so lift = 5*26/25 = 5.2
    assert(byPair(("new", "york"))._2 == 5.2)
  }

  test("label centroids: exact integer pooling and dispersion bounds") {
    // label 0: two identical vectors -> every cosine vs centroid is 1;
    // label 1: two opposite vectors -> centroid is 0-ish but NOT exactly
    //   zero (quantization of .1 keeps it nonzero); use orthogonal pair
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f), 1), (4L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelCentroids(vecs, "vec_id", "embedding", "label")
      .orderBy("label").collect()
    val l0 = r(0)
    assert(l0.getLong(1) == 2L && l0.getDouble(3) == 1.0) // avg_cos = 1
    assert(l0.getDouble(2) == 1.0)                        // ||mean|| = 1
    val l1 = r(1)
    // members at 45 degrees from the diagonal centroid: cos = 1/sqrt(2)
    assert(l1.getLong(1) == 2L)
    assert(math.abs(l1.getDouble(3) - 0.707107) < 1e-6)
    assert(l1.getDouble(4) == l1.getDouble(5)) // symmetric: min == max
  }

  test("chunking: sliding windows cover every token, overlap is stride-wide") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, w=4 s=3
      (2L, "short doc")                               // fits one window
    ).toDF("doc_id", "text")
    val r = graft.operators.SequencePack.chunkSliding(docs, "text", "doc_id",
      window = 4, stride = 3).orderBy("doc_id", "chunk_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3))).toSeq
    // ceil((10-4)/3)+1 = 3 chunks; last starts at token 7, 4 tokens
    assert(r == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L),
      (2L, 0L, "short doc", 2L)))
    // uneven tail: 9 tokens -> chunks at 0,3,6 with the last short
    val tail = graft.operators.SequencePack.chunkSliding(
      Seq((1L, (1 to 9).map("w" + _).mkString(" "))).toDF("doc_id", "text"),
      "text", "doc_id", window = 4, stride = 3).collect()
    assert(tail.length == 3 && tail.map(_.getLong(3)).toSeq == Seq(4L, 4L, 3L))
  }

  test("vocab coverage: ranks, cumulative counts, monotone coverage") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val r = graft.operators.TextIndex.vocabCoverage(docs, "text", "doc_id", k = 2)
      .orderBy("rank").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getDouble(4))).toSeq
    assert(r == Seq((1L, "a", 3L, 3L, 0.5), (2L, "b", 2L, 5L, 0.833333)))
  }

  test("checksum is order-independent and detects single-cell drift") {
    val a = Seq((1L, 10L, "x"), (2L, 20L, "x"), (3L, 30L, "y")).toDF("id", "v", "g")
    val b = Seq((3L, 30L, "y"), (1L, 10L, "x"), (2L, 20L, "x")).toDF("id", "v", "g") // reordered
    val c = Seq((1L, 10L, "x"), (2L, 21L, "x"), (3L, 30L, "y")).toDF("id", "v", "g") // one cell off
    def sums(df: org.apache.spark.sql.DataFrame) =
      Validate.checksum(df, Seq(Validate.enc.long(col("id")), Validate.enc.long(col("v"))),
          groupCols = Seq("g"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sums(a) == sums(b))
    assert(sums(a) != sums(c))
    // null encodes differently from zero
    val withNull = Seq((Some(1L), "x"), (None, "x")).toDF("id", "g")
    val withZero = Seq((Some(1L), "x"), (Some(0L), "x")).toDF("id", "g")
    def g(df: org.apache.spark.sql.DataFrame) =
      Validate.checksum(df, Seq(Validate.enc.long(col("id"))), Seq("g"))
        .collect().head.getLong(2)
    assert(g(withNull) != g(withZero))
  }

  test("attrition funnel: sequential stages, one-pass flags") {
    // good docs pass quality (>= 50 words, clean); "bad" fails the word
    // floor; docs 2,3 are exact dups (3 dropped); cap 1/source drops 4
    val good = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, good + " one", "s1"), (2L, good, "s1"), (3L, good, "s1"),
      (4L, good + " four", "s1"), (5L, "too short", "s1")
    ).toDF("doc_id", "text", "source")
    val r = graft.operators.CorpusPipeline
      .attritionReport(docs, "text", "doc_id", "source", perSourceCap = 1)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toMap2
    assert(r("quality") == (5L, 4L), "word-floor failure dropped")
    assert(r("exact_dedup") == (4L, 3L), "one of the twin docs dropped")
    assert(r("source_cap") == (3L, 1L), "cap keeps 1 per source")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("snapshot diff: added/removed/changed/unchanged accounting") {
    val old = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val neu = Seq((2L, 21L), (3L, 30L), (4L, 40L)).toDF("k", "v") // 1 gone, 2 changed, 4 new
    val r = Validate.diff(old, neu, Seq("k"), Validate.enc.long(col("v")))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (1L, 1L, 1L, 1L))
  }

  test("checksum global form and negative-value normalization") {
    val df = Seq(-5L, 5L).toDF("v")
    val r = Validate.checksum(df, Seq(Validate.enc.long(col("v"))))
    val row = r.collect().head
    assert(row.getLong(0) == 2L && row.getLong(1) >= 0L)
  }
}
