package graft

import graft.operators.TextIndex

/** TF-IDF / BM25 scoring on crafted corpora. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple apple banana common common"),
    (2L, "banana cherry common common"),
    (3L, "cherry date common common"),
    (4L, "date elderberry common common")
  ).toDF("doc_id", "text")

  test("tokens lowercases, splits on non-alnum runs, drops empties") {
    val toks = TextIndex.tokens(Seq((9L, "  Hello,  WORLD!! x2 ")).toDF("id", "text"),
      "text", "id").as[(Long, String)].collect().toSeq
    assert(toks == Seq((9L, "hello"), (9L, "world"), (9L, "x2")))
  }

  test("tfidf ranks rare repeated terms above ubiquitous ones") {
    val top = TextIndex.tfidfTopTerms(docs, "text", "doc_id", k = 3)
      .filter($"doc_id" === 1L).orderBy($"rank")
      .select("term", "score").as[(String, Double)].collect().toSeq
    // doc 1: apple tf=3 df=1 -> 3*(ln(5/2)+1) ~ 5.75; common tf=2 df=4 ->
    // 2*(ln(5/5)+1) = 2.0; banana tf=1 df=2 -> ln(5/3)+1 ~ 1.51
    assert(top.map(_._1) == Seq("apple", "common", "banana"))
    assert(math.abs(top.head._2 - 3 * (math.log(5.0 / 2.0) + 1)) < 1e-4)
    assert(top(1)._2 == 2.0, "ubiquitous term gets idf exactly 1")
  }

  test("bm25 ranks the doc with more query-term mass first; k bounds output") {
    val r = TextIndex.bm25TopK(docs, "text", "doc_id", Seq("apple", "banana"), k = 2)
      .orderBy($"rank").select("doc_id", "rank").as[(Long, Long)].collect().toSeq
    assert(r.length == 2)
    assert(r.head == (1L, 1L), s"doc 1 has apple x3 + banana; got $r")
    assert(r(1) == (2L, 2L), "doc 2 has banana only")
  }

  test("bm25 top-k plan is sort+limit, not a global window over the corpus") {
    val plan = TextIndex.bm25TopK(docs, "text", "doc_id", Seq("apple"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("unigram LM score: vocab terms beat OOV; exact hand-computed score") {
    // corpus: 'common' x6, 'rare' x1, others x1 each -> total 12 tokens
    val lm = Seq(
      (1L, "common common common"),
      (2L, "common common common"),
      (3L, "rare alpha beta gamma delta zzz")
    ).toDF("doc_id", "text")
    // vocabSize=1: only 'common' (count 6) is in-vocab; everything else
    // scores the OOV floor ln(1/12)
    val out = TextIndex.unigramScore(lm, "text", "doc_id", vocabSize = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._2 == 3 && out(1L)._3 == r6(math.log(6.0 / 12.0)))
    assert(out(3L)._2 == 6 && math.abs(out(3L)._3 - r6(math.log(1.0 / 12.0))) < 2e-6)
    // typical doc scores strictly higher than the all-OOV doc
    assert(out(1L)._3 > out(3L)._3)
    // scoring pass is a pure per-row expression: no join/exchange in the
    // plan after the model is built
    val plan = TextIndex.unigramScore(lm, "text", "doc_id", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"scoring pass must be scan-local:\n$plan")
  }

  test("heaps law: disjoint vocab fits beta 1, constant vocab fits beta 0") {
    import spark.implicits._
    import graft.operators.TextIndex
    // every token is globally new -> cum_vocab == cum_tokens -> beta = 1
    val fresh = (0L until 40L)
      .map(i => (i, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val c1 = TextIndex.heapsLaw(fresh, "text", "doc_id", buckets = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(c1.length == 4)
    c1.foreach { case (_, t, v, beta) =>
      assert(t == v, "disjoint vocab: curve on the diagonal")
      assert(beta == 1.0, s"beta $beta")
    }
    assert(c1.last._2 == 120L)
    // one word forever -> vocab flat at 1 -> beta = 0
    val stale = (0L until 40L).map(i => (i, "same same same")).toDF("doc_id", "text")
    val c0 = TextIndex.heapsLaw(stale, "text", "doc_id", buckets = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(c0.forall(_._3 == 1L) && c0.forall(_._4 == 0.0))
  }
}
