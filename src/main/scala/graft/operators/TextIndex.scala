package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index text scoring: TF-IDF term weighting and BM25 ranked
  * retrieval over a document corpus — the keyword-search/relevance half of
  * a training-data pipeline (near-dup removal's sibling: finding, not
  * removing, related documents).
  *
  * Public formulas: smoothed TF-IDF (idf = ln((N+1)/(df+1)) + 1, the
  * sklearn smoothing) and Okapi BM25 (Robertson et al.;
  * k1 = 1.2, b = 0.75 defaults).
  *
  * Scale notes (100 TB):
  *  - `tokens` is a generate-only projection — no shuffle; tf aggregation
  *    shuffles on (doc, term) with map-side combine.
  *  - document frequency is a second aggregation keyed on term; the
  *    tf x df join shuffles on term — the standard inverted-index build.
  *    Stop-word-shaped terms skew that shuffle; AQE skew-join handles it,
  *    or prune df > threshold first (they contribute ~zero idf anyway).
  *  - BM25 filters to the query's terms BEFORE aggregating, so the tf
  *    pass touches only posting lists of queried terms; the final top-k
  *    is sort+limit (TakeOrderedAndProject — never a global window), and
  *    rank assignment happens on the k surviving rows.
  *  - corpus-level scalars (N, avgdl) ride along as broadcast one-row
  *    frames, never driver-side collects.
  */
object TextIndex {

  /** Lowercased alphanumeric-run tokenization: one (doc_id, term) row per
    * token occurrence. ANSI-portable (same regex runs in DuckDB). */
  def tokens(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")

  /** Top-k TF-IDF terms per document: (doc_id, term, score, rank).
    * Ranking is over the ROUNDED score (6dp) with term as tie-break, so
    * the order is engine-portable, not float-bit-dependent. */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val toks = tokens(df, textCol, idCol)
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "score", "rank")
  }

  /** Unigram language-model quality score per document — the perplexity-
    * filter shape (CCNet-style pipelines score documents with a reference
    * LM and drop the tail; a unigram model over the corpus itself is the
    * degenerate-but-useful in-engine variant: gibberish and boilerplate
    * both land far from the corpus distribution).
    *
    * Model: the `vocabSize` most frequent terms (count desc, term asc —
    * a deterministic boundary) carry `lp = ln(count/total)` rounded to
    * 6dp; everything else scores the OOV floor `ln(1/total)`. Score =
    * mean token log-prob (higher = more typical).
    *
    * Scale: the model build is one token aggregation (map-side combined)
    * plus a top-V — the only shuffles. The SCORING pass is a per-row
    * expression over a LITERAL vocab map (coalesce(element_at(map, term),
    * oov) folded over the token array): zero shuffle, zero join — the
    * 100 TB path scores documents at scan speed. Output:
    * (doc_id, n_tokens, mean_logp); token-less documents are dropped
    * (they have no distribution to score). */
  def unigramScore(df: DataFrame, textCol: String, idCol: String,
                   vocabSize: Int): DataFrame = {
    val counts = tokens(df, textCol, idCol)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt"))).first().getLong(0)
    def lp(c: Long): Double =
      BigDecimal(math.log(c.toDouble / total.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vocab: Map[String, Double] =
      counts.orderBy(col("cnt").desc, col("term").asc).limit(vocabSize)
        .collect().map(r => r.getString(0) -> lp(r.getLong(1))).toMap
    val oovLp = lp(1L)
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    val lps = transform(toks, t =>
      coalesce(element_at(typedLit(vocab), t), lit(oovLp)))
    // Engine-portable mean: the per-doc sum of 6dp summands is a 1e-6
    // grid point, so rounding the SUM first snaps both engines to the
    // identical double regardless of summation order; the mean then
    // divides a grid point by an integer, which can land EXACTLY on a
    // .5e-6 tie — round() breaks those ties differently across engines
    // (decimal-string vs binary), so use floor(x*1e6 + 0.5)/1e6: pure
    // IEEE ops, one tie rule everywhere.
    val sum6 = round(aggregate(lps, lit(0.0d), _ + _), 6)
    df.select(col(idCol).as("doc_id"),
        size(lps).cast("long").as("n_tokens"),
        (floor(sum6 / size(lps) * lit(1e6) + lit(0.5d)) / lit(1e6))
          .as("mean_logp"))
      .filter(col("n_tokens") > 0)
  }

  /** Vocabulary coverage curve: the `k` most frequent terms with their
    * cumulative corpus coverage — the tokenizer-sizing question ("what
    * fraction of tokens does a V-word vocabulary cover?") answered
    * directly; the marginal coverage of rank V is the OOV-rate knob.
    *
    * Determinism: rank orders by (count desc, term asc); coverage =
    * cumulative count / total on the 6dp grid (exact BIGINTs until the
    * one division).
    *
    * Scale: the token aggregation is the only corpus-sized stage
    * (map-side combined). The top-k cut is sort+limit
    * (TakeOrderedAndProject), and the cumulative window runs over k rows
    * on one partition — k is a constant (vocab candidates), never the
    * corpus. */
  def vocabCoverage(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val counts = tokens(df, textCol, idCol)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    val top = counts.orderBy(col("cnt").desc, col("term").asc).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("cnt").desc, col("term").asc)).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .withColumn("coverage",
        floor(col("cum_cnt").cast("double") / col("n_total").cast("double")
          * lit(1e6) + lit(0.5d)) / lit(1e6))
      .select("rank", "term", "cnt", "cum_cnt", "coverage")
  }

  /** Bigram collocation mining: adjacent-token pairs ranked by LIFT —
    * `n_ab * N / (n_a * n_b)`, the association-strength core of PMI
    * (PMI = log2(lift); lift is rank-equivalent and needs NO transcendental,
    * so engines agree without log-rounding games). The classic vocabulary/
    * phrase-induction pass: high-lift pairs ("new york") are collocations,
    * candidates for merged tokens.
    *
    * Determinism: n_ab, n_a, n_b, N are exact BIGINTs; the double products
    * stay below 2^53 (exact) for corpora under ~10^8 occurrences per term
    * pair product — the one division is a single IEEE op, then the house
    * 6dp grid. Rank ties break on (w1, w2).
    *
    * Scale: pair generation is scan-side (`transform` over the token
    * array — no position self-join); the pair aggregation shuffles
    * (w1, w2) with map-side combine; the two unigram joins key on a
    * vocab-sized frame (broadcast-able in practice — term counts follow
    * Zipf, the frame is tiny next to the corpus); top-k is sort+limit. */
  def collocations(df: DataFrame, textCol: String, idCol: String,
                   minCount: Long = 5L, k: Int = 20): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    val pairs = df.select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__t) - 1)," +
          " i -> struct(element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
    val uni = df.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val total = uni.agg(sum(col("n")).as("n_total"))
    bi.filter(col("n_ab") >= minCount)
      .join(uni.select(col("term").as("w1"), col("n").as("n_a")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("n").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("lift", floor(
        col("n_ab").cast("double") * col("n_total").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))
          * lit(1e6) + lit(0.5d)) / lit(1e6))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc).limit(k)
      .select("w1", "w2", "n_ab", "n_a", "n_b", "lift")
  }

  /** Exact phrase search over a positional inverted index: documents
    * containing the query tokens CONSECUTIVELY, with occurrence counts —
    * the positional-postings query (Manning/IR classic) that bag-of-words
    * retrieval (TF-IDF/BM25 here) cannot answer.
    *
    * Scale: postings are FILTERED to the phrase's terms before any
    * shuffle — only the queried posting lists move, exactly like
    * [[bm25TopK]]'s term filter. The m-way alignment is m-1 equi-joins
    * on (doc_id, adjusted position): posting-list-sized, never corpus-
    * sized; a stop-word-only phrase degrades to the stop-word posting
    * list, which is the inherent cost of positional search (real
    * engines cap or bigram-index those — out of scope here).
    * Output: (doc_id, n_occurrences), matches only. */
  def phraseSearch(df: DataFrame, textCol: String, idCol: String,
                   rawPhrase: Seq[String]): DataFrame = {
    // normalize the query with the SAME rule as the postings (lowercase,
    // alphanumeric runs) — an un-normalized phrase would silently match
    // nothing; a term that is not one token under the rule is an error,
    // not an empty result
    val phrase = rawPhrase.map(_.toLowerCase)
    require(phrase.nonEmpty && phrase.forall(_.matches("[a-z0-9]+")),
      s"each phrase term must normalize to one [a-z0-9]+ token, got: $rawPhrase")
    val postings = df
      .select(col(idCol).as("doc_id"), posexplode(
        filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")))
      .withColumnRenamed("pos", "tp").withColumnRenamed("col", "term")
      .filter(col("term").isin(phrase: _*))
    val first = postings.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("tp"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        val p = postings.filter(col("term") === w)
          .select(col("doc_id"), (col("tp") - i).as("tp"))
        acc.join(p, Seq("doc_id", "tp"))
    }
    aligned.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Zipf-law slope per group: ordinary least squares of ln(freq) on
    * ln(rank) over the top-`k` terms — the corpus-health scalar (natural
    * language sits near -1; templated/boilerplate-heavy or synthetic
    * text drifts off, making this a one-number drift alarm next to
    * [[vocabCoverage]]'s curve).
    *
    * Determinism: x, y, and their products are rounded to the 6dp grid
    * per term BEFORE summing (the q95 grid-sum rule), each sum re-snaps,
    * and the closed-form slope is one fixed IEEE sequence — engines and
    * row orders agree. Ranks order by (count desc, term asc).
    *
    * Scale: the token aggregation is the only corpus-sized stage; the
    * rank window runs per group over TERM COUNTS (vocabulary-sized,
    * aggregated), capped at k rows per group by the filter. Groups with
    * fewer than 10 ranked terms drop (no meaningful fit). */
  def zipfSlope(df: DataFrame, textCol: String, idCol: String,
                groupCol: String, k: Int = 100): DataFrame = {
    val counts = df
      .select(col(groupCol).as("grp"),
        explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")).as("term"))
      .groupBy(col("grp"), col("term")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cnt").desc, col("term").asc)
    val ranked = counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("x", round(log(col("rank")), 6))
      .withColumn("y", round(log(col("cnt")), 6))
      .withColumn("xy", round(col("x") * col("y"), 6))
      .withColumn("xx", round(col("x") * col("x"), 6))
    ranked.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("x")), 6).as("sx"), round(sum(col("y")), 6).as("sy"),
        round(sum(col("xy")), 6).as("sxy"), round(sum(col("xx")), 6).as("sxx"))
      .filter(col("n_terms") >= 10)
      .select(col("grp"), col("n_terms"),
        (floor((col("n_terms") * col("sxy") - col("sx") * col("sy"))
          / (col("n_terms") * col("sxx") - col("sx") * col("sx"))
          * lit(1e6) + lit(0.5d)) / lit(1e6)).as("slope"))
  }

  /** Heaps'-law vocabulary-growth curve and exponent: cumulative
    * distinct-term count vs cumulative token count along ingestion
    * order (smaller id = earlier), sampled at `buckets` id-range
    * checkpoints, with the log-log least-squares slope — Heaps' V(n) =
    * K·n^beta — fitted over the curve (the zipfSlope arithmetic: 6dp
    * grid points, grid sums, floor-grid slope). The growth curve says
    * whether a crawl is still finding new vocabulary or re-reading the
    * same material — the corpus-level twin of [[Dedup.spanNovelty]].
    *
    * Scale: "new terms per checkpoint" needs NO ordered scan — a
    * term's first owner is one min(doc_id) aggregation (the
    * spanNovelty shape); checkpoint totals are a buckets-sized frame
    * and the cumulative window sorts THAT, never the corpus. Output:
    * (bucket, cum_tokens, cum_vocab, heaps_beta) — beta identical on
    * every row. */
  def heapsLaw(df: DataFrame, textCol: String, idCol: String,
               buckets: Int = 20): DataFrame = {
    require(buckets >= 2, "need at least two curve points")
    val toks = df.select(col(idCol).as("doc_id"),
      explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => t =!= "")).as("term"))
    val mx = df.agg(max(col(idCol)).cast("long").as("mx"))
    val bucketOf = (c: Column) =>
      floor(c.cast("long") * lit(buckets) / (col("mx") + lit(1L))).cast("long")
    val tokCounts = toks.crossJoin(broadcast(mx))
      .groupBy(bucketOf(col("doc_id")).as("bucket"))
      .agg(count(lit(1)).as("toks"))
    val firstOwner = toks.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
    val newTerms = firstOwner.crossJoin(broadcast(mx))
      .groupBy(bucketOf(col("fd")).as("bucket"))
      .agg(count(lit(1)).as("nv"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = tokCounts.join(newTerms, Seq("bucket"), "left")
      .na.fill(0L, Seq("nv"))
      .withColumn("cum_tokens", sum(col("toks")).over(w))
      .withColumn("cum_vocab", sum(col("nv")).over(w))
      .select(col("bucket"), col("cum_tokens"), col("cum_vocab"))
    val pts = curve
      .withColumn("x", round(log(col("cum_tokens")), 6))
      .withColumn("y", round(log(col("cum_vocab")), 6))
      .withColumn("xy", round(col("x") * col("y"), 6))
      .withColumn("xx", round(col("x") * col("x"), 6))
    val fit = pts.agg(count(lit(1)).as("np"),
        round(sum(col("x")), 6).as("sx"), round(sum(col("y")), 6).as("sy"),
        round(sum(col("xy")), 6).as("sxy"), round(sum(col("xx")), 6).as("sxx"))
      .select((floor((col("np") * col("sxy") - col("sx") * col("sy"))
        / (col("np") * col("sxx") - col("sx") * col("sx"))
        * lit(1e6) + lit(0.5d)) / lit(1e6)).as("heaps_beta"))
    curve.crossJoin(broadcast(fit))
  }

  /** BM25 top-k documents for a bag-of-terms query:
    * (doc_id, score, rank). score is rounded to 4dp BEFORE ranking (the
    * per-term sum is float-order-dependent in its last bits; ranking on
    * the rounded value with doc_id tie-break is engine-portable). */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(df, textCol, idCol)
    val dlen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dlen.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    // posting lists of the queried terms only — the filter lands before
    // the (doc, term) aggregation, so unqueried terms never shuffle
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf: Column = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm: Column = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val hits = tf.join(broadcast(dfreq), Seq("term"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * norm), 4).as("score"))
    // top-k = sort + limit (TakeOrderedAndProject); the rank window then
    // runs over k rows, not the corpus
    val topk = hits.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    topk.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "score", "rank")
  }

  /** 9dp integer DCG position discounts `round(1e9 / log2(r+1))` for
    * ranks 1..k — computed ONCE driver-side and injected as literals
    * into both the Spark plan and the oracle SQL, so no in-plan
    * transcendental can diverge across engines. */
  def ndcgWeights9(k: Int): Seq[(Long, Long)] =
    (1 to k).map(r => (r.toLong,
      math.floor(1e9 * math.log(2.0) / math.log(r + 1.0) + 0.5).toLong))

  /** NDCG@k retrieval evaluation: grade the BM25 ranking (the q88
    * scorer, unchanged) against graded relevance = number of query
    * terms the document contains — the query-coverage gold standard a
    * synthetic corpus supports without human judgments. One row per
    * query: (qid, n_hits, dcg, idcg, ndcg).
    *
    * Engine-exact: gains `2^rel - 1` via a literal CASE (rel is ≤ the
    * query length), discounts from [[ndcgWeights9]] joined as a
    * broadcast literal table, DCG/IDCG as exact integer sums on the
    * 9dp grid, ONE double division per query at the end. Both the
    * real ranking (rounded score desc, doc_id asc) and the ideal
    * ranking (gain desc, doc_id asc) are engine-portable total orders.
    *
    * Scale: the tf pass filters to the union of query terms BEFORE
    * aggregating (posting lists only — the bm25TopK contract), so the
    * per-qid rank windows run over candidate sets bounded by those
    * posting lists, partitioned by qid. At web scale prune each list
    * to its top-M postings by impact first; the metric only needs
    * ranks ≤ k plus the ideal head. */
  def ndcgAtK(df: DataFrame, textCol: String, idCol: String,
              queries: Seq[(String, Seq[String])], k: Int,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val maxLen = queries.map(_._2.length).max
    val qt = queries.flatMap { case (q, ts) => ts.map(tm => (q, tm)) }
      .toDF("qid", "term")
    val toks = tokens(df, textCol, idCol)
    val dlen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dlen.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf: Column =
      log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm: Column = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val hits = tf.join(broadcast(qt), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(idf * norm), 4).as("score"),
        count(lit(1)).as("rel"))
    // 2^rel - 1 as a literal CASE — rel is bounded by the query length
    val gain = (1 to maxLen).foldLeft(lit(0L)) { (acc, r) =>
      when(col("rel") === r, lit((1L << r) - 1L)).otherwise(acc)
    }
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val wIdeal = Window.partitionBy(col("qid"))
      .orderBy(col("gain").desc, col("doc_id").asc)
    val weights = ndcgWeights9(k).toDF("r", "w9")
    val ranked = hits.withColumn("gain", gain)
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("irank", row_number().over(wIdeal).cast("long"))
    val nh = ranked.groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    val dcg = ranked.filter(col("rank") <= k)
      .join(broadcast(weights), col("rank") === col("r"))
      .groupBy(col("qid")).agg(sum(col("gain") * col("w9")).as("dcg9"))
    val idcg = ranked.filter(col("irank") <= k)
      .join(broadcast(weights), col("irank") === col("r"))
      .groupBy(col("qid")).agg(sum(col("gain") * col("w9")).as("idcg9"))
    nh.join(dcg, Seq("qid")).join(idcg, Seq("qid"))
      .select(col("qid"), col("n_hits"),
        round(col("dcg9").cast("double") / 1e9, 6).as("dcg"),
        round(col("idcg9").cast("double") / 1e9, 6).as("idcg"),
        round(col("dcg9").cast("double") / col("idcg9").cast("double"), 6)
          .as("ndcg"))
  }

  /** Pseudo-relevance feedback (Rocchio shape): run the BM25 query,
    * take the top `fbDocs` documents as presumed-relevant, mine their
    * `fbTerms` strongest non-query terms (feedback tf summed × the
    * BM25 idf, 4dp grid, term tie-break), and re-run BM25 with the
    * EXPANDED term set — the classical recall-repair loop every
    * retrieval stack ships (used here to surface related documents
    * the literal query vocabulary misses).
    *
    * Output: (doc_id, score, rank, expanded) for the final top-k,
    * `expanded` = '|'-joined expansion terms (same on every row — an
    * observability column, the q257 convention).
    *
    * Determinism: both rankings order by (4dp-rounded score, doc_id);
    * expansion terms by (4dp weight, term). Scale: the tf pass of
    * stage 1 touches only the original query's posting lists; stage 2
    * adds the `fbTerms` expansion lists via a broadcast semi-join
    * (the term set is computed in-plan, so no literal isin). Feedback
    * term mining aggregates over fbDocs documents only. */
  def prfExpandedTopK(df: DataFrame, textCol: String, idCol: String,
                      queryTerms: Seq[String], fbDocs: Int, fbTerms: Int,
                      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(df, textCol, idCol)
    // tfAll/dlen/dfreqAll feed BOTH bm25 passes (seed query + expanded)
    // and the Rocchio mining — cut the aggregated (small) frames so the
    // tokenizer explode and its groupBys run once, not once per consumer
    val dlen = Lineage.cut(
      toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl")))
    val stats = dlen.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tfAll = Lineage.cut(toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val dfreqAll = Lineage.cut(
      tfAll.groupBy(col("term")).agg(count(lit(1)).as("df")))
    val idf: Column =
      log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm: Column = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    def bm25Of(termSet: DataFrame): DataFrame =
      tfAll.join(broadcast(termSet), Seq("term"), "left_semi")
        .join(broadcast(dfreqAll.join(broadcast(termSet), Seq("term"),
          "left_semi")), Seq("term"))
        .join(dlen, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy(col("doc_id"))
        .agg(round(sum(idf * norm), 4).as("score"))
    val spark = df.sparkSession
    import spark.implicits._
    val q0 = queryTerms.toDF("term")
    val fb = bm25Of(q0)
      .orderBy(col("score").desc, col("doc_id").asc).limit(fbDocs)
      .select(col("doc_id"))
    // Rocchio term mining: feedback tf mass × idf, original terms out
    val expansion = tfAll.join(broadcast(fb), Seq("doc_id"), "left_semi")
      .groupBy(col("term")).agg(sum(col("tf")).as("__ftf"))
      .join(broadcast(q0), Seq("term"), "left_anti")
      .join(broadcast(dfreqAll), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("term"), round(col("__ftf") * idf, 4).as("__w"))
      .orderBy(col("__w").desc, col("term").asc).limit(fbTerms)
    val expandedList = broadcast(expansion)
      .agg(array_join(array_sort(collect_list(col("term"))), "|")
        .as("expanded"))
    val q1 = q0.unionByName(expansion.select(col("term")))
    bm25Of(q1)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .crossJoin(broadcast(expandedList))
      .select(col("doc_id"), col("score"), col("rank"), col("expanded"))
  }

  /** Per-document Shannon entropy of the word distribution (nats) — the
    * lexical-diversity quality signal: near-zero entropy flags keyword
    * stuffing and template spam that length/stopword rules miss, while
    * natural prose sits near the corpus band.
    *
    * `H = ln(n) - (1/n) Σ_w c_w ln(c_w)` — the per-word terms
    * `c ln c` snap to the 6dp grid as longs, so the inner sum is
    * ORDER-FREE and the whole statistic one fixed IEEE sequence the
    * oracle replays (ln of small integer counts lands identically on
    * the grid across libms).
    *
    * Scale: explode + one (doc, word)-keyed count + one doc-keyed
    * aggregation — uniform hash keys, the q47 repetition-family shuffle
    * shape; only fixed-width stat rows leave the word stage.
    * Output: (doc_id, n_tokens, n_vocab, entropy). */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), " ", -1)).as("w"))
    toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * lit(1e6) + lit(0.5d)).cast("long")).as("__s"))
      .select(col("doc_id"), col("n_tokens"), col("n_vocab"),
        (floor((log(col("n_tokens").cast("double"))
          - col("__s").cast("double") / lit(1e6)
            / col("n_tokens").cast("double"))
          * lit(1e6) + lit(0.5d)) / lit(1e6)).as("entropy"))
  }

  /** Mutual information between term PRESENCE and a document group —
    * the supervised feature-selection screen (which words identify a
    * source?): for each term t, `MI_t = Σ_s Σ_{present,absent}
    * p(x,s) ln(p(x,s)/(p(x)p(s)))` over doc-level presence. All
    * probabilities are ratios of exact integer counts; each of the two
    * per-source components lands on the 6dp grid before an integer
    * sum, so the top-k order is engine-portable.
    *
    * Scale: presence counts are one distinct-explode aggregation
    * shuffled on (term, group); the term×group grid is a JOIN of the
    * two bounded aggregates (never a driver collect); top-k is a
    * sort-limit. */
  def miTermSource(df: DataFrame, textCol: String, idCol: String,
                   groupCol: String, k: Int = 20): DataFrame = {
    val pres = df.select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        explode(array_distinct(split(lower(col(textCol)), "[^a-z0-9]+")))
          .as("term"))
      .filter(col("term") =!= "")
    val nts = pres.groupBy(col("term"), col("grp")).agg(count(lit(1)).as("nts"))
    val nt = nts.groupBy(col("term")).agg(sum(col("nts")).as("nt"))
    val ns = df.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("ns"))
    val nn = df.agg(count(lit(1)).as("nn"))
    val grid = nt.crossJoin(broadcast(ns))
      .join(nts, Seq("term", "grp"), "left")
      .join(broadcast(nn))
      .withColumn("c11", coalesce(col("nts"), lit(0L)))
      .withColumn("c01", col("ns") - coalesce(col("nts"), lit(0L)))
    val t1 = when(col("c11") > 0L,
      floor(col("c11").cast("double") / col("nn").cast("double")
        * log((col("c11") * col("nn")).cast("double")
          / (col("nt") * col("ns")).cast("double"))
        * lit(1e6) + lit(0.5d)).cast("long")).otherwise(lit(0L))
    val t0 = when(col("c01") > 0L && col("nn") > col("nt"),
      floor(col("c01").cast("double") / col("nn").cast("double")
        * log((col("c01") * col("nn")).cast("double")
          / ((col("nn") - col("nt")) * col("ns")).cast("double"))
        * lit(1e6) + lit(0.5d)).cast("long")).otherwise(lit(0L))
    grid.withColumn("__t6", t1 + t0)
      .groupBy(col("term"))
      .agg(max(col("nt")).as("n_docs"), sum(col("__t6")).as("__mi6"))
      .orderBy(col("__mi6").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("n_docs"),
        (col("__mi6").cast("double") / 1e6).as("mi"))
  }

  /** Chao1 species-richness estimator over word n-gram "species":
    * `V + V1²/(2·V2)` (bias-corrected `V + V1(V1-1)/2` when no
    * doubletons) — how much vocabulary the corpus has NOT yet shown,
    * the asymptote complement of Heaps' growth curve (q213). One
    * n-gram count aggregation, then three scalars. */
  def chao1(df: DataFrame, textCol: String, idCol: String,
            n: Int = 4): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val grams = df.select(
        graft.expressions.ShingleExpr.shinglesAll(lower(col(textCol)), n)
          .as("gs"))
      .select(explode(col("gs")).as("g"))
    val counts = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
    counts.agg(count(lit(1)).as("v"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("v1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("v2"))
      .select(col("v"), col("v1"), col("v2"),
        when(col("v2") > 0L,
          col("v").cast("double") + floor(
            (col("v1") * col("v1")).cast("double")
              / (lit(2L) * col("v2")).cast("double") * lit(1e6) + lit(0.5d))
            / lit(1e6))
          .otherwise(col("v").cast("double")
            + (col("v1") * (col("v1") - 1L)).cast("double") / 2.0d)
          .as("chao1"))
  }

  /** TextTiling-style topic-shift segmentation (Hearst 1997, simplified):
    * slide a `w`-token window by `stride`, compare ADJACENT windows by
    * exact-integer term-count cosine, and call a boundary where the
    * similarity dips under `threshold` — the topic-aware chunker that
    * beats the fixed-size q123 chunks for long multi-topic documents
    * (a training chunk straddling a topic shift dilutes both topics).
    *
    * All sums are exact integers (dot product over shared terms, both
    * norms); the single float step is `num/sqrt(n1*n2)` onto the 6dp
    * grid. Per-doc summary output: windows, gaps, boundaries, min/mean
    * cosine — bounded by the document count. Everything shuffles on
    * (doc, window) keys; no pairwise anything. */
  def topicSegments(df: DataFrame, textCol: String, idCol: String,
                    w: Int = 20, stride: Int = 10,
                    threshold: Double = 0.5): DataFrame = {
    require(w >= 2 && stride >= 1 && stride <= w, "need 2 <= stride <= w")
    val t6 = math.floor(threshold * 1e6 + 0.5).toLong
    val toks = df.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), " ", -1).as("tk"))
    val wins = toks.filter(size(col("tk")) >= w)
      .withColumn("widx", explode(sequence(lit(0),
        floor((size(col("tk")) - w).cast("double") / stride).cast("int"))))
      .select(col("doc_id"), col("widx").cast("long").as("widx"),
        explode(slice(col("tk"), col("widx") * stride + 1, lit(w))).as("term"))
    val cnt = wins.groupBy(col("doc_id"), col("widx"), col("term"))
      .agg(count(lit(1)).as("c"))
    val norms = cnt.groupBy(col("doc_id"), col("widx"))
      .agg(sum(col("c") * col("c")).as("nn"))
    val dots = cnt.select(col("doc_id"), col("widx"), col("term"), col("c"))
      .join(cnt.select(col("doc_id"), (col("widx") - 1L).as("widx"),
        col("term"), col("c").as("c2")), Seq("doc_id", "widx", "term"))
      .groupBy(col("doc_id"), col("widx"))
      .agg(sum(col("c") * col("c2")).as("num"))
    val gaps = norms.join(norms.select(col("doc_id"),
        (col("widx") - 1L).as("widx"), col("nn").as("nn2")),
        Seq("doc_id", "widx"))
      .join(dots, Seq("doc_id", "widx"), "left")
      .withColumn("cos6", floor(coalesce(col("num"), lit(0L)).cast("double")
        / sqrt((col("nn") * col("nn2")).cast("double")) * lit(1e6)
        + lit(0.5d)).cast("long"))
    val perDoc = gaps.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(when(col("cos6") < t6, 1L).otherwise(0L)).as("n_boundaries"),
        (min(col("cos6")).cast("double") / 1e6).as("min_cos"),
        (floor(sum(col("cos6")).cast("double") / count(lit(1)).cast("double")
          + lit(0.5d)).cast("double") / 1e6).as("mean_cos"))
    val nWin = norms.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"))
    df.select(col(idCol).as("doc_id"))
      .join(nWin, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        coalesce(col("n_boundaries"), lit(0L)).as("n_boundaries"),
        col("min_cos"), col("mean_cos"))
  }

  /** PPMI collocations (positive pointwise mutual information, the
    * Church–Hanks association measure): word pairs co-occurring within
    * a ±`window` token distance far more often than their marginal
    * frequencies predict — multiword-expression discovery, tokenizer
    * vocab curation, and the classic distributional-semantics building
    * block. `ppmi = max(0, ln(c12·N² / (Npairs·c1·c2)))` with both
    * sides of the ratio held as EXACT decimal(38,0) integers before
    * ONE correctly-rounded double conversion each (the Mann–Whitney
    * precision discipline), then the 9dp ln grid.
    *
    * Scale: tokenization is generate-only; the pair join is POSITION-
    * bounded (each token joins its next `window` neighbors within the
    * doc — ≤ window·N pairs, never quadratic); counts are map-side-
    * combined aggregations; the final top-k is sort-limit. */
  def ppmiCollocations(df: DataFrame, textCol: String, idCol: String,
                       window: Int = 2, minCount: Long = 5,
                       topK: Int = 30): DataFrame = {
    require(window >= 1 && topK >= 1, "window, topK >= 1")
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9]+"))
          .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTok = toks.agg(count(lit(1)).as("n"))
    val pairs = toks.alias("a")
      .join(toks.alias("b"),
        col("a.doc_id") === col("b.doc_id")
          && col("b.pos") > col("a.pos")
          && col("b.pos") <= col("a.pos") + window)
      .select(least(col("a.w"), col("b.w")).as("w1"),
        greatest(col("a.w"), col("b.w")).as("w2"))
    val c12 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val nPair = pairs.agg(count(lit(1)).as("np"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    c12
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .join(broadcast(nTok)).join(broadcast(nPair))
      .withColumn("__ppmi9", floor(log(
          (d(col("c12")) * d(col("n")) * d(col("n"))).cast("double")
            / (d(col("np")) * d(col("c1")) * d(col("c2"))).cast("double"))
        * lit(1e9) + lit(0.5d)).cast("long"))
      .filter(col("__ppmi9") > 0L)
      .orderBy(col("__ppmi9").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        (col("__ppmi9").cast("double") / 1e9).as("ppmi"))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Rapid Automatic
    * Keyword Extraction"): candidate phrases are maximal runs of
    * non-stopword tokens (the phrase id is a running stopword count —
    * the sessionizer idiom, no regex-alternation splitting to keep
    * engine parity trivial); each word scores `degree/frequency`
    * where degree sums the lengths of the phrases it appears in, and
    * a phrase scores the sum of its member words. Phrases longer than
    * `maxPhraseLen` are dropped BEFORE the word statistics (standard
    * RAKE practice — run-on fragments poison degree).
    *
    * Engine-exact: word scores are 6dp integers via BIGINT floor
    * division (`deg·10⁶ div freq`), phrase scores exact integer sums;
    * identical phrase text ⇒ identical score, so the corpus top-k by
    * (score desc, phrase asc) is deterministic.
    *
    * Scale: one generate-only tokenization, per-doc windows (keyed on
    * doc), one word-keyed aggregation + join, one phrase-keyed
    * aggregation; the top-k plans as TakeOrderedAndProject. */
  def rakeKeywords(df: DataFrame, textCol: String, idCol: String,
                   stopwords: Seq[String] =
                     graft.functions.TextAnalysis.StopwordTable
                       .flatMap(_._2).distinct.sorted,
                   maxPhraseLen: Int = 4, topK: Int = 20): DataFrame = {
    require(maxPhraseLen >= 1 && topK >= 1, "maxPhraseLen, topK >= 1")
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9]+"))
          .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val isStop = col("w").isInCollection(stopwords)
    val runW = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inPhrase = toks
      .withColumn("pid", sum(when(isStop, 1L).otherwise(0L)).over(runW))
      .filter(!isStop)
    val withLen = inPhrase
      .withColumn("plen", count(lit(1))
        .over(Window.partitionBy(col("doc_id"), col("pid"))))
      .filter(col("plen") <= maxPhraseLen)
    val stats = withLen.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("ws6", expr("(deg * 1000000L) div freq"))
    val phraseW = Window.partitionBy(col("doc_id"), col("pid"))
      .orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val phr = withLen
      .withColumn("phrase", array_join(collect_list(col("w")).over(phraseW),
        " "))
      .join(stats.select(col("w"), col("ws6")), Seq("w"))
      .groupBy(col("doc_id"), col("pid"), col("phrase"))
      .agg(max(col("plen")).as("plen"), sum(col("ws6")).as("score6"))
    phr.groupBy(col("phrase"))
      .agg(max(col("plen")).as("n_words"),
        count(lit(1)).as("n_occurrences"), max(col("score6")).as("__s6"))
      .orderBy(col("__s6").desc, col("phrase").asc)
      .limit(topK)
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        (col("__s6").cast("double") / 1e6).as("score"))
  }
}
