package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval with reciprocal-rank fusion — the
  * RAG-corpus query shape: a keyword ranking (BM25) and an embedding
  * ranking (cosine) are fused by summing reciprocal ranks, so documents
  * surfaced by BOTH modalities rise above documents strong in only one.
  *
  * Public formula: RRF (Cormack, Clarke & Buettcher, SIGIR'09) —
  * `score(d) = Σ_r 1 / (K + rank_r(d))`, K=60 the paper default.
  *
  * Engine-portability: the reciprocal is computed as the EXACT integer
  * `1e9 div (K + rank)` (parts-per-billion), so the fused score is an
  * order-free BIGINT sum — no float summation to diverge between engines,
  * and ranks are small so ppb precision never collapses two distinct
  * rank-sets onto one score unless their reciprocal sums truly tie at
  * 1e-9 (broken deterministically by doc id).
  *
  * Scale (100 TB): each input ranking is already top-kRetrieve (bounded,
  * produced by TakeOrderedAndProject plans upstream); the fusion unions
  * lists of k rows, aggregates on doc id, and takes the final top-k —
  * every stage after retrieval is O(k·lists), independent of corpus size.
  */
object Retrieval {

  /** Fuse ranked lists by reciprocal-rank. Each input must carry `idCol`
    * and a 1-based `rank` column; lists may overlap arbitrarily. Output:
    * (idCol, rrf_ppb, n_lists, rank) — `rrf_ppb` the integer fused score,
    * `n_lists` how many rankings surfaced the doc. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    // integral div keeps the reciprocal exact — no float in the score path
    val part = expr(s"1000000000 div ($rrfK + rank)")
    val tagged = rankings
      .map(_.select(col(idCol), part.cast("long").as("part")))
      .reduce(_ unionByName _)
    val fused = tagged.groupBy(col(idCol))
      .agg(sum(col("part")).as("rrf_ppb"), count(lit(1)).as("n_lists"))
    // top-k = sort+limit (TakeOrderedAndProject); the rank window then
    // orders k rows, never the corpus
    fused.orderBy(col("rrf_ppb").desc, col(idCol).asc).limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("rrf_ppb").desc, col(idCol).asc)).cast("long"))
  }

  /** BM25 + cosine hybrid top-k over a corpus whose text ids align with
    * its embedding ids. The semantic query is the embedding of
    * `queryVecId` (that doc itself is excluded from the semantic list by
    * the ANN convention; it can still enter via the lexical list). */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
                 textCol: String, docIdCol: String,
                 vecIdCol: String, vecCol: String,
                 queryTerms: Seq[String], queryVecId: Long,
                 k: Int, kRetrieve: Int, rrfK: Int = 60): DataFrame = {
    val lex = TextIndex.bm25TopK(docs, textCol, docIdCol, queryTerms, kRetrieve)
      .select(col("doc_id"), col("rank"))
    val sem = Similarity.bruteForceTopK(
        embeddings, embeddings.filter(col(vecIdCol) === queryVecId),
        vecIdCol, vecCol, kRetrieve)
      .select(col("vec_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, sem), "doc_id", k, rrfK)
  }

  /** Hard-negative mining for contrastive training: for each ANCHOR
    * document, the top-k BM25-most-similar documents that are NOT
    * near-duplicates of it — lexically close (hard), semantically
    * distinct (negative). Random negatives are trivial for a model;
    * near-dup "negatives" are label noise; this picks the band between.
    *
    * Mechanics: each anchor's own term multiset is the BM25 query
    * (query-term weight = its anchor-side tf); candidates come from an
    * inverted-index join on shared terms; `positives` (id_a, id_b) —
    * the minhash/LSH near-dup pair output — is excluded in BOTH
    * orientations, as is the anchor itself; rank by (score desc, id).
    *
    * Scale (100 TB): anchors are a training BATCH (bounded — they
    * broadcast); the candidate join is the posting-list shape, touching
    * only postings of the anchors' terms. `maxDfFrac` is the stop-term
    * throttle: query terms appearing in more than that fraction of the
    * corpus are dropped from the query (a stop word's posting list IS
    * the corpus — at scale it turns the mining into a full scan while
    * contributing ~zero idf). Output: (anchor_id, doc_id, score, rank). */
  def hardNegatives(df: DataFrame, textCol: String, idCol: String,
                    anchorPred: org.apache.spark.sql.Column,
                    positives: DataFrame, k: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    maxDfFrac: Double = 1.0): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => t =!= "")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dlen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dlen.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val anchors = df.filter(anchorPred).select(col(idCol).as("anchor_id"))
    val qterms = tf.join(anchors, tf("doc_id") === anchors("anchor_id"))
      .select(col("anchor_id"), col("term"), col("tf").as("qtf"))
    val idf = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf.join(broadcast(qterms), Seq("term"))
      .filter(col("doc_id") =!= col("anchor_id"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .filter(col("df") <= col("n") * lit(maxDfFrac))
      .groupBy(col("anchor_id"), col("doc_id"))
      .agg(round(sum(col("qtf") * idf * norm), 4).as("score"))
    val posBoth = positives
      .select(col("id_a").as("anchor_id"), col("id_b").as("doc_id"))
      .unionByName(positives
        .select(col("id_b").as("anchor_id"), col("id_a").as("doc_id")))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.join(posBoth, Seq("anchor_id", "doc_id"), "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("anchor_id", "doc_id", "score", "rank")
  }

  /** Maximal-marginal-relevance reranking (Carbonell & Goldstein,
    * SIGIR'98) at λ = 0.5 over an exact top-`poolK` candidate pool:
    * greedy picks maximize `rel − max_sim_to_already_picked`, so the
    * final k trade raw relevance for coverage — the diversity stage of
    * a RAG retrieval or a dedup-aware few-shot selector.
    *
    * Determinism/portability: relevance and pairwise similarity are
    * 6dp-rounded cosines lifted to MICRO-INT units, so at λ = 0.5 the
    * MMR objective is the pure integer `rel6 − penalty6` (the ½ factor
    * cancels in argmax) — no float ever enters the greedy loop, and
    * ties break by smallest candidate id. The oracle unrolls all k
    * picks relationally.
    *
    * Scale: the pool is top-poolK per query (a bounded
    * TakeOrderedAndProject), pairwise similarity is poolK² PER QUERY —
    * candidate-confined, never corpus-pairwise — and each greedy round
    * is one join + one argmax aggregation on uniform query keys with a
    * constant-depth plan ([[Lineage]] cut per round). Driver never sees
    * data.
    *
    * Output: (query_id, pick, vec_id, score) — `pick` the 1-based
    * selection order, `score` the integer MMR objective at pick time. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, poolK: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= poolK && k <= 20,
      "MMR: need 1 <= k <= min(poolK, 20) (one materialized round per pick)")
    val rel6 = floor(col("cosine") * lit(1e6) + lit(0.5d)).cast("long")
    val pool = Lineage.cut(
      Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, poolK)
        .select(col("query_id"), col("vec_id"), rel6.as("rel6")))
    val v = corpus.select(col(idCol).as("__pid"), col(vecCol).as("__pv"))
    val withVec = pool.join(v, pool("vec_id") === v("__pid"))
      .select(col("query_id"), col("vec_id"), col("__pv"))
    val pa = withVec.select(col("query_id"), col("vec_id").as("a"),
      col("__pv").as("av"))
    val pb = withVec.select(col("query_id"), col("vec_id").as("b"),
      col("__pv").as("bv"))
    val psim = Lineage.cut(pa.join(pb, Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        floor(round(Similarity.cosine(col("av"), col("bv")), 6) * lit(1e6)
          + lit(0.5d)).cast("long").as("sim6")))
    def argmax(df: DataFrame, score: org.apache.spark.sql.Column,
               pick: Int): DataFrame =
      df.groupBy(col("query_id"))
        .agg(max(struct(score.as("s"), (-col("vec_id")).as("nv"))).as("m"))
        .select(col("query_id"), lit(pick.toLong).as("pick"),
          (-col("m.nv")).as("vec_id"), col("m.s").as("score"))
    var sel = Lineage.cut(argmax(pool, col("rel6"), 1))
    for (r <- 2 to k) {
      val remaining = pool.join(sel.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_anti")
      val pen = remaining
        .join(psim.withColumnRenamed("a", "vec_id"), Seq("query_id", "vec_id"))
        .join(sel.select(col("query_id"), col("vec_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("vec_id"), col("rel6"))
        .agg(max(col("sim6")).as("mx"))
      sel = Lineage.cut(sel.unionByName(
        argmax(pen, col("rel6") - col("mx"), r)))
    }
    sel
  }
}
