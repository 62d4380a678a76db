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
}
