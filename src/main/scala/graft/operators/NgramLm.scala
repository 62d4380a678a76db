package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language model — the classic n-gram LM
  * smoothing (Kneser & Ney 1995; Chen & Goodman 1999's interpolated
  * form), the quality-scoring backbone of CCNet-style corpus filtering
  * (documents far from the corpus distribution score low and get
  * dropped). Upgrades [[TextIndex.unigramScore]] from bag-of-words to
  * word-ORDER sensitivity: scrambled or boilerplate-stitched text scores
  * visibly worse under a bigram model even when its unigrams look
  * typical.
  *
  * Model (absolute discount D, trained on the corpus itself):
  *
  *   P(w2|w1) = (c(w1,w2) - D)/c(w1·)
  *            + (D · N1+(w1·)/c(w1·)) · (N1+(·w2) / T)
  *
  * where c(w1·) is the bigram-occurrence count starting at w1,
  * N1+(w1·)/N1+(·w2) are the forward/backward continuation type counts,
  * and T is the total number of distinct bigram types. The continuation
  * probability N1+(·w2)/T — "how many contexts does w2 complete" — is
  * the Kneser-Ney insight: "francisco" is frequent but follows only
  * "san", so its backoff mass stays small.
  *
  * [[knBigramScore]] scores the training corpus itself, so every scored
  * bigram is in the model (no OOV path) — the same in-engine degenerate
  * variant as the unigram scorer. [[knBigramScoreHeldOut]] is the real
  * filter: fit on one split, score a disjoint one, with continuation-
  * probability backoff for unseen bigrams/contexts and add-one-reserved
  * OOV mass for words never seen at all.
  *
  * Determinism: per-bigram log-probs round to the 6dp grid in the model
  * table; a document's score sums grid points (round-then-floor-mean,
  * the house portable-mean rule), so engines and row orders agree.
  *
  * Scale (100 TB): bigram generation is scan-side (`transform` over the
  * token array — no position self-join). The model build is one
  * (w1,w2)-keyed aggregation with map-side combine plus two vocab-sized
  * reaggregations; T rides along as a broadcast one-row frame. Scoring
  * is ONE join keyed on the bigram — the inverted-index shape, skew
  * handled by AQE — then a doc-keyed aggregation. No windows, no sorts,
  * no driver-side model materialization (the model can exceed driver
  * memory; it stays distributed).
  */
object NgramLm {

  private def toks(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")

  /** (doc_id, w1, w2) per adjacent-token occurrence. */
  private def occurrences(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), toks(textCol).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__t) - 1)," +
          " i -> struct(element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** The fitted model: (w1, w2, lp) with lp = round(ln P_KN(w2|w1), 6).
    * Stays a DataFrame — joinable at any corpus size. */
  def knBigramModel(df: DataFrame, textCol: String, idCol: String,
                    discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount must be in (0, 1)")
    val occ = occurrences(df, textCol, idCol)
    val bi = occ.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val fwd = bi.groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"), count(lit(1)).as("n1f"))
    val bwd = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = bi.agg(count(lit(1)).as("t"))
    // fixed IEEE op sequence, mirrored verbatim by the SQL oracle:
    // (c - D)/c1 + (D*n1f/c1) * (n1b/T)
    bi.join(fwd, Seq("w1")).join(bwd, Seq("w2")).crossJoin(broadcast(types))
      .withColumn("lp", round(log(
        (col("c") - lit(discount)) / col("c1") +
          (lit(discount) * col("n1f") / col("c1")) * (col("n1b") / col("t"))), 6))
      .select("w1", "w2", "lp")
  }

  /** HELD-OUT scoring: fit the interpolated-KN bigram model on `fit` and
    * score `score` — the split may be disjoint, so unseen bigrams,
    * unseen contexts, and OOV words all need probability mass. This is
    * the CCNet-style filter users actually run (fit on a trusted slice,
    * score the crawl); [[knBigramScore]] is its in-corpus degenerate.
    *
    * Backoff structure (standard interpolated KN + add-one continuation):
    *
    *   Pcont(w2) = (N1+(·w2) + 1) / (T + V + 1)
    *     — add-one smoothing over continuation types: a w2 never seen in
    *       fit gets the reserved 1/(T+V+1) OOV mass, and the seen types
    *       sum to (T+V)/(T+V+1), so Pcont is a proper distribution over
    *       seen-vocab ∪ {OOV}. V = # distinct continuation types.
    *
    *   seen context w1 (c(w1·) > 0):
    *     P(w2|w1) = max(c(w1,w2) - D, 0)/c(w1·)
    *              + (D · N1+(w1·)/c(w1·)) · Pcont(w2)
    *     — the seen-bigram term vanishes (coalesce to 0) when (w1,w2)
    *       never occurred in fit; the discount-funded backoff carries it.
    *
    *   unseen context w1 (incl. OOV w1):  P(w2|w1) = Pcont(w2)
    *
    * Every arithmetic step is one fixed IEEE sequence mirrored verbatim
    * by the SQL oracle; per-bigram log-probs round to the 6dp grid
    * before the order-free document sum (the house portable-mean rule).
    *
    * Scale (100 TB): the model never touches the driver — scoring is
    * three LEFT joins (bigram, forward-context, continuation) against
    * the fit-side aggregates plus two broadcast one-row scalars (T, V),
    * then a doc-keyed aggregation. Stop-word contexts skew the unigram
    * joins; AQE skew-join splits them. Output: (doc_id, n_bigrams,
    * n_unseen, mean_logp); docs with < 2 tokens drop (no bigram
    * distribution to score). */
  def knBigramScoreHeldOut(fit: DataFrame, score: DataFrame,
                           textCol: String, idCol: String,
                           discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount must be in (0, 1)")
    val occF = occurrences(fit, textCol, idCol)
    val occS = occurrences(score, textCol, idCol)
    // bi feeds fwd/bwd/types AND the scoring join — cut the aggregated
    // bigram table so the fit-side occurrence explode runs once
    val bi = Lineage.cut(
      occF.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c")))
    val fwd = bi.groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"), count(lit(1)).as("n1f"))
    val bwd = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = bi.agg(count(lit(1)).as("t"))
    val vocab = bwd.agg(count(lit(1)).as("v"))
    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(1L)) /
      (col("t") + col("v") + lit(1L))
    val p = when(col("c1").isNotNull,
      coalesce((col("c") - lit(discount)) / col("c1"), lit(0.0d)) +
        (lit(discount) * col("n1f") / col("c1")) * pcont)
      .otherwise(pcont)
    occS
      .join(bi, Seq("w1", "w2"), "left")
      .join(fwd, Seq("w1"), "left")
      .join(bwd, Seq("w2"), "left")
      .crossJoin(broadcast(types)).crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        when(col("c").isNull, 1L).otherwise(0L).as("unseen"),
        round(log(p), 6).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("unseen")).as("n_unseen"),
        round(sum(col("lp")), 6).as("__s"))
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        (floor(col("__s") / col("n_bigrams") * lit(1e6) + lit(0.5d)) / lit(1e6))
          .as("mean_logp"))
  }

  /** Per-document mean bigram log-prob under the corpus-fitted KN model:
    * (doc_id, n_bigrams, mean_logp). Documents with fewer than two
    * tokens have no bigram distribution and are dropped. */
  def knBigramScore(df: DataFrame, textCol: String, idCol: String,
                    discount: Double = 0.75): DataFrame = {
    val occ = occurrences(df, textCol, idCol)
    val model = knBigramModel(df, textCol, idCol, discount)
    occ.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(sum(col("lp")), 6).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        (floor(col("__s") / col("n_bigrams") * lit(1e6) + lit(0.5d)) / lit(1e6))
          .as("mean_logp"))
  }
}
