package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-grade language identification: a multinomial Naive Bayes
  * classifier over word unigrams, trained fully IN-PLAN from the
  * labeled corpus (no driver collect, no vocabulary cap) and scored
  * back over the same corpus — the trainable replacement for the
  * stopword-argmax heuristic (`TextAnalysis.langId`), whose confusion
  * matrix (q238) exists precisely because the heuristic misclassifies.
  *
  * Model: `score(doc, L) = ln P(L) + Σ_w n_dw · ln P(w|L)` with add-1
  * smoothing `P(w|L) = (c_Lw + 1) / (t_L + V)`. Every log term lands
  * on the house 9dp integer grid (`floor(ln(x)·1e9 + 0.5)`, the HBOS /
  * Adamic–Adar idiom), so per-doc scores are exact integer sums the
  * oracle replays term-for-term; argmax ties break to the
  * lexicographically smallest language.
  *
  * Scale: the model is RELATIONAL — a (language × vocab) smoothed
  * term grid built from two corpus-token aggregations (map-side
  * combined, shuffled on (lang, word) then word). Scoring joins the
  * per-doc distinct-word counts to the grid on `word` (fan-out =
  * #languages, a constant) and reduces on doc_id. No driver-side
  * model, no literal-map size cliff — vocabulary can be billions of
  * rows. */
object LangModel {

  /** Per-(doc, candidate-language) 9dp-integer posterior scores
    * `(doc_id, lang_label, cand, s9)` — the full score table
    * [[naiveBayesGuess]] argmaxes and [[labelSuspects]] margins. */
  def naiveBayesScores(docs: DataFrame, idCol: String, textCol: String,
                       labelCol: String): DataFrame = {
    val tk = graft.Tables.fanOut(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        col(labelCol).as("lang_label"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    scoresFromTokens(docs, labelCol, tk)
  }

  /** Char-3..5-gram token frame (doc_id, lang_label, w): every
    * character window of the LOWERCASED text, spaces included —
    * boundary grams like "he " carry the word-edge signal the
    * classic Cavnar–Trenkle profiles rely on. Grams come off one
    * codegen'd nested-transform expression per row (no per-doc
    * array column survives past the explode). */
  private[graft] def charNgramTokens(docs: DataFrame, idCol: String,
                                         textCol: String, labelCol: String,
                                         nMin: Int, nMax: Int): DataFrame = {
    require(nMin >= 1 && nMax >= nMin, "need 1 <= nMin <= nMax")
    graft.Tables.fanOut(docs, col(idCol))
      .select(col(idCol).as("doc_id"), col(labelCol).as("lang_label"),
        lower(col(textCol)).as("__t"))
      .withColumn("w", explode(expr(
        s"flatten(transform(sequence($nMin, $nMax), n -> " +
          "CASE WHEN length(__t) >= n " +
          "THEN transform(sequence(1, length(__t) - n + 1), " +
          "i -> substring(__t, i, n)) " +
          "ELSE array() END))")))
      .select(col("doc_id"), col("lang_label"), col("w"))
  }

  /** Char-n-gram Naive Bayes scores — the SHORT-TEXT language
    * identifier: on tweet-length documents the word-unigram grid
    * ([[naiveBayesScores]]) is too sparse (most words unseen per
    * language), while overlapping char 3..5-grams give every doc
    * hundreds of features with corpus-wide support (Cavnar–Trenkle
    * 1994's n-gram profiles recast as multinomial NB). Same 9dp
    * integer grid, same relational no-vocab-cap model — only the
    * tokenizer changes. */
  def charNaiveBayesScores(docs: DataFrame, idCol: String, textCol: String,
                           labelCol: String, nMin: Int = 3,
                           nMax: Int = 5): DataFrame =
    scoresFromTokens(docs, labelCol,
      charNgramTokens(docs, idCol, textCol, labelCol, nMin, nMax))

  /** Shared multinomial-NB core over any (doc_id, lang_label, w)
    * token frame — see [[naiveBayesScores]] for the model and grid. */
  private def scoresFromTokens(docs: DataFrame, labelCol: String,
                               tk0: DataFrame): DataFrame = {
    // the token frame feeds four aggregations (cnt/tot/vocab/dt). It
    // is deliberately NOT lineage-cut: materializing an EXPLODED gram
    // frame costs more than re-running the codegen'd explode per
    // consumer (measured 13.1 s vs 7 s on q312 — the checkpoint's
    // deserialized reads quadruple task input bytes). The tokenizers
    // fan the narrow scan across cores instead (guide §2.5), so the
    // repeated explode is at least parallel.
    val tk = tk0
    val cnt = tk.groupBy(col("lang_label").as("cand"), col("w"))
      .agg(count(lit(1)).as("c"))
    val tot = tk.groupBy(col("lang_label").as("cand"))
      .agg(count(lit(1)).as("t"))
    val vocab = tk.select(col("w")).distinct()
    val vv = vocab.agg(count(lit(1)).as("v"))
    val lp = docs.groupBy(col(labelCol).as("cand"))
      .agg(count(lit(1)).as("d"))
    val nn = docs.agg(count(lit(1)).as("n"))
    // smoothed per-(language, word) 9dp log-likelihood grid; zero-count
    // words get the same add-1 floor the oracle computes
    val grid = vocab.crossJoin(broadcast(tot)).crossJoin(broadcast(vv))
      .join(cnt, Seq("cand", "w"), "left")
      .select(col("cand"), col("w"),
        floor(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double")
            / (col("t") + col("v")).cast("double")) * lit(1e9) + lit(0.5d))
          .cast("long").as("term9"))
    val pri = lp.join(broadcast(nn))
      .select(col("cand"), floor(log(col("d").cast("double")
          / col("n").cast("double")) * lit(1e9) + lit(0.5d))
        .cast("long").as("prior9"))
    val dt = tk.groupBy(col("doc_id"), col("lang_label"), col("w"))
      .agg(count(lit(1)).as("n_dw"))
    dt.join(grid, Seq("w"))
      .groupBy(col("doc_id"), col("lang_label"), col("cand"))
      .agg(sum(col("n_dw") * col("term9")).as("sw9"))
      .join(broadcast(pri), Seq("cand"))
      .select(col("doc_id"), col("lang_label"), col("cand"),
        (col("sw9") + col("prior9")).as("s9"))
  }

  /** (doc_id, lang_label, lang_guess) for every doc with ≥1 token. */
  def naiveBayesGuess(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String): DataFrame =
    guessFromScores(naiveBayesScores(docs, idCol, textCol, labelCol))

  /** Char-n-gram argmax guesses — every doc with ≥1 char gram
    * (i.e. length ≥ nMin). */
  def charNaiveBayesGuess(docs: DataFrame, idCol: String, textCol: String,
                          labelCol: String, nMin: Int = 3,
                          nMax: Int = 5): DataFrame =
    guessFromScores(
      charNaiveBayesScores(docs, idCol, textCol, labelCol, nMin, nMax))

  /** Char-n-gram confusion matrix on the q238/q283 board shape. */
  def charNaiveBayesConfusion(docs: DataFrame, idCol: String,
                              textCol: String, labelCol: String,
                              nMin: Int = 3, nMax: Int = 5): DataFrame =
    confusionFromGuess(
      charNaiveBayesGuess(docs, idCol, textCol, labelCol, nMin, nMax))

  private def guessFromScores(sc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("s9").desc, col("cand").asc)
    sc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang_label"), col("cand").as("lang_guess"))
  }

  private def confusionFromGuess(g: DataFrame): DataFrame = {
    val wl = Window.partitionBy(col("lang_label"))
    g.groupBy(col("lang_label"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_share", round(col("n").cast("double")
        / sum(col("n")).over(wl).cast("double"), 6))
  }

  /** Confident-learning-style label-error candidates: documents whose
    * model posterior prefers a DIFFERENT language than their given
    * label, ranked by the 9dp-integer log-posterior margin
    * `s9(best) - s9(label)` — the standard "which silver labels to
    * re-annotate first" queue (Northcutt et al.'s confident-learning
    * intuition on the in-plan NB posterior). Top-k by (margin desc,
    * doc_id) via sort+limit, never a global window.
    *
    * Scale: two derivations of the same score table (argmax window
    * partitioned per doc; the label row by equi-filter), one doc-keyed
    * join — everything downstream of scoring is doc-count-sized. */
  def labelSuspects(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String, k: Int): DataFrame = {
    val sc = naiveBayesScores(docs, idCol, textCol, labelCol)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("s9").desc, col("cand").asc)
    val best = sc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang_label"),
        col("cand").as("best_guess"), col("s9").as("__sb"))
    val lbl = sc.filter(col("cand") === col("lang_label"))
      .select(col("doc_id"), col("s9").as("__sl"))
    best.join(lbl, Seq("doc_id"))
      .filter(col("best_guess") =!= col("lang_label"))
      .withColumn("__m9", col("__sb") - col("__sl"))
      .orderBy(col("__m9").desc, col("doc_id").asc).limit(k)
      .select(col("doc_id"), col("lang_label"), col("best_guess"),
        (col("__m9").cast("double") / 1e9).as("margin"))
  }

  /** Confusion matrix of the trained model — the q238 shape
    * (lang_label, lang_guess, n, row_share) so the two classifiers
    * grade on the same board. */
  def naiveBayesConfusion(docs: DataFrame, idCol: String, textCol: String,
                          labelCol: String): DataFrame =
    confusionFromGuess(naiveBayesGuess(docs, idCol, textCol, labelCol))
}
