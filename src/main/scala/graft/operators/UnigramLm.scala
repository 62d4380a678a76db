package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (the SentencePiece shape:
  * Kudo 2018, "Subword Regularization") — the OTHER tokenizer family a
  * training-data pipeline meets, complementing BPE (q180/q266): BPE
  * grows a vocabulary bottom-up by merging; the unigram LM starts from
  * a LARGE seed vocabulary of candidate pieces and EM-PRUNES it, with
  * piece probabilities re-estimated from optimal segmentations of the
  * corpus.
  *
  * This implementation keeps the estimator fully IN-PLAN and
  * engine-replayable:
  *  - Seed: every character substring (length 1..`maxPieceLen`) of the
  *    corpus words, counted by word frequency; all single chars plus
  *    the top `seedK` multi-char pieces by (count desc, piece asc).
  *  - Piece log-probs on the house 9dp integer grid with add-1
  *    smoothing: `lp9 = floor(ln((c+1)/(T+V))·1e9 + 0.5)`.
  *  - E-step: per WORD (vocab-scale, never corpus-scale), the Viterbi
  *    best-segmentation score by forward AND backward integer DP —
  *    both computed in ONE fold expression per row (no joins, no
  *    per-position shuffles). A piece occurrence (word, start, len) is
  *    "on an optimal path" iff `fwd(start-1) + lp9 + bwd(start-1+len)
  *    == fwd(|w|)` — the standard forward-backward membership test,
  *    which needs NO backtrace and is a pure function of the integer
  *    grid (ties count every co-optimal path's pieces, identically on
  *    every engine). Expected counts = Σ word-freq over on-path
  *    occurrences.
  *  - M-step + prune: keep all single chars (coverage guarantee —
  *    every word stays segmentable) plus the top `keepK` multi-char
  *    pieces by (count desc, piece asc); re-smooth lp9 over survivors.
  *
  * Scale: after one corpus word-count aggregation everything operates
  * on the DISTINCT-WORD table (Zipf-bounded, the Bpe.trainMerges
  * contract); the vocabulary rides as a broadcast 1-row
  * `map_from_entries` column (vocab-capped by construction), so an EM
  * iteration is one scan of the word table + one vocab-sized
  * re-aggregation. Words are truncated to `maxWordLen` chars (the
  * SentencePiece max-sentencepiece-length discipline) so the DP fold
  * is O(maxWordLen · maxPieceLen) per word.
  *
  * Determinism: the integer DP sums and lexicographic tie-breaks are
  * bit-identical under ANY execution shape (partitioning, merge order)
  * — that claim covers the integer arithmetic only. The lp9 grid
  * itself comes from `floor(ln(·)·1e9 + 0.5)`, so it carries the known
  * libm-portability hazard (the q283 class): a 1-ulp JVM-vs-DuckDB
  * difference in `ln` at a .5 grid boundary would flip lp9 by 1 and
  * cascade through EM pruning. Observed agreement with the DuckDB
  * oracle is therefore an empirical property of the tested corpus, not
  * a structural guarantee like the PageRank/K-M all-integer paths. */
object UnigramLm {

  /** "Impossible" DP sentinel: far below any real 9dp log-prob sum
    * (|lp9| ≤ ~30·1e9 per piece, ≤ maxWordLen pieces). */
  private val Neg = -1000000000000000000L

  /** Train `iters` EM rounds; returns the surviving vocabulary as
    * (piece, n_est, lp9) — n_est the final on-path expected count,
    * lp9 the 9dp-integer log-probability. */
  def emTrain(df: DataFrame, textCol: String, iters: Int,
              maxPieceLen: Int = 4, maxWordLen: Int = 10,
              seedK: Int = 300, keepK: Int = 200): DataFrame = {
    require(iters >= 1 && maxPieceLen >= 2 && maxWordLen >= maxPieceLen
      && seedK >= 1 && keepK >= 1, "bad unigram-LM hyperparameters")
    // the vocabulary rides as a map COLUMN on every word row (the
    // crossJoin below copies its bytes per row): cap it so a config
    // mistake degrades loudly instead of multiplying the word table
    // by a gigabyte-scale literal
    require(seedK <= 65536 && keepK <= 65536,
      s"unigram-LM vocab caps seedK=$seedK/keepK=$keepK exceed 65536 — " +
        "the vocabulary map is materialized per word row during the DP; " +
        "train a larger vocabulary hierarchically (per-shard vocabs, " +
        "merged) rather than widening the broadcast map")
    val words = Lineage.cut(Bpe.wordCounts(df, textCol)
      .select(substring(col("word"), 1, maxWordLen).as("w"),
        col("cnt").as("f"))
      .groupBy(col("w")).agg(sum(col("f")).as("f")))

    val occExpr = expr(
      s"flatten(transform(sequence(1, length(w)), s -> " +
        s"transform(sequence(1, least($maxPieceLen, length(w) - s + 1)), " +
        "l -> struct(s AS s, l AS l, substring(w, s, l) AS p))))")
    def occ(ws: DataFrame): DataFrame = ws
      .withColumn("o", explode(occExpr))
      .withColumn("s", col("o.s")).withColumn("l", col("o.l"))
      .withColumn("p", col("o.p")).drop("o")

    // seed vocabulary from raw substring occurrence mass
    val seedCnt = occ(words).groupBy(col("p")).agg(sum(col("f")).as("cnt"))
    var vocab = Lineage.cut(withLp(
      keepPieces(seedCnt, seedK), "cnt"))

    for (_ <- 1 to iters) {
      val vm = vocab.agg(map_from_entries(
        collect_list(struct(col("p"), col("lp9")))).as("vm"))
      val arr = words.crossJoin(broadcast(vm))
        .withColumn("fwd", expr(fwdSql(maxPieceLen)))
        .withColumn("bwd", expr(bwdSql(maxPieceLen)))
        .drop("vm")
      val onPath = occ(arr)
        .join(vocab.select(col("p"), col("lp9").as("__lp")), Seq("p"))
        .filter(element_at(col("fwd"), col("s")) > Neg
          && element_at(col("bwd"), col("s") + col("l")) > Neg
          && element_at(col("fwd"), col("s")) + col("__lp")
            + element_at(col("bwd"), col("s") + col("l"))
            === element_at(col("fwd"), length(col("w")) + 1))
      val est = vocab.select(col("p")).join(
          onPath.groupBy(col("p")).agg(sum(col("f")).as("__ne")),
          Seq("p"), "left")
        .select(col("p"), coalesce(col("__ne"), lit(0L)).as("cnt"))
      vocab = Lineage.cut(withLp(keepPieces(est, keepK), "cnt"))
    }
    vocab.select(col("p").as("piece"), col("n_est"), col("lp9"))
  }

  /** Singles always survive (coverage); multis top-k by (cnt, piece). */
  private def keepPieces(cnts: DataFrame, k: Int): DataFrame =
    cnts.filter(length(col("p")) === 1).unionByName(
      cnts.filter(length(col("p")) >= 2)
        .orderBy(col("cnt").desc, col("p").asc).limit(k))

  /** Add-1-smoothed 9dp log-probs over the kept vocabulary. */
  private def withLp(v: DataFrame, cntCol: String): DataFrame = {
    val tv = v.agg(sum(col(cntCol)).as("__t"), count(lit(1)).as("__v"))
    v.crossJoin(broadcast(tv))
      .select(col("p"), col(cntCol).as("n_est"),
        floor(log((col(cntCol) + lit(1L)).cast("double")
            / (col("__t") + col("__v")).cast("double")) * lit(1e9)
          + lit(0.5d)).cast("long").as("lp9"))
  }

  /** `fwd[i+1]` (1-based array) = best 9dp score segmenting the FIRST
    * `i` chars of `w`; fwd[1] = 0. One nested integer fold per row. */
  private def fwdSql(L: Int): String =
    s"""aggregate(sequence(1, length(w)), array(0L), (acc, i) ->
       |  concat(acc, array(
       |    aggregate(sequence(greatest(0, i - $L), i - 1),
       |      CAST($Neg AS BIGINT), (m, j) ->
       |      CASE WHEN element_at(acc, j + 1) > CAST($Neg AS BIGINT)
       |        AND element_at(vm, substring(w, j + 1, i - j)) IS NOT NULL
       |        THEN greatest(m, element_at(acc, j + 1)
       |          + element_at(vm, substring(w, j + 1, i - j)))
       |        ELSE m END))))""".stripMargin.replace("\n", " ")

  /** `bwd[k+1]` (1-based, AFTER the final reverse) = best 9dp score
    * segmenting the chars of `w` AFTER position k; bwd[|w|+1] = 0. */
  private def bwdSql(L: Int): String =
    s"""reverse(aggregate(sequence(1, length(w)), array(0L), (acc, k) ->
       |  concat(acc, array(
       |    aggregate(sequence(1, least($L, k)),
       |      CAST($Neg AS BIGINT), (m, l) ->
       |      CASE WHEN element_at(acc, k - l + 1) > CAST($Neg AS BIGINT)
       |        AND element_at(vm, substring(w, length(w) - k + 1, l))
       |          IS NOT NULL
       |        THEN greatest(m, element_at(acc, k - l + 1)
       |          + element_at(vm, substring(w, length(w) - k + 1, l)))
       |        ELSE m END)))))""".stripMargin.replace("\n", " ")

  /** Viterbi-encode a text column with a trained (piece → lp9)
    * vocabulary: lowercased alphanumeric runs (the shared tokenization
    * convention), each word segmented to its best-scoring piece
    * sequence (ties: the longest final piece, recursively — the
    * deterministic longest-match flavor). Codegen'd scan-side
    * expression, zero shuffle — the [[Bpe.encode]] contract. */
  def encode(c: Column, vocab: Seq[(String, Long)]): Column =
    graft.expressions.UnigramEncodeExpr.encode(c, vocab)

  /** Inverse of encode up to text canonicalization — encode emits the
    * shared `</w>` marker after each word, so BOTH tokenizers invert
    * through the same [[Bpe.decode]]. */
  def decode(tokens: Column): Column = Bpe.decode(tokens)
}
