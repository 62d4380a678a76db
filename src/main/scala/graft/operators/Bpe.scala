package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{BpeEncodeExpr, ExprKernels}

/** Byte-pair-encoding tokenizer: distributed merge-table training +
  * scan-speed encoding (public algorithm: Sennrich, Haddow & Birch,
  * ACL'16 — the subword tokenization used by most LLM vocabularies).
  *
  * Training splits into the two natural scales:
  *  - DISTRIBUTED: word counting. One explode + one hash aggregation over
  *    the corpus, then `orderBy(count).limit(maxWords)` — a
  *    TakeOrderedAndProject top-k, never a global sort. The collected
  *    word-frequency head is vocab-sized (maxWords rows), the same
  *    bounded-collect discipline as the k-means centroids and vocab-k
  *    operators; Zipf's law makes the head carry nearly all pair mass.
  *  - DRIVER: greedy merge learning over that bounded table — the classic
  *    sequential algorithm (each merge depends on the last, so it cannot
  *    parallelize across merges; its input is vocab-scale, not
  *    corpus-scale, which is what makes driver-side correct here).
  *
  * Encoding is [[graft.expressions.BpeEncodeExpr]]: per-row, codegen'd,
  * zero shuffle — 100 TB tokenizes at scan speed with the merge table as
  * a broadcast-sized reference object.
  *
  * Determinism: word ties break lexicographically in the top-k; merge
  * ties break on (count desc, pair lexicographic asc); application order
  * is merge rank. Same corpus → same table → same tokens, on any cluster
  * layout.
  */
object Bpe {

  /** Corpus word frequencies under the shared lowercased-alphanumeric-run
    * tokenization (the q88/q179 convention — replayable in ANSI SQL). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Train `nMerges` merges from the `maxWords` most frequent words.
    * Stops early only when no adjacent pair remains (every head word fully
    * merged to one symbol). */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
                  maxWords: Int): Seq[(String, String)] = {
    val head = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word").asc).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainFromCounts(head, nMerges)
  }

  /** Greedy merge learning over a word-frequency table (driver-side; the
    * table is vocab-sized by contract). Exposed for specs. */
  def trainFromCounts(words: Seq[(String, Long)],
                      nMerges: Int): Seq[(String, String)] = {
    val syms = words.map { case (w, c) =>
      val l = new java.util.ArrayList[String](w.length + 1)
      w.foreach(ch => l.add(String.valueOf(ch)))
      l.add(ExprKernels.BpeEow)
      (l, c)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((l, c) <- syms) {
        var i = 0
        while (i < l.size - 1) {
          val k = (l.get(i), l.get(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic: highest count, ties to the lexicographically
        // smallest (a, b) — iteration order of the map never matters
        val best = counts.keys.minBy { case (a, b) => (-counts((a, b)), a, b) }
        merges += best
        syms.foreach { case (l, _) => ExprKernels.bpeMergeAll(l, best._1, best._2) }
      }
    }
    merges.toSeq
  }

  /** Distributed BPE merge TRAINING — the in-plan counterpart of
    * `trainMerges`: the word-frequency table never leaves the cluster
    * (no driver collect, no vocab cap), so it trains on the FULL
    * vocabulary at any corpus size. Each word is a space-joined symbol
    * string ending in the `</w>` marker (the `trainFromCounts`
    * convention, so both trainers learn identical merges); per merge
    * step: adjacent-pair counts (one vocab-bounded aggregation), the
    * argmax pair by (count desc, pair asc) via sort-limit, and the
    * merge applied as a LEFT-TO-RIGHT fold over each word's symbols
    * (`aggregate` HOF with a boundary-aware CASE — `a a a` merges to
    * `aa a`, never `a aa`). The symbol table is materialized once per
    * step (Lineage.cut), so step k never replays steps 1..k-1.
    * Returns the merge table: (step, sym_a, sym_b, pair_count). */
  def distributedMerges(df: DataFrame, textCol: String,
                        nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64, "nMerges in [1, 64]")
    val eow = ExprKernels.BpeEow
    var cur = wordCounts(df, textCol).select(
      concat(concat_ws(" ",
        filter(split(col("word"), ""), ch => ch =!= "")),
        lit(" " + eow)).as("symstr"),
      col("cnt"))
    val mergeFold =
      "aggregate(slice(__sy, 2, size(__sy) - 1), element_at(__sy, 1), " +
        "(acc, x) -> CASE WHEN x = __b AND (acc = __a " +
        "OR right(acc, length(__a) + 1) = concat(' ', __a)) " +
        "THEN concat(left(acc, length(acc) - length(__a)), __a, __b) " +
        "ELSE concat(acc, ' ', x) END)"
    val steps = (1 to nMerges).map { step =>
      cur = Lineage.cut(cur)
      val pairs = cur
        .select(split(col("symstr"), " ").as("sy"), col("cnt"))
        .select(explode(expr("transform(sequence(1, size(sy) - 1), " +
          "i -> struct(element_at(sy, i) AS a, element_at(sy, i + 1) AS b))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("a").asc, col("b").asc).limit(1)
        .select(lit(step.toLong).as("step"), col("a").as("sym_a"),
          col("b").as("sym_b"), col("pair_count"))
      cur = cur
        .crossJoin(broadcast(best.select(col("sym_a").as("__a"),
          col("sym_b").as("__b"))))
        .withColumn("__sy", split(col("symstr"), " "))
        .withColumn("symstr", expr(mergeFold))
        .select(col("symstr"), col("cnt"))
      best
    }
    steps.reduce(_ unionByName _)
  }

  /** Tokenize: array of subword symbols (word-final symbols carry the
    * `</w>` marker). Codegen'd scan-side expression. */
  def encode(c: Column, merges: Seq[(String, String)]): Column =
    BpeEncodeExpr.encode(c, merges)

  /** Inverse of encode up to text canonicalization: markers become word
    * breaks. Built-ins only. */
  def decode(tokens: Column): Column =
    trim(regexp_replace(concat_ws("", tokens), ExprKernels.BpeEow, " "))

  /** The canonical text form encode-then-decode round-trips to:
    * lowercased, alphanumeric runs joined by single spaces. */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Word count under the shared tokenization (SQL-replayable). */
  def wordCount(c: Column): Column =
    size(filter(split(lower(c), "[^a-z0-9]+"), w => w =!= "")).cast("long")
}
