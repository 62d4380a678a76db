package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{KmvDistinctAgg, SignatureExprs}

/** Cross-source content overlap from KMV sketches: "how much n-gram
  * content do corpus sources share?" — the corpus-curation question
  * behind contamination screens, source-mix design, and crawl-snapshot
  * diffing.
  *
  * The 100 TB shape is the whole point: each source's shingle SET is
  * summarized into one k-long sketch by a single map-side-combined
  * aggregation over scan-side hash arrays ([[SignatureExprs.shingleHashSet]]
  * — no explode, no string leaves the scan), and every pairwise estimate
  * is then computed from sketches alone: source-count x k longs, a
  * broadcast-sized self-join, zero corpus-sized pair stage. The exact
  * counterpart (one distinct-shingle shuffle + an id-only self-join)
  * rides along in [[overlapReport]] to grade the estimator; production
  * at scale would run the sketch path only.
  *
  * Estimator (classic KMV set algebra, Bar-Yossef et al. 2002 / Beyer et
  * al. 2007): with `U_k` = the k smallest distinct hashes of A ∪ B
  * (computable from the two sketches alone — min-k of a union is the
  * min-k of the union of min-k's), Jaccard(A,B) ≈ |{h ∈ U_k : h ∈
  * sketch(A) ∩ sketch(B)}| / |U_k|, a hypergeometric sample of the union
  * with rank error O(1/sqrt(k)). Every quantity is a pure function of
  * the data (deterministic hashes, no RNG), so the DuckDB oracle replays
  * sketches AND estimates exactly — q173 grades a sketch by hard
  * equality.
  */
object CorpusOverlap {

  /** One KMV sketch per group over the word n-gram shingle sets of
    * `textCol`: (group, sketch array<long> ascending order-normalized).
    * One map-side-combined aggregation; state O(k) per group. */
  def shingleSketches(df: DataFrame, textCol: String, groupCol: String,
                      n: Int, k: Int): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(KmvDistinctAgg.kmvDistinctSketch(
        SignatureExprs.shingleHashSet(col(textCol), n), k).as("sketch"))

  /** Pairwise Jaccard estimates from sketches alone (grp_a < grp_b).
    * Output: (grp_a, grp_b, union_k, match_k, est_jaccard). Sketches are
    * tiny (k longs per group), so the self-join broadcasts. */
  def jaccardEstimates(sketches: DataFrame, k: Int): DataFrame = {
    val a = sketches.select(col("grp").as("grp_a"), col("sketch").as("sk_a"))
    val b = sketches.select(col("grp").as("grp_b"), col("sketch").as("sk_b"))
    val uk = slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k)
    val both = array_intersect(col("sk_a"), col("sk_b"))
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        size(uk).as("union_k"),
        size(array_intersect(uk, both)).as("match_k"))
      .withColumn("est_jaccard",
        col("match_k").cast("double") / col("union_k").cast("double"))
  }

  /** Estimates next to exact truth: per source pair, the sketch-estimated
    * and the exactly-computed shingle Jaccard. The exact side is the only
    * corpus-sized stage — one distinct (group, hash) shuffle and an
    * 8-byte-key equi-join — and exists to GRADE the estimator; callers at
    * scale use [[jaccardEstimates]] alone. */
  def overlapReport(df: DataFrame, textCol: String, groupCol: String,
                    n: Int, k: Int): DataFrame = {
    val est = jaccardEstimates(shingleSketches(df, textCol, groupCol, n, k), k)

    val sets = df.select(col(groupCol).as("grp"),
        explode(SignatureExprs.shingleHashSet(col(textCol), n)).as("h"))
      .distinct()
    val sizes = sets.groupBy(col("grp")).agg(count(lit(1)).as("n_distinct"))
    val inter = sets.select(col("grp").as("grp_a"), col("h"))
      .join(sets.select(col("grp").as("grp_b"), col("h")), Seq("h"))
      .filter(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b")).agg(count(lit(1)).as("n_inter"))

    est
      .join(broadcast(inter), Seq("grp_a", "grp_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(broadcast(sizes.select(col("grp").as("grp_a"), col("n_distinct").as("n_a"))), Seq("grp_a"))
      .join(broadcast(sizes.select(col("grp").as("grp_b"), col("n_distinct").as("n_b"))), Seq("grp_b"))
      .withColumn("exact_jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .select("grp_a", "grp_b", "union_k", "match_k", "est_jaccard",
        "n_inter", "n_a", "n_b", "exact_jaccard")
  }
}
