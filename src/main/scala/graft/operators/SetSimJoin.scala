package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Exact set-similarity self-join with PREFIX FILTERING (the
  * PPJoin/AllPairs candidate rule of Bayardo, Ma & Srikant, WWW'07, and
  * Xiao et al., WWW'08) — the scale path for exact Jaccard joins.
  *
  * [[Dedup.ngramJaccardPairs]] generates a candidate pair for EVERY
  * shared shingle: the shuffle carries `sum(df_g^2)` posting pairs, and
  * only a stop-shingle cap keeps that quadratic term bounded — at the
  * cost of silently dropping any pair whose overlap lives entirely in
  * capped shingles. Prefix filtering removes the quadratic term WITHOUT
  * losing a single pair:
  *
  *   order all shingles by a GLOBAL total order (document frequency
  *   ascending, hash ascending — rarest first); a document of n
  *   distinct shingles indexes only its first `n - ceil(t*n) + 1`
  *   shingles in that order. Two sets with Jaccard >= t overlap in
  *   >= ceil(t/(1+t) * (na+nb)) elements, so they MUST collide inside
  *   those prefixes — any pair missed by the prefix index provably has
  *   jaccard < t (no recall caveat, unlike the banded-LSH family).
  *
  * Candidates are additionally length-filtered (`t*na <= nb <= na/t` —
  * a size ratio outside that band caps Jaccard below t on its own) and
  * then verified EXACTLY: the pair joins back both distinct-shingle-hash
  * arrays and computes `|A∩B| / (na + nb - |A∩B|)`.
  *
  * Scale: the inverted index carries only prefix postings — for
  * t = 0.5 that's half of each document, for t = 0.8 a fifth — and the
  * rarest-first order makes the indexed shingles exactly the ones with
  * the SHORTEST postings lists, so candidate generation touches the
  * small end of the df distribution. The df ranking is one aggregation
  * plus a per-document window (partition = one document, bounded by
  * document length — skew-free). Verification ships the two shingle-hash
  * arrays to candidate pairs only; shingle STRINGS never shuffle
  * (64-bit hashes stand in, the q33 collision caveat applies). Every
  * shuffle key (shingle hash, doc id) is uniform.
  *
  * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to
  * the 6dp grid — identical contract to [[Dedup.ngramJaccardPairs]],
  * and since the filter chain is lossless the oracle is the plain exact
  * all-pairs SQL, not a recall floor.
  */
object SetSimJoin {

  def prefixFilteredPairs(df: DataFrame, textCol: String, idCol: String,
                          shingleN: Int = 3,
                          threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0, "threshold must be in (0,1)")
    // Materialized once ([[Lineage.cut]]): the shingle arrays feed the
    // postings build AND both sides of candidate verification — without
    // the cut the plan recomputes shingling three times.
    // NO fanOut here (reverted r19): interleaved same-host A/B showed
    // the pre-shingle repartition consistently ~6% SLOWER at sf0.1 —
    // xxhash shingling is too cheap to pay back an exchange of text
    // payloads (unlike winnow's md5-per-gram, where fanOut holds).
    val sh = Lineage.cut(df
      .select(col(idCol).as("id"),
        TextAnalysis.shingles(col(textCol), shingleN).as("__sh"))
      .select(col("id"),
        array_sort(transform(col("__sh"), g => xxhash64(g))).as("hs"),
        size(col("__sh")).cast("long").as("n")))
    // Postings + global document frequency. agg + join (not a window
    // over g): df is a full-corpus property and the agg shape keeps the
    // exchange free of per-key sorts.
    val postings = sh.select(col("id"), col("n"), explode(col("hs")).as("g"))
    val dfreq = postings.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // Rarest-first total order; rank within each document is a window
    // whose partition is ONE document (<= its shingle count) — bounded,
    // uniform, no stratum-sort hazard.
    val ranked = postings.join(dfreq, "g")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df").asc, col("g").asc)))
    // Materialized once: both sides of the candidate self-join read the
    // SAME prefix index (df ranking included) instead of deriving it
    // twice — at corpus scale the df-rank derivation is the expensive
    // half of the operator.
    val prefix = Lineage.cut(ranked
      .filter(col("r") <= col("n") - ceil(lit(threshold) * col("n")) + lit(1))
      .select(col("g"), col("id"), col("n")))
    // Prefix collision + two-sided length filter, then pair dedup: a
    // pair colliding on several prefix shingles must verify once.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          col("b.n") >= ceil(lit(threshold) * col("a.n")) &&
          col("b.n") * lit(threshold) <= col("a.n"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Exact verification on the surviving candidates only.
    cand
      .join(sh.select(col("id").as("id_a"), col("hs").as("hs_a"),
        col("n").as("n_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("hs").as("hs_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
