package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — the hashed-n-gram
  * importance-weighting scheme of Xie et al. 2023 ("Data Selection for
  * Language Models via Importance Resampling"): fit two bag-of-hashed-
  * features models, one on a small TARGET corpus (the distribution you
  * want more of) and one on the RAW pool, then weight every raw document
  * by its target/raw log-likelihood ratio and keep the top slice. The
  * standard "make the crawl look like Wikipedia" selection pass.
  *
  * Features: unigram tokens hashed into `buckets` cells with the house
  * md5-prefix h32 (`h32(term) mod B`) — hashing bounds model size at B
  * regardless of vocabulary, which is what makes the model a driver-side
  * literal instead of a join. Both models are Laplace-smoothed bucket
  * multinomials; a document's weight is
  *
  *   w(x) = sum over token occurrences of
  *          ln( ((ct[b]+1)/(tot_t+B)) / ((cr[b]+1)/(tot_r+B)) )
  *
  * with each bucket's log-ratio pre-rounded to the 6dp grid, so the
  * per-doc sum is engine- and order-portable (q95's grid-sum rule).
  *
  * Selection is deterministic top-k by (weight desc, doc_id) — the
  * rank-based variant of DSIR's Gumbel resampling (the paper's appendix
  * notes top-k performs comparably; it keeps the operator reproducible
  * across runs and engines).
  *
  * Scale (100 TB): ONE B-cell conditional aggregation with map-side
  * combine (the corpus is tokenized once for both multinomials; the
  * shuffle moves at most B rows per partition), one bounded collect of
  * 2B longs, then a ZERO-JOIN scan — each document folds its token
  * array against a literal B-entry map. Top-k plans as
  * `TakeOrderedAndProject` (per-partition heaps, never a global sort).
  */
object Dsir {

  private def toks(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")

  /** h32(term) mod B — codegen'd, DuckDB-replayable. */
  private def bucketOf(term: Column, buckets: Int): Column =
    pmod(conv(substring(md5(term), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** BOTH multinomials in ONE corpus pass: per-bucket (raw count,
    * target count) via a conditional aggregation — the raw pool is
    * tokenized once, not once per model. Driver-side (<= B entries). */
  private def bucketCounts(df: DataFrame, textCol: String,
                           targetPred: Column, buckets: Int): Map[Long, (Long, Long)] = {
    df.select(targetPred.as("__tgt"), explode(toks(textCol)).as("term"))
      .select(col("__tgt"), bucketOf(col("term"), buckets).as("bk"))
      .groupBy(col("bk"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** Above this bucket count the log-ratio model is shipped as a
    * BROADCAST relation instead of a `typedLit` map: a 2^20-entry literal
    * map inlines ~1M expression-tree nodes into the plan (analysis and
    * codegen blow up long before the data does), while a broadcast of
    * the same (bucket, log-ratio) pairs is a few MB of torrent-shipped
    * rows and a hash-lookup join. */
  val LiteralMapMaxBuckets: Int = 1 << 16

  /** Score every document of `raw` with its DSIR importance weight and
    * keep the top `k`: (doc_id, n_tokens, weight). `targetPred` marks
    * the in-pool target slice (e.g. `col("lang") === "en"` or a
    * quality-classifier verdict); a separate target corpus works by
    * unioning it in with a marker column. */
  def importanceSelect(raw: DataFrame, targetPred: Column, textCol: String,
                       idCol: String, buckets: Int = 256, k: Int = 100): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), "buckets must be in [2, 2^20]")
    val counts = bucketCounts(raw, textCol, targetPred, buckets)
    val totT = counts.values.map(_._2).sum
    val totR = counts.values.map(_._1).sum
    // log-ratio per bucket, one fixed IEEE sequence (mirrored by the
    // oracle): ((ct+1)/(totT+B)) / ((cr+1)/(totR+B)), ln, round 6dp.
    // Only buckets present in raw can be probed (every scored token came
    // from raw), so keying the literal map by the raw buckets is total.
    val lr: Map[Long, Double] = counts.map { case (b, (crb, ctb)) =>
      val num = (ctb + 1.0) / (totT + buckets).toDouble
      val den = (crb + 1.0) / (totR + buckets).toDouble
      b -> BigDecimal(math.log(num / den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val scored =
      if (buckets <= LiteralMapMaxBuckets) {
        // small model: zero-join scan, each doc folds its token array
        // against the literal map (6dp grid terms, so the fold order is
        // portable)
        val lps = transform(toks(textCol), t =>
          element_at(typedLit(lr), bucketOf(t, buckets)))
        raw.select(col(idCol).as("doc_id"),
            size(lps).cast("long").as("n_tokens"),
            round(aggregate(lps, lit(0.0d), _ + _), 6).as("weight"))
          .filter(col("n_tokens") > 0)
      } else {
        // big model: broadcast the (bucket, log-ratio) relation instead
        // of inlining ~buckets literals into the expression tree. Every
        // probed bucket exists in the model (all scored tokens came from
        // raw), so the inner hash join is total; the grid terms make the
        // order-free sum agree with the fold above.
        import raw.sparkSession.implicits._
        val model = lr.toSeq.toDF("bk", "lrv")
        raw.select(col(idCol).as("doc_id"), explode(toks(textCol)).as("term"))
          .select(col("doc_id"), bucketOf(col("term"), buckets).as("bk"))
          .join(broadcast(model), Seq("bk"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            round(sum(col("lrv")), 6).as("weight"))
      }
    scored.orderBy(col("weight").desc, col("doc_id").asc).limit(k)
  }

  /** Per-group distribution drift: KL(P_group || P_corpus) over the same
    * hashed-unigram buckets, Laplace smoothed — "which source no longer
    * looks like the corpus", the mixture-monitoring twin of
    * [[importanceSelect]] (there the ratio model SELECTS documents; here
    * it scores whole groups).
    *
    * Fully relational — no driver-side model: bucket counts key one
    * aggregation on (group, bucket), the corpus marginal reaggregates by
    * bucket, and the KL sum is a group-keyed aggregation of per-bucket
    * grid terms (each term 6dp-rounded before the order-free grid sum).
    * Groups x buckets rows flow between stages — never the corpus.
    * Output: (group, n_tokens, kl). */
  def klDrift(df: DataFrame, textCol: String, groupCol: String,
              buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), "buckets must be in [2, 2^20]")
    val bk = df.select(col(groupCol).as("grp"),
        explode(toks(textCol)).as("term"))
      .select(col("grp"), bucketOf(col("term"), buckets).as("bk"))
      .groupBy(col("grp"), col("bk")).agg(count(lit(1)).as("cg"))
    val corpus = bk.groupBy(col("bk")).agg(sum(col("cg")).as("cc"))
    val gtot = bk.groupBy(col("grp")).agg(sum(col("cg")).as("tg"))
    val ctot = corpus.agg(sum(col("cc")).as("tc"))
    val b = lit(buckets.toDouble)
    // smoothed probabilities; every group joins every one of ITS buckets
    // (zero-count buckets contribute ~0 to KL under p*ln(p/q) with
    // p -> 0 smoothing mass folded into the observed buckets)
    val term = (col("cg") + 1.0) / (col("tg") + b) *
      log(((col("cg") + 1.0) / (col("tg") + b)) /
          ((col("cc") + 1.0) / (col("tc") + b)))
    bk.join(corpus, Seq("bk"))
      .join(gtot, Seq("grp"))
      .crossJoin(broadcast(ctot))
      .withColumn("t6", round(term, 6))
      .groupBy(col("grp"))
      .agg(max(col("tg")).as("n_tokens"), round(sum(col("t6")), 6).as("kl"))
      .select(col("grp"), col("n_tokens"), col("kl"))
  }

  /** Jensen–Shannon drift per group against the whole corpus — the
    * SYMMETRIC, [0, ln 2]-bounded complement of `klDrift`: KL explodes
    * on mass the reference lacks, JSD stays finite and comparable
    * across groups, so it is the one to threshold in a drift gate.
    * Same hashed-bucket token model as klDrift, but on the FULL
    * group×bucket grid (every observed corpus bucket joins every
    * group, the psiDrift shape) with Laplace-smoothed p/q,
    * `M = (P+Q)/2`, and `Σ p/2·ln(p/m) + q/2·ln(q/m)` as 6dp-rounded
    * terms. Grid size is groups × buckets — bounded, never data-sized. */
  def jsdDrift(df: DataFrame, textCol: String, groupCol: String,
               buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), "buckets must be in [2, 2^20]")
    val bk = df.select(col(groupCol).as("grp"),
        explode(toks(textCol)).as("term"))
      .select(col("grp"), bucketOf(col("term"), buckets).as("bk"))
      .groupBy(col("grp"), col("bk")).agg(count(lit(1)).as("cg"))
    val corpus = bk.groupBy(col("bk")).agg(sum(col("cg")).as("cc"))
    val gtot = bk.groupBy(col("grp")).agg(sum(col("cg")).as("tg"))
    val ctot = corpus.agg(sum(col("cc")).as("tc"))
    val b = lit(buckets.toDouble)
    val grid = gtot.crossJoin(broadcast(corpus))
      .join(bk, Seq("grp", "bk"), "left")
      .crossJoin(broadcast(ctot))
      .withColumn("__cg", coalesce(col("cg"), lit(0L)))
    val p = (col("__cg") + 1.0) / (col("tg") + b)
    val q = (col("cc") + 1.0) / (col("tc") + b)
    val m = (p + q) / 2.0
    val term = p / 2.0 * log(p / m) + q / 2.0 * log(q / m)
    grid.withColumn("__t6", round(term, 6))
      .groupBy(col("grp"))
      .agg(max(col("tg")).as("n_tokens"), round(sum(col("__t6")), 6).as("jsd"))
      .select(col("grp"), col("n_tokens"), col("jsd"))
  }

  /** POPULATION STABILITY INDEX per group over a NUMERIC column — the
    * MLOps-standard drift gate (PSI < 0.1 stable, > 0.25 act), here
    * against exact corpus deciles:
    *
    *   PSI_g = Σ_b (p_b - q_b) ln(p_b / q_b),  b over 10 corpus-decile
    *   buckets, p = group share, q = corpus share, Laplace-smoothed so
    *   empty buckets are defined.
    *
    * Decile boundaries are EXACT order statistics (smallest value with
    * cumulative count >= ceil(p*n/10), integer ceil-div — no sketch, no
    * interpolation), derived from the aggregated (value, count) rows
    * and collected under a fail-loud cap; bucket assignment is then the
    * scan-side boundaries-strictly-below count (the QuantileNorm
    * idiom). Terms snap to the 6dp grid before an order-free sum.
    *
    * vs [[klDrift]]: KL over hashed TEXT unigrams measures content
    * drift; PSI over value deciles measures a numeric feature's
    * distribution shift — the pair covers both gate types.
    * Output: (grp, n_rows, psi). */
  def psiDrift(df: DataFrame, valueCol: String, groupCol: String,
               maxDistinct: Int = 65536): DataFrame = {
    val d = df.select(col(groupCol).as("grp"),
      col(valueCol).cast("long").as("v"))
    val cum = d.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .limit(maxDistinct + 1).collect()
    require(cum.length <= maxDistinct,
      s"psiDrift: more than $maxDistinct distinct values in '$valueCol'" +
        " — quantize upstream (deciles of an id-like column are not a" +
        " drift gate)")
    val n = cum.map(_.getLong(1)).sum
    val sorted = cum.sortBy(_.getLong(0))
    val bounds: Seq[Long] = (1 to 9).map { p =>
      val need = (p * n + 9) / 10
      sorted.find(_.getLong(2) >= need).get.getLong(0)
    }
    val bucket = size(filter(typedLit(bounds), b => b < col("v")))
      .cast("long")
    val bySrc = d.select(col("grp"), bucket.as("b"))
      .groupBy(col("grp"), col("b")).agg(count(lit(1)).as("cs"))
    val srcs = d.groupBy(col("grp")).agg(count(lit(1)).as("ns"))
    val byCorp = bySrc.groupBy(col("b")).agg(sum(col("cs")).as("cc"))
    // complete grid: every (group, bucket) cell, zero counts included —
    // Laplace needs the absent cells; strata × 10 rows, broadcast side
    val grid = srcs.crossJoin(
        broadcast(byCorp.select(col("b"), col("cc"))))
      .join(bySrc, Seq("grp", "b"), "left")
      .select(col("grp"), col("ns"), col("b"),
        coalesce(col("cs"), lit(0L)).as("cs"), col("cc"))
    val p = (col("cs") + 1.0d) / (col("ns") + 10.0d)
    val q = (col("cc") + 1.0d) / (lit(n.toDouble) + 10.0d)
    grid
      .withColumn("t6",
        floor((p - q) * log(p / q) * lit(1e6) + lit(0.5d)).cast("long"))
      .groupBy(col("grp"))
      .agg(max(col("ns")).as("n_rows"),
        (sum(col("t6")).cast("double") / lit(1e6)).as("psi"))
  }
}
