package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy transforms for training-data pipelines.
  *
  * [[pseudonymize]] replaces identifier columns with salted-hash tokens
  * (sha2-256 over `salt:value`). Deterministic, so REFERENTIAL INTEGRITY
  * SURVIVES: the same id maps to the same token in every table hashed
  * with the same salt, and joins on tokens produce exactly the joins the
  * raw ids would (q170 grades this cross-engine) — but the raw id never
  * enters the corpus. This is pseudonymization, not anonymization:
  * whoever holds the salt and the id universe can re-identify; rotate
  * or destroy the salt per governance policy. Complements the content
  * scrubbers (scrubPii) which handle identifiers INSIDE free text.
  *
  * Scale: pure per-row hash expressions — scan-side, codegen'd, zero
  * shuffle, and the token space (256-bit) makes accidental collisions
  * across entities negligible at any corpus size. */
object Privacy {

  /** Salted token for one identifier value. */
  def token(c: Column, salt: String): Column =
    sha2(concat(lit(salt + ":"), c.cast("string")), 256)

  /** Replace each named column with its salted token (same salt =>
    * join-compatible tokens across tables). */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame =
    cols.foldLeft(df)((d, cn) => d.withColumn(cn, token(col(cn), salt)))

  /** Re-identification risk audit: for each quasi-identifier combination,
    * the group size (k-anonymity: a group smaller than `k` is
    * re-identifiable by linkage) and the number of distinct sensitive
    * values (l-diversity: a group where everyone shares one sensitive
    * value leaks it even when k is satisfied). Output one row per
    * quasi-group: (quasi cols..., group_n, l_distinct, k_anon_ok,
    * l_div_ok) — the release gate is `every group ok`, the fix for
    * failing groups is generalizing a quasi column and re-auditing.
    *
    * Scale: one hash aggregation on the quasi columns (map-side
    * combined); distinct-sensitive counting rides the same shuffle via
    * count_distinct. No sort, no self-join; output is quasi-cardinality
    * sized. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("k_anon_ok", col("group_n") >= k)
      .withColumn("l_div_ok", col("l_distinct") >= l)

  /** t-closeness audit (Li et al. 2007) — the distribution-level gap
    * k-anonymity/l-diversity (q174) can't see: an equivalence class
    * whose SENSITIVE-VALUE DISTRIBUTION skews far from the corpus leaks
    * even with many members and many distinct values. Distance is the
    * ordered-attribute Earth Mover's Distance
    * `Σ_b |cumP_b - cumQ_b| / (B-1)` over the ORDERED sensitive
    * buckets — computed EXACTLY as cross-multiplied integers
    * (`|Σc·N - ΣC·n_g|` summed over the class×bucket grid, one 6dp
    * division at the end). Grid size = classes × observed buckets,
    * never data-sized. */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, t: Double): DataFrame = {
    require(t > 0 && t < 1, "t must be in (0,1)")
    val t6 = math.floor(t * 1e6 + 0.5).toLong
    val cls = df.groupBy(quasiCols.map(col) :+
        col(sensitiveCol).as("__sv"): _*)
      .agg(count(lit(1)).as("__c"))
    val classes = cls.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__ng"))
    val corpus = cls.groupBy(col("__sv")).agg(sum(col("__c")).as("__cb"))
    val totals = corpus.agg(sum(col("__cb")).as("__nn"),
      count(lit(1)).as("__nb"))
    val grid = classes.crossJoin(broadcast(corpus))
      .join(cls, quasiCols :+ "__sv", "left")
      .crossJoin(broadcast(totals))
      .withColumn("__cc", coalesce(col("__c"), lit(0L)))
    val wCum = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__sv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__cum", abs(sum(col("__cc") * col("__nn")).over(wCum)
        - sum(col("__cb") * col("__ng")).over(wCum)))
      .groupBy((quasiCols.map(col) :+ col("__ng")): _*)
      .agg((floor(sum(col("__cum")).cast("double")
        / (col("__ng") * max(col("__nn")) * (max(col("__nb")) - 1L))
          .cast("double") * lit(1e6) + lit(0.5d)).cast("long")).as("__e6"))
      .select((quasiCols.map(col) :+ col("__ng").as("group_n") :+
        (col("__e6").cast("double") / 1e6).as("emd") :+
        (col("__e6") <= t6).as("t_ok")): _*)
  }

  /** Laplace-mechanism noisy counts — the differential-privacy release
    * shape (sensitivity-1 count + Laplace(1/epsilon) noise) with the
    * noise drawn DETERMINISTICALLY from the md5-uniform hash through
    * the exact Laplace inverse CDF, so both engines replay it
    * bit-for-bit. THE SEED MAKES THIS A MECHANISM DEMO, NOT A PRIVATE
    * RELEASE: a fixed seed is a public quantity, so swap in a secure
    * RNG (and drop the true count from the output) before any real
    * publication. One aggregation; noise math is scan-side on the
    * group rows. */
  def laplaceNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
                         seed: String): DataFrame = {
    require(epsilon > 0, "epsilon must be > 0")
    val counts = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"))
    val u = (conv(substring(md5(concat(lit(seed), lit("|"), col("grp"))),
      1, 8), 16, 10).cast("long").cast("double") + lit(0.5d)) / lit(4294967296.0d)
    val d = u - lit(0.5d)
    val noise = (-(lit(1.0d / epsilon)) * signum(d)
      * log(lit(1.0d) - lit(2.0d) * abs(d)))
    counts
      .withColumn("noise", floor(noise * lit(1e6) + lit(0.5d)) / lit(1e6))
      .withColumn("noisy_n",
        col("n") + floor(col("noise") + lit(0.5d)).cast("long"))
      .withColumn("epsilon", lit(epsilon))
  }
}
