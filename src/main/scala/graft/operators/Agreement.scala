package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator / inter-model agreement: Cohen's kappa over two
  * categorical labelings of the same rows — the standard
  * chance-corrected agreement score a labeling pipeline reports when
  * two annotators (or a heuristic and a model, cf. q41 vs q283) tag
  * the same corpus. Raw accuracy rewards majority-class collusion;
  * kappa subtracts the agreement the two marginal distributions
  * would produce by chance.
  *
  * `kappa = (p_o - p_e) / (1 - p_e)` computed entirely in exact
  * integers: with N rows, `agree` diagonal mass and
  * `S = Σ_k row_k · col_k` the chance cross-product,
  * `kappa = (N·agree - S) / (N² - S)` — numerator and denominator
  * accumulate in decimal(38,0) (N² overflows BIGINT at real corpus
  * size), ONE double division at the end, rounded to the 6dp grid.
  *
  * Scale: one (g1, g2) count aggregation (map-side combined; the
  * contingency table is |classes|², tiny), two re-aggregations of
  * that table for the margins, and 1-row broadcast joins — nothing
  * data-sized moves after the first shuffle.
  *
  * Output: the contingency rows (g1, g2, n) with the corpus totals
  * (n_total, agree_n) and `kappa` riding on every row as
  * observability columns (the q257 dropped_centers idiom). */
object Agreement {

  def cohenKappa(pred: DataFrame, c1: String, c2: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = pred.groupBy(col(c1).as("g1"), col(c2).as("g2"))
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy(col("g1").as("k")).agg(sum(col("n")).as("r"))
    val cols = cells.groupBy(col("g2").as("k")).agg(sum(col("n")).as("c"))
    // classes missing from either margin contribute r·c = 0 — inner join
    val chance = rows.join(cols, Seq("k"))
      .agg(coalesce(sum(col("r").cast(dec) * col("c").cast(dec)),
        lit(0L).cast(dec)).as("s"))
    val tot = cells.agg(sum(col("n")).as("n_total"),
      sum(when(col("g1") === col("g2"), col("n")).otherwise(lit(0L)))
        .as("agree_n"))
    // p_e = 1 (both labelings one identical constant class) zeroes the
    // denominator: kappa is undefined there — emit NULL explicitly on
    // both engines rather than ride each engine's div-by-zero habits
    // (Spark NULL vs DuckDB inf would silently hash-diverge)
    val den = (col("n_total").cast(dec) * col("n_total").cast(dec)
      - col("s")).cast("double")
    val stats = tot.crossJoin(broadcast(chance))
      .select(col("n_total"), col("agree_n"),
        when(den =!= lit(0.0d),
          round((col("n_total").cast(dec) * col("agree_n").cast(dec)
            - col("s")).cast("double") / den, 6))
          .otherwise(lit(null).cast("double")).as("kappa"))
    cells.crossJoin(broadcast(stats))
  }
}
