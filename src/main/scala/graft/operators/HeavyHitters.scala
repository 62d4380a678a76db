package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.expressions.MisraGriesAgg

/** Exact heavy hitters at scale, sketch-pruned:
  *
  *  1. one Misra-Gries pass (O(k) state per partition, mergeable) yields
  *     <= k candidate keys — a GUARANTEED superset of every key with
  *     share > 1/(k+1);
  *  2. an exact count of ONLY the candidates (isin filter pushed to the
  *     scan + one small groupBy) yields exact counts;
  *  3. the share threshold filters on exact counts.
  *
  * The final output is deterministic (sketch counter values depend on
  * merge order; the candidate-superset property — all we use — does not),
  * so the operator is DuckDB-oracle-checkable against the plain
  * `GROUP BY HAVING count >= ceil(share * N)` form it replaces. At 100 TB
  * the win is pass 2: the groupBy runs over only the candidate keys' rows
  * instead of shuffling every distinct key.
  *
  * `minShare` must be STRICTLY above `1/(k+1)` — the MG guarantee covers
  * keys with frequency strictly greater than N/(k+1), so at exactly the
  * bound a qualifying key could be missed. Null keys are excluded from
  * both the count and the output (a null key cannot be a hitter).
  */
object HeavyHitters {

  def exact(df: DataFrame, keyCol: String, minShare: Double, k: Int = 256): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare in (0, 1]")
    require(minShare > 1.0 / (k + 1),
      s"minShare=$minShare not above the sketch guarantee 1/(k+1)=${1.0 / (k + 1)}; raise k")

    // Pass 1: sketch + total count in ONE aggregation (no extra scan).
    val sk = df.agg(
      MisraGriesAgg.misraGries(col(keyCol), k).as("cands"),
      count(col(keyCol)).as("n")).head()
    val n = sk.getAs[Long]("n")
    val candidates = sk.getSeq[Row](sk.fieldIndex("cands")).map(_.get(0)) // <= k values, driver-bounded
    val threshold = math.ceil(minShare * n).toLong

    // empty candidate set still returns the (keyCol, n_occurrences)
    // schema — a zero-column frame would break downstream selects
    val filtered =
      if (candidates.isEmpty) df.limit(0)
      else df.filter(col(keyCol).isin(candidates: _*))
    filtered.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= threshold)
  }
}
