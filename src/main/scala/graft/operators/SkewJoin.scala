package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: hot keys are salted, everything else joins plain.
  *
  * When one join key carries a disproportionate share of the big side
  * (hot customers, null-ish sentinel keys), a plain shuffle join puts the
  * whole hot key in one task. The production pattern is TWO-PATH:
  *
  *  1. find the hot keys (caller-supplied, or estimated from a small
  *     sample of the big side — two driver jobs over ~sampleFraction of
  *     one column, hot set bounded by 1/hotShare keys);
  *  2. the hot slice is salted — each hot row gets a deterministic salt,
  *     the matching small-side rows are replicated saltFactor times, so
  *     the hot key's rows spread over saltFactor tasks;
  *  3. the cold slice joins plain — Catalyst still broadcasts the small
  *     side when it fits, which blanket salting would forfeit (replicating
  *     the small side 8x defeats both broadcast and map-side efficiency);
  *  4. union. The result set is identical to the plain join.
  *
  * With no skew detected the operator IS the plain join — zero overhead.
  * AQE's skew-split handles sort-merge skew when statistics see it at
  * runtime; explicit salting remains the tool when skew is known ahead
  * (and for aggregations after the join, where AQE can't rebalance the
  * downstream groupBy).
  */
object SkewJoin {

  /** Skew-probe policy when no `hotKeys` are supplied: `Detect` runs the
    * sample + collect probe (two small extra jobs); `None` skips it and
    * plans the plain join — for callers that KNOW the data isn't skewed
    * and want zero probe overhead. Supplied `hotKeys` always win. */
  sealed trait Probe
  case object Detect extends Probe
  case object NoProbe extends Probe

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, saltFactor: Int = 8,
                 hotKeys: Seq[Any] = Nil,
                 sampleFraction: Double = 0.01,
                 hotShare: Double = 0.05,
                 probe: Probe = Detect): DataFrame = {
    val hot: Seq[Any] =
      if (hotKeys.nonEmpty) hotKeys
      else if (probe == NoProbe) Nil
      else {
        // Deterministic seed: re-runs pick the same hot set. Correctness
        // never depends on the estimate — both paths emit identical rows —
        // only the plan shape does.
        val counts = big.select(col(bigKey)).na.drop()
          .sample(withReplacement = false, sampleFraction, seed = 42L)
          .groupBy(col(bigKey)).agg(count(lit(1)).as("__n"))
        // coalesce: sum() over zero sampled rows is null, not 0
        val total = counts.agg(coalesce(sum(col("__n")), lit(0L))).first().getLong(0)
        if (total == 0) Nil
        else counts.filter(col("__n") >= math.max(2.0, hotShare * total))
          .select(col(bigKey)).collect().map(_.get(0)).toSeq
      }

    def plainJoin(b: DataFrame, s: DataFrame): DataFrame =
      b.join(s, b(bigKey) === s(smallKey))

    if (hot.isEmpty) plainJoin(big, small)
    else {
      val isHot: Column = col(bigKey).isin(hot: _*)
      // Null keys take the cold path (isin on null is null; the coalesce
      // routes them to the plain join) where the inner equi-join drops
      // them — correct for this inner join, but an outer-join variant
      // would need an explicit null route.
      val cold = plainJoin(big.filter(not(coalesce(isHot, lit(false)))), small)

      // monotonically_increasing_id mixed into the salt: hashing row
      // content alone sends fully-identical duplicate rows of a hot key
      // (repeated sentinel rows — the exact skew case salting targets) to
      // ONE salt. The id is deterministic within a run and distinct per
      // row, so duplicates spread across all saltFactor tasks; the small
      // side is replicated to every salt, so routing stays correct.
      val saltedBig = big.filter(isHot).withColumn("__salt",
        pmod(xxhash64(struct(big.columns.map(col): _*),
          monotonically_increasing_id()), lit(saltFactor)).cast("int"))
      val saltedSmall = small.filter(col(smallKey).isin(hot: _*))
        .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      val hotJoin = saltedBig.join(saltedSmall,
          saltedBig(bigKey) === saltedSmall(smallKey) &&
            saltedBig("__salt") === saltedSmall("__salt"))
        .drop("__salt")

      // positional union: both branches emit big.columns ++ small.columns
      // in order; unionByName would reject the (legal) duplicate column
      // names a same-named join key produces
      cold.union(hotJoin)
    }
  }
}
