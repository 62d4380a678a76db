package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-relative quantile bucketing — "which quartile of its language's
  * length distribution is this document in" — the quantile-normalization
  * step behind per-source quality binning and curriculum schedules
  * (compare scores ACROSS sources by rank, not raw value, so one
  * source's score scale can't dominate a mixing policy).
  *
  * The naive form is a per-group `ntile`/`percent_rank` window — a sort
  * of every group, the exact per-stratum-sort shape this engine bans at
  * scale (a dominant group becomes one near-global sort). Here the sort
  * never happens:
  *
  *   1. per-group boundary estimation via [[graft.expressions.KmvQuantileAgg]] —
  *      one aggregation, O(k) state per group, partition-order
  *      deterministic (the k-minimum-id-hash row sample);
  *   2. a bounded collect of (groups x probs) boundary doubles — group
  *      cardinality must be driver-bounded (languages, sources, shards:
  *      the strata this operator exists for);
  *   3. scan-side assignment: `bucket = #boundaries strictly below the
  *      value` against the literal boundary map — zero additional
  *      shuffle, codegen-friendly, exact given the boundaries.
  *
  * Accuracy: a group with <= k rows is sampled in full, so its
  * boundaries — and every bucket — are EXACT (the lower-value rank
  * convention `v[ceil(p*n)]`; the q187 oracle replays it relationally).
  * Larger groups get boundaries with O(1/sqrt(k)) rank error while
  * assignment stays deterministic — re-runs, partitionings, and AQE
  * re-plans agree bit for bit, unlike `percentile_approx`'s merge-order-
  * dependent summaries.
  */
object QuantileNorm {

  /** Map key standing in for a null group value — Spark forbids null map
    * keys, so null groups are coalesced to this sentinel on BOTH sides
    * (boundary aggregation and scan-side lookup) and bucket correctly
    * among themselves as their own stratum. */
  val NullGroupKey = "__null__"

  /** Per-row bucket assignment: (idCol, groupCol, valueCol, bucket) with
    * `bucket` in [0, probs.length] — bucket b holds rows above the b-th
    * boundary (0 = at-or-below the first). `probs` must be ascending.
    *
    * `maxGroups` is the fail-loud stratum cap: the boundary collect is
    * fetched with `limit(maxGroups + 1)`, so a groupCol with unbounded
    * cardinality (a mistaken id column at 100 TB) throws a clear error
    * after moving at most maxGroups+1 tiny rows — it can never OOM the
    * driver. */
  def quantileBuckets(df: DataFrame, valueCol: String, idCol: String,
                      groupCol: String, probs: Seq[Double] = Seq(0.25, 0.5, 0.75),
                      k: Int = 4096, maxGroups: Int = 65536): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted &&
      probs.forall(p => p > 0.0 && p < 1.0), "probs must be ascending in (0,1)")
    require(maxGroups >= 1, "maxGroups must be >= 1")
    import graft.expressions.KmvQuantileAgg.kmvQuantiles
    val gKey = coalesce(col(groupCol).cast("string"), lit(NullGroupKey))
    val rows =
      df.groupBy(gKey.as("g"))
        .agg(kmvQuantiles(col(valueCol), col(idCol), k, probs).as("bs"))
        .limit(maxGroups + 1).collect()
    require(rows.length <= maxGroups,
      s"quantileBuckets: more than $maxGroups distinct values in " +
        s"'$groupCol' — strata must be driver-bounded (languages, sources," +
        " shards); check the group column or raise maxGroups")
    val bounds: Map[String, Seq[Double]] =
      rows.map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val bs = element_at(typedLit(bounds), gKey)
    df.select(col(idCol), col(groupCol), col(valueCol),
      size(filter(bs, b => col(valueCol).cast("double") > b))
        .cast("long").as("bucket"))
  }
}
