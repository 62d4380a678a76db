package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a grouped rollup current by
  * folding in only the NEW batch, never rescanning history — the
  * materialized-view-maintenance pattern that makes "total per key over
  * 100 TB of history" a per-batch cost instead of a full recompute.
  *
  * Works for any algebraic aggregate carried as mergeable partials:
  * count and sum merge by addition (avg = sum/count at read time,
  * min/max merge by min/max). Money amounts are carried as EXACT cents
  * (floor(x*100 + 0.5) BIGINT, the repo's grid rule) so the stored state
  * is engine-portable and immune to float-accumulation drift — after a
  * thousand merges the rollup still equals a from-scratch recompute
  * bit-for-bit, which is exactly what the q130 oracle asserts.
  *
  * Scale: `partials` is one map-side-combined aggregation of the batch;
  * `merge` is a union of partial frames + the same aggregation — one
  * shuffle on the group key, sized by KEYS not history. Store the state
  * bucketed by the key (IncrementalLoad.writeBucketed) and the merge
  * becomes shuffle-free.
  */
object IncrementalAgg {

  /** Mergeable partial state of a batch: (keys..., n, cents, min_c, max_c). */
  def partials(batch: DataFrame, keys: Seq[String], amountCol: String): DataFrame = {
    val cents = floor(col(amountCol).cast("double") * 100d + 0.5d).cast("long")
    batch.withColumn("__c", cents)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("cents"),
        min(col("__c")).as("min_cents"), max(col("__c")).as("max_cents"))
  }

  /** Fold any number of partial states into one (associative +
    * commutative, so batches can arrive in any order or grouping). */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"),
        min(col("min_cents")).as("min_cents"), max(col("max_cents")).as("max_cents"))

  /** Read-time view over the exact state: derived average on the house
    * 6dp grid (one division over exact integers). */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_amount",
      floor(col("cents").cast("double") / col("n").cast("double") / 100d
        * lit(1e6) + lit(0.5d)) / lit(1e6))
}
