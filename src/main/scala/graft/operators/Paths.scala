package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clickstream path analytics: where do users GO — the first-order
  * transition structure (Markov matrix) and the most common opening
  * journeys.
  *
  * Both operators order a user's events by (ts, id) — the id tiebreak
  * makes the sequence deterministic under same-timestamp events, which
  * is what keeps the result engine-portable and re-run-stable.
  *
  * Scale: ONE hash shuffle on the user key; `lead`/rank windows and the
  * per-user aggregation reuse that partitioning. The transition /
  * path aggregations that follow are keyed on event-type pairs and path
  * strings — vocabulary-sized frames, tiny next to the event scan.
  */
object Paths {

  /** First-order transition matrix: (from_type, to_type, n, p) where p
    * is the row-normalized probability on the 6dp grid. Transitions
    * cross session boundaries deliberately (pass sessionized input to
    * confine them). */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("row_total", sum(col("n")).over(byFrom))
      .withColumn("p",
        floor(col("n").cast("double") / col("row_total").cast("double")
          * lit(1e6) + lit(0.5d)) / lit(1e6))
  }

  /** Top-k opening paths: the first `depth` event types of each user's
    * timeline joined with '>', counted and ranked (ties break on the
    * path string). Users with fewer than `depth` events report their
    * full (shorter) path. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String, depth: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val paths = events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
      .groupBy(col(userCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
        x => x.getField("t")), ">").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc).limit(k)
  }
}
