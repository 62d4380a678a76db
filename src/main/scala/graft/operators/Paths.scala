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

  /** Conditional transition entropy per user, `H(next | current) =
    * Σ_{s,t} c(s,t)/C · ln(c(s,·)/c(s,t))` over consecutive event-type
    * bigrams — how PREDICTABLE a user's next action is. Near-zero means
    * a deterministic loop (the content-side complement of q241's timing
    * regularity: a bot can jitter its clock but still walks the same
    * cycle). Exact integer counts, one 6dp-grid term per observed
    * bigram, integer sum; output one row per user with >= 1
    * transition. One windowed pass partitioned by user, then bounded
    * per-user aggregates. */
  def transitionEntropy(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val bi = events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(userCol).as("user"), col(typeCol).as("s"), col("to_type").as("t"))
      .agg(count(lit(1)).as("c"))
    val fromTot = bi.groupBy(col("user"), col("s")).agg(sum(col("c")).as("cs"))
    val userTot = bi.groupBy(col("user")).agg(sum(col("c")).as("ct"))
    bi.join(fromTot, Seq("user", "s")).join(userTot, Seq("user"))
      .withColumn("__t6",
        floor(col("c").cast("double") / col("ct").cast("double")
          * log(col("cs").cast("double") / col("c").cast("double"))
          * lit(1e6) + lit(0.5d)).cast("long"))
      .groupBy(col("user").as("user_id"))
      .agg(max(col("ct")).as("n_transitions"), sum(col("__t6")).as("__h6"))
      .select(col("user_id"), col("n_transitions"),
        (col("__h6").cast("double") / 1e6).as("cond_entropy"))
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
