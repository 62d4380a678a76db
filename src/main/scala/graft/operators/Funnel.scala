package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how far does each user progress through a
  * required sequence of event types (view -> click -> purchase), where each
  * step must occur STRICTLY AFTER the previous one?
  *
  * Semantics: per user, `t_1 = min ts of step 1`; `t_i = min ts of step i
  * with ts > t_{i-1}`. The user's funnel stage is the largest `i` with
  * `t_i` defined (0 if they never performed step 1). This is the standard
  * product-analytics funnel: re-orderings don't count (a purchase before
  * the first qualifying click does not advance the funnel), and the
  * earliest qualifying occurrence is chosen at every step, which maximizes
  * the chance of completing later steps (min-ts greedy is optimal here:
  * any other choice of step-i time only shrinks the window for step i+1).
  *
  * Scale: ONE hash shuffle on the user key. Every per-step minimum is an
  * unordered window aggregate over the same `partitionBy(user)` — Catalyst
  * plans a single Exchange and chains the Window operators, so the cost at
  * 100 TB is one shuffle of (user, ts, type) projections, never a
  * self-join per step. Stage counting then aggregates users-per-stage
  * (stage cardinality = steps+1 rows out).
  */
object Funnel {

  /** Per-user funnel depth: (user, stage) with stage in [0, steps.length].
    * `steps` are matched against `typeCol` in order. With `maxGapMinutes`
    * set, each step must additionally occur within that many minutes of
    * the previous step's chosen time (the bounded-window conversion funnel
    * — "clicked within 30 minutes of the view").
    */
  def userStages(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String],
                 maxGapMinutes: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    val stepCols = steps.indices.map(i => s"__t${i + 1}")
    val withTimes = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val qualifies: Column =
        if (i == 0) col(typeCol) === step
        else {
          val after = col(typeCol) === step && col(tsCol) > col(stepCols(i - 1))
          maxGapMinutes.fold(after) { m =>
            after && col(tsCol) <= col(stepCols(i - 1)) + expr(s"INTERVAL $m MINUTE")
          }
        }
      df.withColumn(stepCols(i), min(when(qualifies, col(tsCol))).over(w))
    }
    // All rows of a user carry identical __t* values; max() collapses them
    // (and is null only when the step was never reached).
    val aggs = stepCols.map(c => max(col(c)).as(c))
    val perUser = withTimes.groupBy(col(userCol).as("user"))
      .agg(aggs.head, aggs.tail: _*)
    // Fold FORWARD so the deepest step's check ends up outermost:
    // when(t_k) k ... otherwise(when(t_1) 1 otherwise 0).
    val stage = stepCols.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (c, i)) => when(col(c).isNotNull, lit(i + 1)).otherwise(acc)
    }
    perUser.select(col("user"), stage.cast("int").as("stage"))
  }

  /** Users per funnel stage reached (stage 0 = entered the data but never
    * performed step 1). */
  def stageCounts(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  maxGapMinutes: Option[Long] = None): DataFrame =
    userStages(events, userCol, tsCol, typeCol, steps, maxGapMinutes)
      .groupBy(col("stage"))
      .agg(count(lit(1)).cast("long").as("n_users"))

  /** Frequent CONSECUTIVE event n-grams across user streams — the
    * sequential-pattern-mining counterpart of the fixed funnel (which
    * n-step behaviors actually occur, before anyone hard-codes a
    * funnel to measure) and of the Markov chain (observed n-th-order
    * patterns vs the fitted 1st-order model). Each user's
    * (ts, event_id)-ordered stream contributes every length-`n` run;
    * output the `topK` patterns by total occurrences with distinct-
    * user support, ties to the lexicographically smallest pattern.
    *
    * Scale: ONE hash shuffle on user (the funnel partitioning) for
    * the lead windows, then a pattern-keyed count/count-distinct pair
    * (two-level agg keeps the (pattern, user) partial map-side);
    * top-k is sort+limit, never a global window. */
  def frequentSequences(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String, n: Int,
                        topK: Int): DataFrame = {
    require(n >= 2, "n >= 2 (a 1-gram is just a value count)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("ts").asc, col("eid").asc)
    val base = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(idCol).as("eid"), col(typeCol).as("e0"))
    val withLeads = (1 until n).foldLeft(base) { (df, i) =>
      df.withColumn(s"e$i", lead(col("e0"), i).over(w))
    }
    // concat (NOT concat_ws): a NULL event type must kill the gram,
    // not silently collapse it into a shorter pattern; the filter
    // below drops every window touching a NULL or the stream tail.
    // (Patterns assume '>' does not occur inside event-type names.)
    val gram = concat((0 until n).flatMap(i =>
      if (i == 0) Seq(col("e0")) else Seq(lit(">"), col(s"e$i"))): _*)
    val perUser = withLeads
      .filter((0 until n).map(i => col(s"e$i").isNotNull).reduce(_ && _))
      .select(col("u"), gram.as("pattern"))
      .groupBy(col("pattern"), col("u")).agg(count(lit(1)).as("__c"))
    perUser.groupBy(col("pattern"))
      .agg(sum(col("__c")).as("n_occurrences"),
        count(lit(1)).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("pattern").asc).limit(topK)
  }
}
