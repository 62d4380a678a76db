package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Model-based document quality scoring — the learned-classifier stage of
  * an LLM data pipeline (the CCNet/GPT-3-shape "quality classifier": score
  * every document against a trained linear model, keep the high-quality
  * tail). Complements the rule-based filters (Gopher rules, q44): rules
  * encode thresholds a human wrote, the model encodes weights FIT to a
  * labeled sample.
  *
  * Both halves are Spark-first:
  *  - **Scoring** is a pure per-row expression tree (engineered features →
  *    dot product → sigmoid), codegen'd, zero shuffle: the 100 TB path is
  *    scan → project, the same cost as any column derivation. Weights ride
  *    the plan as literals, exactly like the IVF centroid matrix.
  *  - **Training** is batch gradient descent where each iteration is ONE
  *    aggregation (map-side-combined sums of d+1 doubles); only the
  *    gradient vector ever reaches the driver, so iterations cost
  *    O(scan) with no per-row driver traffic.
  */
object QualityModel {

  /** Engineered per-document features, all deterministic round(…, 6)
    * expressions replayable in ANSI SQL (the oracle mirrors them):
    * log(1+tokens), stopword ratio, punctuation ratio, digit ratio. */
  def features(text: Column): Seq[Column] = Seq(
    round(log(lit(1.0d) + TextAnalysis.tokenCount(text).cast("double")), 6),
    TextAnalysis.stopwordRatio(text),
    TextAnalysis.punctRatio(text),
    TextAnalysis.digitRatio(text))

  val FeatureNames: Seq[String] =
    Seq("log_tokens", "stop_ratio", "punct_ratio", "digit_ratio")

  private def sigmoid(z: Column): Column = lit(1.0d) / (lit(1.0d) + exp(-z))

  /** Linear logit over the engineered features: bias + w · f. Kept
    * separate from [[score]] so training can reuse the identical feature
    * pipeline (train/serve skew is the classic bug in this stage). */
  private def logit(text: Column, weights: Seq[Double], bias: Double): Column =
    features(text).zip(weights)
      .foldLeft(lit(bias)) { case (acc, (f, w)) => acc + f * lit(w) }

  /** Score `df` with a fitted model: adds `quality_prob` (rounded 6) and
    * `kept` (prob >= threshold). Scan-side only — no shuffle, no UDF. */
  def score(df: DataFrame, textCol: String, weights: Seq[Double],
            bias: Double, threshold: Double = 0.5): DataFrame = {
    require(weights.length == FeatureNames.length,
      s"expected ${FeatureNames.length} weights")
    val prob = round(sigmoid(logit(col(textCol), weights, bias)), 6)
    df.withColumn("quality_prob", prob)
      .withColumn("kept", col("quality_prob") >= threshold)
  }

  /** Per-row gradient contributions are quantized to this grid before
    * summation, making every gradient an EXACT integer sum. */
  val GradScale: Double = 1e6

  /** Split-conformal prediction sets for the trained classifier
    * (Vovk et al.; the distribution-free coverage guarantee): on a
    * held-out calibration split, nonconformity is `1 - p(true label)`;
    * `q_hat` is the `ceil((n_cal+1)(1-alpha))`-th smallest score
    * (house order statistic); a test document's prediction SET then
    * contains every label whose nonconformity stays within q_hat —
    * {1}, {0}, both (ambiguous), or empty (outlier). Marginal coverage
    * >= 1-alpha holds by construction, no distributional assumption.
    * Output: one row per set shape with counts and the empirical
    * coverage of that shape, plus q_hat — aggregate-sized.
    *
    * All scores live on the 6dp grid (scores = the replayable q182
    * probabilities), so the rank threshold is engine-portable. The
    * calibration membership is the house md5 hash split. */
  def conformalSets(df: DataFrame, textCol: String, idCol: String,
                    labelCol: String, weights: Seq[Double], bias: Double,
                    alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    val p6 = floor(round(sigmoid(logit(col(textCol), weights, bias)), 6)
      * lit(1e6) + lit(0.5d)).cast("long")
    val isCal = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long"), lit(4L)) === 0L
    val scored = df.select(col(idCol).as("__id"), col(labelCol).as("__y"),
      p6.as("__p6"), isCal.as("__cal"))
    // nonconformity of the TRUE label: 1e6 - p6 if y=1 else p6
    val s6 = when(col("__y") === 1, lit(1000000L) - col("__p6"))
      .otherwise(col("__p6"))
    val cal = scored.filter(col("__cal")).withColumn("__s6", s6)
    // Single order statistic via the aggregate-then-cumulative idiom
    // (the rocAuc / weightedQuantiles shape): group the calibration
    // split by the BOUNDED __s6 grid (<= 1e6+1 distinct values no
    // matter the corpus size), scale-adaptive cumulative count
    // (Ranks.cumSums — two-pass global offsets above 1M distinct
    // scores), then q_hat = the smallest score whose cumulative count
    // reaches ceil((1-alpha)(n+1)). Ranks within a tied score are
    // contiguous, so min-score-with-cum>=k equals the old
    // min-score-with-rank>=k exactly — same q_hat, but the
    // corpus-proportional single-partition row_number window is gone:
    // nothing row-proportional ever funnels into one task.
    val perScore = cal.groupBy(col("__s6")).agg(count(lit(1)).as("__nv"))
    val qhat = Ranks.cumSums(perScore, Nil, "__s6",
        Seq(("__nv", "__cum", true)), totals = Seq(("__nv", "__nc")))
      .agg(min(when(col("__cum") >=
        ceil(lit(1.0 - alpha) * (col("__nc") + 1L)), col("__s6")))
        .as("__q6"))
    scored.filter(!col("__cal"))
      .join(broadcast(qhat))
      .withColumn("__in1", lit(1000000L) - col("__p6") <= col("__q6"))
      .withColumn("__in0", col("__p6") <= col("__q6"))
      .withColumn("pred_set",
        when(col("__in1") && col("__in0"), "both")
          .when(col("__in1"), "{1}")
          .when(col("__in0"), "{0}")
          .otherwise("empty"))
      .withColumn("__covered",
        (col("__y") === 1 && col("__in1")) || (col("__y") === 0 && col("__in0")))
      .groupBy(col("pred_set"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__covered"), 1L).otherwise(0L)).as("n_covered"),
        (max(col("__q6")).cast("double") / 1e6).as("q_hat"))
  }

  /** Batch-gradient-descent logistic regression on a labeled frame
    * (`labelCol` in {0,1}). Each iteration aggregates the full gradient
    * map-side-combined, then steps driver-side — the only data movement is
    * d+1 values per iteration. Feature values are cached once.
    *
    * BIT-REPRODUCIBLE across partitionings and engines (the
    * labelCentroids discipline): the per-row contribution
    * `(p - y) * f_j` is a pure function of the row (weights enter as
    * driver literals), quantized to the [[GradScale]] grid with
    * `floor(x·1e6 + 0.5)` and summed as LONG — integer addition is
    * order-free, so shuffle/partition order can't wiggle low bits the
    * way a floating sum does. The driver then derives the step through
    * one FIXED IEEE sequence (`lr * (g/1e6) / n`). Two trains of the
    * same data return identical doubles, and an external engine
    * replaying the same arithmetic reproduces them (q182's oracle does,
    * in SQL). Headroom: |err·f| ≤ ~13 ⇒ ~1.3e7 per row quantized,
    * ~7e11 rows before a long sum could wrap — beyond that, widen the
    * accumulator to decimal(38,0).
    *
    * Returns (weights, bias). */
  def train(df: DataFrame, textCol: String, labelCol: String,
            iters: Int = 20, lr: Double = 0.5): (Seq[Double], Double) = {
    val d = FeatureNames.length
    val feats = df.select(
      (features(col(textCol)).zipWithIndex.map { case (f, i) => f.as(s"f$i") }
        :+ col(labelCol).cast("double").as("y")): _*)
      .persist()
    try {
      val n = feats.count().toDouble
      var w = Array.fill(d)(0.0)
      var b = 0.0
      val qz = (c: Column) => floor(c * lit(GradScale) + lit(0.5d)).cast("long")
      (0 until iters).foreach { _ =>
        val z = (0 until d).foldLeft(lit(b)) { (acc, i) =>
          acc + col(s"f$i") * lit(w(i))
        }
        val err = (lit(1.0d) / (lit(1.0d) + exp(-z))) - col("y")
        val sums = feats.agg(
          sum(qz(err)).as("g_b"),
          (0 until d).map(i => sum(qz(err * col(s"f$i"))).as(s"g$i")): _*).head()
        b -= lr * (sums.getLong(0).toDouble / GradScale) / n
        (0 until d).foreach(i =>
          w(i) -= lr * (sums.getLong(i + 1).toDouble / GradScale) / n)
      }
      (w.toSeq, b)
    } finally feats.unpersist()
  }
}
