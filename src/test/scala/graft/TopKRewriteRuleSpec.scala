package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The opt-in window-rank rewrite: with spark.graft.topk.rewrite=true
  * the standard `row_number().over(W) <= k` idiom gains a
  * TopKPerKeyExec under the window; results stay identical under a
  * total order; rank() and the conf-off path are untouched; the rule
  * yields to Spark's own InferWindowGroupLimit when the built-in
  * threshold covers the bound. */
class TopKRewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  private val ThresholdKey = "spark.sql.optimizer.windowGroupLimitThreshold"

  /** Both toggles on, built-in group-limit out of the way, restore after. */
  private def withRewrite[T](body: => T): T = {
    spark.conf.set("spark.graft.topk.rewrite", "true")
    spark.conf.set(ThresholdKey, "0")
    try body
    finally {
      spark.conf.unset("spark.graft.topk.rewrite")
      spark.conf.unset(ThresholdKey)
    }
  }

  private def topkDf = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "rn")
  }

  test("rewrite fires under the conf and keeps results identical") {
    val off = topkDf.collect().map(_.toSeq).toSet
    assert(!topkDf.queryExecution.executedPlan.toString
      .contains("TopKPerKey"), "must not fire with the conf unset")
    withRewrite {
      val plan = topkDf.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
      val on = topkDf.collect().map(_.toSeq).toSet
      assert(on == off, "rewritten plan must return identical rows")
      assert(on.nonEmpty)
    }
  }

  test("rule yields to InferWindowGroupLimit when the threshold covers k") {
    spark.conf.set("spark.graft.topk.rewrite", "true")
    // default threshold is 1000 >= 2: the built-in WindowGroupLimit
    // already bounds the sort — stacking the heap node would be a
    // redundant second top-k pass, so the rule must not fire
    try {
      val plan = topkDf.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"),
        s"must bail out under the built-in threshold:\n$plan")
      assert(plan.contains("WindowGroupLimit"),
        s"the built-in group limit should be the one that fires:\n$plan")
    } finally spark.conf.unset("spark.graft.topk.rewrite")
  }

  test("rank() windows are never rewritten (ties may exceed k)") {
    withRewrite {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc)
      val df = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
        .withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
      assert(!df.queryExecution.executedPlan.toString
        .contains("TopKPerKey"), "rank() must not match the rewrite")
    }
  }

  test("the tightest conjunct bound wins and rn = 1 rewrites too") {
    withRewrite {
      val w = Window.partitionBy(col("k")).orderBy(col("v").asc, col("id").asc)
      val df = (1L to 20L).map(i => (i % 4, i % 7, i)).toDF("k", "v", "id")
        .withColumn("rn", row_number().over(w))
      val eq1 = df.filter(col("rn") === 1)
      val plan1 = eq1.queryExecution.executedPlan.toString
      assert(plan1.contains("TopKPerKey"), s"rn = 1 shape:\n$plan1")
      assert("""TopKPerKey .*, 1\b""".r.findFirstIn(plan1).isDefined,
        s"bound 1 reaches the node:\n$plan1")
      // deterministic keep-first semantics survive the rewrite
      val keep = eq1.select("k", "id").as[(Long, Long)].collect().toMap
      assert(keep.size == 4)
    }
  }

  test("heap exec degrades to the spilling sort fallback past maxKeysPerPartition") {
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "7")
    try {
      // 1000 interleaved keys in ONE partition trip the 7-key cap
      // mid-stream, after some heaps already admitted and evicted rows
      val rows = (1 to 5000).map(i =>
        ((i % 1000).toLong, (i * 7919 % 4999).toLong, i.toLong))
      val df = rows.toDF("k", "v", "id").repartition(1)
      val got = graft.operators.TopK.perKey(df, Seq("k"),
          Seq(("v", true), ("id", true)), k = 2)
        .select("k", "v", "id").as[(Long, Long, Long)].collect().toSet
      val w = Window.partitionBy(col("k"))
        .orderBy(col("v").asc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("k", "v", "id").as[(Long, Long, Long)].collect().toSet
      assert(got == want, "fallback path returns exactly the window top-k")
      assert(got.size > 1900, "every key keeps its k rows through the switch")
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
  }
}
