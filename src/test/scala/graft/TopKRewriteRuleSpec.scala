package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The opt-in window-rank rewrite: with spark.graft.topk.rewrite=true
  * the standard `row_number().over(W) <= k` idiom gains a
  * TopKPerKeyExec under the window; results stay identical under a
  * total order; rank() and the conf-off path are untouched. */
class TopKRewriteRuleSpec extends SparkSpec {
  import spark.implicits._

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
    spark.conf.set("spark.graft.topk.rewrite", "true")
    try {
      val plan = topkDf.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
      val on = topkDf.collect().map(_.toSeq).toSet
      assert(on == off, "rewritten plan must return identical rows")
      assert(on.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.rewrite")
  }

  test("rank() windows are never rewritten (ties may exceed k)") {
    spark.conf.set("spark.graft.topk.rewrite", "true")
    try {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc)
      val df = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
        .withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
      assert(!df.queryExecution.executedPlan.toString
        .contains("TopKPerKey"), "rank() must not match the rewrite")
    } finally spark.conf.unset("spark.graft.topk.rewrite")
  }

  test("the tightest conjunct bound wins and rn = 1 rewrites too") {
    spark.conf.set("spark.graft.topk.rewrite", "true")
    try {
      val w = Window.partitionBy(col("k")).orderBy(col("v").asc, col("id").asc)
      val df = (1L to 20L).map(i => (i % 4, i % 7, i)).toDF("k", "v", "id")
        .withColumn("rn", row_number().over(w))
      val eq1 = df.filter(col("rn") === 1)
      val plan1 = eq1.queryExecution.executedPlan.toString
      assert(plan1.contains("TopKPerKey"), s"rn = 1 shape:\n$plan1")
      assert(plan1.contains("k=1,") || plan1.contains("k=1]")
        || plan1.contains("1,"), "bound 1 reaches the node")
      // deterministic keep-first semantics survive the rewrite
      val keep = eq1.select("k", "id").as[(Long, Long)].collect().toMap
      assert(keep.size == 4)
    } finally spark.conf.unset("spark.graft.topk.rewrite")
  }
}
