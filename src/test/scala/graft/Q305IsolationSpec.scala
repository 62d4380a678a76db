package graft

import org.apache.spark.sql.functions._

/** q305's conf isolation: the rewrite toggles live on a throwaway
  * newSession() — they must fire THERE (extensions carry over to child
  * sessions) and never leak into the parent session's planning. */
class Q305IsolationSpec extends SparkSpec {

  test("q305 rewrite fires on its own session and leaks nothing to the parent") {
    assert(spark.conf.getOption("spark.graft.topk.rewrite").isEmpty)
    // run the real query body; it plans on a child session
    val r = SparkEntry.queries("q305_topk_rewrite")(spark, sf("sf0.001"))
    assert(r.count() > 0)
    // parent session saw neither toggle (the threshold conf has a
    // built-in default, so "not leaked" means "still the default")
    assert(spark.conf.getOption("spark.graft.topk.rewrite").isEmpty,
      "the child session's conf must not leak")
    assert(spark.conf.get(
      "spark.sql.optimizer.windowGroupLimitThreshold") != "0",
      "the child session's threshold override must not leak")
    // and the child session genuinely rewrote: reproduce its conf state
    // on a fresh child and assert the custom node plans
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.topk.rewrite", "true")
    s2.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice").desc,
        col("l_orderkey").asc, col("l_linenumber").asc)
    val plan = s2.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"extensions must carry into newSession children:\n$plan")
  }
}
