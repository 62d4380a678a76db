package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("topk per key equals the window form on real data") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val rev = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    val custom = graft.operators.TopK.perKey(rev, Seq("l_suppkey"),
        Seq(("revenue", false), ("l_partkey", true)), k = 3)
      .select("l_suppkey", "l_partkey", "revenue")
      .as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("revenue").desc, col("l_partkey").asc)
    val window = rev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("l_suppkey", "l_partkey", "revenue")
      .as[(Long, Long, Double)].collect().toSet
    assert(custom == window, "custom operator must match the window form")
    assert(custom.nonEmpty)
  }

  test("topk per key: k past the group size keeps the whole group") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "v")
    val r = graft.operators.TopK.perKey(df, Seq("k"),
        Seq(("v", true)), k = 5)
      .as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 10L), (1L, 20L), (2L, 30L)))
  }

  test("topk per key: total order makes ties deterministic") {
    // equal v: the id tiebreak must pick the smallest ids
    val df = (1L to 10L).map(i => (1L, 5L, i)).toDF("k", "v", "id")
    val r = graft.operators.TopK.perKey(df, Seq("k"),
        Seq(("v", false), ("id", true)), k = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(r == Seq(1L, 2L, 3L), s"got $r")
  }

  test("topk per key plans the custom exec and clusters on the keys") {
    val df = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val plan = graft.operators.TopK.perKey(df, Seq("k"),
      Seq(("v", true)), k = 1).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(plan.contains("hashpartitioning(k"),
      s"keys must cluster the child:\n$plan")
    // and no sort anywhere — the whole point vs the window form
    assert(!plan.toLowerCase.contains("sort "), s"unexpected sort:\n$plan")
  }
}
