package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule: a raw range-predicate join (which Spark
  * plans as BroadcastNestedLoopJoin / cartesian) rewrites to the bucketed
  * equi-join shape when spark.graft.rangeJoin.bucket is set — same result
  * set, no nested-loop in the plan. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 100L))
    .toDF("pid", "t")
  private def ivals = Seq((10L, 10L, 20L), (20L, 0L, 6L), (30L, 90L, 95L),
      (40L, 1000L, 500L)) // inverted: matches nothing, must not explode
    .toDF("iid", "s", "e")

  private def expected = Set((1L, 20L), (2L, 10L), (3L, 10L))

  test("rule off: naive plan; rule on: equi plan with identical results") {
    def run() = points.join(ivals, $"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid")
    // off: nested loop is what Spark does with a pure range condition
    val off = run()
    assert(off.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(off.as[(Long, Long)].collect().toSet == expected)

    spark.conf.set("spark.graft.rangeJoin.bucket", "7")
    try {
      val on = run()
      val plan = on.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"expected equi join shape, got:\n$plan")
      assert(on.as[(Long, Long)].collect().toSet == expected)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucket")
  }

  test("rule fails fast on intervals spanning more than the bucket cap") {
    spark.conf.set("spark.graft.rangeJoin.bucket", "1")
    try {
      val wide = Seq((1L, 0L, 100000L)).toDF("iid", "s", "e") // 100k buckets
      val ex = intercept[Exception] {
        points.join(wide, $"t" >= $"s" && $"t" < $"e").count()
      }
      assert(ex.getMessage.contains("rangeJoin.bucket") ||
        Option(ex.getCause).exists(_.getMessage.contains("rangeJoin.bucket")),
        s"expected the span-cap error, got: ${ex.getMessage}")
    } finally spark.conf.unset("spark.graft.rangeJoin.bucket")
  }

  test("rule rewrites SQL range joins and inclusive bounds; leaves equi joins alone") {
    points.createOrReplaceTempView("pts")
    ivals.createOrReplaceTempView("ivs")
    spark.conf.set("spark.graft.rangeJoin.bucket", "7")
    try {
      // SQL surface, inclusive upper bound: t in [s, e]
      val sql = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivs ON t >= s AND t <= e")
      assert(!sql.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(sql.as[(Long, Long)].collect().toSet ==
        expected + ((4L, 10L))) // t=20 now matches [10,20]
      // an equi conjunct means hash join already — rule must not touch it
      val equi = points.join(ivals, $"pid" === $"iid" && $"t" >= $"s" && $"t" < $"e")
      val equiPlan = equi.queryExecution.optimizedPlan.toString
      assert(!equiPlan.contains("__range_b"), "equi join left untouched")
    } finally spark.conf.unset("spark.graft.rangeJoin.bucket")
  }
}
