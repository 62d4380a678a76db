package graft

import org.apache.spark.sql.functions._

import graft.sources.JdbcSources

/** JDBC parity operators proven against an embedded Derby database (on the
  * classpath via Spark's bundled jars) — the reference's actual I/O is a
  * live RDBMS, so the idempotent-append invariant must hold against a JDBC
  * target, not just parquet. */
class JdbcSourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = tmpDir("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def base = Seq((1L, "ana", 10.0), (2L, "bo", 20.0), (3L, "cy", 30.0))
    .toDF("id", "name", "score")

  test("appendNew against a JDBC target is idempotent (reference invariant 1)") {
    val n1 = JdbcSources.appendNew(spark, base, url, "people", Seq("id"))
    assert(n1 == 3)
    // same input again: anti-join filters everything
    val n2 = JdbcSources.appendNew(spark, base, url, "people", Seq("id"))
    assert(n2 == 0)
    // one genuinely new row among repeats: only it lands
    val n3 = JdbcSources.appendNew(spark,
      base.union(Seq((4L, "dee", 40.0)).toDF("id", "name", "score")),
      url, "people", Seq("id"))
    assert(n3 == 1)
    val all = JdbcSources.readTable(spark, url, "people")
    assert(all.count() == 4)
    assert(all.select(sum($"score")).as[Double].head() == 100.0)
  }

  test("readKeys ships only the key columns; partitioned read fans out") {
    JdbcSources.appendNew(spark, base, url, "dims", Seq("id"))
    val keys = JdbcSources.readKeys(spark, url, "dims", Seq("id"))
    assert(keys.columns.toSeq == Seq("id"))
    assert(keys.as[Long].collect().sorted.sameElements(Array(1L, 2L, 3L)))
    // the pushed-down SELECT carries only the key column
    val plan = keys.queryExecution.executedPlan.toString
    assert(plan.contains("[id]") || plan.toLowerCase.contains("readschema: struct<id"),
      s"projection not pushed to JDBC scan:\n$plan")
    // partitioned scan returns the same rows, including out-of-bounds ones
    val part = JdbcSources.readTable(spark, url, "dims",
      Some(JdbcSources.PartitionSpec("id", 1L, 3L, 2)))
    assert(part.rdd.getNumPartitions == 2)
    assert(part.count() == 3)
  }
}
