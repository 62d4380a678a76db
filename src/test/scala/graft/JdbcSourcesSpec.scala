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

  test("transactional multi-table append is all-or-nothing (main.py:173-195)") {
    val facts = Seq((1L, 10.0), (2L, 20.0)).toDF("fid", "amount")
    val dims = Seq((7L, "dim7")).toDF("did", "name")
    // first load creates both tables inside one transaction
    val n1 = JdbcSources.transactionalAppendAll(spark, url, Map(
      "tfacts" -> ((facts, Seq("fid"))), "tdims" -> ((dims, Seq("did")))))
    assert(n1 == Map("tfacts" -> 2L, "tdims" -> 1L))
    // re-run: idempotent on every table
    val n2 = JdbcSources.transactionalAppendAll(spark, url, Map(
      "tfacts" -> ((facts, Seq("fid"))), "tdims" -> ((dims, Seq("did")))))
    assert(n2 == Map("tfacts" -> 0L, "tdims" -> 0L))
    // a failing member (schema mismatch vs existing target) rolls back the
    // OTHER table's insert too — the published state never half-moves
    val newFacts = Seq((3L, 30.0)).toDF("fid", "amount")
    val badDims = Seq((8L, "x", 1L)).toDF("did", "name", "extra_col")
    intercept[Exception] {
      JdbcSources.transactionalAppendAll(spark, url, Map(
        "tfacts" -> ((newFacts, Seq("fid"))), "tdims" -> ((badDims, Seq("did")))))
    }
    assert(JdbcSources.readTable(spark, url, "tfacts").count() == 2,
      "fact insert rolled back with the failing dim")
    assert(JdbcSources.readTable(spark, url, "tdims").count() == 1)
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
