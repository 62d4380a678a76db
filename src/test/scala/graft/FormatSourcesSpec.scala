package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.FormatSources

/** JSON-lines (schema + quarantine) and ORC round-trip source specs. */
class FormatSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("explicit-schema JSON-lines read with corrupt-record quarantine") {
    val dir = tmpDir("json")
    Files.writeString(Paths.get(s"$dir/clients.json"),
      """{"IdCliente": 1, "Nombre": "Ana", "Email": "ana@mail.com"}
        |{"IdCliente": 2, "Nombre": "Luis", "Email": "luis@mail.com"}
        |{not valid json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("IdCliente", LongType),
      StructField("Nombre", StringType),
      StructField("Email", StringType)))
    // cache: corrupt-only pruned scans of raw JSON are disallowed
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — same pattern as CsvSourcesSpec
    val raw = FormatSources.readJsonLines(spark, s"$dir/clients.json", schema).cache()
    val valid = FormatSources.validJsonRows(raw)
    assert(valid.count() == 2)
    assert(valid.select("Nombre").as[String].collect().toSet == Set("Ana", "Luis"))
    assert(FormatSources.corruptJsonRows(raw).count() == 1, "bad line quarantined, not fatal")
    // the quarantined payload is preserved for audit
    assert(FormatSources.corruptJsonRows(raw).as[String].head().contains("not valid"))
  }

  test("parquet schema evolution: later partitions may add columns") {
    // a long-lived partitioned sink gains a column in a later load; with
    // mergeSchema the union schema reads back, old rows null-filled
    val dir = tmpDir("evolve")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t/anio=2024")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/t/anio=2025")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet == Set("id", "v", "score", "anio"))
    val rows = merged.orderBy("id")
      .select($"id", $"score").collect()
    assert(rows(0).isNullAt(1), "old partition null-fills the new column")
    assert(rows(1).getDouble(1) == 9.5)
    // partition pruning still works on the evolved table
    assert(merged.filter($"anio" === 2025).count() == 1)
  }

  test("ORC round trip preserves rows and supports pushdown like parquet") {
    val dir = tmpDir("orc")
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    FormatSources.writeOrc(docs, s"$dir/documents")
    val back = FormatSources.readOrc(spark, s"$dir/documents")
    assert(back.count() == docs.count())
    assert(back.agg(sum(length($"text"))).head.getLong(0) ==
      docs.agg(sum(length($"text"))).head.getLong(0), "content identical")
    // predicate reaches the ORC scan as a pushed filter
    val plan = back.filter($"doc_id" === 1L).queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*doc_id".r.findFirstIn(plan).isDefined,
      s"expected doc_id in PushedFilters:\n$plan")
  }

  test("partitioned ORC sink: partition-value filters prune, not scan (q175 plan)") {
    val dir = tmpDir("orcpart")
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    FormatSources.writeOrcPartitioned(docs, s"$dir/documents", "source")
    val read = FormatSources.readOrc(spark, s"$dir/documents")
      .filter($"source".isin("src1", "src2"))
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*source".r.findFirstIn(plan).isDefined,
      s"expected source in PartitionFilters:\n$plan")
    // pruned read equals the parquet truth
    val want = docs.filter($"source".isin("src1", "src2"))
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toSet
    val got = read.select($"doc_id", $"n_chars").as[(Long, Long)].collect().toSet
    assert(got == want)
  }
}
