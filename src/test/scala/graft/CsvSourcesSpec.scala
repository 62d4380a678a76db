package graft

import java.nio.file.{Files, Paths}

import graft.sources.CsvSources

/** CSV source specs: explicit schema, header handling, corrupt-row
  * quarantine, accented column names. */
class CsvSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("explicit-schema CSV read with corrupt-record quarantine") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(s"$dir/clients.csv"),
      """IdCliente,Nombre,Email
        |1,Ana,ana@mail.com
        |2,Luis,luis@mail.com
        |not_an_int,Broken,broken@mail.com
        |""".stripMargin)
    // cache: Spark disallows filtering on only the corrupt-record column
    // of an uncached raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val df = CsvSources.readCsv(spark, s"$dir/clients.csv", CsvSources.clientsSchema).cache()
    assert(df.schema.fieldNames.toSeq == Seq("IdCliente", "Nombre", "Email", "_corrupt"))
    val good = df.filter($"_corrupt".isNull)
    val bad = df.filter($"_corrupt".isNotNull)
    assert(good.count() == 2 && bad.count() == 1)
    assert(df.filter($"IdCliente" === 1).select("Nombre").as[String].head() == "Ana")
  }

  test("accented column names survive the CSV read (Categoría)") {
    val dir = tmpDir("csv2")
    Files.writeString(Paths.get(s"$dir/products.csv"),
      "IdProducto,Nombre,Categoría\n1,Laptop,Tecnología\n")
    val df = CsvSources.readCsv(spark, s"$dir/products.csv", CsvSources.productsSchema)
    assert(df.columns.contains("Categoría"))
    assert(df.select("Categoría").as[String].head() == "Tecnología")
  }
}
