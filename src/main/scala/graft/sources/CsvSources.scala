package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV sources with explicit schemas (SURVEY.md §2.1 S1).
  *
  * The reference reads its six CSVs with inferred schemas
  * (`pd.read_csv`, main.py:78-86). At 100 TB inference is a full extra
  * pass over the data, so every source here declares its schema
  * (FIXTURES.md §A — the fact schemas are reconstructed from column usage
  * in main.py, cited there). `mode=PERMISSIVE` + a corrupt-record column
  * reproduces "bad row -> keep pipeline alive" without a job abort.
  */
object CsvSources {

  val clientsSchema: StructType = StructType(Seq(
    StructField("IdCliente", IntegerType),
    StructField("Nombre", StringType),
    StructField("Email", StringType)))

  val productsSchema: StructType = StructType(Seq(
    StructField("IdProducto", IntegerType),
    StructField("Nombre", StringType),
    StructField("Categoría", StringType)))

  val fuenteDatosSchema: StructType = StructType(Seq(
    StructField("IdFuente", StringType),
    StructField("TipoFuente", StringType),
    StructField("FechaCarga", StringType))) // parsed later with coerce (P7)

  val socialCommentsSchema: StructType = StructType(Seq(
    StructField("IdComment", StringType),
    StructField("IdCliente", StringType),   // "C"-prefixed, cleaned by P6
    StructField("IdProducto", StringType),  // "P"-prefixed
    StructField("Fuente", StringType),
    StructField("Fecha", StringType),
    StructField("comentario", StringType))) // lowercase in the source

  val surveysSchema: StructType = StructType(Seq(
    StructField("IdOpinion", IntegerType),
    StructField("IdCliente", StringType),
    StructField("IdProducto", StringType),
    StructField("Fecha", StringType),
    StructField("Comentario", StringType),
    StructField("Clasificacion", StringType),
    StructField("PuntajeSatisfaccion", IntegerType)))

  val webReviewsSchema: StructType = StructType(Seq(
    StructField("IdReview", StringType),
    StructField("IdCliente", StringType),
    StructField("IdProducto", StringType),
    StructField("Fecha", StringType),
    StructField("Comentario", StringType),
    StructField("Rating", IntegerType)))

  /** Header CSV scan with declared schema and quarantined corrupt rows. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema.add(StructField("_corrupt", StringType)))
      .csv(path)

  /** All six reference sources from a directory of CSVs (main.py:11-18). */
  def readAll(spark: SparkSession, dir: String): Map[String, DataFrame] = Map(
    "clients" -> readCsv(spark, s"$dir/clients.csv", clientsSchema),
    "products" -> readCsv(spark, s"$dir/products.csv", productsSchema),
    "fuente_datos" -> readCsv(spark, s"$dir/fuente_datos.csv", fuenteDatosSchema),
    "social_comments" -> readCsv(spark, s"$dir/social_comments.csv", socialCommentsSchema),
    "surveys" -> readCsv(spark, s"$dir/surveys_part1.csv", surveysSchema),
    "web_reviews" -> readCsv(spark, s"$dir/web_reviews.csv", webReviewsSchema))
}
