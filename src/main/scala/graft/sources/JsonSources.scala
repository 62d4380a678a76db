package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines sources with explicit schemas — the S1 source contract
  * ([[CsvSources]]) for the other ubiquitous raw-interchange format.
  *
  * Same 100 TB reasoning as CSV: schema is DECLARED (inference is a full
  * extra pass over the data), `mode=PERMISSIVE` plus a corrupt-record
  * column turns an undecodable line into a quarantined row instead of a
  * job abort — the pipeline stays alive and the quarantine is observable
  * (counted, inspectable, re-processable) rather than silently dropped.
  */
object JsonSources {

  val CorruptCol = "_corrupt"

  /** JSON-lines scan with declared schema and quarantined corrupt rows:
    * a bad line yields one row with `_corrupt` holding the raw line and
    * every schema column NULL. */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .json(path)

  def isQuarantined: Column = col(CorruptCol).isNotNull

  /** The clean rows, quarantine column dropped. */
  def valid(df: DataFrame): DataFrame =
    df.filter(!isQuarantined).drop(CorruptCol)

  /** The quarantined raw lines, for inspection / dead-letter handling.
    * NOTE: Spark refuses a query that projects ONLY the corrupt-record
    * column from a lazily-parsed scan
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — `.cache()` the scan first when
    * using this branch alongside [[valid]]. */
  def quarantined(df: DataFrame): DataFrame =
    df.filter(isQuarantined).select(col(CorruptCol).as("raw_line"))
}
