package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Additional source formats a reference user might migrate with: JSON
  * lines (explicit schema + corrupt-record quarantine, the CsvSources
  * contract) and ORC (native Spark, columnar — partition pruning and
  * predicate pushdown work the same as parquet). Schema inference is
  * deliberately never used: at 100 TB it is a full extra pass.
  */
object FormatSources {

  /** JSON-lines scan with declared schema; malformed lines land in
    * `_corrupt` instead of aborting the job (PERMISSIVE). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField("_corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Rows that failed to parse (audit/quarantine side). NOTE: a query
    * whose pruned scan schema is ONLY the corrupt column (e.g. a bare
    * count() of this frame) is rejected by Spark
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the raw frame first when
    * auditing standalone, as CsvSources callers do; real pipelines read
    * data columns alongside and never hit it. */
  def corruptJsonRows(df: DataFrame): DataFrame =
    df.filter(df("_corrupt").isNotNull).select("_corrupt")

  /** Clean rows (the pipeline side). */
  def validJsonRows(df: DataFrame): DataFrame =
    df.filter(df("_corrupt").isNull).drop("_corrupt")

  /** ORC sink/scan round trip — columnar alternative to parquet with the
    * same pushdown/pruning behavior. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Partitioned ORC sink (S5's layout contract through ORC): one
    * directory per partition value, so partition-valued filters prune
    * directories at plan time instead of scanning them. */
  def writeOrcPartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
