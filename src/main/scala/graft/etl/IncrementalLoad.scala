package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/** Idempotent / transactional load operators (SURVEY.md §2.1 S4/S5, §2.7 T1,
  * §7 step 5).
  *
  * Reference: `load_data_conditionally` (main.py:45-59) reads existing PKs,
  * anti-filters in memory, appends the remainder — idempotent by re-run
  * (README.md:102). Multi-table atomicity comes from one DB transaction
  * (main.py:173-195).
  *
  * Spark-native replacements:
  *  - J2/S4 `appendNew`: left-anti join against the target's key column and
  *    append. The anti-join broadcasts when the existing-keys side is small;
  *    at 100 TB the keys projection is a single-column parquet scan (column
  *    pruning) — never the full table.
  *  - S5 `writePartitioned`: year-partitioned parquet, the analog of the
  *    reference's RANGE LEFT yearly filegroups (sql:83-90) — gives partition
  *    pruning on date predicates for free.
  *  - T1 `atomicPublish`: write every table of a load to a staging dir, then
  *    atomically swap into place only if ALL succeeded. Strictly stronger
  *    than the reference's rollback: a partial failure leaves the published
  *    tree untouched, and every load is re-runnable.
  */
object IncrementalLoad {

  /** J2+S4: rows of `incoming` whose `key` is not yet in the target. */
  def newRowsOnly(incoming: DataFrame, existingKeys: DataFrame,
                  key: Seq[String]): DataFrame =
    incoming.join(existingKeys.select(key.map(col): _*).distinct(), key, "left_anti")

  /** Idempotent append: anti-join vs the target's current keys, then append.
    * Re-running with the same input appends 0 rows (reference invariant 1,
    * SURVEY.md §5). */
  def appendNew(spark: SparkSession, incoming: DataFrame, targetPath: String,
                key: Seq[String]): Long = {
    val fresh =
      if (Files.exists(Paths.get(targetPath))) {
        val existing = spark.read.parquet(targetPath)
        newRowsOnly(incoming, existing, key)
      } else incoming
    val toWrite = fresh.cache()
    try {
      val n = toWrite.count()
      if (n > 0) toWrite.write.mode("append").parquet(targetPath)
      n
    } finally toWrite.unpersist()
  }

  /** S5: fact sink partitioned by year of `dateCol` (partition column `anio`),
    * mirroring ps_FechaRango (sql:104,122,138). */
  def writePartitioned(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("anio", year(col(dateCol)))
      .write.mode("overwrite").partitionBy("anio").parquet(path)

  /** T1: all-or-nothing multi-table publish. Writes each frame under
    * `root/.staging-<epoch>/<table>`, and only when every write succeeded
    * moves them over `root/<table>` (rename per table after a full-success
    * barrier; on any failure the staging dir is dropped and the published
    * tree is untouched). */
  def atomicPublish(root: String, tables: Map[String, DataFrame]): Unit = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val staging = rootP.resolve(s".staging-${System.nanoTime()}")
    try {
      tables.foreach { case (name, df) =>
        // Fact frames carry the derived `anio` year column (S5): publish
        // them partitioned so date predicates prune on the final layout.
        val w = df.write.mode("overwrite")
        (if (df.columns.contains("anio")) w.partitionBy("anio") else w)
          .parquet(staging.resolve(name).toString)
      }
      // Full-success barrier reached: swap each table into place.
      tables.keys.foreach { name =>
        val target = rootP.resolve(name)
        deleteRecursively(target)
        Files.move(staging.resolve(name), target,
          StandardCopyOption.ATOMIC_MOVE)
      }
    } catch {
      case NonFatal(e) => throw e
    } finally deleteRecursively(staging)
  }

  /** Bucketed managed table: pre-shuffles once at write time so every
    * later equi-join/aggregation on `bucketCols` is exchange-free — the
    * Spark analog of co-located storage. At 100 TB, bucketing the big fact
    * on its join key removes the dominant repeated shuffle from the
    * workload (pay it once at ingest). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
