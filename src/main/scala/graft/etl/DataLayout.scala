package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.ZOrderExpr

/** Data-layout optimization: z-order clustered writes + a per-file
  * min/max manifest, and a manifest-pruned read path.
  *
  * This is the storage half of the 100 TB story: at scale the win is not
  * executing the scan faster but NOT READING most files at all. Writing a
  * fact range-partitioned and sorted by the Morton value of two key
  * columns makes each parquet file a tile of the key plane; the manifest
  * (one row per file: min/max of each clustered column) then resolves a
  * 2-D range predicate to the touched tiles before any scan task launches.
  * Engines' manifest/statistics files (Iceberg, Delta, Hudi) are this
  * exact mechanism; here it is self-contained parquet under `_manifest`
  * (underscore-prefixed paths are invisible to Spark's file index, like
  * `_SUCCESS`).
  *
  * Scale notes:
  *  - the write is one range-partitioning shuffle (sampled bounds) + an
  *    in-partition sort — the same cost as any sorted write;
  *  - the manifest is file-count-sized (one row per file), so collecting
  *    the pruned file list on the driver is exactly as cheap as planning
  *    a normal scan's file index;
  *  - parquet row-group min/max pruning still applies WITHIN each kept
  *    file (the data is sorted, so those stats are tight too).
  */
object DataLayout {

  /** Morton value of two integral columns (see [[ZOrderExpr]]). */
  def zorder(a: Column, b: Column): Column = ZOrderExpr.zorder2(a, b)

  /** Write `df` z-order-clustered by (`cx`, `cy`) into `nFiles`
    * range-partitioned sorted files at `path`, plus the per-file min/max
    * manifest at `path/_manifest`. */
  def writeClustered(spark: SparkSession, df: DataFrame, cx: String, cy: String,
                     path: String, nFiles: Int): Unit = {
    df.withColumn("__z", zorder(col(cx), col(cy)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    val manifest = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(cx)).as(s"min_$cx"), max(col(cx)).as(s"max_$cx"),
        min(col(cy)).as(s"min_$cy"), max(col(cy)).as(s"max_$cy"),
        count(lit(1)).as("n_rows"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Files whose [min, max] range on `c` intersects [lo, hi] — the
    * manifest-pruned scan list. */
  def prunedFiles(spark: SparkSession, path: String, c: String,
                  lo: Long, hi: Long): (Seq[String], Long) = {
    val man = spark.read.parquet(s"$path/_manifest")
    val total = man.count()
    val keep = man.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq
    (keep, total)
  }

  /** Read `path` with manifest pruning for `c` in [lo, hi]: only files
    * whose min/max range intersects the predicate are opened. The exact
    * predicate is re-applied, so results are identical to a full scan —
    * pruning is purely an I/O reduction. */
  def readSkipping(spark: SparkSession, path: String, c: String,
                   lo: Long, hi: Long): DataFrame = {
    val (keep, _) = prunedFiles(spark, path, c, lo, hi)
    val base =
      if (keep.isEmpty) spark.read.parquet(path).where(lit(false))
      else spark.read.parquet(keep: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }
}
