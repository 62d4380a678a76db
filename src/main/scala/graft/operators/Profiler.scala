package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: per-column null counts, distinct counts, min/max —
  * the data-quality pass every ingest pipeline runs before trusting a
  * source. One job for the whole table: all per-column aggregates sit in a
  * single global aggregation (exact distinct adds an expand, still one
  * pass over the scan), then unpivot to one row per column.
  *
  * `approxProfile` swaps exact distinct for HyperLogLog++
  * (`approx_count_distinct`) — at 100 TB the exact expand on dozens of
  * columns is the difference between one pass and an expensive shuffle per
  * column; HLL keeps it strictly one map-side pass.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        distinctAgg(c).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      wide.select(
        lit(c).as("col_name"),
        (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    stacked.reduce(_ unionByName _)
  }
}
