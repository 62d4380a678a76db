package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (the moving-average STL
  * ancestor: trend by centered MA, seasonal by period-position means of
  * the detrended series, residual as the remainder — Cleveland et al.'s
  * decomposition baseline, the "is this metric drifting or just
  * weekly-cyclic" diagnostic behind ingestion-volume monitoring).
  *
  * Determinism is the design problem: naive double sums make trend and
  * seasonal means partition-order dependent. Here every sum is EXACT
  * integer arithmetic until one final division:
  *  - daily values quantize to cents (`floor(v*100+0.5)`, the q162
  *    convention) and sum as longs;
  *  - the detrended series is kept as `d7 = period*v - sum_period`
  *    (cents x period, exact), so seasonal means are one division of an
  *    exact long sum;
  *  - the few remaining double combines land on the house 6dp grid
  *    (round-then-combine), so engines and row orders agree bit for bit.
  *
  * Scale: the raw-event aggregation is the only corpus-sized stage
  * (map-side combined). Every window — centered MA, period-position
  * means — runs over the AGGREGATED (key, day) series: thousands of
  * rows per key, never events. The classic aggregate-then-window
  * discipline; a per-event window would be the scale bug.
  *
  * Output (interior rows only — where the full MA window exists):
  * (key, d, idx, value, trend, seasonal, residual).
  */
object Seasonal {

  def maDecompose(df: DataFrame, tsCol: String, valueCol: String,
                  keyCol: String, period: Int = 7, half: Int = 3): DataFrame = {
    require(period >= 2 && half >= 1 && 2 * half + 1 >= period - 1,
      "MA window (2*half+1) should cover ~one period")
    val win = 2 * half + 1
    val grid = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
    val den = win * 100.0 // cents -> value units across the MA division

    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("d"))
      .agg(sum(floor(col(valueCol) * 100 + lit(0.5d)).cast("long")).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("d"))
      .rowsBetween(-half, half)
    val base = daily
      .withColumn("idx", pmod(datediff(col("d"), lit("1970-01-01")), lit(period)))
      .withColumn("s7", sum(col("v")).over(w))
      .withColumn("c7", count(lit(1)).over(w))
      .filter(col("c7") === win)
      .withColumn("d7", lit(win) * col("v") - col("s7"))
    val seas = base.groupBy(col("key"), col("idx"))
      .agg(round(sum(col("d7")).cast("double")
        / (lit(den) * count(lit(1)).cast("double")), 6).as("s6"))
    val center = seas.groupBy(col("key"))
      .agg((floor(round(sum(col("s6")), 6) / lit(period) * lit(1e6) + lit(0.5d))
        / lit(1e6)).as("mt"))
    base
      .join(seas, Seq("key", "idx"))
      .join(center, Seq("key"))
      .select(col("key"), col("d"), col("idx").cast("long").as("idx"),
        (col("v") / lit(100.0)).as("value"),
        grid(col("s7") / lit(den)).as("trend"),
        (col("s6") - col("mt")).as("seasonal"),
        grid(col("d7") / lit(den) - (col("s6") - col("mt"))).as("residual"))
  }
}
