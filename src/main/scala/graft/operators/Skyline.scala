package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier, maximize both axes): the
  * points no other point beats on both dimensions — "most expensive AND
  * most recent", the multi-objective top that no single ORDER BY can
  * express.
  *
  * Scale shape (the classic prune-then-sweep): quantize x into `buckets`
  * equi-width cells, take max(y) per cell (one map-side-combined
  * aggregate, output bounded by `buckets`), collect the suffix maxima
  * as literals, and keep only points whose y beats every strictly-
  * higher cell's maximum — a scan-side filter that discards everything
  * far from the frontier. The exact sweep (per-x max, running max over
  * higher x) then runs on the surviving candidates: two tiny windows
  * over frontier-sized data, never a global sort of the input. Points
  * equal on both axes do not dominate each other — all rows AT a
  * frontier point are counted.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val pts = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val range = pts.agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"))
      .collect()(0)
    if (range.isNullAt(0))
      return pts.limit(0).withColumn("n_rows", lit(0L))
        .select(col("x"), col("y"), col("n_rows"))
    val (mnx, mxx) = (range.getLong(0), range.getLong(1))
    val bucketOf = if (mxx > mnx)
      least(lit(buckets - 1).cast("long"),
        ((col("x") - mnx) * buckets / (mxx - mnx + 1)).cast("long"))
    else lit(0L)
    // suffix maxima of per-bucket max(y): one bounded collect
    val perBucket = pts.withColumn("__b", bucketOf)
      .groupBy(col("__b")).agg(max(col("y")).as("my"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val suffix = new Array[Long](buckets + 1)
    suffix(buckets) = Long.MinValue
    var b = buckets - 1
    while (b >= 0) {
      suffix(b) = math.max(suffix(b + 1), perBucket.getOrElse(b.toLong, Long.MinValue))
      b -= 1
    }
    // a strictly-higher bucket implies strictly larger x, so any y there
    // >= ours dominates; survive only if y > that suffix max. The
    // suffix maxima ride as ONE literal array (element_at), not a
    // nested-when chain — O(buckets) plan size, O(1) eval.
    val aboveArr = typedLit((0 until buckets).map(i => suffix(i + 1)))
    val aboveMax = element_at(aboveArr, col("__b").cast("int") + 1)
    val cand = pts.withColumn("__b", bucketOf)
      .filter(col("y") > aboveMax || lit(suffix(0) == Long.MinValue))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_rows"))
    // exact sweep on frontier-sized candidates: per-x max y, then only
    // x whose max beats every strictly-larger x's max stays
    val perX = cand.groupBy(col("x")).agg(max(col("y")).as("my"))
    val wDesc = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX.withColumn("__above", max(col("my")).over(wDesc))
      .filter(col("__above").isNull || col("my") > col("__above"))
      .select(col("x"), col("my").as("y"))
    cand.join(frontier, Seq("x", "y")).select(col("x"), col("y"), col("n_rows"))
  }
}
