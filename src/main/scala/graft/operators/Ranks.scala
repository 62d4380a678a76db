package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-adaptive cumulative sums over a distinct-value grid.
  *
  * The rank-stat family (Mann–Whitney, ROC AUC, weighted quantiles)
  * runs `sum(...) over (order by v)` windows on an aggregated
  * distinct-value table. For bounded domains (prices, 6dp grids) a
  * single-partition window over a few thousand rows is free — but a
  * continuous high-cardinality column funnels the whole grid into ONE
  * partition, the exact shape `Linkage.globalRank` exists to avoid.
  *
  * [[cumSums]] keeps the plain window below `largeDomain` distinct
  * rows (bit-identical, zero extra shuffles) and above it switches to
  * the two-pass form: range-repartition by (group, value), per-
  * partition cumulative windows (parallel), then exclusive offsets
  * from ONE bounded collect of per-(group, partition) subtotals —
  * bounded by partitions + groups, never by the grid. Integer sums
  * make the two paths exactly equal, so callers (and their oracles)
  * never see which path ran.
  *
  * `totals` appends per-group GRAND totals as extra columns: in the
  * two-pass path they come free from the same subtotal collect; in
  * the window path from one groupBy over the already-materialized cut
  * — never a whole-partition window.
  *
  * Caller contract: `grpCols` are bounded strata (return flags,
  * sources) — the offset collect is `O(partitions + groups)`. */
private[graft] object Ranks {

  /** For each `(src, out, inclusive)` in `sums`, append column `out` =
    * cumulative sum of long column `src` over rows ordered by
    * `orderCol` ascending within `grpCols` (exclusive = strictly-below
    * rows only, 0 for the first row). For each `(src, out)` in
    * `totals`, append column `out` = the group's total of `src`. */
  def cumSums(per: DataFrame, grpCols: Seq[String], orderCol: String,
              sums: Seq[(String, String, Boolean)],
              largeDomain: Long = 1048576L,
              totals: Seq[(String, String)] = Nil): DataFrame = {
    val cut = Lineage.cut(per)
    if (cut.count() <= largeDomain) {
      val base = Window.partitionBy(grpCols.map(col): _*)
        .orderBy(col(orderCol).asc)
      val cumd = sums.foldLeft(cut) { case (df, (src, out, inclusive)) =>
        val w = if (inclusive)
          base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        else base.rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn(out, coalesce(sum(col(src)).over(w), lit(0L)))
      }
      if (totals.isEmpty) cumd
      else {
        val tAggs = totals.map { case (src, out) => sum(col(src)).as(out) }
        val t =
          if (grpCols.isEmpty) cut.agg(tAggs.head, tAggs.tail: _*)
          else cut.groupBy(grpCols.map(col): _*).agg(tAggs.head, tAggs.tail: _*)
        if (grpCols.isEmpty) cumd.crossJoin(broadcast(t))
        else cumd.join(broadcast(t), grpCols)
      }
    } else {
      val np = cut.sparkSession.sessionState.conf.numShufflePartitions
      val order = grpCols.map(col) :+ col(orderCol)
      val ranged = Lineage.cut(cut.repartitionByRange(np, order: _*)
        .withColumn("__pid", spark_partition_id().cast("long")))
      // one bounded collect: per-(group, partition) subtotal of every
      // summed column; offsets (and grand totals) joined back broadcast
      val subAggs = sums.map { case (src, out, _) =>
        sum(col(src)).as(s"__t_$out") } ++
        totals.map { case (src, out) => sum(col(src)).as(s"__g_$out") }
      val subs = ranged.groupBy((grpCols.map(col) :+ col("__pid")): _*)
        .agg(subAggs.head, subAggs.tail: _*).collect()
      val grpIdx = grpCols.indices
      val byGrp = subs.groupBy(r => grpIdx.map(r.get))
      val base = grpCols.length + 1
      val offRows = subs.map { r =>
        val g = grpIdx.map(r.get)
        val pid = r.getLong(grpCols.length)
        val offs = sums.indices.map { i =>
          byGrp(g).filter(_.getLong(grpCols.length) < pid)
            .map(_.getLong(base + i)).sum }
        val grand = totals.indices.map { i =>
          byGrp(g).map(_.getLong(base + sums.length + i)).sum }
        org.apache.spark.sql.Row.fromSeq(g ++ (pid +: (offs ++ grand)))
      }
      val offSchema = org.apache.spark.sql.types.StructType(
        grpCols.map(c => ranged.schema(c)) ++
          (org.apache.spark.sql.types.StructField("__pid",
            org.apache.spark.sql.types.LongType, nullable = false) +:
            (sums.map { case (_, out, _) =>
              org.apache.spark.sql.types.StructField(s"__off_$out",
                org.apache.spark.sql.types.LongType, nullable = false) } ++
              totals.map { case (_, out) =>
                org.apache.spark.sql.types.StructField(out,
                  org.apache.spark.sql.types.LongType, nullable = false) })))
      val offDf = cut.sparkSession.createDataFrame(
        java.util.Arrays.asList(offRows: _*), offSchema)
      // null-safe on the group keys: a NULL stratum still has subtotal
      // rows in the collect, and a plain USING join would silently
      // zero its cross-partition offsets
      val joinCond = (grpCols.map(c => ranged(c) <=> offDf(c)) :+
        (ranged("__pid") === offDf("__pid"))).reduce(_ && _)
      val joined0 = ranged.join(broadcast(offDf), joinCond, "left")
      val joined = grpCols.foldLeft(joined0.drop(offDf("__pid"))) {
        (df, c) => df.drop(offDf(c))
      }
      val baseW = Window.partitionBy((grpCols :+ "__pid").map(col): _*)
        .orderBy(col(orderCol).asc)
      sums.foldLeft(joined) { case (df, (src, out, inclusive)) =>
        val w = if (inclusive)
          baseW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        else baseW.rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn(out, coalesce(sum(col(src)).over(w), lit(0L))
          + coalesce(col(s"__off_$out"), lit(0L)))
      }.drop("__pid").drop(sums.map { case (_, out, _) => s"__off_$out" }: _*)
    }
  }
}
