package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-ORDER (Morton-curve) multi-column clustering for manifest tables.
  *
  * A table range-clustered on ONE column gives tight per-file min/max
  * on that column only — a predicate bounding any OTHER column scans
  * every file. Interleaving the bits of SEVERAL columns' bucket
  * indices and range-partitioning on the interleaved value keeps each
  * file small in EVERY clustered dimension at once, so
  * `ManifestTable.deleteWhere` / merge discovery — which already
  * intersects range narrowing across all recorded stats columns —
  * prunes a multi-column bounded predicate to the files its box can
  * touch. The same idea Delta OSS's `OPTIMIZE ZORDER BY` and
  * Iceberg's z-order rewrite apply at 100 TB: cluster once at write,
  * skip forever at read.
  *
  * Design notes, in Spark terms:
  *  - The z-value is DERIVED AND DROPPED: it exists only as the
  *    `repartitionByRange` key. Correctness never depends on it —
  *    per-file stats are recorded from the REAL column values by the
  *    manifest writers, so a skewed bucket map only costs pruning
  *    tightness, never rows.
  *  - Bucket indices are equi-width over the observed min/max (one
  *    tiny driver agg). `repartitionByRange` then balances ROWS per
  *    file by sampling the z-values, so value skew cannot produce
  *    giant files — it only widens the affected files' recorded
  *    ranges.
  *  - The bit interleave is plain Column arithmetic (shiftleft /
  *    bitwiseOR / bitwiseAND) — whole-stage-codegen'd, no UDF, no
  *    custom Expression needed.
  *  - DATE / TIMESTAMP dimensions canonicalize to epoch-day /
  *    epoch-seconds, the same units `ManifestTable` records per-file
  *    stats in, so a retention window over a date dimension prunes
  *    consistently.
  */
object ZOrder {

  /** Canonical long rendering of a clustering dimension — mirrors the
    * units `ManifestTable` records per-file stats in (epoch-day for
    * DATE, epoch-seconds for TIMESTAMP, long cast otherwise), so the
    * clustering the z-curve produces is tight in exactly the stats
    * discovery narrowing consults. */
  private def canonLong(df: DataFrame, c: String): Column =
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(DateType) => datediff(col(c), to_date(lit("1970-01-01")))
        .cast(LongType)
      case Some(TimestampType) => unix_timestamp(col(c))
      case _ => col(c).cast(LongType)
    }

  /** Morton interleave of `dims` bucket indices (each in
    * [0, 2^bits)): bit b of dimension d lands at position b*D + d.
    * Plain shift/or arithmetic — 16·D leaf terms, all codegen'd. */
  private[graft] def interleave(dims: Seq[Column], bits: Int): Column = {
    val d = dims.length
    val terms = for {
      b <- 0 until bits
      (dim, i) <- dims.zipWithIndex
    } yield shiftleft(shiftright(dim, b).bitwiseAND(lit(1L)), b * d + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for `cols` given per-dimension (min, max)
    * canonical-long ranges: equi-width bucket to `bits` bits each,
    * then Morton-interleave. Null values bucket to 0 (they cluster
    * together at the curve's origin). */
  private[graft] def zvalue(df: DataFrame, cols: Seq[String],
                                ranges: Seq[(Long, Long)],
                                bits: Int): Column = {
    val maxBucket = (1L << bits) - 1L
    val dims = cols.zip(ranges).map { case (c, (mn, mx)) =>
      val v = canonLong(df, c)
      val span = mx - mn
      val idx =
        if (span < 0L) {
          // range wider than a long (snowflake-scale extremes):
          // double-precision scale — locality degrades at the 2^53
          // granularity floor but stays monotone, which is all the
          // curve needs (per-file stats record REAL values)
          floor((v.cast(DoubleType) - lit(mn.toDouble)) /
            lit(math.max(1.0, mx.toDouble - mn.toDouble)) *
            lit(maxBucket.toDouble)).cast(LongType)
        } else {
          // integer shift: bucket = (v - mn) >> s keeps values BIT-
          // ALIGNED, so the curve's power-of-two quadrants are exact
          // and an axis-aligned box confines to the quadrants it
          // overlaps — a multiplicative rescale would blur quadrant
          // boundaries and the per-file bounding boxes with them
          val s = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(span) - bits)
          shiftright(v - lit(mn), s)
        }
      coalesce(least(greatest(idx, lit(0L)), lit(maxBucket)), lit(0L))
    }
    interleave(dims, bits)
  }

  /** `df` clustered along the z-curve of `cols` into `numFiles`
    * range-partitions (one parquet file each under a manifest write).
    * Publish the result with `statsCols`/`extraStatsCols` covering the
    * clustered dimensions and every file carries a tight range in ALL
    * of them:
    *
    * {{{
    * ManifestTable.publish(spark, root,
    *   Map("t" -> ZOrder.cluster(df, Seq("k1", "k2"), 64)),
    *   statsCols = Map("t" -> "k1"),
    *   extraStatsCols = Map("t" -> Seq("k2")))
    * }}}
    *
    * One extra narrow agg (the per-dimension min/max) + the range
    * shuffle `repartitionByRange` always costs; at 100 TB run it on
    * the compaction cadence, not per micro-batch. Up to 4 dimensions
    * (16 bits each fills the long); 2–3 is the sweet spot — each
    * added dimension halves the per-dimension resolution of the
    * curve. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.size <= 4, "ZOrder.cluster: 1-4 columns")
    require(bits >= 1 && bits * cols.size <= 63,
      s"ZOrder.cluster: $bits bits x ${cols.size} dims overflows a long")
    val aggs = cols.flatMap(c =>
      Seq(min(canonLong(df, c)), max(canonLong(df, c))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input, or a dimension with no non-null values: no signal
    // to cluster on — pass through unclustered (correctness unaffected)
    if ((0 until 2 * cols.size).exists(r.isNullAt)) return df
    val ranges = cols.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
    val zc = "__graft_z"
    df.withColumn(zc, zvalue(df, cols, ranges, bits))
      .repartitionByRange(numFiles, col(zc))
      .drop(zc)
  }
}
