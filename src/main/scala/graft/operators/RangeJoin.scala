package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Bucketed interval (range) join: left rows at a point in time against
  * right rows carrying an interval, WITHOUT an equi key.
  *
  * A raw `l.time BETWEEN r.start AND r.end` join condition has no equi
  * component, so Spark plans BroadcastNestedLoopJoin (fine only when one
  * side broadcasts) or falls back to a cartesian product — the classic
  * scale killer. The production shape instead derives an equi key from
  * time itself: both sides are assigned `floor(time / bucket)` bucket ids,
  * the interval side is replicated to every bucket it overlaps (bounded
  * replication: intervals are capped at `maxBuckets` buckets), the join is
  * a plain shuffle/equi join on the bucket id, and the exact range
  * predicate filters inside the bucket. This is the published
  * bucketing/binning technique used by interval-join implementations in
  * stream processors and genomics engines alike.
  *
  * Semantics: `[start, end)` — end-exclusive, the natural window form.
  * Columns are numeric (epoch seconds/millis or any monotone long);
  * callers convert timestamps with `unix_timestamp` first.
  */
object RangeJoin {

  /** Exact integer floor-division bucket id: subtract the non-negative
    * pmod remainder, then integral-divide the exact multiple. Double-based
    * floor(x/bucket) rounds above 2^53 (epoch nanos) and can put a point
    * and its interval in different buckets, silently dropping matches —
    * the exact range predicate only runs inside the matched bucket. */
  private def bucketOf(c: Column, bucket: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal, Pmod, Subtract}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val xl = ColumnBridge.expression(c.cast("long"))
    val b = Literal(bucket)
    ColumnBridge.column(IntegralDivide(Subtract(xl, Pmod(xl, b)), b))
  }

  private def requireIntegral(df: DataFrame, c: String): Unit = {
    val dt = df.schema(c).dataType
    // IntegralType itself is sql-private; enumerate the concrete members
    require(dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType,
      s"intervalJoin: column '$c' must be integral (epoch seconds/millis/" +
        s"nanos as long; convert timestamps with unix_timestamp) — got $dt")
  }

  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   bucket: Long, maxBuckets: Int = 64): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    requireIntegral(points, pointCol)
    requireIntegral(intervals, startCol)
    requireIntegral(intervals, endCol)
    val l = points.withColumn("__b", bucketOf(col(pointCol), bucket))
    // Replicate each interval to the buckets it overlaps. The cap is a
    // correctness guard, not a truncation: an interval longer than
    // maxBuckets*bucket means the caller chose the wrong bucket size, and
    // silently joining a truncated range would drop matches — fail fast.
    val startB = bucketOf(col(startCol), bucket)
    // end-exclusive: an interval ending exactly on a bucket boundary does
    // not overlap that bucket. The guard lives INSIDE the sequence bound
    // so Catalyst cannot prune it away as unused.
    val endB = bucketOf(col(endCol) - 1, bucket)
    val endGuarded = when(endB - startB + lit(1) > maxBuckets,
        raise_error(lit(s"intervalJoin: interval spans more than $maxBuckets " +
          "buckets; increase bucket size")).cast("long"))
      .otherwise(endB)
    // Empty/inverted intervals ([start, end) with end <= start) match no
    // point and must emit NO bucket rows — without this filter,
    // sequence(startB, endB) with endB < startB would count DOWN and
    // replicate the row once per descending bucket.
    val r = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(startB, endGuarded)))
    l.join(r, l("__b") === r("__b") &&
        l(pointCol) >= r(startCol) && l(pointCol) < r(endCol))
      .drop("__b")
  }

  /** Interval x interval OVERLAP join ([start, end) semantics both
    * sides): pairs whose ranges intersect — incidents x sessions,
    * maintenance windows x jobs. The same bucketing discipline as
    * [[intervalJoin]], with one extra idea: a pair sharing several
    * buckets must match exactly ONCE, so a match is only emitted in its
    * DESIGNATED bucket — the bucket containing the overlap's start
    * (`greatest(lStart, rStart)`). No post-join distinct, no duplicate
    * inflation, exact semantics.
    *
    * Both sides replicate to the buckets they span (each capped at
    * `maxBuckets` — fail fast, never silently truncate); optional
    * `keys` become equi conjuncts alongside the bucket id, so per-entity
    * overlap joins shuffle on (key, bucket).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bucket: Long, maxBuckets: Int = 64): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    Seq(lStart, lEnd).foreach(requireIntegral(left, _))
    Seq(rStart, rEnd).foreach(requireIntegral(right, _))
    def replicate(df: DataFrame, s: String, e: String, side: String): DataFrame = {
      val sB = bucketOf(col(s), bucket)
      val eB = bucketOf(col(e) - 1, bucket)
      val eGuarded = when(eB - sB + lit(1) > maxBuckets,
          raise_error(lit(s"intervalOverlapJoin: $side interval spans more " +
            s"than $maxBuckets buckets; increase bucket size")).cast("long"))
        .otherwise(eB)
      df.filter(col(e) > col(s))
        .withColumn(s"__b$side", explode(sequence(sB, eGuarded)))
    }
    // explicit aliases: left and right often derive from the same scan
    // (self-overlap analyses), and unqualified key columns would resolve
    // ambiguously
    val l = replicate(left, lStart, lEnd, "l").alias("__ol")
    val r = replicate(right, rStart, rEnd, "r").alias("__or")
    def lc(c: String) = col(s"__ol.$c")
    def rc(c: String) = col(s"__or.$c")
    val keyCond = keys.map(k => lc(k) === rc(k)).reduceOption(_ && _).getOrElse(lit(true))
    val overlap = lc(lStart) < rc(rEnd) && rc(rStart) < lc(lEnd)
    val designated = bucketOf(greatest(lc(lStart), rc(rStart)), bucket) === lc("__bl")
    val joined = l.join(r, lc("__bl") === rc("__br") && keyCond && overlap && designated)
      .drop("__bl", "__br")
    // drop the right side's duplicated key columns
    keys.foldLeft(joined)((d, k) => d.drop(rc(k)))
  }
}
