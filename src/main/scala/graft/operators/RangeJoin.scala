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
}
