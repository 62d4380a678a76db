package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Cohorts, Intervals, Resample}

/** Temporal analytics operators on handcrafted inputs: interval
  * coalescing, cohort retention, resample + forward fill. */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("interval merge coalesces overlapping and touching, splits gaps") {
    // user 1: [0,10] [5,15] (overlap) [15,20] (touching -> merges)
    //         [30,40] (gap -> new island)
    // user 2: single interval
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L), (1L, 30L, 40L),
      (2L, 100L, 200L)
    ).toDF("k", "s", "e")
    val merged = Intervals.merge(iv, "k", col("s"), col("e"))
      .orderBy("k", "start_us").collect()
    assert(merged.map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 0L, 20L, 3L), (1L, 30L, 40L, 1L), (2L, 100L, 200L, 1L)))

    val cov = Intervals.coverage(iv, "k", col("s"), col("e"))
      .orderBy("k").collect()
    // user 1: covered 20 + 10 = 30 over span 40; user 2: 100 over 100
    assert(cov.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 4L, 2L, 30L, 40L), (2L, 1L, 1L, 100L, 100L)))
  }

  test("interval merge: containment and duplicate intervals") {
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 10L, 20L), (1L, 100L, 101L))
      .toDF("k", "s", "e")
    val m = Intervals.merge(iv, "k", col("s"), col("e")).collect()
    assert(m.length == 1 && m.head.getLong(2) == 0L && m.head.getLong(3) == 101L)
  }

  test("cohort retention: offsets, cohort size, and ratio") {
    // cohort week of 2024-01-01 (Mon): users 1,2 first seen that week;
    // user 1 returns in week+1, both gone by week+2; user 3 starts week+1
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-03 11:00:00")),
      (1L, ts("2024-01-09 09:00:00")), // offset 1 for cohort wk0
      (3L, ts("2024-01-10 12:00:00")), // cohort wk1
      (1L, ts("2024-01-02 15:00:00"))  // same user+week dup: no double count
    ).toDF("user_id", "ts")
    val r = Cohorts.retention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
    assert(r.map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2),
      x.getLong(3), x.getDouble(4))).toSeq == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-08", 0L, 1L, 1L, 1.0)))
  }

  test("rolling active users: window membership, clipping, quiet-day DAU 0") {
    // user 1 active Jan 1; user 2 active Jan 1 and Jan 5; 3-day window
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-05 11:00:00"))
    ).toDF("user_id", "ts")
    val r = Cohorts.rollingActive(ev, "user_id", "ts", windowDays = 3)
      .orderBy("day").collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(
      ("2024-01-01", 2L, 2L), // both active
      ("2024-01-02", 0L, 2L), // quiet day, both in trailing window
      ("2024-01-03", 0L, 2L),
      // Jan 4: nobody's window covers it except... window(Jan4)=Jan2..4: none
      ("2024-01-05", 1L, 1L))) // days past max(d)=Jan5 clipped
  }

  test("streaks: longest consecutive run and total active days") {
    val ev = Seq(
      // user 1: Jan 1,2,3 then Jan 5 -> streak 3, active 4
      (1L, ts("2024-01-01 01:00:00")), (1L, ts("2024-01-02 01:00:00")),
      (1L, ts("2024-01-03 01:00:00")), (1L, ts("2024-01-05 01:00:00")),
      (1L, ts("2024-01-02 23:00:00")), // same-day dup ignored
      // user 2: single day
      (2L, ts("2024-03-01 12:00:00"))
    ).toDF("user_id", "ts")
    val r = Cohorts.streaks(ev, "user_id", "ts").orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, 4L, 3L), (2L, 1L, 1L)))
  }

  test("transition matrix: counts, row normalization, tie-broken order") {
    import graft.operators.Paths
    val ev = Seq(
      // user 1: a -> b -> a ; user 2: a -> b  => a->b x2 of 2 (p=1.0),
      // b->a x1 of 1 (p=1.0)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (2L, ts("2024-01-01 11:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "b") // same ts: id breaks the tie
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Paths.transitions(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_type", "to_type").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(4))).toSeq
    assert(r == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("top paths: opening sequences ranked, short users keep short paths") {
    import graft.operators.Paths
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "x"), (1L, ts("2024-01-01 10:01:00"), 2L, "y"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "z"), (1L, ts("2024-01-01 10:03:00"), 4L, "w"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "x"), (2L, ts("2024-01-01 10:01:00"), 6L, "y"),
      (2L, ts("2024-01-01 10:02:00"), 7L, "z"),
      (3L, ts("2024-01-01 10:00:00"), 8L, "solo")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Paths.topPaths(ev, "user_id", "ts", "event_id", "event_type",
      depth = 3, k = 5).collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("x>y>z", 2L), ("solo", 1L))) // 4th event never in path
  }

  test("time-weighted average: durations weight values, last point free") {
    import graft.operators.Resample
    // value 10 held for 30s, then 20 held for 10s -> twap = (300+200)/40
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:00:30"), 2L, 20.0),
      (1L, ts("2024-01-01 00:00:40"), 3L, 999.0), // terminal: no weight
      (2L, ts("2024-01-01 00:00:00"), 4L, 5.0)    // single event: no row
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Resample.timeWeightedAvg(ev, "user_id", "ts", "event_id", "value")
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)
    assert(row.getLong(2) == 40000L) // ms
    assert(row.getDouble(3) == 12.5)
  }

  test("resample: dense daily grid, forward fill, observation flags") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.5), (1L, ts("2024-01-01 11:00:00"), 2.0),
      (1L, ts("2024-01-04 09:00:00"), 4.0), // 2-day gap before this
      (2L, ts("2024-02-01 00:00:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val r = Resample.dailyForwardFill(ev, "user_id", "ts", "value")
      .orderBy("key", "day").collect()
    val rows = r.map(x => (x.getLong(0), x.getDate(1).toString, x.getLong(2),
      Option(x.get(3)), x.getDouble(4), x.getBoolean(5))).toSeq
    assert(rows == Seq(
      (1L, "2024-01-01", 2L, Some(3.5), 3.5, true),
      (1L, "2024-01-02", 0L, None, 3.5, false),
      (1L, "2024-01-03", 0L, None, 3.5, false),
      (1L, "2024-01-04", 1L, Some(4.0), 4.0, true),
      (2L, "2024-02-01", 1L, Some(7.0), 7.0, true)))
  }
}
