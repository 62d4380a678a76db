package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusMix, Funnel, PageRank, Profiler}
import graft.streaming.EventStreams

/** Funnel, PageRank, and robust-outlier operator specs. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def stagesOf(rows: Seq[(Long, Timestamp, String)],
                       gap: Option[Long] = None): Map[Long, Int] = {
    val ev = rows.toDF("user_id", "ts", "event_type")
    Funnel.userStages(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), gap)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("funnel: steps must occur in order, strictly after the previous") {
    val r = stagesOf(Seq(
      // u1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2: purchase BEFORE the qualifying click -> stage 2 only
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:05:00"), "click"),
      // u3: click at the SAME instant as view (not strictly after) -> stage 1
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // u4: never views -> stage 0
      (4L, ts("2024-01-01 10:00:00"), "click"),
      (4L, ts("2024-01-01 10:05:00"), "purchase")))
    assert(r == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("funnel: deepest stage wins (stage fold order)") {
    // Regression: a reversed fold once reported stage 1 for fully
    // converting users because the step-1 check ended up outermost.
    val r = stagesOf(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase")))
    assert(r(1L) == 3, "a user with all three steps is stage 3, not 1")
  }

  test("funnel: min-ts greedy picks the earliest qualifying step time") {
    // u1's first click (10:05) opens a window in which the purchase
    // (10:20) fits; the later click (11:00) would NOT have — greedy on
    // the earliest click is what lets the funnel complete.
    val r = stagesOf(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase")), gap = Some(30L))
    assert(r(1L) == 3)
  }

  test("funnel: bounded gap disqualifies late steps") {
    val r = stagesOf(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:31:00"), "click"), // 31 min > 30 -> stage 1
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "click")), // exactly 30 min -> counts
      gap = Some(30L))
    assert(r == Map(1L -> 1, 2L -> 2))
  }

  test("pagerank: symmetric 2-cycle stays uniform, ranks sum to 1") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = PageRank.run(e, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) == 0.5 && pr(2L) == 0.5)
  }

  test("pagerank: dangling sink accumulates rank, mass is conserved") {
    // a -> b, b dangling. After one iteration: pr(a) = 0.15/2 +
    // 0.85*(0.5/2) = 0.2875, pr(b) = 0.15/2 + 0.85*(0.5 + 0.5/2) = 0.7125.
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val pr = PageRank.run(e, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) == 0.2875 && pr(2L) == 0.7125)
    val pr5 = PageRank.run(e, iters = 5).collect().map(_.getDouble(1))
    val mass = pr5.sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass drifted: $mass")
    assert(pr5.max > 0.5, "the sink keeps the larger share")
  }

  test("pagerank: duplicate edges collapse to the distinct graph") {
    val once = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val dup = once.union(once).union(once)
    val a = PageRank.run(once, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(dup, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("robust outliers: lower median, MAD, strict 3-sigma count") {
    // g1 values: 1..9 plus a wild 1000: med of 10 values = lower median
    // = 5th order stat = 5.0;|x-5| = 4,3,2,1,0,1,2,3,4,995 -> sorted
    // 0,1,1,2,2,3,3,4,4,995, lower med (5th) = 2.0; threshold
    // 3*1.4826*2 = 8.8956 -> only 995 exceeds it.
    val df = ((1 to 9).map(v => ("g1", v.toDouble)) :+ ("g1", 1000.0)).toDF("g", "v")
    val r = Profiler.robustOutliers(df, "g", "v").collect().head
    assert(r.getAs[Double]("med") == 5.0)
    assert(r.getAs[Double]("mad") == 2.0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("histogram: equi-width binning, max lands in the last bucket") {
    val df = (Seq(0.0, 0.5, 1.0, 5.0, 9.99, 10.0)).toDF("v")
    val r = Profiler.histogram(df, "v", bins = 10).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // width 1.0: bucket 0 holds [0,1) -> {0.0, 0.5}; 1.0 is in bucket 1;
    // the max 10.0 clamps into bucket 9 with 9.99.
    assert(r(0L)._1 == 2 && r(1L)._1 == 1 && r(5L)._1 == 1 && r(9L)._1 == 2)
    assert(r(9L)._2 == 9.0, "lower bound of the last bucket")
    assert(r.values.map(_._1).sum == 6L, "every row lands in exactly one bucket")
  }

  test("histogram: constant column degenerates to a single bucket") {
    val df = Seq.fill(4)(3.25).toDF("v")
    val r = Profiler.histogram(df, "v", bins = 10).collect()
    assert(r.length == 1 && r.head.getLong(0) == 0L && r.head.getLong(1) == 4L)
  }

  test("robust outliers: zero-MAD group counts any deviation as outlier") {
    val df = (Seq.fill(5)(("g1", 7.0)) :+ ("g1", 7.5)).toDF("g", "v")
    val r = Profiler.robustOutliers(df, "g", "v").collect().head
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 1L,
      "with MAD 0 the threshold is 0, so the single deviant is flagged")
  }

  test("sliding windows: every event lands in exactly duration/slide windows") {
    val ev = Seq((ts("2024-01-01 10:07:00"), "view", 2.0))
      .toDF("ts", "event_type", "value")
    val r = EventStreams.slidingAgg(ev, "1 hour", "15 minutes").collect()
    assert(r.length == 4, "1h / 15min = 4 overlapping windows")
    val starts = r.map(_.getTimestamp(0).toString).sorted
    assert(starts.head == "2024-01-01 09:15:00.0" &&
      starts.last == "2024-01-01 10:00:00.0",
      "windows step back by one slide from the event's slide-aligned floor")
    assert(r.forall(x => x.getLong(2) == 1L && x.getDouble(3) == 2.0))
  }

  test("priority sample: deterministic, weight-monotone inclusion") {
    val docs = (1 to 200).map(i =>
      (i.toLong, s"doc text $i", if (i <= 20) 100000L else 10L))
      .toDF("doc_id", "text", "n_chars")
    val take = CorpusMix.prioritySample(docs, "n_chars", "text", "doc_id", 30)
      .collect().map(_.getLong(0)).toSet
    // 10000x heavier rows dominate the sample.
    assert((1 to 20).map(_.toLong).toSet.subsetOf(take),
      "every heavy row is sampled ahead of the light tail")
    val again = CorpusMix.prioritySample(docs, "n_chars", "text", "doc_id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(take == again, "content-hash uniforms make re-runs identical")
  }
}
