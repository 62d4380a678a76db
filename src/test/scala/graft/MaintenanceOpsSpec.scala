package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, IncrementalAgg, Profiler}

/** Monitoring/maintenance operators: daily anomaly z-scores, triangle
  * counting, incremental aggregate maintenance. */
class MaintenanceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("daily anomalies: spike flagged, constant series z-scores to 0") {
    // series A: 8 days at 10 events, then one day at 100
    // series B: constant -> variance 0 -> z 0 everywhere
    val rows = (for {
      d <- 1 to 8; i <- 1 to 10
    } yield ("A", ts(f"2024-01-0$d%d 01:${i}%02d:00"))) ++
      (for (i <- 1 to 100) yield ("A", ts(f"2024-01-09 02:${i % 60}%02d:${i / 60}%02d"))) ++
      (for (d <- 1 to 3; i <- 1 to 5) yield ("B", ts(f"2024-01-0$d%d 01:0$i%d:00")))
    val ev = rows.toDF("event_type", "ts")
    val r = Profiler.dailyAnomalies(ev, "event_type", "ts", windowDays = 7,
      threshold = 2.0)
    val a9 = r.filter($"series" === "A" && $"day" === "2024-01-09").collect().head
    assert(a9.getAs[Long]("n") == 100L)
    assert(a9.getAs[Boolean]("is_anomaly"), "spike day flagged")
    assert(a9.getAs[Double]("z") > 2.0)
    val aQuiet = r.filter($"series" === "A" && $"day" < "2024-01-09")
    assert(aQuiet.filter($"is_anomaly").isEmpty, "steady days not flagged")
    val b = r.filter($"series" === "B").collect()
    assert(b.forall(_.getAs[Double]("z") == 0.0), "zero variance -> z 0")
  }

  test("triangle count: known graph, orientation handles hubs") {
    // K4 on {1,2,3,4} = 4 triangles; pendant 5-1 adds none; duplicate
    // and reversed edges collapse into the canonical undirected set
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), // reversed dups
      (5L, 1L)
    ).toDF("src", "dst")
    val r = Graphs.triangleCount(edges, "src", "dst").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5L, 7L, 4L))
    // star graph: no triangles, and the hub generates zero wedges
    val star = (2L to 20L).map(i => (1L, i)).toDF("src", "dst")
    val s = Graphs.triangleCount(star, "src", "dst").collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == (20L, 19L, 0L))
  }

  test("incremental agg: merged partials equal the full recompute") {
    val full = Seq(
      ("x", 10.004), ("x", 19.996), ("x", 30.0), ("y", 5.555), ("y", 4.445)
    ).toDF("k", "amount")
    val (h, b) = (full.filter($"amount" < 15), full.filter($"amount" >= 15))
    val merged = IncrementalAgg.merge(Seq(
      IncrementalAgg.partials(h, Seq("k"), "amount"),
      IncrementalAgg.partials(b, Seq("k"), "amount")), Seq("k"))
    val direct = IncrementalAgg.partials(full, Seq("k"), "amount")
    assert(merged.orderBy("k").collect().toSeq ==
      direct.orderBy("k").collect().toSeq, "incremental == full, bit-for-bit")
    // empty delta is the identity
    val withEmpty = IncrementalAgg.merge(Seq(direct, IncrementalAgg.partials(
      full.filter(lit(false)), Seq("k"), "amount")), Seq("k"))
    assert(withEmpty.orderBy("k").collect().toSeq ==
      direct.orderBy("k").collect().toSeq)
    // derived view: exact cents -> 6dp average; half-up grid: 10.004 ->
    // 1000c + 2000c (19.996 -> 2000) + 3000c = 6000c over 3 rows = 20.0
    val avg = IncrementalAgg.withAvg(direct).filter($"k" === "x").collect().head
    assert(avg.getAs[Long]("cents") == 6000L)
    assert(avg.getAs[Double]("avg_amount") == 20.0)
  }
}
