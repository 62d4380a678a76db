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

  test("bfs distances: exact hops, min over multiple paths, horizon cutoff") {
    // path 1-2-3-4-5 plus shortcut 1-4: dist(4) = 1 via shortcut, not 3;
    // 6-7 is a separate component, never reached
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (6L, 7L)
    ).toDF("src", "dst")
    val seeds = Seq(1L, 1L).toDF("id") // duplicate seed must not double rows
    val d = Graphs.bfsDistances(edges, "src", "dst", seeds, "id", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // horizon 1: node 3 and 5 fall outside
    val d1 = Graphs.bfsDistances(edges, "src", "dst", seeds, "id", maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d1 == Map(1L -> 0, 2L -> 1, 4L -> 1))
  }

  test("bfs deep chain: per-hop lineage cut bounds plan depth, frontier exhaustion stops early") {
    // a path graph of diameter 120 — pre-cut, 120 nested join-aggregates
    // would blow up analysis; with the per-hop Lineage.cut every round's
    // plan reads the previous materialization
    val n = 120L
    val chain = (0L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val d = Graphs.bfsDistances(chain, "src", "dst", seeds, "id", maxHops = 200)
    // the returned plan is a scan of the last cut, not the whole history
    val nNodes = d.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nNodes <= 5, s"expected a flat post-cut plan, got $nNodes nodes:\n" +
      d.queryExecution.optimizedPlan)
    val got = d.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == n + 1 && (0L to n).forall(i => got(i) == i.toInt),
      "exact hop distance along the whole chain")
  }

  test("clustering coefficient: clique scores 1, star center scores 0") {
    // K3 {1,2,3} plus pendant 4-1: nodes 1..3 have cc with their clique,
    // node 4 deg 1 -> 0; node 1 deg 3 -> 1 triangle / C(3,2)=3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val r = graft.operators.Graphs.clusteringCoefficient(edges, "src", "dst", k = 10)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3)))
      .toMap
    assert(r(2L) == (2L, 1L, 1.0) && r(3L) == (2L, 1L, 1.0))
    assert(r(1L) == (3L, 1L, 0.333333))
    assert(r(4L) == (1L, 0L, 0.0))
  }

  test("fk audit: violations, unreferenced parents, null FKs not violations") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.operators.Validate.fkAudit(Seq(
      ("c_p", child, "fk", parent, "pk"))).collect().head
    assert(r.getString(0) == "c_p")
    assert(r.getLong(1) == 3L, "null FK not counted as child")
    assert(r.getLong(2) == 1L, "99 is an orphan")
    assert(r.getLong(3) == 3L && r.getLong(4) == 1L, "parent 3 unreferenced")
    assert(r.getDouble(5) == 0.666667)
  }

  test("basket rules: pair counts, confidence asymmetry, lift") {
    // baskets: (u1,d1)={x,y}, (u2,d1)={x,y}, (u3,d1)={x}, (u4,d1)={y,z}
    val df = Seq(
      (1L, "d1", "x"), (1L, "d1", "y"), (1L, "d1", "x"), // within-basket dup
      (2L, "d1", "x"), (2L, "d1", "y"),
      (3L, "d1", "x"),
      (4L, "d1", "y"), (4L, "d1", "z")
    ).toDF("u", "d", "item")
    val r = graft.operators.Baskets.pairRules(df, Seq("u", "d"), "item",
      minPairSupport = 1L).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val xy = r(("x", "y"))
    assert(xy.getAs[Long]("n_ab") == 2L)
    assert(xy.getAs[Long]("n_a") == 3L && xy.getAs[Long]("n_b") == 3L)
    assert(xy.getAs[Double]("support") == 0.5)       // 2 of 4 baskets
    assert(xy.getAs[Double]("conf_ab") == 0.666667)  // x->y
    assert(xy.getAs[Double]("lift") == 0.888889)     // 2*4/(3*3)
    val yz = r(("y", "z"))
    assert(yz.getAs[Double]("conf_ba") == 1.0, "z always with y")
  }

  test("debounce: chatter dropped, first kept, keys independent") {
    import graft.operators.Resample
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:30"), 2L, "a"), // 30s after prev: dropped
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"), // 90s after RAW prev: kept
      (1L, ts("2024-01-01 10:00:10"), 4L, "b"), // other key: kept
      (2L, ts("2024-01-01 10:00:20"), 5L, "a")  // other user: kept
    ).toDF("user_id", "ts", "event_id", "event_type")
    val kept = Resample.debounce(ev, Seq("user_id", "event_type"), "ts",
      "event_id", gapSeconds = 60L).select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("exact quantiles: rank selection, short groups, real data values") {
    import graft.operators.Profiler
    // group a: 1..100 -> p50=50, p95=95, p99=99 (ceil ranks 50/95/99)
    // group b: 3 values -> p50 = 2nd, p95/p99 = 3rd
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      Seq(("b", 10L), ("b", 20L), ("b", 30L))).toDF("g", "v")
    val r = Profiler.exactQuantiles(df, "g", "v",
      Seq(("p50", 1L, 2L), ("p95", 19L, 20L), ("p99", 99L, 100L)))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(3)).toMap
    assert(r(("a", "p50")) == 50L && r(("a", "p95")) == 95L && r(("a", "p99")) == 99L)
    assert(r(("b", "p50")) == 20L && r(("b", "p95")) == 30L && r(("b", "p99")) == 30L)
  }

  test("checksum compare: only the drifted partition mismatches") {
    import graft.operators.Validate
    val a = Seq(("p1", 1L, 10L), ("p1", 2L, 20L), ("p2", 3L, 30L)).toDF("p", "id", "v")
    val b = Seq(("p1", 1L, 10L), ("p1", 2L, 21L), ("p2", 3L, 30L)).toDF("p", "id", "v")
    val r = Validate.checksumCompare(a, b,
      d => Seq(Validate.enc.long(col("id")), Validate.enc.long(col("v"))), Seq("p"))
      .collect().map(x => x.getString(0) -> x.getBoolean(5)).toMap
    assert(r == Map("p1" -> false, "p2" -> true))
  }

  test("eval overlap report: burned and clean eval docs") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "alpha beta gamma delta"),   // fully contained -> 1.0
      (101L, "nothing shared here at all") // -> 0.0
    ).toDF("doc_id", "text")
    val r = Dedup.evalOverlapReport(corpus, evalSet, "text", "doc_id", shingleN = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(100L) == 1.0 && r(101L) == 0.0)
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
