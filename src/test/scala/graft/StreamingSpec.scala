package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Structured Streaming specs: windowed aggregation through a memory sink
  * and the idempotent foreachBatch merge (exactly-once effect). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDF = Seq(
    (1L, ts("2024-01-01 10:00:10"), 7L, "click", 1.0, "{}"),
    (2L, ts("2024-01-01 10:04:00"), 7L, "click", 2.0, "{}"),
    (3L, ts("2024-01-01 10:59:59"), 7L, "view", 3.0, "{}"),
    (4L, ts("2024-01-01 11:00:00"), 8L, "view", 4.0, "{}"),
    (5L, ts("2024-01-01 12:30:00"), 7L, "click", 5.0, "{}")  // new session for 7
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("batch hourly aggregation") {
    val r = EventStreams.hourlyAgg(eventsDF)
      .select(date_format($"hour", "HH").as("h"), $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    assert(r.contains(("10", "click", 2L, 3.0)))
    assert(r.contains(("10", "view", 1L, 3.0)))
    assert(r.contains(("11", "view", 1L, 4.0)))
    assert(r.contains(("12", "click", 1L, 5.0)))
  }

  test("streaming hourlyAgg equals the oracle-checked batch result (q50)") {
    // the SAME aggregation q50 hash-checks against DuckDB, driven through
    // readEventStream + foreachBatch into parquet: batch and streaming
    // paths must produce identical totals on the real events table
    val events = Tables.load(spark, sf(), "events")
    val src = tmpDir("graft-stream-src")
    events.write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val outDir = tmpDir("graft-stream-out")
    val q = EventStreams.hourlyAgg(EventStreams.readEventStream(spark, src, schema))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("graft-stream-ckpt"))
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select($"hour".cast("string"), $"event_type",
          $"n".cast("string"), $"sum_value".cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq
    val streaming = canon(spark.read.parquet(outDir))
    val batch = canon(EventStreams.hourlyAgg(events))
    assert(streaming.nonEmpty && streaming == batch)
  }

  test("stream-stream interval join equals the batch plan on real events") {
    val events = Tables.load(spark, sf(), "events")
    val clicksDir = tmpDir("graft-ss-clicks")
    val viewsDir = tmpDir("graft-ss-views")
    events.filter($"event_type" === "click").write.mode("overwrite").parquet(clicksDir)
    events.filter($"event_type" === "view").write.mode("overwrite").parquet(viewsDir)
    val schema = spark.read.parquet(clicksDir).schema
    val joined = EventStreams.clickViewJoin(
      EventStreams.readEventStream(spark, clicksDir, schema),
      EventStreams.readEventStream(spark, viewsDir, schema),
      watermark = "1 hour", lookback = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("graft-ss-ckpt"))
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select($"user_id".cast("string"), $"click_id".cast("string"),
          $"view_id".cast("string"), $"view_value".cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq
    val streaming = canon(spark.table("ssjoin"))
    val batch = canon(EventStreams.clickViewJoin(
      events.filter($"event_type" === "click"),
      events.filter($"event_type" === "view"),
      watermark = "1 hour", lookback = "30 minutes"))
    assert(streaming.nonEmpty, "join produced no pairs — data no longer exercises it")
    assert(streaming == batch)
  }

  test("gap sessionization: 30-min inactivity starts a new session") {
    val r = EventStreams.sessionize(eventsDF, gapMinutes = 30)
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect().toMap2
    // user 7 gaps: 10:00:10 -> 10:04 (same session), 10:04 -> 10:59:59
    // (56 min, new), 10:59:59 -> 12:30 (new) => 3 sessions over 4 events
    assert(r(7L) == (3L, 4L))
    assert(r(8L) == (1L, 1L))
  }

  implicit class MapOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("streaming windowed counts over a file source reach a memory sink") {
    val src = tmpDir("stream-src")
    eventsDF.coalesce(1).write.mode("overwrite").parquet(src)
    val stream = EventStreams.readEventStream(spark, src, eventsDF.schema)
    val agg = EventStreams.windowedCounts(stream, "1 hour", "1 hour", "10 minutes")
    val q = EventStreams.runToMemory(agg, "win_counts")
    q.processAllAvailable(); q.stop()
    val r = spark.table("win_counts")
      .select(date_format($"window.start", "HH").as("h"), $"event_type", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(r.contains(("10", "click", 2L)))
    assert(r.contains(("11", "view", 1L)))
  }

  test("session_window agg matches the manual gap sessionization") {
    // batch form: same session count per user as the window-based sessionize
    val sw = EventStreams.sessionWindowAgg(eventsDF, gap = "30 minutes")
    val perUser = sw.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(perUser == Map(7L -> 3L, 8L -> 1L), s"got $perUser")
    // session bounds: user 7's first session covers both 10:00 events
    val first = sw.filter($"user_id" === 7L).orderBy("session_start")
      .select($"n_events").as[Long].collect().toSeq
    assert(first == Seq(2L, 1L, 1L))

    // streaming form with watermark reaches a memory sink
    val src = tmpDir("sw-src")
    eventsDF.coalesce(1).write.mode("overwrite").parquet(src)
    val stream = EventStreams.readEventStream(spark, src, eventsDF.schema)
    val q = EventStreams.runToMemory(
      EventStreams.sessionWindowAgg(stream, "30 minutes", Some("10 minutes")),
      "sw_out", outputMode = "append")
    q.processAllAvailable(); q.stop()
    // append mode emits only sessions CLOSED before the final watermark
    // (12:30 - 10min = 12:20): user 7's last session ends 13:00 and is
    // correctly withheld in state — bounded-state semantics, not data loss
    assert(spark.table("sw_out").groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap == Map(7L -> 2L, 8L -> 1L))
  }

  test("streaming dedup within watermark keeps one row per key") {
    val src = tmpDir("dedup-src")
    // duplicate event_ids across the stream (redelivery shape)
    eventsDF.unionByName(eventsDF.limit(3)).coalesce(1)
      .write.mode("overwrite").parquet(src)
    val stream = EventStreams.readEventStream(spark, src, eventsDF.schema)
    val deduped = EventStreams.streamingDedup(stream, Seq("event_id"), "1 hour")
    val q = EventStreams.runToMemory(deduped, "dedup_out",
      outputMode = "append")
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L, 4L, 5L), s"each id exactly once: $ids")
  }

  test("idempotent foreachBatch sink: replaying the stream appends nothing") {
    val src = tmpDir("idem-src")
    val target = tmpDir("idem-target") + "/t"
    eventsDF.coalesce(1).write.mode("overwrite").parquet(src)

    def runOnce(checkpoint: String): Unit = {
      val stream = EventStreams.readEventStream(spark, src, eventsDF.schema)
      val q = EventStreams.idempotentParquetSink(stream, target, checkpoint, Seq("event_id"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce(tmpDir("cp1"))
    assert(spark.read.parquet(target).count() == 5)
    // Fresh checkpoint = full redelivery of every file: the at-least-once
    // worst case. The anti-join merge must still keep the target exact.
    runOnce(tmpDir("cp2"))
    assert(spark.read.parquet(target).count() == 5, "replay appended nothing")
  }

  test("exactly-once manifest sink: full redelivery lands zero duplicate rows") {
    import graft.etl.ManifestTable
    val src = tmpDir("eom-src")
    val root = tmpDir("eom-root")
    eventsDF.coalesce(1).write.mode("overwrite").parquet(src)

    def runOnce(checkpoint: String): Unit = {
      val stream = EventStreams.readEventStream(spark, src, eventsDF.schema)
      val q = EventStreams.exactlyOnceManifestSink(stream, root, "events",
          checkpoint, writerId = "eom-test")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce(tmpDir("eomcp1"))
    assert(ManifestTable.read(spark, root, "events").count() == 5)
    // fresh checkpoint redelivers everything as the same batch ids; the
    // watermark in the commit makes every replayed batch a no-op — this
    // sink needs NO key columns, unlike the anti-join sink above
    runOnce(tmpDir("eomcp2"))
    assert(ManifestTable.read(spark, root, "events").count() == 5)
  }

  test("manifest reader stream: snapshot then per-commit deltas, rewrites silent, restart delivers only new commits") {
    import graft.etl.ManifestTable
    val root = tmpDir("graft-mstream-root")
    val ckpt = tmpDir("graft-mstream-ckpt")
    def batch(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")

    ManifestTable.publish(spark, root, Map("t" -> batch(1, 2)))       // v1
    ManifestTable.appendNew(spark, root, "t", batch(3), Seq("id"))    // v2
    ManifestTable.compact(spark, root, "t")                           // v3: rewrite
    ManifestTable.appendNew(spark, root, "t", batch(4), Seq("id"))    // v4

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def drain(): Unit = {
      val q = EventStreams.committedAppendStream(spark, root, "t", ckpt) {
        (rows, v) => got.synchronized {
          got += ((v, rows.select("id").as[Long].collect().toSet)) }
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "manifest stream did not drain")
    }
    drain()
    // v1 snapshot, v2/v4 deltas, the v3 compaction delivered NOTHING
    assert(got.toList == List((1L, Set(1L, 2L)), (2L, Set(3L)), (4L, Set(4L))))

    // restart from the checkpoint after two more commits: only the new
    // versions arrive — nothing is re-delivered
    got.clear()
    ManifestTable.appendNew(spark, root, "t", batch(5), Seq("id"))    // v5
    ManifestTable.deleteWhere(spark, root, "t", col("id") === 2L)     // v6: rewrite
    drain()
    assert(got.toList == List((5L, Set(5L))))

    // reader twin of the exactly-once sink: mirror every delivery into a
    // second manifest table keyed by the source version; re-running the
    // whole stream from a FRESH checkpoint replays every commit, and the
    // transaction watermark absorbs all of it — zero duplicates
    val mirror = tmpDir("graft-mstream-mirror")
    def mirrorAll(ck: String): Unit = {
      val q = EventStreams.committedAppendStream(spark, root, "t", ck) {
        (rows, v) => ManifestTable.transactionalAppend(
          rows.sparkSession, mirror, "t", rows, "mirror", v); ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    mirrorAll(tmpDir("graft-mstream-ck1"))
    mirrorAll(tmpDir("graft-mstream-ck2")) // full redelivery, absorbed
    val mirrored = ManifestTable.read(spark, mirror, "t")
      .select("id").as[Long].collect().toSet
    // deltas never re-deliver rewritten content, so the mirror holds the
    // APPEND history (id 2's later deletion is a rewrite, invisible here)
    assert(mirrored == Set(1L, 2L, 3L, 4L, 5L))

    // a fresh reader on a compacted log gets the snapshot head, not an error
    val late = tmpDir("graft-mstream-late")
    ManifestTable.compactLog(spark, root, keepVersions = 1)
    got.clear()
    val q2 = EventStreams.committedAppendStream(spark, root, "t", late) {
      (rows, v) => got.synchronized {
        got += ((v, rows.select("id").as[Long].collect().toSet)) }
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000))
    assert(got.toList == List((6L, Set(1L, 3L, 4L, 5L))),
      "head snapshot = current state (id 2 deleted in v6)")
  }

  test("anomaly scoring over streamed-maintained daily counts equals batch") {
    // the monitoring loop at scale: micro-batches maintain (series, day)
    // counts incrementally; the z-score pass runs over the SMALL
    // maintained state — and must equal dailyAnomalies over raw history
    import graft.operators.Profiler
    val events = Tables.load(spark, sf(), "events")
    val src = tmpDir("graft-anom-src")
    events.repartition(3).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val base = tmpDir("graft-anom-state")
    val q = EventStreams.readEventStream(spark, src, schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       bid: Long) =>
        val part = batch
          .select(col("event_type").as("series"),
            date_trunc("day", col("ts")).cast("date").as("day"))
          .groupBy("series", "day").agg(count(lit(1)).as("n"))
        val prev = new java.io.File(s"$base/v${bid - 1}")
        val merged = if (prev.exists())
          spark.read.parquet(prev.toString).unionByName(part)
            .groupBy("series", "day").agg(sum("n").as("n"))
        else part
        merged.write.mode("overwrite").parquet(s"$base/v$bid")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("graft-anom-ckpt"))
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    val last = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName.drop(1).toInt).max
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("series", "day").collect().map(_.toSeq).toSeq
    val streamed = Profiler.anomaliesFromDaily(
      spark.read.parquet(s"$base/v$last"), windowDays = 7, threshold = 2.0)
    val batchForm = Profiler.dailyAnomalies(events, "event_type", "ts",
      windowDays = 7, threshold = 2.0)
    assert(canon(streamed).nonEmpty && canon(streamed) == canon(batchForm))
  }

  test("stateful sessionize under the RocksDB state store matches the default provider") {
    // the 100 TB story for stateful streaming: the default HDFS-backed
    // provider is executor-heap-bound; RocksDB spills state to local disk.
    // Same data, same query, both providers -> identical closed sessions,
    // and the checkpoint proves RocksDB actually engaged.
    val src = tmpDir("rocks-src")
    Seq(
      EventStreams.Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0, "{}"),
      EventStreams.Event(2, ts("2024-01-01 10:10:00"), 7, "view", 2.0, "{}"),
      EventStreams.Event(3, ts("2024-01-01 12:00:00"), 7, "click", 4.0, "{}"),
      EventStreams.Event(4, ts("2024-01-01 10:05:00"), 8, "view", 8.0, "{}"),
      EventStreams.Event(5, ts("2024-01-01 13:00:00"), 8, "view", 16.0, "{}")
    ).toDS().coalesce(1).write.mode("overwrite").parquet(src)

    def runSessions(name: String): (Set[(Long, Long, Double)], String) = {
      val ckpt = tmpDir(s"rocks-ckpt-$name")
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]].schema)
        .parquet(src).as[EventStreams.Event]
      val q = EventStreams.statefulSessionize(stream, gapMinutes = 30)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      (spark.table(name).select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet, ckpt)
    }

    val (defaultOut, defaultCkpt) = runSessions("rocks_off")
    val before = EventStreams.RocksDBStateStoreConf.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    EventStreams.RocksDBStateStoreConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val (rocksOut, rocksCkpt) = runSessions("rocks_on")
      assert(rocksOut.nonEmpty && rocksOut == defaultOut,
        s"provider changed results: $rocksOut vs $defaultOut")
      // proof each provider actually ran: HDFS provider writes .delta
      // state files, RocksDB (with changelog checkpointing) .changelog
      def stateFiles(ckpt: String): Seq[String] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$ckpt/state")).map(_.getName)
      }
      assert(stateFiles(defaultCkpt).exists(_.endsWith(".delta")))
      assert(stateFiles(rocksCkpt).exists(n =>
        n.endsWith(".changelog") || n.endsWith(".zip")))
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("transformWithState sessionize equals flatMapGroupsWithState") {
    // Spark 4's successor stateful API, driven over the same events as the
    // classic path; both share the session fold, so outputs must match
    // exactly. transformWithState REQUIRES the RocksDB provider.
    val src = tmpDir("tws-src")
    Seq(
      EventStreams.Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0, "{}"),
      EventStreams.Event(2, ts("2024-01-01 10:10:00"), 7, "view", 2.0, "{}"),
      EventStreams.Event(3, ts("2024-01-01 12:00:00"), 7, "click", 4.0, "{}"),
      EventStreams.Event(4, ts("2024-01-01 10:05:00"), 8, "view", 8.0, "{}"),
      EventStreams.Event(5, ts("2024-01-01 13:00:00"), 8, "view", 16.0, "{}")
    ).toDS().coalesce(1).write.mode("overwrite").parquet(src)

    def run(name: String,
            f: org.apache.spark.sql.Dataset[EventStreams.Event] =>
              org.apache.spark.sql.Dataset[EventStreams.ClosedSession]): Set[(Long, Long, Double)] = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]].schema)
        .parquet(src).as[EventStreams.Event]
      val q = f(stream).writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tmpDir(s"tws-ckpt-$name"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
    }

    // gap 31 min, NOT 30: with 30 the open-session timer for user 7
    // (12:00 + gap) lands EXACTLY on the final watermark (13:00 - gap =
    // 12:30), and the two engines disagree at that boundary (timers fire
    // at >=, GroupStateTimeout strictly after). A real pipeline doesn't
    // care which; the equality check needs the boundary case excluded.
    val classic = run("tws_classic", EventStreams.statefulSessionize(_, 31))
    val before = EventStreams.RocksDBStateStoreConf.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    EventStreams.RocksDBStateStoreConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val tws = run("tws_new", EventStreams.statefulSessionizeTWS(_, 31))
      assert(tws.nonEmpty && tws == classic, s"TWS $tws vs classic $classic")
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("streaming incremental rollup maintenance equals the full recompute") {
    // the q130 operator driven as a stream: each micro-batch folds its
    // partials into a versioned rollup state; after the stream drains,
    // the state must equal a from-scratch aggregation of everything —
    // exact-cents partials make that bit-for-bit, across any number of
    // batches in any order
    import graft.operators.IncrementalAgg
    val events = Tables.load(spark, sf(), "events")
    val src = tmpDir("graft-incragg-src")
    events.repartition(4).write.mode("overwrite").parquet(src) // 4 micro-batches
    val schema = spark.read.parquet(src).schema
    val base = tmpDir("graft-incragg-state")
    val q = EventStreams.readEventStream(spark, src, schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       bid: Long) =>
        val part = IncrementalAgg.partials(batch, Seq("event_type"), "value")
        val prev = new java.io.File(s"$base/v${bid - 1}")
        val merged = if (prev.exists())
          IncrementalAgg.merge(Seq(spark.read.parquet(prev.toString), part),
            Seq("event_type"))
        else part
        merged.write.mode("overwrite").parquet(s"$base/v$bid")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("graft-incragg-ckpt"))
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    val last = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName.drop(1).toInt).max
    assert(last >= 1, "expected multiple micro-batches")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(canon(spark.read.parquet(s"$base/v$last")) ==
      canon(IncrementalAgg.partials(events, Seq("event_type"), "value")))
  }

  test("streaming hll state: live distinct == batch; at-least-once replay exact") {
    import graft.operators.DistinctSketch
    val src = tmpDir("hll-src")
    val state = tmpDir("hll-state") + "/s"
    eventsDF.coalesce(1).write.mode("overwrite").parquet(src)

    def runOnce(checkpoint: String): Unit = {
      val stream = EventStreams.readEventStream(spark, src, eventsDF.schema)
      val q = DistinctSketch.sketchSink(stream, "user_id", "ts", state, checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce(tmpDir("hcp1"))
    def est(): Map[java.sql.Date, Long] =
      spark.read.parquet(state)
        .select($"day", DistinctSketch.estimate($"sketch").as("e"))
        .as[(java.sql.Date, Long)].collect().toMap
    val live = est()
    val batch = DistinctSketch.dailySketches(eventsDF, "user_id", "ts")
      .select($"day", DistinctSketch.estimate($"sketch").as("e"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(live == batch, "streamed state must equal the batch recompute")
    assert(live.values.head == 2L, "two distinct users on the one day")
    // fresh checkpoint = full redelivery (at-least-once worst case):
    // HLL re-insertion is idempotent, so the state must not move
    runOnce(tmpDir("hcp2"))
    assert(est() == live, "replay must not change register state")
    // a genuinely new user does move it
    Seq((6L, ts("2024-01-01 09:00:00"), 99L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce(tmpDir("hcp2")) // same checkpoint: only the new file delivers
    assert(est().values.head == 3L)
  }
}
