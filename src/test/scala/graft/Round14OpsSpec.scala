package graft

import org.apache.spark.sql.functions._

/** Round-14 fixes on crafted fixtures: crash recovery for the staged
  * swap, the reworked streaming ingestion gate (O(1) replay guard,
  * quarantine audit sink, empty-history bootstrap), the
  * ManifestTable-committed IVF index, and the tombstone-aware graph
  * compaction cadence.
  *
  * Recovery from a hard crash
  * inside atomicRewrite's two-rename swap window (the round-13 ADVICE
  * finding — live rows parked in `.rewrite-old-*` with the target
  * missing), both at the single-path entry and in vacuum's
  * whole-tree sweep. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Simulate the between-renames crash state for `path`: the published
    * dir is moved aside to its deterministic `.rewrite-old-<name>`
    * sidecar and nothing swapped in — exactly what a hard kill between
    * atomicRewrite's move-aside and swap-in leaves behind. */
  private def parkInOld(path: String): Unit = {
    val f = new java.io.File(path)
    val old = new java.io.File(f.getParentFile, s".rewrite-old-${f.getName}")
    assert(f.renameTo(old), s"fixture rename $f -> $old")
  }

  test("atomicRewrite: re-entry repairs a crash parked between renames") {
    val dir = tmpDir("arw-crash")
    val path = s"$dir/t"
    Seq(1L, 2L, 3L).toDF("id").write.parquet(path)
    parkInOld(path) // hard crash between move-aside and swap-in
    assert(!new java.io.File(path).exists())
    // a re-run that DERIVES its contents from the current table (the
    // vacuum/compact shape) must see the restored rows, not a missing dir
    graft.etl.IncrementalLoad.atomicRewrite(spark, path) { staging =>
      spark.read.parquet(path).filter(col("id") =!= 2L)
        .write.parquet(staging)
    }
    assert(spark.read.parquet(path).as[Long].collect().toSet == Set(1L, 3L))
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".rewrite-")), "sidecars cleared")
  }

  test("atomicRewrite: re-entry drops the backup when swap-in completed") {
    val dir = tmpDir("arw-crash2")
    val path = s"$dir/t"
    Seq(1L, 2L).toDF("id").write.parquet(path)
    // crash AFTER swap-in, before backup delete: new contents live at
    // the target, stale old copy lingers in .rewrite-old-<name>
    Seq(9L).toDF("id").write
      .parquet(s"$dir/.rewrite-old-t")
    graft.etl.IncrementalLoad.atomicRewrite(spark, path) { staging =>
      Seq(5L, 6L).toDF("id").write.parquet(staging)
    }
    assert(spark.read.parquet(path).as[Long].collect().toSet == Set(5L, 6L),
      "live target wins; stale backup must not be restored over it")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".rewrite-")))
  }

  test("recoverRewrites: tree sweep restores nested parked partitions") {
    val dir = tmpDir("arw-sweep")
    val tbl = s"$dir/idx"
    Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1), (5L, 2)).toDF("id", "band")
      .write.partitionBy("band").parquet(tbl)
    parkInOld(s"$tbl/band=1") // one partition lost mid-swap
    // stale staging from another crashed attempt must be cleared too
    Seq(0L).toDF("id").write.parquet(s"$tbl/.rewrite-staging-band=2")
    graft.etl.IncrementalLoad.recoverRewrites(spark, tbl)
    assert(spark.read.parquet(tbl).select("id").as[Long].collect().toSet
      == Set(1L, 2L, 3L, 4L, 5L), "parked partition restored")
    assert(!new java.io.File(tbl).listFiles()
      .exists(_.getName.startsWith(".rewrite-")))
  }

  test("vacuum: repairs an interrupted swap before the touched scan") {
    val dir = tmpDir("vac-crash")
    val tbl = s"$dir/idx"
    Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("id", "band")
      .write.partitionBy("band").parquet(tbl)
    graft.etl.Tombstones.delete(spark, tbl, Seq(3L).toDF("id"), "id")
    // hard crash while rewriting band=1: its live rows (3,4) sit only
    // in .rewrite-old-band=1. Without recovery the touched scan sees no
    // tombstoned row anywhere and vacuum would "complete" losing id=4.
    parkInOld(s"$tbl/band=1")
    graft.etl.Tombstones.vacuum(spark, tbl, "id", "band")
    assert(spark.read.parquet(tbl).select("id").as[Long].collect().toSet
      == Set(1L, 2L, 4L), "live row 4 restored then kept; 3 reclaimed")
    assert(!new java.io.File(graft.etl.Tombstones.sidecarPath(tbl)).exists(),
      "sidecar cleared last")
  }

  // ---- CorpusIngest: O(1) replay guard + quarantine + empty bootstrap ----

  private def ingestFixture(prefix: String) = {
    val root = tmpDir(prefix)
    (root, s"$root/index", s"$root/corpus", s"$root/quarantine")
  }

  private def ingest(batch: org.apache.spark.sql.DataFrame, idx: String,
                     corpus: String, batchId: Long,
                     quarantine: Option[String] = None): Unit =
    graft.streaming.CorpusIngest.ingestBatch(batch, "text", "doc_id", idx,
      corpus, batchId, bands = 16, rowsPerBand = 2, shingleN = 3,
      threshold = 0.8, quarantinePath = quarantine)

  test("CorpusIngest: committed-batch replay is O(1) — never reads the index") {
    val (_, idx, corpus, _) = ingestFixture("ing-o1")
    val h = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeMinhashIndex(h, "text", "doc_id", idx)
    h.write.parquet(corpus)
    val b = Seq((10L, "granite rivers remember every glacier that carved them long ago"))
      .toDF("doc_id", "text")
    ingest(b, idx, corpus, batchId = 0L)
    assert(spark.read.parquet(corpus).count() == 2)
    // replay with BOTH data paths destroyed: under the round-13 design
    // this crashed on the per-batch index scan; the commit-log fast
    // path must return without touching anything
    val fakeIdx = idx + "-gone"
    val fakeBatch = Seq((10L, "granite rivers remember every glacier that carved them long ago"))
      .toDF("doc_id", "text")
    ingest(fakeBatch, fakeIdx, corpus, batchId = 0L)
    assert(spark.read.parquet(corpus).count() == 2, "no-op replay")
    assert(!new java.io.File(fakeIdx).exists(),
      "replay never touched the (absent) index")
  }

  test("CorpusIngest: crashed replay completes only the missing sink") {
    val (_, idx, corpus, _) = ingestFixture("ing-crash")
    val h = Seq((1L, "colorless green ideas sleep furiously under winter moons tonight"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeMinhashIndex(h, "text", "doc_id", idx)
    h.write.parquet(corpus)
    val b = Seq(
      (10L, "seven crimson airships drifted across the copper morning skyline slowly"),
      (11L, "binary stars trade plasma in slow ten thousand year waltzes"))
      .toDF("doc_id", "text")
    // simulate a crash AFTER the index append, BEFORE the corpus append:
    // begin marker present, commit absent, index already holds the batch
    val logDir = graft.streaming.CorpusIngest.commitLogPath(corpus)
    new java.io.File(logDir).mkdirs()
    new java.io.File(logDir, "begin-7").createNewFile()
    graft.operators.Dedup.minhashIndexAppend(spark, b, "text", "doc_id", idx)
    ingest(b, idx, corpus, batchId = 7L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 10L, 11L), "corpus completed")
    assert(graft.operators.Dedup.readMinhashIndex(spark, idx)
      .groupBy("id", "band").count().filter(col("count") > 1).isEmpty,
      "no duplicate signature rows after the guarded replay")
    assert(new java.io.File(logDir, "commit-7").exists(), "batch committed")
  }

  test("CorpusIngest: kept + quarantined = batch; quarantine replay-idempotent") {
    val (_, idx, corpus, quar) = ingestFixture("ing-quar")
    val h = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeMinhashIndex(h, "text", "doc_id", idx)
    h.write.parquet(corpus)
    val b = Seq(
      (10L, "seven crimson airships drifted across the copper morning skyline slowly"),
      (11L, "the quick brown fox jumps over the lazy dog again and again"), // == h1
      (12L, "granite rivers remember every glacier that carved them long ago"),
      (13L, "granite rivers remember every glacier that carved them long ago")) // == 12
      .toDF("doc_id", "text")
    ingest(b, idx, corpus, batchId = 0L, quarantine = Some(quar))
    val kept = spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet -- Set(1L)
    val q = spark.read.parquet(quar)
    val quarantined = q.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 12L), s"kept: $kept")
    assert(quarantined == Set(11L, 13L), s"quarantined: $quarantined")
    assert((kept ++ quarantined).size == 4, "kept + quarantined = batch")
    val rows = q.select("doc_id", "matched_id", "kind")
      .as[(Long, Long, String)].collect().toSet
    assert(rows == Set((11L, 1L, "index"), (13L, 12L, "batch")),
      s"audit carries what matched: $rows")
    assert(q.filter(col("kind") === "index" && col("jaccard") < 0.8).isEmpty,
      "index-dup jaccard recorded at/above threshold")
    // crashed replay (begin present, commit removed): quarantine
    // overwrites its own batch partition — no duplicate audit rows
    new java.io.File(graft.streaming.CorpusIngest.commitLogPath(corpus),
      "commit-0").delete()
    ingest(b, idx, corpus, batchId = 0L, quarantine = Some(quar))
    assert(spark.read.parquet(quar).count() == 2, "quarantine idempotent")
    assert(spark.read.parquet(corpus).count() == 3, "corpus idempotent")
  }

  test("CorpusIngest: empty-history bootstrap (empty index, no corpus dir)") {
    val (_, idx, corpus, _) = ingestFixture("ing-empty")
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    graft.operators.Dedup.writeMinhashIndex(empty, "text", "doc_id", idx)
    val b = Seq(
      (10L, "seven crimson airships drifted across the copper morning skyline slowly"),
      (11L, "seven crimson airships drifted across the copper morning skyline slowly"))
      .toDF("doc_id", "text")
    ingest(b, idx, corpus, batchId = 0L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet == Set(10L), "within-batch dedup still applies")
    assert(graft.operators.Dedup.readMinhashIndex(spark, idx)
      .select("id").distinct().as[Long].collect().toSet == Set(10L),
      "index bootstrapped from empty")
    // and a second batch dedupes against the now-populated index
    val b2 = Seq((20L, "seven crimson airships drifted across the copper morning skyline slowly"))
      .toDF("doc_id", "text")
    ingest(b2, idx, corpus, batchId = 1L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet == Set(10L), "cross-batch dup gated after bootstrap")
  }

  // ---- CorpusIngest manifest mode: the batch is ONE transaction ----

  test("CorpusIngest manifest mode: all three dup kinds gated; replay " +
    "is an O(1) watermark no-op; orphans of a pre-commit crash invisible") {
    def doc(id: Long, text: String) = (id, text)
    val root = tmpDir("ingest-mf") + "/corpus"
    def ingestM(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      graft.streaming.CorpusIngest.ingestBatchManifest(b, "text", "doc_id",
        root, id, bands = 16, rowsPerBand = 2, shingleN = 3,
        threshold = 0.8)
    val b0 = Seq( // bootstrap batch — no tables exist yet
      doc(1L, "the quick brown fox jumps over the lazy dog again and again"),
      doc(2L, "colorless green ideas sleep furiously under winter moons tonight"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      doc(10L, "seven crimson airships drifted across the copper morning skyline slowly"),
      doc(11L, "the quick brown fox jumps over the lazy dog again and again"), // == 1
      doc(12L, "granite rivers remember every glacier that carved them long ago"),
      doc(13L, "granite rivers remember every glacier that carved them long ago")) // == 12
      .toDF("doc_id", "text")
    val b2 = Seq(
      doc(20L, "seven crimson airships drifted across the copper morning skyline slowly"), // == 10
      doc(21L, "binary stars trade plasma in slow ten thousand year waltzes"))
      .toDF("doc_id", "text")
    ingestM(b0, 0L); ingestM(b1, 1L); ingestM(b2, 2L)
    def corpusIds() = graft.etl.ManifestTable.read(spark, root, "corpus")
      .select("doc_id").as[Long].collect().toSet
    def indexIds() = graft.etl.ManifestTable.read(spark, root, "index")
      .select(col("id")).distinct().as[Long].collect().toSet
    val live = Set(1L, 2L, 10L, 12L, 21L)
    assert(corpusIds() == live, s"corpus gates all three dup kinds: ${corpusIds()}")
    assert(indexIds() == live, "index stays in step with the corpus")
    val q = graft.etl.ManifestTable.read(spark, root, "quarantine")
    assert(q.select("doc_id", "matched_id", "kind")
      .as[(Long, Long, String)].collect().toSet
      == Set((11L, 1L, "index"), (13L, 12L, "batch"), (20L, 10L, "index")),
      "quarantine audits every gated doc exactly once")
    // replay: the watermark no-ops before touching anything — version
    // count and both sinks unchanged
    val v = graft.etl.ManifestTable.current(spark, root).get.version
    ingestM(b1, 1L)
    assert(graft.etl.ManifestTable.current(spark, root).get.version == v &&
      corpusIds() == live, "watermark replay is a no-op")
    // a pre-commit crash leaves only ORPHAN data files — readers never
    // see them (nothing references them until a commit lands)
    Seq(doc(99L, "never committed")).toDF("doc_id", "text")
      .write.parquet(s"$root/corpus/d-deadbeefcafe")
    assert(corpusIds() == live, "orphans of a crashed batch are invisible")
    // skew-cap parity with the directory family: the combined cap holds
    // across manifest appends too (every bucket ≤ maxBucket)
    assert(graft.etl.ManifestTable.read(spark, root, "index")
      .groupBy("band", "bh").count().filter(col("count") > 1000).isEmpty)
  }

  test("CorpusIngest manifest mode: end-to-end stream across restarts") {
    val root0 = tmpDir("ingest-mf-e2e")
    val root = s"$root0/corpus"
    val src = s"$root0/src"
    val b1 = Seq(
      (10L, "seven crimson airships drifted across the copper morning skyline slowly"),
      (11L, "seven crimson airships drifted across the copper morning skyline slowly"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (20L, "seven crimson airships drifted across the copper morning skyline slowly"), // == 10
      (21L, "binary stars trade plasma in slow ten thousand year waltzes"))
      .toDF("doc_id", "text")
    def run(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = graft.streaming.CorpusIngest.dedupIngestManifest(stream,
        "text", "doc_id", root, s"$root0/ckpt").start()
      q.processAllAvailable(); q.stop()
    }
    b1.coalesce(1).write.mode("append").parquet(src)
    run() // stream run 1 (bootstrap: no tables exist)
    b2.coalesce(1).write.mode("append").parquet(src)
    run() // stream run 2 (restart from the checkpoint)
    assert(graft.etl.ManifestTable.read(spark, root, "corpus")
      .select("doc_id").as[Long].collect().toSet == Set(10L, 21L),
      "within-batch and cross-batch dups gated across restarts")
    assert(graft.etl.ManifestTable.read(spark, root, "quarantine")
      .select("doc_id", "matched_id").as[(Long, Long)].collect().toSet
      == Set((11L, 10L), (20L, 10L)), "audit complete across restarts")
  }

  // ---- versioned IVF: ManifestTable-committed index lifecycle ----

  test("versioned IVF: pinned reader byte-stable across append + delete; " +
    "retention vacuum; probed-set file skipping") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val isDelta = col("vec_id") >= 5 && col("vec_id") < 25
    val qs = e.filter(col("vec_id") < 3)
    val root = tmpDir("ivf-ver") + "/ivf"
    def search(v: Option[Long]) = graft.operators.Similarity
      .ivfTopKVersioned(spark, root, cents, qs, "vec_id", "embedding",
        k = 5, nprobe = 4, version = v)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    lazy val cents = graft.operators.Similarity.ivfWriteVersioned(
      e.filter(!isDelta), "vec_id", "embedding", root, nlist = 16,
      metaCols = Seq("label"))
    cents // force the v1 build
    val r1 = search(None)
    // append commits version 2; the pinned-v1 board must not move
    val appended = graft.operators.Similarity.ivfAppendVersioned(
      e.filter(isDelta), "vec_id", "embedding", root, cents,
      metaCols = Seq("label"))
    assert(appended == 20L, s"delta rows appended: $appended")
    assert(search(Some(1L)) == r1, "v1 pinned across the append")
    val r2 = search(None)
    assert(r2 != r1, "latest sees the delta")
    // replayed append: 0 rows, NO new version (idempotent)
    assert(graft.operators.Similarity.ivfAppendVersioned(
      e.filter(isDelta), "vec_id", "embedding", root, cents,
      metaCols = Seq("label")) == 0L)
    assert(graft.etl.ManifestTable.current(spark, root).get.version == 2L,
      "replay created no version")
    // delete one returned id by manifest copy-on-write (version 3)
    val dead = r2.map(_._2).head
    graft.operators.Similarity.ivfDeleteVersioned(spark, root,
      col("vec_id") === dead)
    assert(!search(None).exists(_._2 == dead), "deleted id gone at latest")
    assert(search(Some(2L)) == r2 && search(Some(1L)) == r1,
      "both prior snapshots byte-stable across the delete")
    // retention: vacuum to the current version only — time travel to
    // v1/v2 must now fail LOUDLY, latest must still serve
    graft.etl.ManifestTable.vacuum(spark, root, keepVersions = 1)
    intercept[IllegalArgumentException] { search(Some(1L)) }
    assert(!search(None).exists(_._2 == dead), "latest survives vacuum")
    // probed-set pruning is real: a single-list probe opens fewer
    // files than the table holds (manifest min/max file skipping)
    val (kept, total) = graft.etl.ManifestTable.pruneStats(spark, root,
      "lists", lo = 0L, hi = 0L)
    assert(kept < total && total > 1,
      s"file skipping prunes: kept $kept of $total")
    // filtered search: the metadata predicate evaluates against the
    // index-resident label column, pushed into the parquet scan of the
    // surviving files (the q328 semantics on the versioned family)
    val filteredDf = graft.operators.Similarity.ivfTopKVersioned(spark,
      root, cents, qs, "vec_id", "embedding", k = 5, nprobe = 8,
      pred = Some(col("label") === 1))
    val lbl = e.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    val filtered = filteredDf.select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    assert(filtered.nonEmpty &&
      filtered.forall { case (_, v) => lbl(v) == 1 },
      "every filtered hit satisfies the predicate")
    val plan = filteredDf.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"label predicate pushed into the manifest-file scan")
  }

  // ---- graphAppend: tombstone-aware compaction cadence ----

  /** The Round12/13 graph fixture: 8 well-separated direction groups of
    * 4 vectors each (ids i, i+8, i+16, i+24 share direction i%8). */
  private def groupedVecs() = {
    val rows = (0 until 32).map { i =>
      val d = i % 8
      val v = Array.tabulate(64)(j =>
        if (j == d * 8) 10.0 else if (j == d * 8 + 1) (i / 8).toDouble else 0.1)
        .toSeq
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("graphAppend: past the tombstone bar the append compacts; " +
    "below it dead edges persist") {
    val vecs = groupedVecs()
    val isDelta = col("vec_id") >= 24 // one whole direction tier
    val base = vecs.filter(!isDelta)
    val delta = vecs.filter(isDelta)
    val path = tmpDir("gann-cadence")
    graft.operators.GraphAnn.graphWrite(base, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = path, upperMod = 4, upperDegree = 8, upperRefine = 1)
    // M deletes: 6 of 24 base nodes dead = 6/32 of the post-append
    // corpus — under the bar at 0.25, over it at 0.15
    val deadIds = Seq(1L, 2L, 3L, 9L, 10L, 11L)
    graft.operators.GraphAnn.graphDelete(spark, path,
      deadIds.toDF("vec_id"))
    def deadEdges() = spark.read.parquet(s"$path/edges")
      .filter(col("src").isin(deadIds: _*)).count()
    assert(deadEdges() > 0, "fixture: dead nodes hold edges pre-append")
    // below the bar: plain append — dead edges still republished,
    // sidecar still present (the documented churn cost)
    graft.operators.GraphAnn.graphAppend(spark, path, base, delta,
      "vec_id", "embedding", dim = 64, planes = 4, tables = 2,
      degree = 8, rounds = 2, beamWidth = 16, entries = Seq(4L, 12L),
      vacuumAtTombstoneFraction = 0.25)
    assert(deadEdges() > 0 &&
      graft.operators.GraphAnn.graphTombstones(spark, path).nonEmpty,
      "below the bar the append stays an append")
    // over the bar: the SAME append escalates to a vacuum rebuild
    graft.operators.GraphAnn.graphAppend(spark, path, base, delta,
      "vec_id", "embedding", dim = 64, planes = 4, tables = 2,
      degree = 8, rounds = 2, beamWidth = 16, entries = Seq(4L, 12L),
      vacuumAtTombstoneFraction = 0.15)
    assert(deadEdges() == 0, "dead edges physically gone")
    assert(graft.operators.GraphAnn.graphTombstones(spark, path).isEmpty,
      "sidecar cleared by the escalated append")
    // search equality: the compacting append's index == a fresh build
    // over the live corpus (base minus deleted, plus delta)
    val fresh = tmpDir("gann-cadence-fresh")
    graft.operators.GraphAnn.graphWrite(
      vecs.filter(!col("vec_id").isin(deadIds: _*)), "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = fresh, upperMod = 4, upperDegree = 8, upperRefine = 1)
    def layer(p: String, l: String) = spark.read.parquet(s"$p/$l")
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(layer(path, "edges") == layer(fresh, "edges") &&
      layer(path, "upper_edges") == layer(fresh, "upper_edges"),
      "post-cadence index is a pure function of the live corpus")
  }

  // ---- versioned graph-ANN: one commit per maintenance op ----

  test("versioned graph index: pinned search stable across delete + " +
    "append; vacuum equals a fresh build; cadence escalates in one commit") {
    val vecs = groupedVecs()
    val isDelta = col("vec_id") >= 24
    val base = vecs.filter(!isDelta)
    val root = tmpDir("gann-ver") + "/g"
    def search(v: Option[Long]) = graft.operators.GraphAnn
      .layeredTopKVersioned(spark, root, vecs, vecs.filter(col("vec_id") === 8L),
        "vec_id", "embedding", dim = 64, planes = 4, tables = 2,
        entries = Seq(0L, 4L), rounds = 3, beamWidth = 8, version = v)
      .select("vec_id", "rank").as[(Long, Long)].collect().toSet
    val v1 = graft.operators.GraphAnn.graphWriteVersioned(base, "vec_id",
      "embedding", dim = 64, planes = 4, tables = 2, degree = 8,
      refine = 1, root = root, upperMod = 4, upperDegree = 8,
      upperRefine = 1)
    assert(v1 == 1L)
    val r1 = search(None)
    // soft delete: one commit, tombstones only; pinned v1 unmoved
    val dead = r1.map(_._1).head
    graft.operators.GraphAnn.graphDeleteVersioned(spark, root,
      Seq(dead).toDF("vec_id"))
    assert(!search(None).exists(_._1 == dead), "tombstoned never returned")
    assert(search(Some(1L)) == r1, "v1 pinned across the delete")
    // append below the cadence bar: one commit, edges only; pinned
    // versions unmoved, latest routes to the inserted tier
    graft.operators.GraphAnn.graphAppendVersioned(spark, root, base,
      vecs.filter(isDelta), "vec_id", "embedding", dim = 64, planes = 4,
      tables = 2, degree = 8, rounds = 2, beamWidth = 16,
      entries = Seq(0L, 4L), vacuumAtTombstoneFraction = 0.5)
    assert(search(Some(1L)) == r1, "v1 pinned across the append")
    assert(!search(None).exists(_._1 == dead), "tombstones carried")
    // vacuum: both layers + cleared tombstones in ONE commit; latest
    // equals a fresh build over the live corpus
    graft.operators.GraphAnn.graphVacuumVersioned(spark, root, vecs,
      "vec_id", "embedding", dim = 64, planes = 4, tables = 2,
      degree = 8, refine = 1)
    val fresh = tmpDir("gann-ver-fresh") + "/g"
    graft.operators.GraphAnn.graphWriteVersioned(
      vecs.filter(col("vec_id") =!= dead), "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      root = fresh)
    def layer(r: String, t: String) = graft.etl.ManifestTable
      .read(spark, r, t).select("src", "dst").as[(Long, Long)]
      .collect().toSet
    assert(layer(root, "edges") == layer(fresh, "edges") &&
      layer(root, "upper_edges") == layer(fresh, "upper_edges"),
      "post-vacuum latest is a pure function of the live corpus")
    assert(graft.etl.ManifestTable.read(spark, root, "tombstones")
      .isEmpty, "tombstone table cleared in the same commit")
    // and v1 is STILL searchable (retention, not overwrite)
    assert(search(Some(1L)) == r1, "v1 pinned across the vacuum")
    // cadence: past the tombstone bar the append escalates to a vacuum
    // rebuild that lands as ONE commit — exactly one new version, dead
    // edges gone, tombstone table cleared atomically with the layers
    val deadIds = Seq(1L, 2L, 3L, 9L, 10L, 11L) // 6/32 ≥ the 0.15 bar
    graft.operators.GraphAnn.graphDeleteVersioned(spark, root,
      deadIds.toDF("vec_id"))
    val vBefore = graft.etl.ManifestTable.current(spark, root).get.version
    graft.operators.GraphAnn.graphAppendVersioned(spark, root, base,
      vecs.filter(isDelta), "vec_id", "embedding", dim = 64, planes = 4,
      tables = 2, degree = 8, rounds = 2, beamWidth = 16,
      entries = Seq(0L, 4L), vacuumAtTombstoneFraction = 0.15)
    assert(graft.etl.ManifestTable.current(spark, root).get.version
      == vBefore + 1, "the escalated append is ONE commit")
    assert(graft.etl.ManifestTable.read(spark, root, "tombstones").isEmpty
      && graft.etl.ManifestTable.read(spark, root, "edges")
        .filter(col("src").isin(deadIds: _*)).isEmpty,
      "dead edges reclaimed and tombstones cleared atomically")
  }

  // ---- ivfPqAppend: recall-drift board (rebuild-trigger curve) ----

  test("ivfPqAppend drift board: appended-index recall vs a full rebuild " +
    "at 10%/50%/100% append fractions") {
    // ivfPqAppend freezes the base's coarse centroids and codebooks; as
    // the appended fraction grows, quantization drifts from what a
    // re-trained index would use. This board MEASURES that drift — the
    // recall-vs-rebuild curve the ivfPqAppend docs previously asserted
    // by prose — and pins a floor at the 50% fraction (the documented
    // compaction trigger: compact before the appended fraction passes
    // the base size).
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val qs = e.filter(col("vec_id") < 5)
    val base = e.filter(col("vec_id") >= 5 && col("vec_id") < 125) // 120
    def delta(n: Int) = e.filter(col("vec_id") >= 125 &&
      col("vec_id") < 125 + n)
    val k = 10
    def recall(found: org.apache.spark.sql.DataFrame,
               truth: Set[(Long, Long)]): Double = {
      val f = found.select("query_id", "vec_id").as[(Long, Long)]
        .collect().toSet
      (f & truth).size.toDouble / truth.size
    }
    val curve = Seq(12, 60, 120).map { n => // 10% / 50% / 100% of base
      val corpus = base.unionByName(delta(n))
      val truth = graft.operators.Similarity.bruteForceTopK(corpus, qs,
          "vec_id", "embedding", k = k)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val aPath = tmpDir(s"pq-drift-a$n") + "/pq"
      val (cents, cb) = graft.operators.Similarity.ivfPqWrite(base,
        "vec_id", "embedding", aPath, dim = 64, nlist = 16)
      graft.operators.Similarity.ivfPqAppend(delta(n), "vec_id",
        "embedding", aPath, cents, cb, dim = 64)
      val appended = recall(graft.operators.Similarity.ivfPqTopKPartitioned(
        spark, aPath, cents, cb, qs, "vec_id", "embedding", dim = 64,
        k = k, nprobe = 8), truth)
      val rPath = tmpDir(s"pq-drift-r$n") + "/pq"
      val (rc, rcb) = graft.operators.Similarity.ivfPqWrite(corpus,
        "vec_id", "embedding", rPath, dim = 64, nlist = 16)
      val rebuilt = recall(graft.operators.Similarity.ivfPqTopKPartitioned(
        spark, rPath, rc, rcb, qs, "vec_id", "embedding", dim = 64,
        k = k, nprobe = 8), truth)
      info(f"append fraction ${n * 100 / 120}%3d%%: appended recall@$k " +
        f"$appended%.2f vs rebuilt $rebuilt%.2f")
      (n, appended, rebuilt)
    }
    // pinned floors (deterministic fixture; measured curve: 10% ->
    // 0.48 vs 0.50, 50% -> 0.42 vs 0.42, 100% -> 0.32 vs 0.34): at the
    // 50% fraction the appended index must hold recall within 0.1 of a
    // full rebuild and at least 0.40 absolute — past that, compact
    // (rebuild) per the ivfPqAppend docs. The small measured drift IS
    // the board's finding: at these fractions the frozen codebooks
    // track a retrain closely, so the trigger is corpus growth (both
    // curves sink as k-NN gets harder), not quantization collapse.
    val (_, app50, reb50) = curve(1)
    assert(app50 >= 0.40, f"appended recall@10 at 50%% = $app50%.2f")
    assert(reb50 - app50 <= 0.1,
      f"drift at 50%% exceeds the rebuild trigger: $app50%.2f vs $reb50%.2f")
  }
}
