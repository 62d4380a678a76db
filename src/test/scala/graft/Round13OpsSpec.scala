package graft

import org.apache.spark.sql.functions._

/** Round-13 fixes on crafted fixtures: atomic graph-ANN index
  * maintenance (staged-swap publish, duplicate-edge dedup), the
  * atomicRewrite publish primitive, and the survival-board self-checksum
  * diagnostic (q318/q319). */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- atomicRewrite: the single-path staged-swap primitive ----

  test("atomicRewrite: mid-write failure leaves the published table intact") {
    val dir = tmpDir("arw")
    val path = s"$dir/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(path)
    // the callback fails AFTER staging partial contents — the published
    // path must stay byte-readable and value-identical
    intercept[RuntimeException] {
      graft.etl.IncrementalLoad.atomicRewrite(spark, path) { staging =>
        Seq((9L, "x")).toDF("id", "v").write.parquet(staging)
        throw new RuntimeException("boom mid-append")
      }
    }
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSet
      == Set(1L, 2L), "old table survives a failed rewrite")
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".rewrite-"))
    assert(leftovers.isEmpty, s"staging cleaned up: ${leftovers.mkString(",")}")
  }

  test("atomicRewrite: success swaps new contents in; first publish works") {
    val dir = tmpDir("arw2")
    val path = s"$dir/t"
    // first publish: no existing target
    graft.etl.IncrementalLoad.atomicRewrite(spark, path) { staging =>
      Seq(1L, 2L).toDF("id").write.parquet(staging)
    }
    assert(spark.read.parquet(path).count() == 2)
    // rewrite: full replacement, old version gone, no leftovers
    graft.etl.IncrementalLoad.atomicRewrite(spark, path) { staging =>
      Seq(7L, 8L, 9L).toDF("id").write.parquet(staging)
    }
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSet
      == Set(7L, 8L, 9L))
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".rewrite-")), "no staging/old dirs left")
  }

  // ---- graphAppend: atomic + duplicate-free index maintenance ----

  /** Deterministic embedding fixture: 8 well-separated direction groups
    * of 4 vectors each (ids i, i+8, i+16, i+24 share direction i%8) —
    * the Round12 graphAppend fixture shape. */
  private def groupedVecs() = {
    val rows = (0 until 32).map { i =>
      val d = i % 8
      val v = Array.tabulate(64)(j =>
        if (j == d * 8) 10.0 else if (j == d * 8 + 1) (i / 8).toDouble else 0.1)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("graphAppend: failed append leaves the OLD index readable and searchable") {
    val vecs = groupedVecs()
    val base = vecs.filter(col("vec_id") < 24)
    val path = tmpDir("gann-atomic")
    graft.operators.GraphAnn.graphWrite(base, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = path, upperMod = 4, upperDegree = 8, upperRefine = 1)
    val before = spark.read.parquet(s"$path/edges")
      .select("src", "dst").as[(Long, Long)].collect().toSet
    // poisoned delta: evaluating its vector column throws INSIDE the
    // append's jobs — whichever stage hits it first, the published
    // index must be untouched (the old in-place overwrite deleted the
    // only copy before the new write committed)
    val poisoned = vecs.filter(col("vec_id") >= 24)
      .withColumn("embedding",
        when(expr("raise_error('poisoned delta') IS NULL"), col("embedding")))
    intercept[Exception] {
      graft.operators.GraphAnn.graphAppend(spark, path, base, poisoned,
        "vec_id", "embedding", dim = 64, planes = 4, tables = 2,
        degree = 8, rounds = 2, beamWidth = 16, entries = Seq(0L, 4L))
    }
    val after = spark.read.parquet(s"$path/edges")
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(after == before, "failed append must not alter the index")
    assert(!new java.io.File(path).listFiles()
      .exists(_.getName.startsWith(".rewrite-")), "no staging left behind")
  }

  // ---- modularity: the community-quality gate for the LPA family ----

  /** Two planted weight-10 triangles bridged by weak weight-1 edges. */
  private def plantedCommunities() = Seq(
    (1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),
    (4L, 5L, 10L), (4L, 6L, 10L), (5L, 6L, 10L),
    (1L, 4L, 1L), (2L, 5L, 1L), (3L, 6L, 1L),
    (1L, 5L, 1L), (2L, 6L, 1L), (3L, 4L, 1L),
    (1L, 6L, 1L), (2L, 4L, 1L), (3L, 5L, 1L))
    .toDF("a", "b", "w")

  test("modularity: weighted LPA scores >= unweighted on planted communities") {
    val e = plantedCommunities()
    val nodes = (1L to 6L).toDF("id")
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      graft.operators.Graphs.modularity(e, "a", "b", col("w"),
          labels, "node", "community")
        .select("modularity").as[Double].head()
    val wq = q(graft.operators.Graphs.weightedLabelPropagation(
      e, "a", "b", "w", nodes, "id", iters = 2))
    val uq = q(graft.operators.Graphs.labelPropagation(
      e.select("a", "b"), "a", "b", nodes, "id", iters = 2))
    info(s"weighted Q = $wq, unweighted Q = $uq")
    assert(wq >= uq, s"weighted LPA must score >= unweighted: $wq vs $uq")
    assert(wq > 0.0, "weighted LPA recovers the planted structure (Q > 0)")
    // ground truth: the planted split's exact Q on the integer grid —
    // m=39, per clique w_in=30+3=... intra 30, deg 63+... verified
    // against the hand-computed q_num formula below
    val truth = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "community")
    val tq = q(truth)
    assert(wq <= tq, s"no partition beats the planted one here: $wq vs $tq")
  }

  test("modularityLocalMove: a misplaced node goes home, Q never drops") {
    // two weight-10 triangles + one weak bridge; node 3 mislabeled
    // into the right-hand community
    val e = Seq((1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),
      (4L, 5L, 10L), (4L, 6L, 10L), (5L, 6L, 10L), (3L, 4L, 1L))
      .toDF("a", "b", "w")
    val bad = Seq((1L, 1L), (2L, 1L), (3L, 4L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "community")
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      graft.operators.Graphs.modularity(e, "a", "b", col("w"),
          labels, "node", "community")
        .select("modularity").as[Double].head()
    val moved = graft.operators.Graphs.modularityLocalMove(e, "a", "b",
      col("w"), bad, "node", "community")
    val got = moved.select("node", "community").as[(Long, Long)]
      .collect().toMap
    assert(got(3L) == 1L, s"node 3's modularity gain points home: $got")
    assert(Seq(1L, 2L).forall(got(_) == 1L) &&
      Seq(4L, 5L, 6L).forall(got(_) == 4L),
      s"well-placed nodes stay: $got")
    assert(q(moved) >= q(bad), "the local move never lowers modularity")
    // exact integer board: the refined partition's per-community rows
    val board = graft.operators.Graphs.modularity(e, "a", "b", col("w"),
        moved, "node", "community")
      .select("community", "csize", "w_in", "deg_sum")
      .as[(Long, Long, Long, Long)].collect().toSet
    // m=61; comm 1 = {1,2,3}: w_in=30, degs 20+20+21; comm 4: same + 21
    assert(board == Set((1L, 3L, 30L, 61L), (4L, 3L, 30L, 61L)),
      s"exact integer community board: $board")
  }

  // ---- dupSpans: exact boundaries at the suffix-array recall bound ----

  test("dupSpans: planted overlaps come back with exact boundaries; sub-spanN invisible") {
    def toks(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix$i")
    val shared14 = toks("s", 14) // planted overlap, L = 14 >= spanN
    val shared9 = toks("t", 9)   // planted overlap, L = 9 < spanN
    val docs = Seq(
      // doc 1: 10 unique + shared14 + 10 unique -> interval (10, 14)
      (1L, (toks("a", 10) ++ shared14 ++ toks("b", 10)).mkString(" ")),
      // doc 2: 15 unique + shared14 + 5 unique -> interval (15, 14)
      (2L, (toks("c", 15) ++ shared14 ++ toks("d", 5)).mkString(" ")),
      // docs 3/4 share only the 9-token run: below the match length
      (3L, (toks("e", 10) ++ shared9 ++ toks("f", 10)).mkString(" ")),
      (4L, (toks("g", 10) ++ shared9 ++ toks("h", 10)).mkString(" ")),
      // doc 5: WITHIN-doc repeat of shared14 with a > spanN gap
      // between the copies -> two intervals, both exact
      (5L, (shared14 ++ toks("i", 12) ++ shared14).mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.dupSpans(docs, "text", "doc_id",
        spanN = 10)
      .select("doc_id", "span_start", "span_len")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 14L), (2L, 15L, 14L),
      (5L, 0L, 14L), (5L, 26L, 14L)),
      s"exact maximal-span boundaries, got $got")
    // recall boundary: L >= spanN always found (above), L < spanN never
    assert(!got.exists(r => r._1 == 3L || r._1 == 4L),
      "9-token overlap below the match length is invisible")
    // n_windows accounting: a length-L region holds L - spanN + 1 windows
    val nw = graft.operators.Dedup.dupSpans(docs, "text", "doc_id", spanN = 10)
      .filter(col("doc_id") === 1L).select("n_windows").as[Long].head()
    assert(nw == 5L, s"14-token region holds 5 duplicated windows, got $nw")
  }

  test("dupSpans: adjacent duplicated regions merge to one covered interval") {
    // doc 20 concatenates two DIFFERENT duplicated runs back to back
    // (each shared with a different doc): their position coverage is
    // contiguous, so positional-cover semantics reports ONE maximal
    // interval spanning both — the same union ExactSubstr removal takes
    val s1 = (0 until 12).map(i => s"s$i")
    val s2 = (0 until 12).map(i => s"u$i")
    val docs = Seq(
      (20L, (s1 ++ s2).mkString(" ")),
      (21L, (Seq("y0", "y1") ++ s1 ++ Seq("z0", "z1")).mkString(" ")),
      (22L, (Seq("w0", "w1", "w2") ++ s2 ++ Seq("v0")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.dupSpans(docs, "text", "doc_id",
        spanN = 10)
      .select("doc_id", "span_start", "span_len")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((20L, 0L, 24L), (21L, 2L, 12L), (22L, 3L, 12L)),
      s"doc 20's adjacent regions merge into one 24-token interval: $got")
  }

  // ---- scrubEvalSpans: span-level benchmark decontamination ----

  test("scrubEvalSpans: eval text is excised everywhere, sub-spanN untouched") {
    def toks(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix$i")
    val s12 = toks("s", 12)
    val t9 = toks("t", 9)
    val evalSet = Seq((100L, s12.mkString(" ")), (101L, t9.mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // one embedded copy -> exact excision
      (1L, (toks("u", 5) ++ s12 ++ toks("v", 5)).mkString(" ")),
      // TWO copies -> BOTH removed (no first-copy survivor)
      (2L, (s12 ++ toks("m", 4) ++ s12).mkString(" ")),
      // 9-token eval doc is below the match length -> invisible
      (3L, (toks("w", 10) ++ t9 ++ toks("x", 10)).mkString(" ")),
      // clean doc -> untouched
      (4L, toks("y", 15).mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.scrubEvalSpans(corpus, evalSet,
        "text", "doc_id", spanN = 10)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (((toks("u", 5) ++ toks("v", 5)).mkString(" "), 12L)),
      s"embedded eval span excised exactly: ${got(1L)}")
    assert(got(2L) == ((toks("m", 4).mkString(" "), 24L)),
      s"both copies removed, no survivor: ${got(2L)}")
    assert(got(3L)._2 == 0L, s"9-token eval doc invisible: ${got(3L)}")
    assert(got(4L)._2 == 0L && got(4L)._1 == toks("y", 15).mkString(" "),
      "clean doc byte-identical")
  }

  // ---- ivfAppend: incremental insert at fixed centroids ----

  test("ivfAppend: appended index searches identically to a one-shot build") {
    // base holds the 16 smallest ids, so seedCentroids(base) ==
    // seedCentroids(full) and the equality is exact: per-vector
    // assignment at fixed centroids cannot depend on batching
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val base = e.filter(col("vec_id") < 40)
    val delta = e.filter(col("vec_id") >= 40 && col("vec_id") < 60)
    val corpus = e.filter(col("vec_id") < 60)
    val qs = e.filter(col("vec_id") < 3)
    val appended = tmpDir("ivf-app") + "/ivf"
    val oneShot = tmpDir("ivf-one") + "/ivf"
    val c1 = graft.operators.Similarity.ivfWrite(base, "vec_id", "embedding",
      appended, nlist = 16)
    graft.operators.Similarity.ivfAppend(delta, "vec_id", "embedding",
      appended, c1)
    val c2 = graft.operators.Similarity.ivfWrite(corpus, "vec_id",
      "embedding", oneShot, nlist = 16)
    assert(c1.map(_.toSeq) == c2.map(_.toSeq),
      "same seed rule, same centroids")
    def search(p: String, c: Seq[Array[Double]]) =
      graft.operators.Similarity.ivfTopKPartitioned(spark, p, c, qs,
          "vec_id", "embedding", k = 5, nprobe = 4)
        .select("query_id", "vec_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    assert(search(appended, c1) == search(oneShot, c2),
      "append-then-search == build-then-search at fixed centroids")
    // the insert touched only the delta's own list partitions: every
    // base file predates the append... cheapest observable proxy:
    // delta rows are present and assigned to valid lists
    val lists = spark.read.parquet(appended)
      .filter(col("vec_id") >= 40).select("list_id").distinct().count()
    assert(lists >= 1, "delta landed in the index")
  }

  // ---- graphCompact: upper-routing-layer rebuild after appends ----

  test("graphCompact: stale upper layer recovers; equals a fresh build's") {
    val vecs = groupedVecs()
    // two append batches, together holding EVERY node of directions 0
    // and 1 — including all their upper-eligible ids (0, 8, 16, 24 are
    // id % 4 == 0) — so after the appends the stale upper layer has no
    // presence at all in those regions
    val inB1 = col("vec_id") % 8 === 0
    val inB2 = col("vec_id") % 8 === 1
    val base = vecs.filter(!inB1 && !inB2)
    val path = tmpDir("gann-compact")
    graft.operators.GraphAnn.graphWrite(base, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = path, upperMod = 4, upperDegree = 8, upperRefine = 1)
    graft.operators.GraphAnn.graphAppend(spark, path, base,
      vecs.filter(inB1), "vec_id", "embedding", dim = 64, planes = 4,
      tables = 2, degree = 8, rounds = 2, beamWidth = 16,
      entries = Seq(4L, 12L))
    graft.operators.GraphAnn.graphAppend(spark, path,
      vecs.filter(!inB2), vecs.filter(inB2), "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, rounds = 2,
      beamWidth = 16, entries = Seq(4L, 12L))
    // staleness, observed on the routing layer itself: an upper-only
    // beam for a direction-0 probe, entered at the q311-style fixed
    // global entries {0, 4}, can only DISCOVER nodes through upper
    // edges — and the stale layer has no edges for any inserted node,
    // so probe 8's true upper group-mates 16/24 (inserted, un-seeded)
    // stay unreachable until compaction rebuilds the layer
    def upperBeam(): Set[Long] = {
      val ue = spark.read.parquet(s"$path/upper_edges").select("src", "dst")
      val probe = vecs.filter(col("vec_id") === 8L)
      val seeds = Seq((8L, 0L), (8L, 4L)).toDF("query_id", "vec_id")
      graft.operators.GraphAnn.beamTopK(vecs, probe, ue, seeds,
          "vec_id", "embedding", rounds = 3, beamWidth = 8)
        .select("vec_id").as[Long].collect().toSet
    }
    val stale = upperBeam()
    assert((stale & Set(16L, 24L)).isEmpty,
      s"stale upper layer cannot route to inserted nodes, saw $stale")
    graft.operators.GraphAnn.graphCompact(spark, path, vecs, "vec_id",
      "embedding", dim = 64, planes = 4, tables = 2, upperMod = 4,
      upperDegree = 8, upperRefine = 1)
    val compacted = upperBeam()
    assert(Set(16L, 24L).subsetOf(compacted),
      s"probe 8's upper group-mates (16/24) surface after compact, got $compacted")
    // layout-only invariant: compacted upper layer == fresh build's
    val fresh = tmpDir("gann-fresh")
    graft.operators.GraphAnn.graphWrite(vecs, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = fresh, upperMod = 4, upperDegree = 8, upperRefine = 1)
    def upperSet(p: String) = spark.read.parquet(s"$p/upper_edges")
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(upperSet(path) == upperSet(fresh),
      "post-compact upper_edges is a pure function of the corpus")
  }

  test("graphAppend: merged edge list is duplicate-free") {
    val vecs = groupedVecs()
    // delta = two full direction groups -> delta-delta mates guarantee a
    // delta node appears as src in BOTH fwd and the affected re-rank,
    // the exact shape that produced duplicate (src,dst) rows pre-fix
    val isDelta = col("vec_id") % 8 < 2
    val base = vecs.filter(!isDelta)
    val delta = vecs.filter(isDelta)
    val path = tmpDir("gann-dup")
    graft.operators.GraphAnn.graphWrite(base, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = path, upperMod = 4, upperDegree = 8, upperRefine = 1)
    graft.operators.GraphAnn.graphAppend(spark, path, base, delta,
      "vec_id", "embedding", dim = 64, planes = 4, tables = 2,
      degree = 8, rounds = 2, beamWidth = 16, entries = Seq(4L, 12L))
    val edges = spark.read.parquet(s"$path/edges").select("src", "dst")
    val dupes = edges.groupBy("src", "dst").count()
      .filter(col("count") > 1).collect()
    assert(dupes.isEmpty, s"duplicate (src,dst) rows: ${dupes.mkString(",")}")
    // degree contract holds for every node, delta included
    val over = edges.groupBy("src").count().filter(col("count") > 8).collect()
    assert(over.isEmpty, s"adjacency past the degree cap: ${over.mkString(",")}")
  }

  test("scrubEvalSpans: the eval cover test is a broadcast semi-join") {
    // the plan contract behind the 100 TB story: eval windows hash to a
    // broadcast-sized distinct set, the corpus side probes it with a
    // semi-join — never a shuffle keyed on gram strings, never a
    // cartesian stage
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = graft.operators.Dedup.scrubEvalSpans(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), "text", "doc_id", spanN = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftsemi"),
      s"eval membership must be a broadcast semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian stage anywhere:\n$plan")
  }

  // ---- ivfDelete / ivfVacuum: tombstones, then physical reclaim ----

  test("ivfDelete: tombstoned rows vanish from search; delete is idempotent") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val qs = e.filter(col("vec_id") < 3)
    val path = tmpDir("ivf-del") + "/ivf"
    val cents = graft.operators.Similarity.ivfWrite(e, "vec_id",
      "embedding", path, nlist = 16)
    val dead = (id: org.apache.spark.sql.Column) => id % 7 === 3
    def search(k: Int) = graft.operators.Similarity
      .ivfTopKPartitioned(spark, path, cents, qs, "vec_id", "embedding",
        k = k, nprobe = 4)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect()
    // wide pre-delete board: the post-delete expectation is this board
    // minus the dead ids, ranks compacted — deletion must change
    // NOTHING else (same probes, same candidates, same tie-breaks)
    val pre = search(20).toSeq
    graft.operators.Similarity.ivfDelete(spark, path,
      e.filter(dead(col("vec_id"))).select("vec_id"))
    val post = search(5).toSet
    val expected = pre.filter(_._2 % 7 != 3).groupBy(_._1).toSeq.flatMap {
      case (q, rows) => rows.sortBy(_._3).take(5)
        .zipWithIndex.map { case ((_, v, _), i) => (q, v, i + 1L) }
    }.toSet
    assert(post == expected,
      s"post-delete top-5 == live pre-delete rows re-ranked\n$post\n$expected")
    assert(!post.exists(_._2 % 7 == 3), "no tombstoned id in results")
    // idempotent: re-deleting the same ids leaves one tombstone per id
    graft.operators.Similarity.ivfDelete(spark, path,
      e.filter(dead(col("vec_id"))).select("vec_id"))
    val tomb = graft.operators.Similarity.ivfTombstones(spark, path).get
    assert(tomb.count() == tomb.distinct().count() &&
      tomb.count() == e.filter(dead(col("vec_id"))).count(),
      "distinct-union tombstone set, no growth on re-delete")
  }

  test("ivfVacuum: touched lists rewritten, untouched files byte-stable, " +
    "interrupted vacuum stays correct") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val qs = e.filter(col("vec_id") < 3)
    val path = tmpDir("ivf-vac") + "/ivf"
    val cents = graft.operators.Similarity.ivfWrite(e, "vec_id",
      "embedding", path, nlist = 16)
    graft.operators.Similarity.ivfDelete(spark, path,
      e.filter(col("vec_id") % 7 === 3).select("vec_id"))
    def search() = graft.operators.Similarity
      .ivfTopKPartitioned(spark, path, cents, qs, "vec_id", "embedding",
        k = 5, nprobe = 4)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    val tombstoned = search()
    val touched = spark.read.parquet(path)
      .filter(col("vec_id") % 7 === 3)
      .select("list_id").distinct().as[Int].collect().toSet
    val untouched = spark.read.parquet(path)
      .select("list_id").distinct().as[Int].collect().toSet -- touched
    def files(lids: Set[Int]) = lids.flatMap { lid =>
      val d = new java.io.File(s"$path/list_id=$lid")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified(), f.length()))
    }
    val beforeFiles = files(untouched)
    // emulate a vacuum killed after ONE touched list committed: the
    // idempotence contract — every read during a partial vacuum sees
    // the same live rows (list already clean + tombstones still mask
    // the rest), and re-running completes
    val firstList = touched.min
    graft.etl.IncrementalLoad.atomicRewrite(spark,
      s"$path/list_id=$firstList") { staging =>
      spark.read.parquet(s"$path/list_id=$firstList")
        .filter(col("vec_id") % 7 =!= 3)
        .write.mode("overwrite").parquet(staging)
    }
    assert(search() == tombstoned, "mid-vacuum reads are unchanged")
    graft.operators.Similarity.ivfVacuum(spark, path)
    assert(search() == tombstoned, "post-vacuum reads are unchanged")
    assert(graft.operators.Similarity.ivfTombstones(spark, path).isEmpty,
      "sidecar cleared after all lists committed")
    assert(spark.read.parquet(path)
      .filter(col("vec_id") % 7 === 3).count() == 0,
      "tombstoned rows physically gone")
    assert(files(untouched) == beforeFiles,
      "untouched list partitions not rewritten")
    // vacuum with no tombstones is a no-op
    graft.operators.Similarity.ivfVacuum(spark, path)
    assert(search() == tombstoned)
  }

  // ---- graphDelete / graphVacuum: HNSW soft delete, then rebuild ----

  test("graphDelete: tombstoned nodes still ROUTE but are never returned") {
    val vecs = groupedVecs()
    val path = tmpDir("gann-del")
    graft.operators.GraphAnn.graphWrite(vecs, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = path, upperMod = 4, upperDegree = 8, upperRefine = 1)
    val qs = vecs.filter(col("vec_id") < 3)
    def search() = graft.operators.GraphAnn
      .layeredTopKPartitioned(spark, path, vecs, qs, "vec_id",
        "embedding", dim = 64, planes = 4, tables = 2,
        entries = Seq(0L, 4L), upperRounds = 1, upperWidth = 8,
        rounds = 2, beamWidth = 16)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSeq
    val pre = search()
    graft.operators.GraphAnn.graphDelete(spark, path,
      vecs.filter(col("vec_id") % 5 === 2).select("vec_id"))
    val post = search().toSet
    // the ONLY change is the final filter + re-rank: deleted nodes kept
    // routing (edge shards untouched), so post == pre minus dead ids
    // with ranks compacted
    val expected = pre.filter(_._2 % 5 != 2).groupBy(_._1).toSeq.flatMap {
      case (q, rows) => rows.sortBy(_._3)
        .zipWithIndex.map { case ((_, v, _), i) => (q, v, i + 1L) }
    }.toSet
    assert(post == expected,
      s"soft delete touches only the final re-rank\n$post\n$expected")
    val edges = spark.read.parquet(s"$path/edges")
    assert(edges.filter(col("src") % 5 === 2 || col("dst") % 5 === 2)
      .count() > 0, "edge shards untouched — dead nodes still route")
  }

  test("graphVacuum: index equals a fresh build over the live corpus") {
    val vecs = groupedVecs()
    val path = tmpDir("gann-vac")
    graft.operators.GraphAnn.graphWrite(vecs, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = path, upperMod = 4, upperDegree = 8, upperRefine = 1)
    graft.operators.GraphAnn.graphDelete(spark, path,
      vecs.filter(col("vec_id") % 5 === 2).select("vec_id"))
    graft.operators.GraphAnn.graphVacuum(spark, path, vecs, "vec_id",
      "embedding", dim = 64, planes = 4, tables = 2, degree = 8,
      refine = 1, upperMod = 4, upperDegree = 8, upperRefine = 1)
    val fresh = tmpDir("gann-vac-fresh")
    graft.operators.GraphAnn.graphWrite(
      vecs.filter(col("vec_id") % 5 =!= 2), "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = fresh, upperMod = 4, upperDegree = 8, upperRefine = 1)
    def layer(p: String, l: String) = spark.read.parquet(s"$p/$l")
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(layer(path, "edges") == layer(fresh, "edges"),
      "vacuumed full layer == fresh build over live corpus")
    assert(layer(path, "upper_edges") == layer(fresh, "upper_edges"),
      "vacuumed upper layer == fresh build over live corpus")
    assert(graft.operators.GraphAnn.graphTombstones(spark, path).isEmpty,
      "tombstone sidecar cleared")
  }

  // ---- mmrTopK: diversity-aware greedy re-rank ----

  test("mmrTopK: breaks up a near-duplicate cluster that pure top-k returns") {
    // the query sits between two topic clusters, closer to A: five
    // near-identical A vectors (rel ≈ 0.776) and one B vector
    // (rel ≈ 0.705, near-orthogonal to A). Pure top-2 is two A-clones;
    // MMR(λ=0.7) must take the B outlier second:
    //   2nd A-clone: 0.7·0.776e12 − 0.3·~1.0e12  ≈ 0.243e12
    //   B:           0.7·0.705e12 − 0.3·~0.10e12 ≈ 0.464e12
    def vec(a: Double, b: Double, eps: Double = 0.0) =
      Array.tabulate(64)(j =>
        if (j == 0) a else if (j == 8) b else if (j == 16) eps else 0.0).toSeq
    val corpus = (
      (0 until 5).map(i => (10L + i, vec(1.0, 0.05, i * 0.001))) :+
        (20L, vec(0.05, 1.0)))
      .toDF("vec_id", "embedding")
    val query = Seq((100L, vec(1.0, 0.9))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.mmrTopK(corpus, query, "vec_id",
        "embedding", k = 3, lambda6 = 700000L, candK = 6)
      .select("vec_id", "rank").as[(Long, Long)].collect()
      .map { case (v, r) => r -> v }.toMap
    val rel = graft.operators.Similarity.bruteForceTopK(corpus, query,
        "vec_id", "embedding", k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(rel.subsetOf((10L until 15L).toSet),
      s"pure top-2 is all A-clones: $rel")
    assert(got(1L) >= 10L && got(1L) < 15L, s"rank 1 is the best A: $got")
    assert(got(2L) == 20L, s"rank 2 diversifies to the B outlier: $got")
    assert(got(3L) >= 10L && got(3L) < 15L, s"rank 3 returns to A: $got")
    // λ = 1 degenerates to pure relevance order
    val pure = graft.operators.Similarity.mmrTopK(corpus, query, "vec_id",
        "embedding", k = 3, lambda6 = 1000000L, candK = 6)
      .select("vec_id", "rank").as[(Long, Long)].collect()
      .sortBy(_._2).map(_._1).toSeq
    val bf = graft.operators.Similarity.bruteForceTopK(corpus, query,
        "vec_id", "embedding", k = 3)
      .orderBy(col("rank")).select("vec_id").as[Long].collect().toSeq
    assert(pure == bf, s"λ=1 is relevance order: $pure vs $bf")
  }

  // ---- minhash index lifecycle: append / delete / vacuum ----

  test("minhashIndexAppend: maintained index pairs == one-shot index pairs") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val hist = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1)
    val batch = docs.filter(col("doc_id") % 10 === 1)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val appended = tmpDir("mh-app") + "/index"
    val oneShot = tmpDir("mh-one") + "/index"
    graft.operators.Dedup.writeMinhashIndex(hist, "text", "doc_id",
      appended, bands = 16, rowsPerBand = 2, shingleN = 3)
    graft.operators.Dedup.minhashIndexAppend(spark, batch, "text",
      "doc_id", appended, bands = 16, rowsPerBand = 2, shingleN = 3)
    graft.operators.Dedup.writeMinhashIndex(corpus, "text", "doc_id",
      oneShot, bands = 16, rowsPerBand = 2, shingleN = 3)
    def pairs(idx: String) = graft.operators.Dedup.incrementalPairs(spark,
        fresh, corpus, "text", "doc_id", idx, bands = 16, rowsPerBand = 2,
        shingleN = 3, threshold = 0.35)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(pairs(appended) == pairs(oneShot),
      "write-then-append == one-shot build (signatures are per-doc)")
  }

  test("minhashIndexAppend: skew cap holds across appends (combined count)") {
    // identical texts share every (band, bh) bucket; cap 3 means the
    // 2-row append onto a 2-row bucket must be dropped whole
    val mk = (ids: Seq[Long]) =>
      ids.map(i => (i, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val idx = tmpDir("mh-cap") + "/index"
    graft.operators.Dedup.writeMinhashIndex(mk(Seq(1L, 2L)), "text",
      "doc_id", idx, bands = 4, rowsPerBand = 2, shingleN = 3, maxBucket = 3)
    graft.operators.Dedup.minhashIndexAppend(spark, mk(Seq(3L, 4L)), "text",
      "doc_id", idx, bands = 4, rowsPerBand = 2, shingleN = 3, maxBucket = 3)
    val perBucket = spark.read.parquet(idx).groupBy("band", "bh").count()
      .agg(max("count")).as[Long].collect().head
    assert(perBucket <= 3, s"no bucket may exceed the cap, got $perBucket")
    assert(spark.read.parquet(idx).filter(col("id") >= 3).count() == 0,
      "the over-cap append batch is dropped whole (all-or-nothing per bucket)")
    // a batch landing in fresh buckets still appends
    graft.operators.Dedup.minhashIndexAppend(spark,
      Seq((9L, "omicron pi rho sigma tau upsilon")).toDF("doc_id", "text"),
      "text", "doc_id", idx, bands = 4, rowsPerBand = 2, shingleN = 3,
      maxBucket = 3)
    assert(spark.read.parquet(idx).filter(col("id") === 9).count() === 4L,
      "fresh-bucket batch appends one row per band")
  }

  test("minhashIndexDelete: forgotten docs stop pairing immediately; vacuum reclaims") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val idx = tmpDir("mh-del") + "/index"
    graft.operators.Dedup.writeMinhashIndex(corpus, "text", "doc_id", idx,
      bands = 16, rowsPerBand = 2, shingleN = 3)
    def pairs() = graft.operators.Dedup.incrementalPairs(spark, fresh,
        corpus, "text", "doc_id", idx, bands = 16, rowsPerBand = 2,
        shingleN = 3, threshold = 0.35)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    val before = pairs()
    val forgotten = before.map(_._2).head
    graft.operators.Dedup.minhashIndexDelete(spark, idx,
      Seq(forgotten).toDF("doc_id"))
    val after = pairs()
    assert(after == before.filterNot(_._2 == forgotten),
      "exactly the forgotten doc's pairs disappear")
    graft.operators.Dedup.minhashIndexVacuum(spark, idx)
    assert(pairs() == after, "vacuum preserves the live pairs")
    assert(spark.read.parquet(idx).filter(col("id") === forgotten).count() == 0,
      "signature rows physically gone")
    assert(graft.etl.Tombstones.read(spark, idx, "id").isEmpty,
      "sidecar cleared")
  }

  // ---- filtered ANN: predicate pushed into the probed index scan ----

  test("ivfTopKPartitionedWhere: both prunings in the plan; post-hoc filtering loses results") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val qs = e.filter(col("vec_id") < 3)
    val path = tmpDir("ivf-flt") + "/ivf"
    val cents = graft.operators.Similarity.ivfWrite(e, "vec_id",
      "embedding", path, nlist = 16, metaCols = Seq("label"))
    val filtered = graft.operators.Similarity.ivfTopKPartitionedWhere(
      spark, path, cents, qs, "vec_id", "embedding",
      col("label") === 3, k = 10, nprobe = 6)
    // the scan must prune BOTH ways: probed lists via the partition
    // column, the label predicate via parquet row-group pushdown —
    // never a metadata join or a post-scan-only filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"probed-list partition pruning missing:\n$plan")
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("EqualTo(label,3"),
      s"label predicate not pushed to the scan:\n$plan")
    val rows = filtered.select("query_id", "vec_id").as[(Long, Long)]
      .collect()
    val labels = e.filter(col("label") === 3).select("vec_id")
      .as[Long].collect().toSet
    assert(rows.forall(r => labels.contains(r._2)),
      "every result satisfies the predicate")
    assert(rows.groupBy(_._1).forall(_._2.length == 10),
      "a full page of 10 per query under the filter")
    // the naive alternative — filter an UNCONSTRAINED top-10 — keeps
    // ~1 of 10 at this label cardinality; that deficit is the operator
    val posthoc = graft.operators.Similarity.ivfTopKPartitioned(spark,
        path, cents, qs, "vec_id", "embedding", k = 10, nprobe = 6)
      .join(e.filter(col("label") === 3).select("vec_id"), Seq("vec_id"),
        "left_semi")
      .groupBy("query_id").count().agg(max("count")).as[Long]
      .collect().head
    assert(posthoc < 10,
      s"post-hoc filtering must come up short, kept $posthoc of 10")
  }

  // ---- streaming corpus ingestion behind the near-dup gate ----

  test("CorpusIngest: within-batch, cross-history and cross-batch dups " +
    "gated; batch replay is a no-op") {
    def doc(id: Long, text: String) = (id, text)
    val h = Seq(
      doc(1L, "the quick brown fox jumps over the lazy dog again and again"),
      doc(2L, "colorless green ideas sleep furiously under winter moons tonight"))
      .toDF("doc_id", "text")
    val root = tmpDir("ingest")
    val idx = s"$root/index"
    val corpus = s"$root/corpus"
    // bootstrap: index + corpus are one logical table
    graft.operators.Dedup.writeMinhashIndex(h, "text", "doc_id", idx,
      bands = 16, rowsPerBand = 2, shingleN = 3)
    h.write.parquet(corpus)
    val b1 = Seq(
      doc(10L, "seven crimson airships drifted across the copper morning skyline slowly"),
      doc(11L, "the quick brown fox jumps over the lazy dog again and again"), // == h1
      doc(12L, "granite rivers remember every glacier that carved them long ago"),
      doc(13L, "granite rivers remember every glacier that carved them long ago")) // == 12
      .toDF("doc_id", "text")
    val b2 = Seq(
      doc(20L, "seven crimson airships drifted across the copper morning skyline slowly"), // == 10
      doc(21L, "binary stars trade plasma in slow ten thousand year waltzes"))
      .toDF("doc_id", "text")
    val src = s"$root/src"
    def ingest(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = graft.streaming.CorpusIngest.dedupIngest(stream, "text",
        "doc_id", idx, corpus, s"$root/ckpt", bands = 16,
        rowsPerBand = 2, shingleN = 3, threshold = 0.8).start()
      q.processAllAvailable(); q.stop()
    }
    b1.coalesce(1).write.mode("append").parquet(src)
    ingest()
    b2.coalesce(1).write.mode("append").parquet(src)
    ingest()
    def corpusIds() = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().toSet
    def indexIds() = spark.read.parquet(idx)
      .select(col("id")).distinct().as[Long].collect().toSet
    val live = Set(1L, 2L, 10L, 12L, 21L)
    assert(corpusIds() == live, s"corpus gates all three dup kinds: ${corpusIds()}")
    assert(indexIds() == live, "index stays in step with the corpus")
    // replay of an already-committed batch (the foreachBatch crash
    // contract): both sinks unchanged
    graft.streaming.CorpusIngest.ingestBatch(b1, "text", "doc_id", idx,
      corpus, batchId = 0L, bands = 16, rowsPerBand = 2, shingleN = 3,
      threshold = 0.8)
    assert(corpusIds() == live && indexIds() == live,
      "batch replay appends nothing anywhere")
    assert(spark.read.parquet(corpus).count() == 5,
      "no duplicate corpus rows after replay")
  }

  // ---- ivfPq delete/vacuum: one sidecar over both index tables ----

  test("ivfPqDelete/Vacuum: tombstones mask codes AND vectors; vacuum reclaims both") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val qs = e.filter(col("vec_id") < 3)
    val path = tmpDir("ivfpq-del") + "/pq"
    val (cents, cb) = graft.operators.Similarity.ivfPqWrite(e, "vec_id",
      "embedding", path, dim = 64, nlist = 16)
    def search() = graft.operators.Similarity.ivfPqTopKPartitioned(spark,
        path, cents, cb, qs, "vec_id", "embedding", dim = 64, k = 5,
        nprobe = 4)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    val pre = search()
    val dead = pre.map(_._2).head
    graft.operators.Similarity.ivfPqDelete(spark, path,
      Seq(dead).toDF("vec_id"))
    val post = search()
    assert(!post.exists(_._2 == dead), "tombstoned id never returned")
    assert(post != pre, "the board actually changed")
    graft.operators.Similarity.ivfPqVacuum(spark, path)
    assert(search() == post, "vacuum preserves the masked board")
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") === dead).count() == 0 &&
      spark.read.parquet(s"$path/vectors")
        .filter(col("vec_id") === dead).count() == 0,
      "both tables physically reclaimed")
    assert(graft.operators.Similarity.ivfTombstones(spark, path).isEmpty,
      "sidecar cleared after both tables committed")
  }

  // ---- graph-ANN filtered search: constrained final beam ----

  test("layeredTopKPartitionedWhere: predicate on the final beam only; walk unconstrained") {
    val vecs = groupedVecs().withColumn("label",
      (col("vec_id") % 2).cast("int"))
    val path = tmpDir("gann-flt")
    graft.operators.GraphAnn.graphWrite(vecs, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 2, degree = 8, refine = 1,
      path = path, upperMod = 4, upperDegree = 8, upperRefine = 1)
    val qs = vecs.filter(col("vec_id") < 3)
    val unfiltered = graft.operators.GraphAnn.layeredTopKPartitioned(
        spark, path, vecs, qs, "vec_id", "embedding", dim = 64,
        planes = 4, tables = 2, entries = Seq(0L, 4L), upperRounds = 1,
        upperWidth = 8, rounds = 2, beamWidth = 16)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSeq
    val filtered = graft.operators.GraphAnn.layeredTopKPartitionedWhere(
        spark, path, vecs, qs, "vec_id", "embedding", dim = 64,
        planes = 4, tables = 2, entries = Seq(0L, 4L),
        pred = col("label") === 0, upperRounds = 1, upperWidth = 8,
        rounds = 2, beamWidth = 16)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(filtered.forall(_._2 % 2 == 0), "every result satisfies the predicate")
    // the filter applies to the final beam ONLY: filtered == unfiltered
    // minus odd ids, ranks compacted — identical routing both runs
    val expected = unfiltered.filter(_._2 % 2 == 0).groupBy(_._1).toSeq
      .flatMap { case (q, rows) => rows.sortBy(_._3)
        .zipWithIndex.map { case ((_, v, _), i) => (q, v, i + 1L) } }
      .toSet
    assert(filtered == expected,
      s"constraint touches only the final re-rank\n$filtered\n$expected")
  }

  // ---- ivfPqAppend: incremental insert at fixed cents + codebooks ----

  test("ivfPqAppend: appended index searches identically to a one-shot build") {
    // base holds the 16 smallest ids (seed centroids AND pq seed rows);
    // pqIters = 0 keeps the codebooks at their seeds — a pure function
    // of those ids — so the base-trained and corpus-trained metadata
    // coincide and fixed-metadata equality is exact (with training
    // iterations the codebooks are corpus statistics and a rebuild
    // legitimately differs — that drift is the documented rebuild-on-
    // compaction-cadence contract, not an append defect)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val base = e.filter(col("vec_id") < 40)
    val delta = e.filter(col("vec_id") >= 40 && col("vec_id") < 60)
    val corpus = e.filter(col("vec_id") < 60)
    val qs = e.filter(col("vec_id") < 3)
    val appended = tmpDir("ivfpq-app") + "/pq"
    val oneShot = tmpDir("ivfpq-one") + "/pq"
    val (c1, cb1) = graft.operators.Similarity.ivfPqWrite(base, "vec_id",
      "embedding", appended, dim = 64, nlist = 16, pqIters = 0)
    graft.operators.Similarity.ivfPqAppend(delta, "vec_id", "embedding",
      appended, c1, cb1, dim = 64)
    val (c2, cb2) = graft.operators.Similarity.ivfPqWrite(corpus, "vec_id",
      "embedding", oneShot, dim = 64, nlist = 16, pqIters = 0)
    assert(c1.map(_.toSeq) == c2.map(_.toSeq) && cb1 == cb2,
      "same seed rules, same centroids and codebooks")
    def search(p: String, c: Seq[Array[Double]], cb: Seq[Seq[Seq[Double]]]) =
      graft.operators.Similarity.ivfPqTopKPartitioned(spark, p, c, cb, qs,
          "vec_id", "embedding", dim = 64, k = 5, nprobe = 4)
        .select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
        .collect().toSet
    assert(search(appended, c1, cb1) == search(oneShot, c2, cb2),
      "append-then-search == build-then-search at fixed metadata")
    assert(spark.read.parquet(s"$appended/codes")
      .filter(col("vec_id") >= 40).count() > 0, "delta codes landed")
  }

  // ---- hardNegatives: the contrastive-training mining board ----

  test("hardNegatives: wrong-label lookalikes surface with the exact margin") {
    def vec(a: Double, b: Double, eps: Double = 0.0) =
      Array.tabulate(64)(j =>
        if (j == 0) a else if (j == 8) b else if (j == 16) eps else 0.0).toSeq
    // anchor 100 (label 0); its class-mates point the same way but
    // weaker; one label-1 vector is nearly IDENTICAL to the anchor (the
    // planted hard negative / label-error suspect), one label-1 vector
    // is orthogonal (an easy negative)
    val corpus = Seq(
      (100L, vec(1.0, 0.0), 0),
      (101L, vec(1.0, 0.4), 0),  // best positive
      (102L, vec(1.0, 0.8), 0),
      (200L, vec(1.0, 0.01), 1), // planted hard negative, cos ~ 1
      (201L, vec(0.0, 1.0), 1))  // easy negative, cos ~ 0
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.hardNegatives(corpus,
        corpus.filter(col("vec_id") === 100L), "vec_id", "embedding",
        "label", k = 2)
      .select("vec_id", "rank", "margin6").as[(Long, Long, Long)]
      .collect().sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq(200L, 201L),
      s"hard negative ranks above the easy one: ${got.toSeq}")
    // the planted negative OUTRANKS the best positive (cos ~1 vs ~0.93):
    // margin6 >= 0 — the label-error signal
    assert(got(0)._3 > 0L, s"planted lookalike has a positive margin: ${got(0)}")
    assert(got(1)._3 < 0L, s"easy negative sits far below the positive: ${got(1)}")
    // self and same-label vectors never appear
    assert(!got.exists(r => r._1 == 100L || r._1 == 101L || r._1 == 102L))
  }
}
