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
}
