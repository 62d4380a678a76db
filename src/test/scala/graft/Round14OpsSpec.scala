package graft

import org.apache.spark.sql.functions._

/** Round-14 fixes on crafted fixtures: recovery from a hard crash
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
}
