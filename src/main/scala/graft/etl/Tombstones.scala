package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LSM-style tombstone sidecar shared by the partitioned on-disk
  * indexes (IVF lists, the MinHash dedup index): deletes are an
  * O(batch) distinct-union republish of a small id list, never a
  * data-file rewrite, and searches subtract the (broadcast-sized) set
  * with an anti-join. Physical reclaim is a separate VACUUM that
  * rewrites only the partitions that actually hold tombstoned rows.
  *
  * The sidecar is a SIBLING of the index root (`<index>_tombstones`) —
  * anything inside the root would break its `col=value` partition
  * discovery. Every publish goes through
  * [[IncrementalLoad.atomicRewrite]]'s staged swap, and vacuum clears
  * the sidecar LAST. Crash consistency is by idempotence, not a global
  * transaction: a crash outside a swap leaves reads unchanged
  * (already-clean partitions + a still-present tombstone mask agree
  * with the pre-crash live set) and a re-run completes the job. A hard
  * crash INSIDE a swap's two-rename window parks the partition's live
  * rows in a `.rewrite-old-*` sidecar that plain reads skip — so
  * vacuum's first act is [[IncrementalLoad.recoverRewrites]], which
  * restores any such partition before the touched-partition scan
  * decides what to rewrite (otherwise the scan would never revisit it
  * and a vacuum re-run could "complete" minus that partition's rows).
  * Readers racing that window see the partition missing until the next
  * writer/vacuum repairs it; readers needing isolation belong on
  * [[ManifestTable]].
  */
private[graft] object Tombstones {

  def sidecarPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "_tombstones"

  /** Current tombstone set as a 1-column (`idCol`) frame, or None when
    * nothing was ever deleted. */
  def read(spark: SparkSession, indexPath: String,
           idCol: String): Option[DataFrame] = {
    val tp = sidecarPath(indexPath)
    val (fs, hp) = IncrementalLoad.fsFor(spark, tp)
    if (fs.exists(hp)) Some(spark.read.parquet(tp).select(col(idCol)))
    else None
  }

  /** Merge `ids` (first column, cast to long) into the sidecar.
    * Idempotent: a re-delete of the same ids is a distinct-union no-op. */
  def delete(spark: SparkSession, indexPath: String, ids: DataFrame,
             idCol: String): Unit = {
    val nw = ids.select(col(ids.columns.head).cast("long").as(idCol))
    val merged = read(spark, indexPath, idCol) match {
      case Some(old) => old.union(nw).distinct()
      case None      => nw.distinct()
    }
    IncrementalLoad.atomicRewrite(spark, sidecarPath(indexPath)) { staging =>
      // tombstone sets are id lists — tiny next to the index; one file
      // keeps the search-side broadcast read a single-task scan
      merged.coalesce(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Physically drop tombstoned rows from the `partitionCol`-partitioned
    * index at `indexPath`, then clear the sidecar. Touched partitions
    * are located by one pruned index scan; each rewrites via its own
    * atomic swap; untouched partitions are never opened for write. */
  def vacuum(spark: SparkSession, indexPath: String, idCol: String,
             partitionCol: String): Unit = {
    read(spark, indexPath, idCol).foreach { tomb =>
      vacuumTable(spark, indexPath, tomb, idCol, partitionCol)
      val (fs, hp) = IncrementalLoad.fsFor(spark, sidecarPath(indexPath))
      fs.delete(hp, true)
    }
  }

  /** The partition-local reclaim of [[vacuum]] against one parquet
    * table, for indexes whose root holds SEVERAL tables under one
    * sidecar (IVF-PQ: codes + vectors) — the caller clears the sidecar
    * itself after every table committed. */
  def vacuumTable(spark: SparkSession, tablePath: String, tomb: DataFrame,
                  idCol: String, partitionCol: String): Unit = {
    // repair interrupted swaps FIRST: a partition parked in
    // .rewrite-old-* by a crashed rewrite is invisible to the touched
    // scan below, and skipping it would lose its live rows for good
    IncrementalLoad.recoverRewrites(spark, tablePath)
    val touched = spark.read.parquet(tablePath)
      .join(broadcast(tomb), Seq(idCol), "left_semi")
      .select(col(partitionCol)).distinct()
      .collect().map(_.get(0).toString).sorted
    touched.foreach { pv =>
      val partPath = s"${tablePath.stripSuffix("/")}/$partitionCol=$pv"
      IncrementalLoad.atomicRewrite(spark, partPath) { staging =>
        spark.read.parquet(partPath)
          .join(broadcast(tomb), Seq(idCol), "left_anti")
          .write.mode("overwrite").parquet(staging)
      }
    }
  }
}
