package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.etl.ManifestTable
import graft.operators.ChangeDataCapture

/** Continuous CDC apply: a stream of change rows (keys, totally-ordering
  * sequence columns, an op column whose `deleteOp` value marks deletion,
  * payload) maintained as a queryable [[graft.etl.ManifestTable]] —
  * the streaming descendant of the reference's incremental load
  * (`main.py:45-69` key-scan + append), generalized to updates and
  * deletes.
  *
  * Exactly-once by construction: each micro-batch collapses to its
  * latest-per-key state ([[ChangeDataCapture.applyChangeLog]] /
  * [[ChangeDataCapture.latestDeletes]] — map-side combined, shuffle
  * ~|keys| not |changes|) and lands through
  * [[ManifestTable.transactionalMerge]], where the upserts, the deletes,
  * and the `(writer, batchId)` watermark are ONE atomic commit. A
  * replayed batch no-ops on an O(1) manifest resolve BEFORE the change
  * log is even aggregated. Readers get snapshot isolation and time
  * travel over the applied table for free; at 100 TB only files holding
  * a touched key are ever rewritten.
  *
  * Cross-batch ordering is the streaming source's job (per-key changes
  * must not be split across batches out of order — the usual CDC
  * transport contract); WITHIN a batch any order works, the seq columns
  * decide. */
object CdcApply {

  /** Start the apply stream. `stream` must carry `keyCols`, `seqCols`,
    * `opCol`, and payload; the maintained table's columns are
    * keys + seq + payload-without-op.
    *
    * Maintenance cadences (all 0 = off): every `compactEvery` batches
    * the table compacts ([[ManifestTable.compact]], clustering on
    * `statsCol` so file skipping survives) — per-batch merges rewrite
    * only AFFECTED files, so a long stream otherwise fragments the
    * table into batch-sized file sets; every `compactLogEvery` batches
    * the commit log prunes to `keepVersions` (safe mid-stream — the
    * watermark rides the current self-contained commit).
    *
    * `compactAtFileCount` is the ADAPTIVE trigger (the graph index's
    * `compactAtAppendedFraction` shape): compact whenever the table's
    * manifest holds at least that many files — the fragmentation signal
    * itself, read from the commit the merge just wrote (O(1), the entry
    * list IS the file inventory). A fixed batch-count cadence either
    * over-compacts a low-touch stream or lets a high-touch one fragment
    * between ticks; the file-count trigger self-tunes to the actual
    * per-batch touch rate. Both triggers compose (either fires).
    *
    * `bloomCol` (typically the merge KEY when `statsCol` clusters on
    * something else, e.g. event time): every file the stream writes —
    * merge rewrites, bootstrap, compaction — carries a per-file Bloom
    * filter of that column, so the per-batch affected-file discovery
    * prunes by key even where min/max stats cannot (the time-clustered,
    * key-probed table is the canonical CDC shape).
    *
    * `extraStatsCols`: additional per-file NAMED min/max groups (e.g. a
    * monotonic business key on a time-clustered table) — every write
    * records them, and both merge discovery and predicate deletes
    * range-prune on whichever recorded column a probe/conjunct binds. */
  def applyStream(stream: DataFrame, root: String, table: String,
                  keyCols: Seq[String], seqCols: Seq[String],
                  opCol: String, checkpoint: String,
                  deleteOp: String = "D",
                  statsCol: Option[String] = None,
                  writerId: String = "cdc-apply",
                  compactEvery: Int = 0,
                  compactLogEvery: Int = 0,
                  keepVersions: Int = 10,
                  fkChecks: Seq[(String, Seq[String], String, Seq[String])] = Nil,
                  compactAtFileCount: Int = 0,
                  bloomCol: Option[String] = None,
                  extraStatsCols: Seq[String] = Nil): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, root, table, keyCols, seqCols, opCol, batchId,
          deleteOp, statsCol, writerId, compactEvery, compactLogEvery,
          keepVersions, fkChecks, compactAtFileCount, bloomCol,
          extraStatsCols)
        ()
      }

  /** One micro-batch (exposed for replay testing). */
  private[graft] def applyBatch(batch: DataFrame, root: String,
                                table: String, keyCols: Seq[String],
                                seqCols: Seq[String], opCol: String,
                                batchId: Long, deleteOp: String = "D",
                                statsCol: Option[String] = None,
                                writerId: String = "cdc-apply",
                                compactEvery: Int = 0,
                                compactLogEvery: Int = 0,
                                keepVersions: Int = 10,
                                fkChecks: Seq[(String, Seq[String], String, Seq[String])] = Nil,
                                compactAtFileCount: Int = 0,
                                bloomCol: Option[String] = None,
                                extraStatsCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    // O(1) replay fast path: don't even aggregate the change log
    if (ManifestTable.tableBatchApplied(spark, root, table, writerId,
      batchId)) return
    val cached = batch.localCheckpoint() // source offsets are one-shot
    if (cached.isEmpty) return
    // ONE latest-per-key aggregation feeds BOTH the upsert set and the
    // delete set — formerly two identical groupBy/max passes over the
    // batch per micro-batch (guide §1.2 "don't compute things twice").
    // Materialized (~|keys| rows) so the two derivations are filters.
    val last = graft.operators.Lineage.cut(
      ChangeDataCapture.latestState(cached, keyCols, seqCols))
    val latest = last.filter(col(opCol) =!= lit(deleteOp)).drop(opCol)
    val deletes = last.filter(col(opCol) === lit(deleteOp))
      .select(keyCols.map(col): _*)
    ManifestTable.transactionalMerge(spark, root, table, latest, deletes,
      keyCols, writerId, batchId, statsCol, fkChecks, bloomCol,
      extraStatsCols = extraStatsCols)
    val tableFiles = ManifestTable.current(spark, root)
      .map(_.entries.count(_.table == table)).getOrElse(0)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
        tableFiles > 0)
      // a lost maintenance CAS (another writer on this root committed
      // first) must not kill a stream whose batch already landed; the
      // next cadence tick retries
      try ManifestTable.compact(spark, root, table, statsCol = statsCol,
        bloomCol = bloomCol, extraStatsCols = extraStatsCols)
      catch { case _: ManifestTable.CommitConflictException => () }
    if (compactAtFileCount > 0)
      ManifestTable.compactIfFragmented(spark, root, table,
        compactAtFileCount, statsCol = statsCol, bloomCol = bloomCol,
        extraStatsCols = extraStatsCols)
    if (compactLogEvery > 0 && batchId % compactLogEvery == 0)
      ManifestTable.compactLog(spark, root, keepVersions)
    ()
  }
}
