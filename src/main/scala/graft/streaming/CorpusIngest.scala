package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Dedup

/** Continuous corpus ingestion behind the near-dup gate — the streaming
  * face of the dedup-index lifecycle (`writeMinhashIndex` /
  * `minhashIndexAppend` / `minhashIndexDelete`): each micro-batch is
  * deduped WITHIN itself, then against the persisted index
  * (`incrementalPairs` — batch-proportional, the corpus never
  * re-signs), and only the unique survivors append to the corpus sink
  * and contribute their signatures to the index. This is the shape a
  * 100 TB training-data pipeline actually runs: the index is the only
  * state that grows with the corpus, and every batch touches it
  * key-locally.
  *
  * Bootstrap contract: the caller creates the index once
  * (`writeMinhashIndex` over the historical corpus, possibly empty)
  * before starting the stream, and `corpusPath` must hold EXACTLY the
  * indexed documents (the index supplies candidates, the corpus
  * supplies their texts for exact-Jaccard verification — the two are
  * one logical table and this operator keeps them in step). An empty
  * history is fine: index over an empty frame, no corpus dir yet.
  *
  * Crash consistency (foreachBatch replays a failed batch): the
  * batch's dup/unique decision is REPLAY-STABLE — near-dup candidates
  * whose old side is one of the batch's own ids are excluded, so a
  * partially-committed index append cannot make the batch's survivors
  * look like duplicates of themselves — and each sink is guarded by
  * its own membership anti-join, so a replay completes exactly the
  * side effects that are missing (index-only, corpus-only, or
  * neither). Net effect: every unique document lands in both sinks
  * exactly once.
  */
object CorpusIngest {

  /** Start the ingestion stream. `stream` must carry `idCol` (long) and
    * `textCol`. Band settings MUST match the index's. */
  def dedupIngest(stream: DataFrame, textCol: String, idCol: String,
                  indexPath: String, corpusPath: String, checkpoint: String,
                  bands: Int = 16, rowsPerBand: Int = 2, shingleN: Int = 3,
                  threshold: Double = 0.8): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, textCol, idCol, indexPath, corpusPath,
          bands, rowsPerBand, shingleN, threshold)
        ()
      }

  /** One micro-batch through the gate (exposed for replay testing). */
  private[graft] def ingestBatch(batch: DataFrame, textCol: String,
                                 idCol: String, indexPath: String,
                                 corpusPath: String, bands: Int,
                                 rowsPerBand: Int, shingleN: Int,
                                 threshold: Double): Unit = {
    val spark = batch.sparkSession
    val cached = batch.localCheckpoint() // source offsets are one-shot
    if (cached.isEmpty) return
    // 1) within-batch dedup: keep each near-dup cluster's min id
    val surv = Dedup.dedupCorpus(cached, textCol, idCol, bands,
      rowsPerBand, shingleN, threshold).localCheckpoint()
    val batchIds = broadcast(cached.select(col(idCol)))
    // 2) cross-batch dedup against the maintained index; candidates
    // whose old side is a batch id are replay artifacts of a partially
    // committed index append, never real history — excluded for
    // idempotence (a real dup's old id predates the batch)
    val corpusOpt = readIfExists(spark, corpusPath)
    val dupIds = corpusOpt match {
      case Some(corpus) =>
        Dedup.incrementalPairs(spark, surv, corpus, textCol, idCol,
            indexPath, bands, rowsPerBand, shingleN, threshold)
          .join(batchIds.select(col(idCol).as("old_id")), Seq("old_id"),
            "left_anti")
          .select(col("new_id").as(idCol)).distinct()
      case None => spark.emptyDataFrame.withColumn(idCol, lit(0L))
        .select(col(idCol))
    }
    val unique = surv.join(dupIds, Seq(idCol), "left_anti")
      .localCheckpoint()
    // 3) per-sink idempotence guards, then commit each side
    val indexedIds = spark.read.parquet(indexPath)
      .join(batchIds.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .select(col("id").as(idCol)).distinct()
    val toIndex = unique.join(indexedIds, Seq(idCol), "left_anti")
    if (!toIndex.isEmpty)
      Dedup.minhashIndexAppend(spark, toIndex, textCol, idCol, indexPath,
        bands, rowsPerBand, shingleN)
    val toCorpus = corpusOpt match {
      case Some(corpus) => unique.join(
        corpus.join(batchIds, Seq(idCol), "left_semi").select(col(idCol)),
        Seq(idCol), "left_anti")
      case None => unique
    }
    if (!toCorpus.isEmpty)
      toCorpus.write.mode("append").parquet(corpusPath)
  }

  private def readIfExists(spark: SparkSession,
                           path: String): Option[DataFrame] = {
    val (fs, hp) = graft.etl.IncrementalLoad.fsFor(spark, path)
    if (fs.exists(hp)) Some(spark.read.parquet(path)) else None
  }
}
