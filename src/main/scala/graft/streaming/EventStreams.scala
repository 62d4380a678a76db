package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.IncrementalLoad

/** Event-stream processing (SURVEY.md §2.9, §7 step 6).
  *
  * The reference's incremental-load pattern ("process only rows not yet in
  * the target", main.py:45-59) is batch micro-batching by hand; its
  * Structured Streaming analog is a file-source stream + foreachBatch
  * idempotent merge — implemented here, plus the windowed aggregations any
  * event pipeline needs.
  *
  * Scale notes: windowed aggs shuffle on (window, key) — bounded state via
  * watermark; sessionize is a single shuffle on user_id then a sorted
  * window scan, the standard gap-sessionization plan (no self-join).
  */
object EventStreams {

  /** Batch tumbling-hour aggregation (oracle-checked as q50). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Gap-based sessionization: a new session starts after `gapMinutes` of
    * user inactivity. Returns per-user session stats (oracle-checked q51). */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val prev = lag(col("ts"), 1).over(byUser)
    val isNew = when(prev.isNull ||
      (unix_micros(col("ts")) - unix_micros(prev)) > gapUs, 1).otherwise(0)
    val runningW = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("session_id", sum(isNew).over(runningW))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** File-source stream over a parquet directory (schema must be supplied:
    * streaming sources cannot infer). */
  def readEventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)

  /** Sliding-window counts with watermark — bounded state, late data beyond
    * the watermark dropped deterministically. */
  def windowedCounts(stream: DataFrame, windowLen: String, slide: String,
                     watermark: String): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Idempotent streaming sink: every micro-batch is merged with a
    * left-anti join against the target's existing keys — exactly-once
    * effect on top of at-least-once delivery, the streaming form of the
    * reference's load_data_conditionally. */
  def idempotentParquetSink(stream: DataFrame, targetPath: String,
                            checkpoint: String, key: Seq[String]): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IncrementalLoad.appendNew(batch.sparkSession, batch, targetPath, key)
        ()
      }

  /** Drive a streaming query synchronously over whatever is currently in
    * the source dir (test/dev helper; memory sink). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "complete"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
