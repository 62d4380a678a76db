package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity context windows
  * ("bins") for training-batch construction — the step after tokenization
  * where documents are concatenated into model-context-length sequences.
  *
  * Policy: deterministic NEXT-FIT per shard. Documents are sharded by
  * `id % nShards`, ordered by id within the shard, and folded left to
  * right: a document goes into the current bin unless it would overflow
  * `capacity`, in which case it opens the next bin. A document larger than
  * `capacity` occupies a bin alone (callers chunk oversized docs upstream).
  * Next-fit is the standard streaming-packing policy: one pass, no
  * reordering, and — unlike best-fit — independent of global statistics,
  * so shards pack embarrassingly parallel.
  *
  * Scale: ONE shuffle (hash on shard). Each shard is packed inside a
  * single `aggregate` higher-order fold over its sorted doc list — native
  * Catalyst, no UDF, no driver involvement. A shard is the unit of output
  * (one training-data file), so its doc list is bounded by construction:
  * size `nShards` so shards hold one file's worth of documents, exactly as
  * a writer would anyway. The fold's list concat is per-shard-quadratic in
  * the worst case, which the same bound keeps small.
  */
object SequencePack {

  /** Pack into bins of `capacity` total `weightCol` (token/char count).
    * Output: (idCol, shard, bin, offset) — bin ids are per-shard,
    * 0-based; `offset` is the document's start position inside its bin
    * (cumulative weight of the docs packed before it), i.e. exactly what
    * a concatenating writer needs to lay the sequence out. */
  def packNextFit(df: DataFrame, idCol: String, weightCol: String,
                  capacity: Long, nShards: Int): DataFrame = {
    val base = df.select(
      pmod(col(idCol), lit(nShards.toLong)).as("shard"),
      struct(col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w")).as("d"))
    val zero = struct(lit(0L).as("bin"), lit(0L).as("fill"),
      array().cast("array<struct<id:bigint,bin:bigint,offset:bigint>>").as("acc"))
    def step(st: Column, d: Column): Column = {
      val over = st("fill") > lit(0L) && (st("fill") + d("w")) > lit(capacity)
      val bin = when(over, st("bin") + lit(1L)).otherwise(st("bin"))
      val offset = when(over, lit(0L)).otherwise(st("fill"))
      val fill = when(over, d("w")).otherwise(st("fill") + d("w"))
      struct(bin.as("bin"), fill.as("fill"),
        concat(st("acc"), array(struct(d("id").as("id"), bin.as("bin"),
          offset.as("offset")))).as("acc"))
    }
    base.groupBy(col("shard"))
      .agg(sort_array(collect_list(col("d"))).as("docs"))
      .select(col("shard"),
        explode(aggregate(col("docs"), zero, step, _("acc"))).as("a"))
      .select(col("a.id").as(idCol), col("shard"), col("a.bin").as("bin"),
        col("a.offset").as("offset"))
  }

  /** Bin manifest: one row per (shard, bin) with document count, packed
    * weight, and utilization (packed/capacity, engine-portable 6dp) — the
    * writer/monitoring view of [[packNextFit]]. Same single-shuffle plan:
    * the manifest aggregation groups on (shard, bin), which the packing
    * output's partitioning already co-locates. */
  def binManifest(df: DataFrame, idCol: String, weightCol: String,
                  capacity: Long, nShards: Int): DataFrame = {
    val packed = packNextFit(df, idCol, weightCol, capacity, nShards)
    val w = df.select(col(idCol).cast("long").as(idCol),
      col(weightCol).cast("long").as("w"))
    packed.join(w, Seq(idCol))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("packed_w"),
        min(col(idCol)).as("first_id"))
      .withColumn("utilization",
        floor(col("packed_w").cast("double") / lit(capacity.toDouble)
          * lit(1e6) + lit(0.5d)) / lit(1e6))
  }

  /** Sliding-window document chunking: split each document's token stream
    * into `window`-token chunks advancing by `stride` tokens (overlap =
    * window - stride) — the context-window prep for long documents that
    * don't fit one training sequence, with overlap so no span loses its
    * left context at a chunk boundary. The complement of [[packNextFit]]:
    * packing merges SHORT docs up to the context length, chunking splits
    * LONG ones down to it.
    *
    * Chunk count: 1 if n <= window, else ceil((n - window)/stride) + 1 —
    * every token is covered, the last chunk may be shorter than `window`
    * but always starts within the stream.
    *
    * Scale: entirely scan-side — a transform + posexplode projection with
    * ZERO shuffle; output volume is input tokens x (window/stride)
    * expansion, an explicit constant factor. */
  def chunkSliding(df: DataFrame, textCol: String, idCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val nChunks = when(size(col("__toks")) <= window, lit(1))
      .otherwise(ceil((size(col("__toks")) - window).cast("double") / stride)
        .cast("int") + 1)
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .withColumn("__n", nChunks)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, __n - 1)," +
          s" i -> array_join(slice(__toks, i * $stride + 1, $window), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"),
        (size(split(col("col"), " "))).cast("long").as("n_tokens"))
  }
}
