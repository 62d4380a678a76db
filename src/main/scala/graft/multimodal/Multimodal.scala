package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample /
  * resize stages.
  *
  * The decode step is STUBBED (no media libraries in this environment): it
  * derives features deterministically from the raw bytes, clearly marked
  * below. Everything around it — the schema (binary + metadata struct), the
  * partition-preserving mapPartitions batch shape, the explode-based frame
  * table — is the real 100 TB plumbing: blobs never hit the driver, feature
  * extraction is a narrow (shuffle-free) per-partition pass, and metadata
  * lives in a pruned struct column so scans that only need dimensions never
  * read bytes.
  */
object Multimodal {

  /** A decoded feature row (array<float> mirrors the embeddings table). */
  final case class FeatureRow(id: Long, n_bytes: Long, features: Array[Float])

  /** Build a media table from any (id, text) source: blob + typed metadata.
    * Stand-in for reading real image/audio files into binary columns. */
  def toMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
        encode(col(textCol), "UTF-8").as("blob"))
      .withColumn("meta", struct(
        lit("text").as("kind"),
        length(col("blob")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate")))

  /** STUB decode + feature extraction.
    *
    * Real deployment: replace the body of `featuresOf` with the actual
    * decoder (JPEG decode -> pooled CNN features, PCM decode -> filterbank,
    * ...). The mapPartitions shape — iterate a partition of (id, blob)
    * pairs, emit fixed-width float vectors, never materialize the partition
    * — is exactly what the real decoder needs, so only `featuresOf` changes.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    val out = src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        FeatureRow(id, bytes.length.toLong, featuresOf(bytes, dim))
      }
    }(Encoders.product[FeatureRow])
    out.toDF()
  }

  /** DETERMINISTIC FAKE decode: chunk the bytes into `dim` ranges and fold
    * each to a float in [-1,1) via an FNV-1a hash. Stable across runs and
    * platforms; replace with a real decoder in production. */
  private def featuresOf(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val chunk = math.max(1, bytes.length / dim)
    var d = 0
    while (d < dim) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis (public constant)
      var i = d * chunk
      val end = math.min(bytes.length, if (d == dim - 1) bytes.length else i + chunk)
      while (i < end) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
      out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
      d += 1
    }
    out
  }

  /** Frame sampling: split a blob into `n` fixed-offset frames (chunked
    * byte ranges as a stand-in for video keyframes). Pure expression —
    * posexplode keeps it distributed and shuffle-free. */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val total = length(col("blob"))
    val frameLen = greatest(floor(total / n).cast("int"), lit(1))
    // Last frame absorbs the remainder so no trailing bytes are dropped.
    media.select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => col("blob").substr(i * frameLen + lit(1),
            when(i === lit(n - 1), total - i * frameLen).otherwise(frameLen))))
          .as(Seq("frame_idx", "frame")))
      .withColumn("frame_bytes", length(col("frame")).cast("long"))
      .filter(col("frame_bytes") > 0)
      .select("media_id", "frame_idx", "frame_bytes", "frame")
  }

  /** Resize stage STUB: rewrites the metadata struct only (a real resize
    * would also rewrite `blob`); marks the row as stub-processed. */
  def resizeStub(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.kind").as("kind"),
      col("meta.n_bytes").as("n_bytes"),
      lit(width).as("width"),
      lit(height).as("height"),
      col("meta.sample_rate").as("sample_rate")))
      .withColumn("processing", lit("resize_stub"))
}
