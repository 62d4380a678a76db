package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample /
  * resize stages.
  *
  * ALL decode paths are REAL decoders built from public container/codec
  * specs with zero external dependencies:
  *  - WAV (`decodeWavFeatures`): RIFF chunk walk, PCM validation, signal
  *    features from the actual samples;
  *  - BMP (`decodeBmpFeatures`): header + padded bottom-up pixel-array
  *    parse;
  *  - PNG (`decodePngFeatures`): chunk walk with CRC32 verification,
  *    multi-IDAT zlib inflate (`java.util.zip.Inflater`), and full
  *    scanline-filter reconstruction (None/Sub/Up/Average/Paeth);
  *  - the GENERIC decode (`extractFeatures`) sniffs the container by
  *    magic bytes and dispatches to the matching decoder — every number
  *    it emits comes from decoded pixels or samples.
  * Everything around them — the schema (binary + metadata struct), the
  * partition-preserving mapPartitions batch shape, the explode-based frame
  * table — is the real 100 TB plumbing: blobs never hit the driver, feature
  * extraction is a narrow (shuffle-free) per-partition pass, and metadata
  * lives in a pruned struct column so scans that only need dimensions never
  * read bytes.
  */
object Multimodal {

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

  /** One decoded generic-media feature row: a uniform 5-slot vector so
    * heterogeneous corpora share one schema. Images (png/bmp): (width,
    * height, mean_r, mean_g, mean_b). Audio (wav): (sample_rate,
    * n_samples, rms, peak, zcr). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 f1: Double, f2: Double, f3: Double,
                                 f4: Double, f5: Double)

  /** REAL generic media decode: sniff the container by its magic bytes
    * and dispatch to the matching decoder (PNG / BMP / WAV). Every
    * emitted number comes from decoded pixels or samples; unknown or
    * corrupt blobs are quarantined (dropped) — the production contract
    * for bad media. The mapPartitions shape iterates (id, blob) pairs
    * and never materializes the partition; adding a codec = adding one
    * sniff branch + parser, nothing about the plumbing changes. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    val out = src.mapPartitions { it =>
      it.flatMap { case (id, b) =>
        if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte &&
            b(2) == 'N'.toByte && b(3) == 'G'.toByte)
          parsePng(b).map { case (w, h, sr, sg, sb) =>
            val n = w.toLong * h
            MediaFeatures(id, "png", b.length.toLong, w.toDouble, h.toDouble,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          }
        else if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
          parseBmp24(b).map { case (w, h, sr, sg, sb) =>
            val n = w.toLong * h
            MediaFeatures(id, "bmp", b.length.toLong, w.toDouble, h.toDouble,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          }
        else if (b.length >= 12 && b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
                 b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
                 b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
                 b(10) == 'V'.toByte && b(11) == 'E'.toByte)
          parseWavPcm16(b).map { case (rate, samples) =>
            val (rms, peak, zcr) = wavStats(samples)
            MediaFeatures(id, "wav", b.length.toLong, rate.toDouble,
              samples.length.toDouble, rms, peak.toDouble, zcr.toDouble)
          }
        else None
      }
    }(Encoders.product[MediaFeatures])
    out.toDF()
  }

  /** rms / peak / zero-crossing count of a PCM sample array — shared by
    * the generic dispatch and [[decodeWavFeatures]]. */
  private def wavStats(samples: Array[Short]): (Double, Long, Long) = {
    var sumSq = 0L; var peak = 0L; var zcr = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && s * samples(i - 1).toLong < 0) zcr += 1
      i += 1
    }
    val n = samples.length.toLong
    (if (n > 0) math.sqrt(sumSq.toDouble / n) else 0.0, peak, zcr)
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

  // ---------------------------------------------------------------------
  // Real audio path: WAV (RIFF/PCM) synthesis + a REAL decoder.
  //
  // Unlike `extractFeatures` (stub decode), `decodeWavFeatures` performs a
  // genuine media decode: it parses the RIFF container (chunk walk, fmt
  // validation, 16-bit mono PCM) and computes signal features from the
  // actual samples. The blobs come from `synthesizeWavTable` — valid WAV
  // files whose integer sawtooth waveform is a deterministic function of
  // the row id, so a SQL oracle can recompute the expected features
  // without touching bytes. Malformed blobs are quarantined (dropped),
  // the production behavior for corrupt media.
  // ---------------------------------------------------------------------

  final case class WavFeatures(media_id: Long, sample_rate: Int,
                               n_samples: Long, rms: Double, peak: Long, zcr: Long)

  /** One valid 16-bit mono 16 kHz PCM WAV blob: 44-byte canonical header +
    * integer sawtooth samples `((i*freq*997) % 16000) * 4 - 32000`. Pure
    * integer math — bit-exact reproducible in any engine. */
  def synthesizeWav(nSamples: Int, freq: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)            // PCM, mono
    bb.putInt(16000); bb.putInt(16000 * 2)    // sample rate, byte rate
    bb.putShort(2); bb.putShort(16)           // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val phase = (i.toLong * freq * 997) % 16000
      bb.putShort((phase * 4 - 32000).toShort)
      i += 1
    }
    bb.array()
  }

  /** Media table of synthesized WAV blobs, one per id: n_samples and
    * frequency derive from the id (`800 + id%10*160`, `3 + id%8`). */
  def synthesizeWavTable(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    src.mapPartitions { it =>
      it.map { id =>
        (id, synthesizeWav((800 + (id % 10) * 160).toInt, (3 + (id % 8)).toInt))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("media_id", "blob")
      .withColumn("meta", struct(
        lit("audio").as("kind"),
        length(col("blob")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(16000).as("sample_rate")))
  }

  /** REAL WAV decode: walk the RIFF chunks, validate PCM/mono/16-bit,
    * read the samples, compute rms / peak / zero-crossing count. Rows
    * whose blob fails to parse are dropped (quarantine semantics). */
  def decodeWavFeatures(media: DataFrame): DataFrame = {
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseWavPcm16(bytes).map { case (rate, samples) =>
          val (rms, peak, zcr) = wavStats(samples)
          WavFeatures(id, rate, samples.length.toLong, rms, peak, zcr)
        }
      }
    }(Encoders.product[WavFeatures]).toDF()
  }

  final case class WavWindow(media_id: Long, win: Int, n_samples: Long,
                             energy: Long)

  /** Loudness envelope by REAL decode: fixed-width window energies
    * (exact long sum of squared int16 samples — no float anywhere), the
    * downsampled representation VAD, silence trimming, and loudness
    * normalization run on. One row per (media, window); a trailing
    * partial window keeps its true sample count. Malformed blobs
    * quarantine. Scan-side mapPartitions over the blob column — windows,
    * not blobs, flow downstream. */
  def wavEnergyWindows(media: DataFrame, win: Int = 160): DataFrame = {
    require(win >= 1 && win <= (1 << 20), "window must be in [1, 2^20]")
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseWavPcm16(bytes).toSeq.flatMap { case (_, samples) =>
          samples.indices.grouped(win).zipWithIndex.map { case (idx, w) =>
            var e = 0L
            idx.foreach { i => val s = samples(i).toLong; e += s * s }
            WavWindow(id, w, idx.length.toLong, e)
          }
        }
      }
    }(Encoders.product[WavWindow]).toDF()
  }

  final case class WavTone(media_id: Long, sample_rate: Int,
                           n_samples: Long, detected_hz: Long)

  /** Dominant-frequency detection by REAL decode + Goertzel: for each
    * clip, the single-bin Goertzel recurrence (the O(N) per-bin DFT
    * power — Goertzel 1958, the standard tone-detection algorithm)
    * evaluates every candidate frequency and the clip reports the
    * argmax-power bin (ties to the lower frequency). The synthesized
    * sawtooth's fundamental sits at `freq*997` Hz (aliased into
    * [0, 8000] above Nyquist) with harmonic powers falling as 1/m², so
    * the detected bin is an EXACT integer the oracle derives from the
    * synthesis parameters — any error in decode, recurrence, or power
    * accounting flips the argmax and fails the hash.
    *
    * Scale: one mapPartitions over the blobs — decode + K Goertzel
    * recurrences per clip is per-row CPU, no shuffle; only fixed-width
    * rows leave the scan. Malformed blobs quarantine. */
  def dominantFrequency(media: DataFrame, candidatesHz: Seq[Int]): DataFrame = {
    require(candidatesHz.nonEmpty, "need candidate frequencies")
    val cands = candidatesHz.distinct.sorted
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseWavPcm16(bytes).map { case (rate, samples) =>
          var bestHz = -1L; var bestP = Double.NegativeInfinity
          cands.foreach { hz =>
            val w = 2.0 * math.Pi * hz / rate
            val coeff = 2.0 * math.cos(w)
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
            var i = 0
            while (i < samples.length) {
              s0 = samples(i) + coeff * s1 - s2
              s2 = s1; s1 = s0
              i += 1
            }
            val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
            if (p > bestP) { bestP = p; bestHz = hz.toLong }
          }
          WavTone(id, rate, samples.length.toLong, bestHz)
        }
      }
    }(Encoders.product[WavTone]).toDF()
  }

  /** RIFF/PCM parser: returns (sampleRate, samples) for well-formed
    * 16-bit mono PCM WAV, None otherwise (truncated, wrong magic, wrong
    * codec, or out-of-bounds chunk lengths). */
  private def parseWavPcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    scala.util.Try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def str4(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      require(str4() == "RIFF"); bb.getInt
      require(str4() == "WAVE")
      var fmtOk = false; var rate = 0
      var data: Array[Short] = null
      while (bb.remaining() >= 8) {
        val cid = str4(); val clen = bb.getInt
        require(clen >= 0 && clen <= bb.remaining())
        val chunkEnd = bb.position() + clen
        cid match {
          case "fmt " =>
            val codec = bb.getShort; val channels = bb.getShort
            rate = bb.getInt; bb.getInt; bb.getShort
            val bits = bb.getShort
            fmtOk = codec == 1 && channels == 1 && bits == 16
          case "data" =>
            require(fmtOk)
            val n = clen / 2
            val arr = new Array[Short](n)
            var i = 0
            while (i < n) { arr(i) = bb.getShort; i += 1 }
            data = arr
          case _ => ()
        }
        // RIFF pads odd-length chunks to an even boundary; skip the pad
        // byte so a compliant file with an odd LIST/INFO chunk parses.
        val padded = chunkEnd + (clen & 1)
        bb.position(math.min(padded, bb.limit()))
      }
      require(fmtOk && data != null && rate > 0)
      (rate, data)
    }.toOption

  // ---------------------------------------------------------------------
  // REAL video-container walk (AVI/MJPEG): the WAV parser's RIFF sibling.
  // Honest scope: CONTAINER indexing — header parse, movi chunk walk,
  // idx1 cross-validation, per-frame (offset, size, keyframe) — not JPEG
  // entropy decode (no codec libs here; frame payloads are synthesized
  // SOI…EOI byte runs). That index IS the real large-scale primitive:
  // frame-sampling 100 TB of video means planning (file, offset, length)
  // ranged reads from container metadata, then handing only the sampled
  // frames to a decoder. Blobs come from `synthesizeAviTable` — valid
  // RIFF-AVI files whose frame counts/sizes are integer functions of the
  // id, so a SQL oracle recomputes every offset with a window prefix-sum
  // over the size formula, without touching bytes. Malformed blobs and
  // containers whose idx1 disagrees with the walked chunks are dropped
  // (quarantine semantics).
  // ---------------------------------------------------------------------

  final case class AviFrame(media_id: Long, frame_idx: Long, offset: Long,
                            frame_bytes: Long, keyframe: Boolean)

  private def aviFrameCount(id: Long): Int = (4 + (id % 5)).toInt
  /** Even by construction — no RIFF pad after frame chunks, which keeps
    * the oracle's offset arithmetic a plain prefix sum. (The PARSER still
    * handles odd/padded chunks — spec'd on a hand-built container.) */
  private def aviFrameSize(id: Long, k: Int): Int =
    2 * (100 + ((id * 31 + k * 7) % 120)).toInt

  /** Per-frame 8x8-block gray values of the synthesized MJPEG frames:
    * block (bx, by) of frame k is the CONSTANT
    * `(id*31 + k*17 + bx*7 + by*13) % 256` — constant blocks make the
    * baseline-JPEG round trip integer-EXACT (a constant block's DCT is
    * DC-only; with quantizer 8 the quantized DC is exactly v-128 and the
    * inverse path reproduces v bit for bit), so a SQL oracle replays
    * decoded pixel statistics from this formula without touching bytes. */
  private[multimodal] def mjpegBlockValue(id: Long, k: Int, bx: Int, by: Int): Int =
    ((id * 31 + k * 17 + bx * 7 + by * 13) % 256).toInt

  /** Frames are [[MjpegFramesPerSide]] x [[MjpegFramesPerSide]] blocks
    * (16x16 px) regardless of the container's nominal stream dims — small
    * enough that every encoded frame fits the `aviFrameSize` formula the
    * container-layout oracles pin. */
  private val MjpegBlocksPerSide = 2

  /** One valid AVI/MJPEG container: RIFF(hdrl(avih, strl(strh, strf)),
    * movi(00dc…), idx1). Frame k's payload is a REAL baseline grayscale
    * JPEG ([[synthesizeJpegGray]]: DQT/SOF0/DHT/SOS + entropy-coded
    * DC-only blocks), padded to `aviFrameSize(id, k)` with 0xFF fill
    * bytes before the EOI marker (legal JPEG fill, so the chunk both
    * stays a conformant image AND keeps the size formula the q62 oracle
    * replays; the payload still ends `FFD9`). Every 4th frame is flagged
    * AVIIF_KEYFRAME in idx1. */
  def synthesizeAvi(id: Long): Array[Byte] = {
    val n = aviFrameCount(id)
    val width = (64 + (id % 3) * 16).toInt
    val height = (48 + (id % 2) * 16).toInt
    val sizes = (0 until n).map(k => aviFrameSize(id, k))
    val hdrlData = 192                       // 'hdrl' + avih(64) + LIST strl(124)
    val moviData = 4 + sizes.map(8 + _).sum  // 'movi' + chunks, no pads (even)
    val idxData = 16 * n
    val riffData = 4 + (8 + hdrlData) + (8 + moviData) + (8 + idxData)
    val bb = java.nio.ByteBuffer.allocate(8 + riffData)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(riffData); cc("AVI ")
    cc("LIST"); bb.putInt(hdrlData); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(40000); bb.putInt(0); bb.putInt(0); bb.putInt(0x10) // 25fps, HASINDEX
    bb.putInt(n); bb.putInt(0); bb.putInt(1); bb.putInt(0)
    bb.putInt(width); bb.putInt(height)
    (0 until 4).foreach(_ => bb.putInt(0))
    cc("LIST"); bb.putInt(116); cc("strl")
    cc("strh"); bb.putInt(56)
    cc("vids"); cc("MJPG")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(1); bb.putInt(25)             // scale 1, rate 25 -> 25 fps
    bb.putInt(0); bb.putInt(n)
    bb.putInt(0); bb.putInt(-1); bb.putInt(0)
    bb.putShort(0); bb.putShort(0)
    bb.putShort(width.toShort); bb.putShort(height.toShort)
    cc("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(width); bb.putInt(height)
    bb.putShort(1); bb.putShort(24); cc("MJPG")
    bb.putInt(width * height * 3)
    (0 until 4).foreach(_ => bb.putInt(0))
    cc("LIST"); bb.putInt(moviData); cc("movi")
    sizes.zipWithIndex.foreach { case (sz, k) =>
      cc("00dc"); bb.putInt(sz)
      val vals = Array.tabulate(MjpegBlocksPerSide, MjpegBlocksPerSide) {
        (by, bx) => mjpegBlockValue(id, k, bx, by)
      }
      bb.put(synthesizeJpegGray(vals, sz))
    }
    cc("idx1"); bb.putInt(idxData)
    var rel = 4L
    sizes.zipWithIndex.foreach { case (sz, k) =>
      cc("00dc"); bb.putInt(if (k % 4 == 0) 0x10 else 0)
      bb.putInt(rel.toInt); bb.putInt(sz)
      rel += 8L + sz
    }
    bb.array()
  }

  /** Media table of synthesized AVI blobs, one per id. */
  def synthesizeAviTable(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    src.mapPartitions { it => it.map(id => (id, synthesizeAvi(id))) }(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("media_id", "blob")
      .withColumn("meta", struct(
        lit("video").as("kind"),
        length(col("blob")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate")))
  }

  /** REAL container walk: one row per frame with its absolute payload
    * offset, byte length, and idx1 keyframe flag. The walked movi chunks
    * are cross-checked against idx1 (count, offsets, sizes) — a container
    * whose index lies is dropped, not half-trusted. */
  def aviFrameIndex(media: DataFrame): DataFrame = {
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseAviIndex(bytes).toSeq.flatMap { frames =>
          frames.zipWithIndex.map { case ((off, sz, key), k) =>
            AviFrame(id, k.toLong, off, sz, key)
          }
        }
      }
    }(Encoders.product[AviFrame]).toDF()
  }

  /** RIFF-AVI walker: returns per-frame (payloadOffset, size, keyframe)
    * for well-formed containers, None otherwise. Handles odd-size chunk
    * padding per the RIFF rule; requires avih's declared frame count,
    * the walked movi chunks, and idx1 to agree. */
  private def parseAviIndex(bytes: Array[Byte]): Option[Seq[(Long, Long, Boolean)]] =
    scala.util.Try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      require(cc() == "RIFF"); bb.getInt; require(cc() == "AVI ")
      var totalFrames = -1
      var moviFourccPos = -1L
      var frames = Vector.empty[(Long, Long)] // (payload offset, size)
      var index = Vector.empty[(Long, Long, Boolean)] // (rel offset, size, key)
      while (bb.remaining() >= 8) {
        val id = cc(); val sz = bb.getInt
        require(sz >= 0 && bb.position() + sz <= bb.limit())
        val end = bb.position() + sz
        id match {
          case "LIST" =>
            cc() match {
              case "hdrl" =>
                // walk hdrl children for avih; skip strl etc.
                while (bb.position() < end) {
                  val cid = cc(); val csz = bb.getInt
                  val cend = bb.position() + csz
                  if (cid == "avih") {
                    totalFrames = bb.getInt(bb.position() + 16)
                  }
                  bb.position(cend + (csz & 1))
                }
              case "movi" =>
                moviFourccPos = bb.position() - 4L
                while (bb.position() < end) {
                  val cid = cc(); val csz = bb.getInt
                  require(csz >= 0 && bb.position() + csz <= end)
                  if (cid == "00dc") frames :+= ((bb.position().toLong, csz.toLong))
                  bb.position(bb.position() + csz + (csz & 1))
                }
              case _ => ()
            }
          case "idx1" =>
            while (bb.position() < end) {
              val cid = cc(); val flags = bb.getInt
              val rel = bb.getInt.toLong; val csz = bb.getInt.toLong
              require(cid == "00dc")
              index :+= ((rel, csz, (flags & 0x10) != 0))
            }
          case _ => ()
        }
        bb.position(math.min(end + (sz & 1), bb.limit()))
      }
      require(moviFourccPos >= 0 && frames.nonEmpty)
      require(totalFrames == frames.length, "avih frame count vs movi walk")
      require(index.length == frames.length, "idx1 entry count vs movi walk")
      frames.zip(index).map { case ((off, sz), (rel, isz, key)) =>
        // idx1 offsets are relative to the 'movi' fourcc; the walked
        // chunk header sits 8 bytes before its payload
        require(moviFourccPos + rel + 8 == off && isz == sz,
          "idx1 disagrees with walked chunks")
        (off, sz, key)
      }
    }.toOption

  // ---------------------------------------------------------------------
  // REAL frame decode (baseline JPEG): a genuine — restricted but
  // conformant — baseline sequential JPEG codec for the MJPEG frames:
  // grayscale, one scan, no restart markers. The encoder emits DC-only
  // blocks (each 8x8 block constant), which with quantizer 8 makes the
  // decode integer-exact, so the oracle replays per-frame pixel stats
  // from the synthesis formula. The DECODER is general within the
  // subset: arbitrary DHT/DQT tables, AC coefficients (ZRL/EOB runs),
  // fixed-point-free double IDCT on the non-DC-only path, 0xFF fill
  // bytes before markers, byte-stuffed entropy data. Malformed frames
  // are quarantined (dropped), never half-decoded.
  // ---------------------------------------------------------------------

  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Minimal valid baseline grayscale JPEG of `vals.length*8` x
    * `vals(0).length*8` px where block (bx, by) is the constant
    * `vals(by)(bx)`; total length is EXACTLY `targetLen` via 0xFF fill
    * bytes before EOI (JPEG B.1.1.2 allows any number of fill bytes
    * before a marker). Tables: flat quantizer 8; custom canonical
    * Huffman tables (DC categories 0-9 at 4 bits, AC = EOB alone at 2
    * bits) — far smaller than the Annex K defaults, which is what lets
    * a whole frame fit the container's 200-438 byte chunk sizes. */
  private[multimodal] def synthesizeJpegGray(vals: Array[Array[Int]],
                                             targetLen: Int): Array[Byte] = {
    val bh = vals.length; val bw = vals(0).length
    val (w, h) = (bw * 8, bh * 8)
    val out = new java.io.ByteArrayOutputStream()
    def m(a: Int, b: Int): Unit = { out.write(a); out.write(b) }
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xFF, 0xD8)                                  // SOI
    m(0xFF, 0xDB); u16(67); out.write(0x00)        // DQT, Pq=0 Tq=0
    (0 until 64).foreach(_ => out.write(8))
    m(0xFF, 0xC0); u16(11); out.write(8)           // SOF0: 8-bit
    u16(h); u16(w); out.write(1)                   // 1 component
    out.write(1); out.write(0x11); out.write(0)    // id 1, 1x1, quant 0
    m(0xFF, 0xC4); u16(2 + 1 + 16 + 10)            // DHT DC class 0 id 0
    out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 10 else 0))
    (0 until 10).foreach(out.write)                // categories 0..9
    m(0xFF, 0xC4); u16(2 + 1 + 16 + 1)             // DHT AC class 1 id 0
    out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 2) 1 else 0))
    out.write(0x00)                                // EOB only
    m(0xFF, 0xDA); u16(8); out.write(1)            // SOS
    out.write(1); out.write(0x00)                  // comp 1, DC 0 / AC 0
    out.write(0); out.write(63); out.write(0)      // Ss, Se, AhAl
    // entropy-coded data: canonical codes — DC category c is the 4-bit
    // code c; EOB is the 2-bit code 0
    var acc = 0; var nbits = 0
    val scan = new java.io.ByteArrayOutputStream()
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) {
          scan.write(acc)
          if (acc == 0xFF) scan.write(0x00)        // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val dcq = vals(by)(bx) - 128               // round(8(v-128)/8)
        val diff = dcq - pred; pred = dcq
        var cat = 0; var a = math.abs(diff)
        while (a > 0) { cat += 1; a >>= 1 }
        bits(cat, 4)
        if (cat > 0) bits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
        bits(0, 2)                                 // EOB
        bx += 1
      }
      by += 1
    }
    if (nbits > 0) {                               // 1-pad the tail byte
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      scan.write(acc)
      if (acc == 0xFF) scan.write(0x00)
    }
    out.write(scan.toByteArray)
    val fill = targetLen - out.size() - 2
    require(fill >= 0, s"jpeg frame ${out.size() + 2} exceeds chunk $targetLen")
    (0 until fill).foreach(_ => out.write(0xFF))   // fill bytes, then EOI
    m(0xFF, 0xD9)
    out.toByteArray
  }

  /** Baseline grayscale JPEG decoder (the subset above, decoded
    * generally): returns (width, height, row-major pixels) or None for
    * anything malformed — truncation, bad markers, invalid Huffman
    * codes, progressive/multi-component streams, a scan that doesn't
    * reach EOI. DC-only blocks decode with EXACT integer math
    * (pixel = round(DC/8) + 128); blocks with AC energy take the
    * general double IDCT with one fixed op order. */
  private[multimodal] def parseJpegGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    scala.util.Try {
      var p = 0
      def u8(): Int = { val v = bytes(p) & 0xFF; p += 1; v }
      def u16(): Int = { val v = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF); p += 2; v }
      require(u8() == 0xFF && u8() == 0xD8, "SOI")
      val qt = Array.ofDim[Int](4, 64)
      // canonical Huffman decode tables per (class, table id):
      // mincode/maxcode/valptr by code length, plus the value list
      final case class HTab(min: Array[Int], max: Array[Int],
                            ptr: Array[Int], vals: Array[Int])
      val hTabs = Array.ofDim[HTab](2, 4)
      var w = 0; var h = 0; var sofSeen = false
      var dcTab = 0; var acTab = 0; var qTab = 0
      var sosSeen = false
      while (!sosSeen) {
        var b = u8()
        while (b != 0xFF) b = u8()                 // tolerate garbage
        var mk = u8()
        while (mk == 0xFF) mk = u8()               // fill bytes
        mk match {
          case 0xDB =>
            val end = p + u16() - 2
            while (p < end) {
              val pqtq = u8()
              require((pqtq >> 4) == 0, "8-bit quantizers only")
              val id = pqtq & 0x0F
              (0 until 64).foreach(i => qt(id)(i) = u8())
            }
          case 0xC0 =>
            u16(); require(u8() == 8, "8-bit precision")
            h = u16(); w = u16()
            require(w > 0 && h > 0, "empty frame")
            require(u8() == 1, "grayscale only")
            u8(); require(u8() == 0x11, "1x1 sampling"); qTab = u8()
            sofSeen = true
          case 0xC4 =>
            val end = p + u16() - 2
            while (p < end) {
              val tcth = u8()
              val (cls, id) = (tcth >> 4, tcth & 0x0F)
              require(cls <= 1 && id <= 3, "huffman table slot")
              val counts = new Array[Int](17)
              (1 to 16).foreach(l => counts(l) = u8())
              val vals = new Array[Int](counts.sum)
              vals.indices.foreach(i => vals(i) = u8())
              val (min, max, ptr) =
                (new Array[Int](17), Array.fill(17)(-1), new Array[Int](17))
              var code = 0; var k = 0
              (1 to 16).foreach { l =>
                if (counts(l) > 0) {
                  min(l) = code; max(l) = code + counts(l) - 1; ptr(l) = k
                  code += counts(l); k += counts(l)
                }
                code <<= 1
              }
              hTabs(cls)(id) = HTab(min, max, ptr, vals)
            }
          case 0xDA =>
            require(sofSeen, "SOS before SOF")
            u16(); require(u8() == 1, "one scan component")
            u8(); val tt = u8(); dcTab = tt >> 4; acTab = tt & 0x0F
            require(u8() == 0 && u8() == 63 && u8() == 0, "baseline scan")
            require(hTabs(0)(dcTab) != null && hTabs(1)(acTab) != null,
              "scan references a missing huffman table")
            sosSeen = true
          case 0xD9 => require(false, "EOI before scan")
          case _ =>
            val len = u16(); p += len - 2          // skip APPn/COM/etc.
        }
      }
      // entropy-coded bit reader with unstuffing
      var acc = 0; var nbits = 0
      def bit(): Int = {
        if (nbits == 0) {
          var b = u8()
          if (b == 0xFF) {
            val nx = u8()
            require(nx == 0x00, "marker inside entropy data")
          }
          acc = b; nbits = 8
        }
        nbits -= 1
        (acc >> nbits) & 1
      }
      def huff(t: HTab): Int = {
        var code = 0
        var l = 0
        while (l < 16) {
          code = (code << 1) | bit(); l += 1
          if (t.max(l) >= 0 && code <= t.max(l)) {
            return t.vals(t.ptr(l) + code - t.min(l))
          }
        }
        require(false, "invalid huffman code"); 0
      }
      def extend(v: Int, cat: Int): Int =
        if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v
      def recv(cat: Int): Int = {
        var v = 0
        (0 until cat).foreach(_ => v = (v << 1) | bit())
        v
      }
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val pix = new Array[Int](w * h)
      val q = qt(qTab)
      var pred = 0
      var byi = 0
      while (byi < bh) {
        var bxi = 0
        while (bxi < bw) {
          val coef = new Array[Int](64)
          val cat = huff(hTabs(0)(dcTab))
          require(cat <= 11, "DC category")
          pred += extend(recv(cat), cat)
          coef(0) = pred * q(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = huff(hTabs(1)(acTab))
            val (run, size) = (rs >> 4, rs & 0x0F)
            if (size == 0) {
              if (run == 15) k += 16 else eob = true // ZRL vs EOB
            } else {
              k += run
              require(k < 64, "AC overrun")
              coef(JpegZigzag(k)) = extend(recv(size), size) * q(JpegZigzag(k))
              k += 1
            }
          }
          // IDCT: exact integer path for DC-only blocks, double
          // otherwise (fixed op order, round half up, clamp)
          val acZero = (1 until 64).forall(coef(_) == 0)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val px = byi * 8 + y; val pxx = bxi * 8 + x
              if (px < h && pxx < w) {
                val v =
                  if (acZero)
                    math.floor(coef(0) / 8.0 + 0.5).toInt + 128
                  else {
                    var s = 0.0
                    var u = 0
                    while (u < 8) {
                      var vv = 0
                      while (vv < 8) {
                        val cu = if (u == 0) 0.7071067811865476 else 1.0
                        val cv = if (vv == 0) 0.7071067811865476 else 1.0
                        s += cu * cv * coef(vv * 8 + u) *
                          math.cos((2 * x + 1) * u * math.Pi / 16) *
                          math.cos((2 * y + 1) * vv * math.Pi / 16)
                        vv += 1
                      }
                      u += 1
                    }
                    math.floor(s / 4.0 + 128.0 + 0.5).toInt
                  }
                pix(px * w + pxx) = math.max(0, math.min(255, v))
              }
              x += 1
            }
            y += 1
          }
          bxi += 1
        }
        byi += 1
      }
      // after the scan: optional fill bytes, then EOI must close the frame
      if (nbits > 0) { nbits = 0 }                 // discard pad bits
      var b = u8()
      while (b == 0xFF && (bytes(p) & 0xFF) == 0xFF) b = u8()
      require(b == 0xFF && u8() == 0xD9, "EOI")
      (w, h, pix)
    }.toOption

  final case class MjpegFrame(media_id: Long, frame_idx: Long,
                              width: Long, height: Long, mean_gray: Double,
                              min_gray: Long, max_gray: Long)

  /** REAL per-frame pixel decode of the MJPEG containers: the RIFF walk
    * of [[aviFrameIndex]] locates each frame payload, the baseline-JPEG
    * decoder produces its pixels, and per-frame stats come from the
    * decoded array — (media_id, frame_idx, width, height, mean_gray,
    * min_gray, max_gray). A frame whose JPEG fails to decode is
    * QUARANTINED (dropped) while its siblings survive; a container whose
    * index lies is dropped whole (the walker's contract).
    *
    * Scale: one mapPartitions over the blobs — container walk + decode
    * are per-row CPU, no shuffle; only the fixed-width stats rows leave
    * the scan. mean_gray = pixel sum / (w*h), exact in binary for the
    * synthesized 16x16 frames (quarter grid). */
  def mjpegFrameFeatures(media: DataFrame): DataFrame = {
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseAviIndex(bytes).toSeq.flatMap { frames =>
          frames.zipWithIndex.flatMap { case ((off, sz, _), k) =>
            val payload = java.util.Arrays.copyOfRange(
              bytes, off.toInt, (off + sz).toInt)
            parseJpegGray(payload).map { case (w, h, pix) =>
              MjpegFrame(id, k.toLong, w.toLong, h.toLong,
                pix.map(_.toLong).sum.toDouble / (w * h),
                pix.min.toLong, pix.max.toLong)
            }
          }
        }
      }
    }(Encoders.product[MjpegFrame]).toDF()
  }

  // ---------------------------------------------------------------------
  // REAL image decode (BMP): like the WAV path, BMP is codec-free — a
  // genuine decoder is pure header + pixel-array parsing. Blobs come from
  // `synthesizeBmpTable`: valid 24bpp bottom-up BMPs whose pixel values
  // are a deterministic integer function of (x, y, id), so a SQL oracle
  // recomputes the expected channel means without touching bytes.
  // Malformed blobs are quarantined (dropped).
  // ---------------------------------------------------------------------

  final case class BmpFeatures(media_id: Long, width: Int, height: Int,
                               mean_r: Double, mean_g: Double, mean_b: Double)

  /** One valid 24bpp bottom-up BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + BGR rows padded to 4 bytes. Pixel channels are
    * `(x*7 + y*13 + seed) % 256` (r), `(x*11 + y*3 + 2*seed) % 256` (g),
    * `(x*5 + y*17 + 3*seed) % 256` (b) — pure integer math. */
  def synthesizeBmp(width: Int, height: Int, seed: Int): Array[Byte] = {
    val stride = (width * 3 + 3) & ~3
    val imageSize = stride * height
    val bb = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + imageSize); bb.putShort(0); bb.putShort(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(width); bb.putInt(height)
    bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(imageSize)
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    var y = height - 1 // bottom-up: file row 0 is image row height-1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        bb.put(((x * 5 + y * 17 + 3 * seed) % 256).toByte)  // B
        bb.put(((x * 11 + y * 3 + 2 * seed) % 256).toByte)  // G
        bb.put(((x * 7 + y * 13 + seed) % 256).toByte)      // R
        x += 1
      }
      var p = width * 3
      while (p < stride) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Media table of synthesized BMP blobs: width `8 + id%9`, height
    * `6 + id%7`, seed `id%251` — all derived from the id. */
  def synthesizeBmpTable(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    src.mapPartitions { it =>
      it.map { id =>
        (id, synthesizeBmp((8 + id % 9).toInt, (6 + id % 7).toInt, (id % 251).toInt))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("media_id", "blob")
      .withColumn("meta", struct(
        lit("image").as("kind"),
        length(col("blob")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate")))
  }

  /** REAL BMP decode: validate the BM magic / 24bpp / uncompressed
    * headers, walk the padded bottom-up pixel rows, and compute
    * per-channel means from the actual bytes. Malformed blobs drop. */
  def decodeBmpFeatures(media: DataFrame): DataFrame = {
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseBmp24(bytes).map { case (w, h, sumR, sumG, sumB) =>
          val n = w.toLong * h
          BmpFeatures(id, w, h, sumR.toDouble / n, sumG.toDouble / n, sumB.toDouble / n)
        }
      }
    }(Encoders.product[BmpFeatures]).toDF()
  }

  final case class BmpGray(media_id: Long, width: Int, height: Int,
                           gray: Array[Int])

  /** REAL-decode gray vectors: one array<int> of per-pixel channel sums
    * (B+G+R, 0..765) per image, in top-down (y, x) raster order —
    * decoded from the actual padded bottom-up BMP bytes. The compact
    * representation pair math runs on: ~3 bytes/pixel of ints instead
    * of the blob, so downstream joins shuffle vectors, never blobs. */
  def bmpGrayVectors(media: DataFrame): DataFrame = {
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseBmpGray(bytes).map { case (w, h, g) => BmpGray(id, w, h, g) }
      }
    }(Encoders.product[BmpGray]).toDF()
  }

  /** PSNR between same-sized image pairs (media_id, media_id + offset) —
    * the fidelity metric behind transcode/near-dup verification. SSE is
    * an EXACT long over the decoded gray vectors (zip_with + integer
    * aggregate), so the one log10 at the end is the only float op and
    * the result snaps to the house 6dp grid.
    *
    * Scale: decode is scan-side (mapPartitions over the blob column);
    * the self-join keys on the id arithmetic and ships the compact gray
    * vectors only. Pairs with mismatched dimensions drop (PSNR is
    * undefined), identical images (sse = 0) report null psnr rather
    * than infinity. */
  def bmpPsnrPairs(media: DataFrame, offset: Long): DataFrame = {
    // cut lineage so the real-decode pass runs ONCE: the self-join's two
    // branches shuffle on different keys, so without this every blob
    // would decode twice (the dominant cost)
    val g = graft.operators.Lineage.cut(bmpGrayVectors(media))
    val a = g.select(col("media_id").as("media_id_a"),
      col("width"), col("height"), col("gray").as("ga"))
    val b = g.select((col("media_id") - offset).as("media_id_a"),
      col("media_id").as("media_id_b"),
      col("width").as("wb"), col("height").as("hb"), col("gray").as("gb"))
    a.join(b, Seq("media_id_a"))
      .filter(col("width") === col("wb") && col("height") === col("hb"))
      .withColumn("sse", aggregate(
        zip_with(col("ga"), col("gb"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v.cast("long")))
      .withColumn("n_px", (col("width") * col("height")).cast("long"))
      .withColumn("psnr", when(col("sse") > 0,
        floor(lit(10.0) * log10(lit(585225.0) * col("n_px") / col("sse"))
          * lit(1e6) + lit(0.5d)) / lit(1e6)).otherwise(lit(null).cast("double")))
      .select("media_id_a", "media_id_b", "width", "height", "sse", "psnr")
  }

  /** Top-down (y, x) gray raster of an uncompressed 24bpp BMP, or None
    * for malformed blobs — same walk as [[parseBmp24]], keeping the
    * per-pixel sums instead of channel totals. */
  private def parseBmpGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    scala.util.Try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte)
      bb.getInt; bb.getShort; bb.getShort
      val pixelOffset = bb.getInt
      val hdrSize = bb.getInt
      require(hdrSize >= 40)
      val w = bb.getInt; val h = bb.getInt
      require(w > 0 && h > 0 && w <= 4096 && h <= 4096)
      require(bb.getShort == 1)
      require(bb.getShort == 24)
      require(bb.getInt == 0)
      val stride = (w * 3 + 3) & ~3
      require(pixelOffset >= 54 && pixelOffset.toLong + stride.toLong * h <= bytes.length)
      val gray = new Array[Int](w * h)
      var row = 0
      while (row < h) {
        val y = h - 1 - row // file rows are bottom-up
        var p = pixelOffset + row * stride
        var x = 0
        while (x < w) {
          gray(y * w + x) = (bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) +
            (bytes(p + 2) & 0xFF)
          p += 3; x += 1
        }
        row += 1
      }
      (w, h, gray)
    }.toOption

  /** Header + pixel-array parser for uncompressed 24bpp BMP: returns
    * (width, height, sumR, sumG, sumB) or None for malformed blobs. */
  private def parseBmp24(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    scala.util.Try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte)
      bb.getInt; bb.getShort; bb.getShort
      val pixelOffset = bb.getInt
      val hdrSize = bb.getInt
      require(hdrSize >= 40)
      val w = bb.getInt; val h = bb.getInt
      require(w > 0 && h > 0 && w <= 65536 && h <= 65536)
      require(bb.getShort == 1)       // planes
      require(bb.getShort == 24)      // bpp
      require(bb.getInt == 0)         // BI_RGB, uncompressed
      val stride = (w * 3 + 3) & ~3
      require(pixelOffset >= 54 && pixelOffset.toLong + stride.toLong * h <= bytes.length)
      var (sumR, sumG, sumB) = (0L, 0L, 0L)
      var row = 0
      while (row < h) {
        var p = pixelOffset + row * stride
        var x = 0
        while (x < w) {
          sumB += bytes(p) & 0xFF
          sumG += bytes(p + 1) & 0xFF
          sumR += bytes(p + 2) & 0xFF
          p += 3; x += 1
        }
        row += 1
      }
      (w, h, sumR, sumG, sumB)
    }.toOption

  // ---------------------------------------------------------------------
  // REAL image decode (PNG): a genuine compressed-codec decoder built
  // from the public PNG spec with zero dependencies — chunk walk with
  // CRC32 verification, multi-IDAT zlib inflate (java.util.zip.Inflater),
  // and full scanline-filter reconstruction (None/Sub/Up/Average/Paeth).
  // Blobs come from `synthesizePngTable`: valid 8-bit truecolor PNGs
  // whose pixels follow the SAME integer formula as the BMP path, so the
  // q80 SQL oracle shape recomputes expected channel means without
  // touching bytes — and the synthesizer cycles the filter type per row
  // (y % 5), so every filter's reconstruction arithmetic is load-bearing
  // in every image taller than 4 rows. Malformed blobs (bad magic, CRC
  // mismatch, truncated stream, wrong color type) quarantine.
  // ---------------------------------------------------------------------

  final case class PngFeatures(media_id: Long, width: Int, height: Int,
                               mean_r: Double, mean_g: Double, mean_b: Double)

  /** Paeth predictor (PNG spec §9, filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** One valid 8-bit truecolor (color type 2) non-interlaced PNG. Pixel
    * channels follow the BMP formula — r `(x*7+y*13+seed)%256`,
    * g `(x*11+y*3+2*seed)%256`, b `(x*5+y*17+3*seed)%256`; row `y` is
    * encoded with filter type `y % 5`, and the compressed stream is
    * split across TWO IDAT chunks (decoders must concatenate). */
  def synthesizePng(width: Int, height: Int, seed: Int): Array[Byte] = {
    val stride = width * 3
    val raw = Array.ofDim[Byte](height, stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raw(y)(x * 3) = ((x * 7 + y * 13 + seed) % 256).toByte
        raw(y)(x * 3 + 1) = ((x * 11 + y * 3 + 2 * seed) % 256).toByte
        raw(y)(x * 3 + 2) = ((x * 5 + y * 17 + 3 * seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    // filter each scanline (encoder side = raw minus predictor, mod 256)
    val filtered = new Array[Byte](height * (1 + stride))
    var pos = 0
    y = 0
    while (y < height) {
      val ft = y % 5
      filtered(pos) = ft.toByte; pos += 1
      val cur = raw(y)
      val prev = if (y > 0) raw(y - 1) else null
      var i = 0
      while (i < stride) {
        val xv = cur(i) & 0xff
        val a = if (i >= 3) cur(i - 3) & 0xff else 0
        val b = if (prev != null) prev(i) & 0xff else 0
        val c = if (prev != null && i >= 3) prev(i - 3) & 0xff else 0
        val out = ft match {
          case 0 => xv
          case 1 => xv - a
          case 2 => xv - b
          case 3 => xv - (a + b) / 2
          case 4 => xv - paeth(a, b, c)
        }
        filtered(pos) = (out & 0xff).toByte
        pos += 1; i += 1
      }
      y += 1
    }
    // zlib-compress the filtered stream
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = zout.toByteArray
    // assemble: signature + IHDR + 2×IDAT + IEND, each chunk CRC32'd
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4).putInt(data.length)
      out.write(bb.array())
      val tb = tpe.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    chunk("IHDR", ihdr)
    val half = z.length / 2
    chunk("IDAT", z.take(half))
    chunk("IDAT", z.drop(half))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Media table of synthesized PNG blobs: width `8 + id%9`, height
    * `6 + id%7`, seed `id%251` — the BMP table's geometry, PNG-encoded. */
  def synthesizePngTable(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    src.mapPartitions { it =>
      it.map { id =>
        (id, synthesizePng((8 + id % 9).toInt, (6 + id % 7).toInt, (id % 251).toInt))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("media_id", "blob")
      .withColumn("meta", struct(
        lit("image").as("kind"),
        length(col("blob")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate")))
  }

  /** REAL PNG decode: verify signature + per-chunk CRC32, concatenate
    * IDATs, inflate, reconstruct every scanline filter, and compute
    * per-channel means from the actual pixels. Malformed blobs drop. */
  def decodePngFeatures(media: DataFrame): DataFrame = {
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parsePng(bytes).map { case (w, h, sumR, sumG, sumB) =>
          val n = w.toLong * h
          PngFeatures(id, w, h, sumR.toDouble / n, sumG.toDouble / n, sumB.toDouble / n)
        }
      }
    }(Encoders.product[PngFeatures]).toDF()
  }

  /** Chunk walk + inflate + defilter for 8-bit truecolor non-interlaced
    * PNG: returns (width, height, sumR, sumG, sumB), or None for
    * malformed blobs (bad signature, CRC mismatch, truncated zlib
    * stream, unsupported color type / bit depth / interlace). */
  private def parsePng(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    scala.util.Try {
      require(bytes.length > 8 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte &&
        (bytes(4) & 0xff) == 0x0d && (bytes(5) & 0xff) == 0x0a &&
        (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0x0a)
      val bb = java.nio.ByteBuffer.wrap(bytes) // PNG ints are big-endian
      bb.position(8)
      var w = 0; var h = 0
      var seenIhdr = false; var seenIend = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!seenIend && bb.remaining() >= 12) {
        val len = bb.getInt
        require(len >= 0 && len <= bb.remaining() - 8)
        val tb = new Array[Byte](4); bb.get(tb)
        val data = new Array[Byte](len); bb.get(data)
        val crc = bb.getInt
        val c = new java.util.zip.CRC32()
        c.update(tb); c.update(data)
        require(crc == c.getValue.toInt, "chunk CRC mismatch")
        new String(tb, "US-ASCII") match {
          case "IHDR" =>
            require(len == 13)
            val ib = java.nio.ByteBuffer.wrap(data)
            w = ib.getInt; h = ib.getInt
            require(w > 0 && h > 0 && w <= 65536 && h <= 65536)
            require(data(8) == 8, "bit depth must be 8")
            require(data(9) == 2, "color type must be truecolor RGB")
            require(data(10) == 0 && data(11) == 0 && data(12) == 0,
              "deflate/adaptive/non-interlaced only")
            seenIhdr = true
          case "IDAT" => require(seenIhdr); idat.write(data)
          case "IEND" => seenIend = true
          case _ => () // ancillary chunks are legal; skip
        }
      }
      require(seenIhdr && seenIend)
      val stride = w * 3
      val expected = h * (1 + stride)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val filtered = new Array[Byte](expected)
      var off = 0
      while (off < expected) {
        val n = inf.inflate(filtered, off, expected - off)
        require(n > 0, "truncated or corrupt zlib stream")
        off += n
      }
      inf.end()
      // reconstruct scanlines (decoder side = filtered plus predictor)
      val prev = new Array[Int](stride)
      val cur = new Array[Int](stride)
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      var pos = 0
      var y = 0
      while (y < h) {
        val ft = filtered(pos) & 0xff; pos += 1
        require(ft <= 4, s"unknown filter type $ft")
        var i = 0
        while (i < stride) {
          val xv = filtered(pos + i) & 0xff
          val a = if (i >= 3) cur(i - 3) else 0
          val b = if (y > 0) prev(i) else 0
          val c = if (y > 0 && i >= 3) prev(i - 3) else 0
          cur(i) = ft match {
            case 0 => xv
            case 1 => (xv + a) & 0xff
            case 2 => (xv + b) & 0xff
            case 3 => (xv + (a + b) / 2) & 0xff
            case 4 => (xv + paeth(a, b, c)) & 0xff
          }
          i += 1
        }
        pos += stride
        i = 0
        while (i < stride) {
          sumR += cur(i); sumG += cur(i + 1); sumB += cur(i + 2)
          i += 3
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
      (w, h, sumR, sumG, sumB)
    }.toOption

  /** Mixed-modality media table: id%3 = 0 -> PNG, 1 -> BMP, 2 -> WAV —
    * the heterogeneous corpus the generic [[extractFeatures]] dispatch
    * exists for. */
  def synthesizeMixedMediaTable(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    src.mapPartitions { it =>
      it.map { id =>
        val blob = (id % 3) match {
          case 0 => synthesizePng((8 + id % 9).toInt, (6 + id % 7).toInt, (id % 251).toInt)
          case 1 => synthesizeBmp((8 + id % 9).toInt, (6 + id % 7).toInt, (id % 251).toInt)
          case _ => synthesizeWav((800 + (id % 10) * 160).toInt, (3 + (id % 8)).toInt)
        }
        (id, blob)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("media_id", "blob")
      .withColumn("meta", struct(
        when(col("media_id") % 3 === 2, "audio").otherwise("image").as("kind"),
        length(col("blob")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        when(col("media_id") % 3 === 2, 16000).otherwise(lit(null).cast("int"))
          .as("sample_rate")))
  }

  final case class WavFingerprint(media_id: Long, n_samples: Long, fp: Long)

  /** Acoustic energy-delta fingerprint from REAL WAV decode (the
    * Shazam/Chromaprint family, radically simplified): the sample stream
    * is cut into `frames` equal slices (integer boundaries
    * `j = i*frames/n`), each slice's energy is the exact Int64 sum of
    * s², and bit j (j >= 1) of the fingerprint is set iff energy rose
    * from slice j-1 to slice j. Pure integer comparisons — engine-exact,
    * pitch- and length-normalized by construction (the frame grid scales
    * with the clip).
    *
    * Scale: scan-side mapPartitions decode — blobs never shuffle; one
    * (id, 2 longs) row per clip. */
  def wavFingerprint(media: DataFrame, frames: Int = 32): DataFrame = {
    require(frames >= 2 && frames <= 63, s"frames must fit a long, got $frames")
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseWavPcm16(bytes).map { case (_, samples) =>
          val n = samples.length
          val energy = new Array[Long](frames)
          var i = 0
          while (i < n) {
            val s = samples(i).toLong
            energy((i.toLong * frames / n).toInt) += s * s
            i += 1
          }
          var fp = 0L
          var j = 1
          while (j < frames) {
            if (energy(j) > energy(j - 1)) fp |= 1L << j
            j += 1
          }
          WavFingerprint(id, n.toLong, fp)
        }
      }
    }(Encoders.product[WavFingerprint]).toDF()
  }

  /** Shared banded-LSH Hamming pairing over any (media_id, <hash>)
    * frame — ONE implementation of the candidate discipline behind both
    * image (aHash) and audio (fingerprint) near-dup: explode to
    * (band, value) keys (constant fan-out), self-join, dedup the
    * candidate pairs, verify by exact bit_count. Kept LAZY (both join
    * sides re-derive the hash scan; decode is cheap scan-side work) —
    * callers that want one decode can persist the hash frame first. */
  private def bandedHashPairs(hashes: DataFrame, hashCol: String,
                              bands: Int, bandBits: Int,
                              maxHamming: Int): DataFrame = {
    val banded = hashes.select(col("media_id"), col(hashCol).as("__h"))
      .select(col("media_id"), col("__h"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"i -> struct(i AS band, shiftright(__h, i * $bandBits)" +
          s" & ${(1L << bandBits) - 1} AS v))")).as("b"))
      .select(col("media_id"), col("__h"), col("b.band"), col("b.v"))
    val a = banded.select(col("band"), col("v"),
      col("media_id").as("id_a"), col("__h").as("ha"))
    val b = banded.select(col("band"), col("v"),
      col("media_id").as("id_b"), col("__h").as("hb"))
    a.join(b, Seq("band", "v")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Audio near-duplicate pairs: banded fingerprint LSH + exact Hamming
    * verify (the [[bandedHashPairs]] discipline). */
  def wavNearDupPairs(media: DataFrame, frames: Int = 32, bands: Int = 4,
                      maxHamming: Int = 2): DataFrame = {
    require(frames % bands == 0, "bands must divide frames")
    bandedHashPairs(wavFingerprint(media, frames), "fp",
      bands, frames / bands, maxHamming)
  }

  final case class BmpAHash(media_id: Long, width: Int, height: Int, ahash: Long)

  /** Perceptual average-hash over decoded BMP pixels: the image is cut
    * into a `grid` x `grid` block lattice (integer boundaries
    * `bx = x*grid/w`), each block's summed grayscale (r+g+b, no division)
    * is compared against the image mean by exact CROSS-MULTIPLY
    * (`blockSum * nTotal > totalSum * nBlock` — no float, no rounding),
    * and the comparison bits pack into a `grid²`-bit hash. Identical
    * layouts hash equal; small content drift flips few bits — the
    * classic near-dup fingerprint for images, feeding the same banded-LSH
    * machinery the text dedup uses.
    *
    * Coordinates are IMAGE coordinates (bottom-up BMP rows mapped back),
    * so the hash is layout-stable and the oracle can replay it from the
    * synthesis formula without touching bytes.
    *
    * Scale: pure scan-side decode in mapPartitions — blobs never shuffle;
    * the output is one (id, 3 ints) row per image. */
  def bmpAHash(media: DataFrame, grid: Int = 4): DataFrame = {
    require(grid >= 2 && grid * grid <= 63, s"grid² must fit a long, got $grid")
    val src = media.select(col("media_id").cast("long"), col("blob"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) => ahashOf(bytes, grid).map {
        case (w, h, hash) => BmpAHash(id, w, h, hash)
      } }
    }(Encoders.product[BmpAHash]).toDF()
  }

  private def ahashOf(bytes: Array[Byte], grid: Int): Option[(Int, Int, Long)] =
    scala.util.Try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte)
      bb.getInt; bb.getShort; bb.getShort
      val pixelOffset = bb.getInt
      val hdrSize = bb.getInt
      require(hdrSize >= 40)
      val w = bb.getInt; val h = bb.getInt
      require(w > 0 && h > 0 && w <= 65536 && h <= 65536)
      // the cross-multiply below needs blockSum * nTotal <= 765 * n² to
      // fit Int64: cap pixels at 2^24 (765 * 2^48 ≈ 2.1e17 < 2^63)
      require(w.toLong * h <= (1L << 24),
        s"bmpAHash: image $w x $h exceeds the 16M-pixel exact-arithmetic bound")
      require(bb.getShort == 1 && bb.getShort == 24 && bb.getInt == 0)
      val stride = (w * 3 + 3) & ~3
      require(pixelOffset >= 54 && pixelOffset.toLong + stride.toLong * h <= bytes.length)
      val blockSum = new Array[Long](grid * grid)
      val blockCnt = new Array[Long](grid * grid)
      var totalSum = 0L
      var row = 0
      while (row < h) {
        val y = h - 1 - row // bottom-up: file row 0 is image row h-1
        val by = y * grid / h
        var p = pixelOffset + row * stride
        var x = 0
        while (x < w) {
          val gray = (bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) + (bytes(p + 2) & 0xFF)
          val b = by * grid + x * grid / w
          blockSum(b) += gray; blockCnt(b) += 1; totalSum += gray
          p += 3; x += 1
        }
        row += 1
      }
      val nTotal = w.toLong * h
      var hash = 0L
      var i = 0
      while (i < grid * grid) {
        if (blockSum(i) * nTotal > totalSum * blockCnt(i)) hash |= 1L << i
        i += 1
      }
      (w, h, hash)
    }.toOption

  /** Image near-duplicate pairs by banded aHash LSH: the `grid²`-bit
    * hash splits into `grid` bands of `grid` bits; images sharing any
    * band value become candidates, exact Hamming verifies (the
    * [[bandedHashPairs]] discipline). With a 16-bit hash the band space
    * is small and buckets run large — at a real corpus scale use grid=8
    * (64-bit hash, 8-bit bands) where buckets thin out exponentially. */
  def bmpNearDupPairs(media: DataFrame, grid: Int = 4,
                      maxHamming: Int = 2): DataFrame =
    bandedHashPairs(bmpAHash(media, grid), "ahash", grid, grid, maxHamming)

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

  /** Shot-boundary detection over a decoded frame-feature table
    * (`media_id, frame_idx, mean_gray` — [[mjpegFrameFeatures]]'s
    * shape): a cut is declared where the absolute luminance jump
    * between consecutive frames exceeds `threshold`, and `shot_id` is
    * the running cut count — the segment label a frame-sampling or
    * per-shot-dedup stage keys on.
    *
    * Scale: one window partitioned BY VIDEO and ordered by frame index
    * — partitions are single videos (bounded by frame count, uniform
    * hash keys), so the sort is per-video, never global. The luminance
    * means come out of the decode scan; nothing else shuffles. Frame 0
    * has no predecessor: null diff, never a boundary, shot 0. */
  def shotBoundaries(frames: DataFrame, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames.select(col("media_id"), col("frame_idx"), col("mean_gray"))
      .withColumn("diff",
        abs(col("mean_gray") - lag(col("mean_gray"), 1).over(w)))
      .withColumn("is_boundary",
        coalesce(col("diff") > lit(threshold), lit(false)))
      .withColumn("shot_id",
        sum(when(col("is_boundary"), 1L).otherwise(0L)).over(w))
      .drop("mean_gray")
  }
}
