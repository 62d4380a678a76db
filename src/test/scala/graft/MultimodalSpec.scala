package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing specs: schema, real codec decoders (WAV/BMP/PNG),
  * generic magic-byte dispatch, frame sampling reassembly. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "some text payload standing in for a decoded asset"),
    (2L, "another, longer text payload that stands in for a second binary asset!")
  ).toDF("doc_id", "text")

  test("media table schema: binary blob + typed metadata struct") {
    val m = Multimodal.toMediaTable(docs, "doc_id", "text")
    assert(m.schema("blob").dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("kind", "n_bytes", "width", "height", "sample_rate"))
    val r = m.select($"media_id", $"meta.n_bytes").as[(Long, Long)].collect().toMap
    assert(r(1L) == 49L)
  }

  test("generic decode dispatches by magic bytes; unknown blobs quarantine") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val m = Multimodal.synthesizeMixedMediaTable(ids, "doc_id")
      // a text blob (no known magic) must quarantine, not crash or emit
      .unionByName(Seq((99L, "not a media file".getBytes("UTF-8")))
        .toDF("media_id", "blob")
        .withColumn("meta", struct(lit("text").as("kind"),
          length($"blob").cast("long").as("n_bytes"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"))))
    val f = Multimodal.extractFeatures(m)
      .select($"media_id", $"kind").as[(Long, String)].collect().toMap
    assert(f == Map(0L -> "png", 1L -> "bmp", 2L -> "wav",
      3L -> "png", 4L -> "bmp", 5L -> "wav"), "dispatch by magic; 99 dropped")
    // repartition-invariance: decode is per-row, partitioning-free
    val a = Multimodal.extractFeatures(m).orderBy("media_id").collect().toSeq
    val b = Multimodal.extractFeatures(m.repartition(3)).orderBy("media_id")
      .collect().toSeq
    assert(a == b)
  }

  test("PNG decode: all five scanline filters reconstruct the exact pixels") {
    // h=6 rows -> filter types 0..4 all exercised (y % 5); PNG and BMP
    // share the pixel formula, so the CODECS must agree channel-for-
    // channel: a cross-codec equality that fails if any filter, the
    // inflate path, or the chunk walk is wrong
    val ids = (0L to 20L).toDF("doc_id")
    val png = Multimodal.decodePngFeatures(Multimodal.synthesizePngTable(ids, "doc_id"))
      .orderBy("media_id").collect().toSeq
    val bmp = Multimodal.decodeBmpFeatures(Multimodal.synthesizeBmpTable(ids, "doc_id"))
      .orderBy("media_id").collect().toSeq
    assert(png.size == 21 && png == bmp,
      "PNG decode must equal BMP decode of the same pixel formula")
  }

  test("PNG decode quarantines corrupt blobs: bad CRC, truncation, bad magic") {
    val good = Multimodal.synthesizePng(8, 6, 17)
    val badCrc = good.clone()
    badCrc(good.length - 5) = (badCrc(good.length - 5) ^ 0x7f).toByte // IEND CRC
    val badPixelCrc = good.clone()
    badPixelCrc(60) = (badPixelCrc(60) ^ 0x55).toByte // inside IHDR/IDAT region
    val truncated = good.take(good.length / 2)
    val badMagic = good.clone(); badMagic(0) = 0x42
    val m = Seq(1L -> good, 2L -> badCrc, 3L -> badPixelCrc,
        4L -> truncated, 5L -> badMagic)
      .toDF("media_id", "blob")
    val out = Multimodal.decodePngFeatures(m).select("media_id")
      .as[Long].collect().toSeq
    assert(out == Seq(1L), s"only the intact blob decodes, got $out")
  }

  test("frame sampling covers every byte exactly once") {
    val m = Multimodal.toMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(m, n = 4)
    val sums = frames.groupBy("media_id").agg(sum("frame_bytes").as("fb"))
      .as[(Long, Long)].collect().toMap
    val totals = m.select($"media_id", length($"blob").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(sums == totals, "frames reassemble to original byte length")
    assert(frames.filter($"media_id" === 1L).count() == 4)
  }

  test("WAV decode: real RIFF/PCM parse recovers known samples' features") {
    // handcrafted waveform: the sawtooth formula with id=1 parameters
    val blob = Multimodal.synthesizeWav(nSamples = 4, freq = 4)
    // expected samples: ((i*4*997) % 16000) * 4 - 32000 for i=0..3
    val expected = (0 until 4).map(i => ((i.toLong * 4 * 997) % 16000) * 4 - 32000)
    val media = Seq((7L, blob)).toDF("media_id", "blob")
    val f = Multimodal.decodeWavFeatures(media).collect().head
    assert(f.getAs[Int]("sample_rate") == 16000)
    assert(f.getAs[Long]("n_samples") == 4L)
    val rms = math.sqrt(expected.map(s => s * s).sum.toDouble / 4)
    assert(math.abs(f.getAs[Double]("rms") - rms) < 1e-9)
    assert(f.getAs[Long]("peak") == expected.map(math.abs).max)
    val zcr = expected.sliding(2).count(p => p.head * p.last < 0)
    assert(f.getAs[Long]("zcr") == zcr.toLong)
  }

  test("WAV decode: corrupt blobs are quarantined, valid ones survive") {
    val good = Multimodal.synthesizeWav(nSamples = 100, freq = 5)
    val truncated = good.take(30)              // cut inside the header
    val wrongMagic = good.clone(); wrongMagic(0) = 'X'.toByte
    val media = Seq((1L, good), (2L, truncated), (3L, wrongMagic))
      .toDF("media_id", "blob")
    val out = Multimodal.decodeWavFeatures(media)
      .select("media_id").as[Long].collect().toSet
    assert(out == Set(1L), "only the well-formed blob decodes")
  }

  test("WAV decode: odd-length chunks are pad-skipped per RIFF spec") {
    // fmt + an odd-length LIST chunk (3 bytes + 1 pad) + data: a
    // standards-compliant layout real encoders produce
    val samples = Array[Short](100, -200, 300)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + 8 + 4 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(bb.capacity() - 8)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(16000); bb.putInt(32000)
    bb.putShort(2); bb.putShort(16)
    bb.put("LIST".getBytes("US-ASCII")); bb.putInt(3)   // odd chunk length
    bb.put(Array[Byte]('a', 'b', 'c', 0))               // 3 bytes + pad
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    val media = Seq((5L, bb.array())).toDF("media_id", "blob")
    val f = Multimodal.decodeWavFeatures(media).collect()
    assert(f.length == 1, "odd-chunk WAV decodes, not quarantined")
    assert(f.head.getAs[Long]("n_samples") == 3L)
    assert(f.head.getAs[Long]("peak") == 300L)
  }

  test("WAV synthesis table: ids drive duration and frequency deterministically") {
    val ids = Seq(10L, 11L).toDF("doc_id")
    val m = Multimodal.synthesizeWavTable(ids, "doc_id")
    val meta = m.select($"media_id", $"meta.kind", $"meta.sample_rate", $"meta.n_bytes")
      .as[(Long, String, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(meta(10L)._2 == "audio" && meta(10L)._3 == 16000)
    // id 10 -> n = 800 + 0*160 = 800 samples -> 44 + 1600 bytes
    assert(meta(10L)._4 == 44L + 1600L)
    assert(meta(11L)._4 == 44L + (800 + 160) * 2L)
  }

  test("BMP decode: real header + padded-row parse recovers channel means") {
    // 2x2, seed 0: pixels r=(x*7+y*13)%256 g=(x*11+y*3)%256 b=(x*5+y*17)%256
    // (x,y) in {0,1}^2 -> r: 0,7,13,20 g: 0,11,3,14 b: 0,5,17,22
    val blob = Multimodal.synthesizeBmp(width = 2, height = 2, seed = 0)
    val media = Seq((1L, blob)).toDF("media_id", "blob")
    val r = Multimodal.decodeBmpFeatures(media)
      .select("width", "height", "mean_r", "mean_g", "mean_b")
      .as[(Int, Int, Double, Double, Double)].head()
    assert(r == ((2, 2, 10.0, 7.0, 11.0)))
    // width 5 forces a non-trivial stride pad (15 bytes -> 16): the pad
    // bytes must not leak into the means
    val padded = Multimodal.synthesizeBmp(width = 5, height = 1, seed = 0)
    val p = Multimodal.decodeBmpFeatures(Seq((2L, padded)).toDF("media_id", "blob"))
      .select("mean_r").as[Double].head()
    assert(p == (0 + 7 + 14 + 21 + 28) / 5.0)
  }

  test("BMP decode: corrupt blobs are quarantined, valid ones survive") {
    val good = Multimodal.synthesizeBmp(4, 3, 9)
    val truncated = good.take(40)
    val wrongMagic = good.clone(); wrongMagic(0) = 'X'.toByte
    val eightBpp = good.clone(); eightBpp(28) = 8.toByte // bpp field
    val media = Seq((1L, good), (2L, truncated), (3L, wrongMagic), (4L, eightBpp))
      .toDF("media_id", "blob")
    val out = Multimodal.decodeBmpFeatures(media)
      .select("media_id").as[Long].collect().toSet
    assert(out == Set(1L), "only the well-formed 24bpp blob decodes")
  }

  test("image aHash: layout-stable, identical blobs pair at hamming 0") {
    // same (w, h, seed) -> identical image -> identical hash; a different
    // seed shifts the gradient -> some bits flip
    val twinA = Multimodal.synthesizeBmp(12, 9, 40)
    val twinB = Multimodal.synthesizeBmp(12, 9, 40)
    val other = Multimodal.synthesizeBmp(12, 9, 200)
    val corrupt = "nope".getBytes
    val media = Seq((1L, twinA), (2L, twinB), (3L, other), (4L, corrupt))
      .toDF("media_id", "blob")
    val hashes = Multimodal.bmpAHash(media, grid = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L), "corrupt blob quarantined")
    assert(hashes(1L) == hashes(2L), "identical images hash equal")
    val pairs = Multimodal.bmpNearDupPairs(media, grid = 4, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "twin pair found through the bands")
    assert(!pairs.contains((1L, 3L)) || hashes(1L) == hashes(3L))
  }

  test("audio fingerprint: identical clips pair, corrupt blobs quarantined") {
    val twinA = Multimodal.synthesizeWav(1600, 5)
    val twinB = Multimodal.synthesizeWav(1600, 5)
    val other = Multimodal.synthesizeWav(1600, 9)
    val media = Seq((1L, twinA), (2L, twinB), (3L, other),
      (4L, "not a wav".getBytes)).toDF("media_id", "blob")
    val fps = Multimodal.wavFingerprint(media, frames = 32).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fps.keySet == Set(1L, 2L, 3L), "corrupt blob quarantined")
    assert(fps(1L) == fps(2L), "identical clips fingerprint equal")
    val pairs = Multimodal.wavNearDupPairs(media, frames = 32, bands = 4,
      maxHamming = 0).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "twin pair found through the bands")
  }

  test("AVI container walk: real RIFF parse indexes frames, offsets match layout arithmetic") {
    import graft.multimodal.Multimodal
    val ids = Seq(0L, 1L, 7L, 42L).toDF("id")
    val idx = Multimodal.aviFrameIndex(Multimodal.synthesizeAviTable(ids, "id"))
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    ids.as[Long].collect().foreach { id =>
      val frames = idx(id)
      assert(frames.length == (4 + id % 5).toInt, s"frame count for $id")
      // offsets replay as pure arithmetic: header 224 + 8 per chunk header
      var expectOff = 224L + 8L
      frames.foreach { case (_, k, off, sz, key) =>
        assert(sz == 2L * (100 + ((id * 31 + k * 7) % 120)), s"size $id/$k")
        assert(off == expectOff, s"offset $id/$k")
        assert(key == (k % 4 == 0), s"keyframe flag $id/$k")
        expectOff += sz + 8L
      }
      // the indexed ranges really address SOI..EOI payloads in the blob
      val blob = Multimodal.synthesizeAvi(id)
      frames.foreach { case (_, _, off, sz, _) =>
        assert((blob(off.toInt) & 0xFF) == 0xFF && (blob(off.toInt + 1) & 0xFF) == 0xD8)
        assert((blob(off.toInt + sz.toInt - 1) & 0xFF) == 0xD9)
      }
    }

    // corrupt container (truncated) and lying idx1 both quarantine
    val good = Multimodal.synthesizeAvi(3L)
    val truncated = good.take(good.length - 10)
    val lying = good.clone()
    // idx1's first entry size field is the last 4 bytes of its 16-byte
    // record; flip a bit there
    lying(lying.length - 16 * (4 + 3 % 5).toInt + 12) = 99.toByte
    val mixed = Seq((3L, good), (4L, truncated), (5L, lying)).toDF("media_id", "blob")
    val survived = Multimodal.aviFrameIndex(mixed)
      .select("media_id").distinct().as[Long].collect().toSet
    assert(survived == Set(3L), "corrupt/lying containers are dropped whole")
  }

  test("mjpeg decode: baseline JPEG round-trips the block formula; corrupt frame quarantined") {
    import graft.multimodal.Multimodal
    val ids = Seq(0L, 1L, 7L, 42L).toDF("id")
    val media = Multimodal.synthesizeAviTable(ids, "id")
    val out = Multimodal.mjpegFrameFeatures(media)
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect()
    val byId = out.groupBy(_._1)
    ids.as[Long].collect().foreach { id =>
      val frames = byId(id)
      assert(frames.length == (4 + id % 5).toInt, s"all frames decode for $id")
      frames.foreach { case (_, k, w, h, mean, mn, mx) =>
        assert(w == 16 && h == 16)
        // decoded pixels must EQUAL the synthesis formula (the DC-only
        // round trip is integer-exact): mean/min/max over the 4 blocks
        val vals = for (by <- 0 to 1; bx <- 0 to 1)
          yield (id * 31 + k * 17 + bx * 7 + by * 13) % 256
        assert(mean == vals.sum.toDouble / 4, s"mean $id/$k")
        assert(mn == vals.min && mx == vals.max, s"min/max $id/$k")
      }
    }
    // corrupt one frame's SOI: that frame is quarantined, siblings decode
    val good = Multimodal.synthesizeAvi(3L)
    val offs = Multimodal.aviFrameIndex(Seq((3L, good)).toDF("media_id", "blob"))
      .orderBy($"frame_idx").select($"offset").as[Long].collect()
    val corrupted = good.clone()
    corrupted(offs(1).toInt + 1) = 0x00 // frame 1's D8 -> 00
    val mixed = Seq((3L, good), (9L, corrupted)).toDF("media_id", "blob")
    val counts = Multimodal.mjpegFrameFeatures(mixed)
      .groupBy($"media_id").count().as[(Long, Long)].collect().toMap
    assert(counts(3L) == 7L, "intact container decodes all frames")
    assert(counts(9L) == 6L, "exactly the corrupted frame is dropped")
  }

  test("goertzel dominant frequency: aliased fundamentals found, corrupt clips quarantined") {
    import graft.multimodal.Multimodal
    // ids 6 and 7 give freq 9 and 10: fundamentals 8973/9970 Hz fold to
    // 7027/6030 — the aliasing path must detect the folded bin
    val ids = Seq(0L, 3L, 6L, 7L).toDF("id")
    val cands = (3 to 10).map { f =>
      val hz = f * 997; if (hz <= 8000) hz else 16000 - hz
    }
    val media = Multimodal.synthesizeWavTable(ids, "id")
    val out = Multimodal.dominantFrequency(media, cands)
      .select($"media_id", $"detected_hz").as[(Long, Long)].collect().toMap
    def expect(id: Long): Long = {
      val hz = (3 + id % 8) * 997; if (hz <= 8000) hz else 16000 - hz
    }
    Seq(0L, 3L, 6L, 7L).foreach(id =>
      assert(out(id) == expect(id), s"clip $id: ${out(id)} vs ${expect(id)}"))
    // quarantine: a truncated blob drops, the intact sibling survives
    val good = Multimodal.synthesizeWav(800, 5)
    val bad = good.take(50)
    val mixed = Seq((1L, good), (2L, bad)).toDF("media_id", "blob")
    val survived = Multimodal.dominantFrequency(mixed, cands)
      .select($"media_id").as[Long].collect().toSet
    assert(survived == Set(1L))
  }

  test("resize stub rewrites metadata without touching the blob") {
    val m = Multimodal.toMediaTable(docs, "doc_id", "text")
    val r = Multimodal.resizeStub(m, 224, 224)
    val row = r.filter($"media_id" === 1L)
      .select($"meta.width", $"meta.height", $"processing").collect().head
    assert(row.getInt(0) == 224 && row.getInt(1) == 224)
    assert(row.getString(2) == "resize_stub")
    assert(r.select(md5($"blob")).as[String].collect().toSet ==
      m.select(md5($"blob")).as[String].collect().toSet)
  }
}
