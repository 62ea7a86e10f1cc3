package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaCodec, Multimodal}

/** Real media metadata decode (r12 verdict #3): header sniffers against
  * both ImageIO-encoded round-trips and hand-built golden bytes, plus
  * the row-level unknown outcome for foreign payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ImageIO round-trip: all four JDK formats decode to the fixture " +
      "dimensions with 3 channels") {
    for (id <- Seq(0L, 1L, 17L, 63L, 12345L);
         (wfmt, sniffed) <- Seq("png" -> "png", "jpg" -> "jpeg",
           "gif" -> "gif", "bmp" -> "bmp")) {
      val bytes = Multimodal.imageBytes(id, wfmt)
      val got = MediaCodec.sniffImage(bytes)
      assert(got.contains(MediaCodec.ImageInfo(sniffed,
        Multimodal.fixtureWidth(id), Multimodal.fixtureHeight(id), 3)),
        s"id=$id fmt=$wfmt got $got")
    }
  }

  test("audioEnergy: windowed Σs² matches a direct PCM walk, partial " +
      "last window, foreign payload marker row") {
    val id = 4242L
    val n = (1000 + id % 9000).toInt // 5242 → 52 full + 1 partial @100
    val media = Seq(
        Multimodal.MediaRecord(id, Multimodal.wavBytes(id)),
        Multimodal.MediaRecord(7L, "not audio at all".getBytes("UTF-8")))
      .toDF("id", "payload")
    val got = Multimodal.audioEnergy(spark, media, windowSamples = 100)
      .collect().map(w => (w.id, w.window_idx) -> w).toMap
    // direct reference walk over the generator formula
    def s(i: Int): Long = (((id + i) * 2654435761L) & 0xFFFF).toShort.toLong
    val nWin = (n + 99) / 100
    assert(got.size == nWin + 1)
    for (w <- 0 until nWin) {
      val lo = w * 100; val hi = math.min(n, lo + 100)
      val exp = (lo until hi).map(i => s(i) * s(i)).sum
      val g = got((id, w.toLong))
      assert(g.n_window_samples == hi - lo && g.energy == exp,
        s"window $w")
    }
    assert(got((id, nWin - 1L)).n_window_samples == n % 100,
      "last window is partial")
    assert(got((7L, -1L)) ==
      Multimodal.AudioWindow(7L, -1L, 0L, 0L),
      "foreign payload emits the single marker row")
  }

  test("golden bytes: PNG color types, progressive JPEG, GIF87a, " +
      "top-down BMP") {
    def be32(v: Long) = Array[Byte](
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    // PNG: signature + IHDR with width 513 / height 70000 (BE32 > one
    // byte in both dims) per color type
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val b = pngSig ++ be32(13) ++ "IHDR".getBytes ++
        be32(513) ++ be32(70000) ++
        Array[Byte](8, ct.toByte, 0, 0, 0) ++ be32(0)
      assert(MediaCodec.sniffImage(b)
        .contains(MediaCodec.ImageInfo("png", 513, 70000, ch)),
        s"color type $ct")
    }
    // JPEG: SOI, APP0 (skipped via its length), then PROGRESSIVE SOF2
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 4, 0, 0) ++ // APP0 len 4
      Array[Byte](0xFF.toByte, 0xC2.toByte, 0, 11, 8) ++   // SOF2 len 11
      Array[Byte](1, 64, 2, 0) ++ // height 320, width 512
      Array[Byte](3, 0, 0, 0, 0, 0, 0)
    assert(MediaCodec.sniffImage(jpeg)
      .contains(MediaCodec.ImageInfo("jpeg", 512, 320, 3)))
    // DHT (0xC4) before SOF must NOT be mistaken for a frame header
    val jpegDht = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      Array[Byte](0xFF.toByte, 0xC4.toByte, 0, 4, 0, 0) ++
      Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 11, 8) ++
      Array[Byte](0, 100, 0, 50) ++ Array[Byte](1, 0, 0, 0, 0, 0, 0)
    assert(MediaCodec.sniffImage(jpegDht)
      .contains(MediaCodec.ImageInfo("jpeg", 50, 100, 1)))
    // GIF87a, width 700 (LE16: 0xBC 0x02), height 3
    val gif = "GIF87a".getBytes ++
      Array[Byte](0xBC.toByte, 0x02, 3, 0) ++ Array[Byte](0, 0, 0, 0)
    assert(MediaCodec.sniffImage(gif)
      .contains(MediaCodec.ImageInfo("gif", 700, 3, 3)))
    // BMP with NEGATIVE height (top-down) and 32-bit pixels
    val bmp = new java.io.ByteArrayOutputStream()
    val bb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bb.putInt(40).putInt(33).putInt(-21).putShort(1).putShort(32)
    bmp.write(bb.array())
    assert(MediaCodec.sniffImage(bmp.toByteArray)
      .contains(MediaCodec.ImageInfo("bmp", 33, 21, 4)))
  }

  test("WAV: round-trip, foreign chunks, odd-size padding, truncated " +
      "data declaration") {
    for (id <- Seq(0L, 7L, 8999L, 9000L)) {
      val got = MediaCodec.sniffWav(Multimodal.wavBytes(id))
      val n = 1000 + id % 9000
      assert(got.contains(MediaCodec.AudioInfo("wav", 1, 16000, 16, n)),
        s"id=$id got $got")
    }
    // a LIST chunk with an ODD size precedes fmt — the walk must skip
    // it word-aligned; the data chunk declares MORE than is present
    // (streaming writer): the truth is the bytes on hand
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 8 + 16 + 8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(0).put("WAVE".getBytes)
    bb.put("LIST".getBytes).putInt(3).put(Array[Byte](1, 2, 3, 0)) // pad
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(176400)
      .putShort(4).putShort(16)
    bb.put("data".getBytes).putInt(1000).put(Array[Byte](0, 0, 0, 0, 0, 0))
    val got = MediaCodec.sniffWav(bb.array())
    assert(got.contains(MediaCodec.AudioInfo("wav", 2, 44100, 16, 1L)),
      s"got $got — 6 present bytes / block 4 = 1 frame")
  }

  test("foreign and truncated payloads land on the row-level unknown " +
      "outcome, never a task failure") {
    val junk = Seq(
      "plain text, not media".getBytes,
      Array[Byte](),
      Array[Byte](0x89.toByte, 0x50), // truncated PNG signature
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte), // truncated JPEG
      "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "AVI ".getBytes,
      null)
    junk.foreach { b =>
      assert(MediaCodec.sniffImage(b).isEmpty)
      assert(MediaCodec.sniffWav(b).isEmpty)
    }
    val df = Seq((1L, "not an image".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodeImages(spark, df).collect()
    assert(out.length == 1 && out.head.format == "unknown" &&
      out.head.width == 0)
    // HOSTILE payloads must terminate, not hang or throw (review r13):
    // a RIFF chunk whose u32 size truncates to a negative Int made the
    // walk advance by zero (infinite loop) or drive the index negative
    val evil = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
    evil.put("JUNK".getBytes).putInt(0xFFFFFFF8)
    assert(MediaCodec.sniffWav(evil.array()).isEmpty)
    val evil2 = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil2.put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
    evil2.put("JUNK".getBytes).putInt(0x80000010)
    assert(MediaCodec.sniffWav(evil2.array()).isEmpty)
    // BMP height 0x80000000: abs(Int.MinValue) stays negative — None,
    // never a negative-dimension ImageInfo
    val bb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bb.putInt(40).putInt(10).putInt(Int.MinValue).putShort(1).putShort(24)
    assert(MediaCodec.sniffImage(bb.array()).isEmpty)
  }

  test("end-to-end DataFrame plumbing: encode partition-parallel, " +
      "decode back, frame-sample and resize algebra") {
    val docs = (0L to 49L).toDF("doc_id")
    val media = Multimodal.withImagePayload(spark, docs, "doc_id",
      id => if (id % 2 == 0) "png" else "bmp")
    val metas = Multimodal.decodeImages(spark, media).toDF().cache()
    assert(metas.count() == 50)
    assert(metas.filter(col("format") === "unknown").count() == 0)
    metas.collect().foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Int]("width") == Multimodal.fixtureWidth(id))
      assert(r.getAs[Int]("height") == Multimodal.fixtureHeight(id))
    }
    val frames = Multimodal.sampleFrames(metas, step = 24)
    frames.groupBy("id").agg(max("frame_idx").as("mx"),
        first("n_frames").as("nf")).collect().foreach { r =>
      assert(r.getAs[Int]("mx") <= r.getAs[Int]("nf") - 1)
    }
    val resized = Multimodal.resize(metas, 2).collect()
    resized.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Int]("out_width") == Multimodal.fixtureWidth(id) / 2)
    }
    val wavs = Multimodal.decodeAudio(spark,
      Multimodal.withAudioPayload(spark, docs, "doc_id")).collect()
    assert(wavs.forall(a => a.sample_rate == 16000 &&
      a.n_samples == 1000 + a.id % 9000 &&
      a.n_bytes == 44 + 2 * a.n_samples &&
      a.duration_us == a.n_samples * 1000000L / 16000))
  }
}
