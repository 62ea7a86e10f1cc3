package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.6): image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The decode step is REAL since r13: [[MediaCodec]] parses actual
  * container headers (PNG/JPEG/GIF/BMP, RIFF/WAVE) by pure byte
  * inspection — no external codec dependency. Fixtures are generated
  * in-query from deterministic id-derived dimensions via
  * `javax.imageio` (the JDK ships PNG/JPEG/GIF/BMP writers) and a
  * hand-built canonical WAV header, so a SQL oracle can state the
  * expected decode output from the id arithmetic alone without being
  * able to produce the bytes. The Spark-side shape is what matters at
  * 100 TB: decode runs once per partition iterator (amortized setup,
  * the Scala analogue of `mapInPandas` batches), media bytes never
  * leave the executor, and all downstream ops see only the narrow
  * typed metadata.
  */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every write through
  // a plain OutputStream creates + deletes a temp FILE. The encodes
  // here are tiny per-row fixtures on the executor hot path — keep the
  // cache in memory (JVM-global; reads benefit identically)
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRecord(id: Long, payload: Array[Byte])
  final case class ImageMeta(id: Long, n_bytes: Long, width: Int, height: Int,
                             channels: Int, format: String)
  final case class AudioMeta(id: Long, n_bytes: Long, channels: Int,
                             sample_rate: Int, bits_per_sample: Int,
                             n_samples: Long, duration_us: Long)

  // ---- deterministic fixture generation (id → real container bytes) ----

  /** Fixture dimensions derive from the id ALONE so DuckDB can predict
    * the decode output: width = 1 + id mod 64, height = 1 + 7·id mod 48.
    */
  def fixtureWidth(id: Long): Int = (1 + math.floorMod(id, 64)).toInt
  def fixtureHeight(id: Long): Int = (1 + math.floorMod(id * 7, 48)).toInt

  /** Real image bytes in the requested ImageIO format ("png", "jpg",
    * "gif", "bmp") with deterministic id-seeded pixels. Always RGB-ish
    * content: every JDK writer of these four preserves the canvas
    * dimensions, which is all the metadata contract needs.
    */
  def imageBytes(id: Long, fmt: String): Array[Byte] = {
    val w = fixtureWidth(id); val h = fixtureHeight(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((id + x * 31 + y * 17) * 2654435761L)
          & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos),
      s"no ImageIO writer for format '$fmt'")
    bos.toByteArray
  }

  /** Canonical 44-byte-header WAV: PCM s16le mono 16 kHz,
    * `1000 + id mod 9000` sample frames of deterministic content —
    * n_bytes is therefore `44 + 2·n_samples`, fully id-predictable.
    */
  def wavBytes(id: Long): Array[Byte] = {
    val nSamples = (1000 + math.floorMod(id, 9000)).toInt
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(16000)
      .putInt(32000) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      bb.putShort((((id + i) * 2654435761L) & 0xFFFF).toShort)
      i += 1
    }
    bb.array()
  }

  /** Attach a REAL image payload column: per row, encode a
    * deterministic id-dimensioned image in `fmt` (or, when `fmt` is
    * null-ish per the `fmtFor` cycle, the caller's choice). Encoding
    * happens partition-parallel in one `mapPartitions` pass — the
    * write-side twin of the decode batching.
    */
  def withImagePayload(spark: SparkSession, df: DataFrame, idCol: String,
                       fmtFor: Long => String): DataFrame = {
    import spark.implicits._
    // per-row codec work is CPU-heavy: spread off single-split sources
    // (the shingling/hashing rule) or every encode runs on one core
    Dedup.spread(df.select(col(idCol).cast("long").as("id"))).as[Long]
      .mapPartitions(_.map(id => MediaRecord(id, imageBytes(id, fmtFor(id)))))
      .toDF()
  }

  /** Attach a real WAV payload column. */
  def withAudioPayload(spark: SparkSession, df: DataFrame,
                       idCol: String): DataFrame = {
    import spark.implicits._
    Dedup.spread(df.select(col(idCol).cast("long").as("id"))).as[Long]
      .mapPartitions(_.map(id => MediaRecord(id, wavBytes(id))))
      .toDF()
  }

  /** Partition-batched header decode: one pass per partition iterator,
    * the Dataset equivalent of a Pandas-UDF batch loop. Unrecognized
    * payloads yield `(0, 0, 0, "unknown")` — a row-level outcome, never
    * a task failure.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val n = if (r.payload == null) 0L else r.payload.length.toLong
        MediaCodec.sniffImage(r.payload) match {
          case Some(m) => ImageMeta(r.id, n, m.width, m.height, m.channels,
            m.format)
          case None => ImageMeta(r.id, n, 0, 0, 0, "unknown")
        }
      }
    }
  }

  /** Partition-batched WAV decode; duration in integer microseconds
    * (`n_samples·1e6 DIV rate`) — exact in any engine, unlike a
    * float division-then-round.
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val n = if (r.payload == null) 0L else r.payload.length.toLong
        MediaCodec.sniffWav(r.payload) match {
          case Some(a) => AudioMeta(r.id, n, a.channels, a.sampleRate,
            a.bitsPerSample, a.nSamples,
            a.nSamples * 1000000L / a.sampleRate)
          case None => AudioMeta(r.id, n, 0, 0, 0, 0L, 0L)
        }
      }
    }
  }

  final case class AudioWindow(id: Long, window_idx: Long,
                               n_window_samples: Long, energy: Long)

  /** Windowed audio ENERGY over the real PCM payload (the first
    * feature a speech pipeline extracts — VAD thresholds, loudness
    * normalization, silence trimming all start from per-window power):
    * mono 16-bit PCM splits into fixed `windowSamples`-sample windows
    * and each window emits Σ s² as an exact integer (|s| < 2^15 and
    * windows < 2^18 samples keep the sum < 2^48 — never a float, so
    * any engine replays it bit-for-bit). The last window is partial
    * and reports its own sample count. Decode runs once per partition
    * iterator like [[decodeAudio]]; payloads that are not mono 16-bit
    * PCM WAV emit ONE `window_idx = -1` marker row — the row-level
    * 'unknown' rule, never a task failure.
    */
  def audioEnergy(spark: SparkSession, media: DataFrame,
                  windowSamples: Int): Dataset[AudioWindow] = {
    require(windowSamples >= 1 && windowSamples < (1 << 18),
      s"windowSamples must be in [1, 2^18), got $windowSamples")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.sniffWavPcm(r.payload) match {
          case Some((a, off))
              if a.channels == 1 && a.bitsPerSample == 16 &&
                a.nSamples > 0 =>
            val n = a.nSamples.toInt
            val nWin = (n + windowSamples - 1) / windowSamples
            (0 until nWin).iterator.map { w =>
              val lo = w * windowSamples
              val hi = math.min(n, lo + windowSamples)
              var acc = 0L
              var i = lo
              while (i < hi) {
                val b0 = r.payload(off + 2 * i) & 0xFF
                val s = ((r.payload(off + 2 * i + 1) << 8) | b0).toShort
                acc += s.toLong * s.toLong
                i += 1
              }
              AudioWindow(r.id, w.toLong, (hi - lo).toLong, acc)
            }
          case _ => Iterator.single(AudioWindow(r.id, -1L, 0L, 0L))
        }
      }
    }
  }

  /** Video frame sampling: every `step`-th frame index, exploded to one
    * row per sampled frame. The fixture corpus has no video container,
    * so the frame count is a DOCUMENTED stand-in derived from the real
    * decoded dimensions (`w·h mod 240 + 1`); with a container parser
    * only the `n_frames` expression changes — the explode shape is the
    * operator.
    */
  def sampleFrames(images: DataFrame, step: Int): DataFrame =
    images.withColumn("n_frames",
        ((col("width").cast("long") * col("height")) % 240 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))))
      .select(col("id"), col("n_frames"), col("frame_idx"))

  /** Resize planning on decoded metadata: halve dimensions, recompute
    * the raw-buffer byte estimate.
    */
  def resize(images: DataFrame, factor: Int): DataFrame =
    images.select(col("id"),
      (col("width") / factor).cast("int").as("out_width"),
      (col("height") / factor).cast("int").as("out_height"),
      (col("width") / factor).cast("int").cast("long")
        * (col("height") / factor).cast("int").cast("long")
        * col("channels").cast("long") as "out_bytes")
}
