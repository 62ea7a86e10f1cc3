package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.6): image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The decode step is STUBBED with a deterministic fake (this container has
  * no image/audio codecs): [[FakeCodec]] derives plausible metadata from
  * the byte stream alone. The Spark-side plumbing — binary schema,
  * mapPartitions batching, partition-parallel decode, frame-sample
  * explode — is real and is what matters at 100 TB: decode runs once per
  * partition iterator (amortized setup, the Scala analogue of
  * `mapInPandas` batches), media bytes never leave the executor, and all
  * downstream ops see only the narrow typed metadata.
  */
object Multimodal {

  final case class MediaRecord(id: Long, payload: Array[Byte])
  final case class ImageMeta(id: Long, n_bytes: Long, width: Int, height: Int,
                             channels: Int, format: String)

  /** STUB decode — deterministic fake standing in for a real image codec.
    * A production build replaces `decodeImage` with the actual decoder;
    * everything around it (batching, schema, partitioning) is unchanged.
    */
  object FakeCodec {
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
      val n = bytes.length.toLong
      ImageMeta(id, n,
        width = 64 + (n % 512).toInt,
        height = 64 + ((n * 7) % 512).toInt,
        channels = 3, format = "fake/rgb8")
    }
  }

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * the testdata has no real media; the schema/partition shape is what is
    * exercised).
    */
  def withBinaryPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      encode(col(srcCol), "UTF-8").as("payload"))

  /** Partition-batched decode: one codec "session" per partition iterator,
    * the Dataset equivalent of a Pandas-UDF batch loop.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec init would go here (amortized, like mapInPandas)
      it.map(r => FakeCodec.decodeImage(r.id, r.payload))
    }
  }

  /** Video frame sampling: every `step`-th frame index of an (n_bytes-
    * derived) fake frame count, exploded to one row per sampled frame.
    * With a real container parser only `n_frames` changes.
    */
  def sampleFrames(images: DataFrame, step: Int): DataFrame =
    images.withColumn("n_frames", (col("n_bytes") % 240 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))))
      .select(col("id"), col("n_frames"), col("frame_idx"))

  /** Audio feature stub: sample count / duration from byte length (fake
    * 16 kHz mono s16le).
    */
  def audioMeta(media: DataFrame): DataFrame =
    media.select(col("id"), length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("n_samples", expr("n_bytes DIV 2"))
      .withColumn("duration_s",
        round(col("n_samples").cast("double") / 16000.0, 6))

  /** Resize stub: halve dimensions, recompute byte estimate. */
  def resize(images: DataFrame, factor: Int): DataFrame =
    images.select(col("id"),
      (col("width") / factor).cast("int").as("out_width"),
      (col("height") / factor).cast("int").as("out_height"),
      (col("width") / factor).cast("int").cast("long")
        * (col("height") / factor).cast("int").cast("long")
        * col("channels").cast("long") as "out_bytes")
}
