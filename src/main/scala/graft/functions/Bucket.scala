package graft.functions

/** Iceberg-spec bucket transform over long keys: 32-bit Murmur3 of the
  * 8-byte little-endian value, masked positive, mod N
  * (reference: `iceberg_bucket_bigint` UDF registration,
  * src/data_ingestion/ingestion/dmsdatabase1.py:18-24; used for
  * partition-clustered writes :87-93; Iceberg spec Appendix B).
  *
  * We control both the writer and the reader, so self-consistency is what
  * matters (SURVEY.md §7.4); the algorithm below is the standard public
  * murmur3_x86_32 with seed 0.
  *
  * Static methods so Catalyst `StaticInvoke` can call them from generated
  * code — keeps bucket computation inside whole-stage codegen (no UDF
  * serialization, no boxing beyond the call).
  */
object Bucket {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** murmur3_x86_32(little-endian bytes of v, seed=0). */
  def murmur3Long(v: Long): Int = {
    var h = 0
    var k = (v & 0xffffffffL).toInt
    k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    k = (v >>> 32).toInt
    k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    h ^= 8 // length in bytes
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  def bucket(v: Long, n: Int): Int = (murmur3Long(v) & Int.MaxValue) % n

  /** murmur3_x86_32(data, seed=0) — the byte-input twin of
    * [[murmur3Long]], for the NON-integral bucket sources Iceberg's spec
    * defines (Appendix B): strings hash their UTF-8 bytes, decimals the
    * minimal two's-complement big-endian bytes of their unscaled value.
    */
  def murmur3Bytes(data: Array[Byte]): Int = {
    val len = data.length
    var h = 0
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val b = i * 4
      var k = (data(b) & 0xff) | ((data(b + 1) & 0xff) << 8) |
        ((data(b + 2) & 0xff) << 16) | ((data(b + 3) & 0xff) << 24)
      k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2
      h ^= k1
    }
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  def bucketBytes(data: Array[Byte], n: Int): Int =
    (murmur3Bytes(data) & Int.MaxValue) % n

  /** Codegen entry point for string sources (UTF8String carries the
    * UTF-8 bytes directly — no transcoding).
    */
  def bucketUtf8(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    bucketBytes(s.getBytes, n)

  /** Codegen entry point for decimal sources: Iceberg hashes the
    * unscaled value at the column's DECLARED scale as minimal
    * two's-complement big-endian bytes — exactly
    * `BigInteger.toByteArray`.
    */
  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, n: Int): Int =
    bucketBytes(d.toJavaBigDecimal.unscaledValue.toByteArray, n)
}
