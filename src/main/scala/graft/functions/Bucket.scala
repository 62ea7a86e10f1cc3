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
}
