package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair every left row whose `ts` falls in
  * `[start, end]` of a right-side interval. Spark has no native range
  * join — an inequality-only join plans as BroadcastNestedLoopJoin,
  * O(|L|·|R|) regardless of selectivity — so this is the bucketized
  * formulation every scale engine uses:
  *
  *  - choose a bucket width W;
  *  - each left point maps to ONE bucket (`floor(epoch/W)`);
  *  - each right interval EXPLODES to the buckets it covers
  *    (`ceil(len/W)+1` rows — intervals are assumed ≪ corpus span, so
  *    this is a small constant);
  *  - equi-join on the bucket id (hash shuffle, AQE-skew-splittable),
  *    then filter the exact containment predicate.
  *
  * Each (point, interval) pair meets in exactly one bucket — the point's
  * — so no post-join dedup is needed. Candidate volume is
  * |L| + Σ interval_len/W instead of |L|·|R|; W tunes the explosion
  * factor against bucket selectivity. Additional equi-keys (e.g. a user
  * id) can simply be part of `extraKeys`.
  */
object RangeJoin {

  private val BucketCol = "__graft_range_bucket"

  /** @param left      rows with a point column `tsCol` (TimestampType)
    * @param right     rows with `[startCol, endCol]` TimestampType bounds
    * @param bucketSeconds bucket width; pick ≳ the typical interval length
    * @param extraKeys equi-keys required to match in addition to containment
    */
  def pointInInterval(left: DataFrame, right: DataFrame, tsCol: String,
                      startCol: String, endCol: String,
                      bucketSeconds: Long,
                      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val l = left.withColumn(BucketCol,
      floor(unix_micros(col(tsCol)) / (bucketSeconds * 1000000L)))
    val r = right.withColumn(BucketCol,
      explode(sequence(
        floor(unix_micros(col(startCol)) / (bucketSeconds * 1000000L)),
        floor(unix_micros(col(endCol)) / (bucketSeconds * 1000000L)))))
    l.join(r, extraKeys :+ BucketCol)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(BucketCol)
  }
}
