package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multiset symmetric diff with a FINGERPRINT pre-pass — the changelog's
  * `after \ before` / `before \ after` without shuffling full rows.
  *
  * `exceptAll` hash-partitions WHOLE rows: on a wide schema (long text
  * columns, embedding arrays) the shuffle writes the entire touched-file
  * span twice even when two rows actually changed. The pre-pass shuffles
  * 12-byte fingerprints instead:
  *
  *  1. fingerprint every row on both sides (`xxhash64` + murmur3 `hash`
  *     over all columns — two independent codegen'd hash families,
  *     96 bits combined);
  *  2. `groupBy(fp).count()` each side — map-side partial aggregation
  *     means the shuffle carries one (fp, count) pair per DISTINCT row
  *     per map task, never the row bytes;
  *  3. keep fingerprints whose multiplicities DIFFER (full-outer join of
  *     the two count sides — changed-row volume, tiny);
  *  4. semi-join each side's wide rows against that set and run the
  *     EXACT `exceptAll` over the survivors only.
  *
  * Step 4 keeps the diff exact under single-side collisions: two
  * different rows sharing a fingerprint merely ride into the final
  * `exceptAll`, which compares real values. The one probabilistic case
  * is a CROSS-side collision with equal multiplicities (a removed row
  * and an added row hashing identically in both families) — birthday
  * bound ≈ n²/2⁹⁷, about 6e-10 at ten billion changed-span rows;
  * accepted and documented here (Iceberg's own changelog reads
  * net-diff via row hashes too).
  *
  * Inputs are re-read once more than plain `exceptAll` (counts + semi
  * join) — reads of columnar files scale linearly and prune nothing
  * here anyway, while the avoided full-row shuffle is the 100 TB
  * bottleneck. Types the hash functions reject (maps, and anything
  * containing them) fall back to plain `exceptAll`.
  */
object NetDiff {

  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _: VariantType => false
    case _ => true
  }

  /** (after \ before, before \ after), multiset semantics — exactly
    * `(after.exceptAll(before), before.exceptAll(after))` but with the
    * fingerprint-bounded shuffle above. Schemas must already align
    * (same columns, same order), as exceptAll requires.
    */
  def diff(before: DataFrame, after: DataFrame): (DataFrame, DataFrame) = {
    if (!before.schema.fields.forall(f => hashable(f.dataType)))
      return (after.exceptAll(before), before.exceptAll(after))
    val outCols = before.columns.toSeq
    val fp1 = "_graft_fp1"
    val fp2 = "_graft_fp2"
    def withFp(df: DataFrame): DataFrame = {
      val cs: Seq[Column] = df.columns.toSeq.map(col)
      df.withColumn(fp1, xxhash64(cs: _*)).withColumn(fp2, hash(cs: _*))
    }
    val bf = withFp(before)
    val af = withFp(after)
    def counts(df: DataFrame, as: String): DataFrame =
      df.groupBy(fp1, fp2).agg(count(lit(1)).as(as))
    val changed = counts(af, "ca")
      .join(counts(bf, "cb"), Seq(fp1, fp2), "full_outer")
      .filter(coalesce(col("ca"), lit(0L)) =!= coalesce(col("cb"), lit(0L)))
      .select(fp1, fp2)
    val insSide = af.join(changed, Seq(fp1, fp2), "left_semi")
      .select(outCols.map(col): _*)
    val delSide = bf.join(changed, Seq(fp1, fp2), "left_semi")
      .select(outCols.map(col): _*)
    (insSide.exceptAll(delSide), delSide.exceptAll(insSide))
  }
}
