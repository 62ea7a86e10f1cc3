package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, attach the value columns of the LATEST
  * right row with the same keys and `right.ts <= left.ts` (backward
  * as-of, inclusive — the semantics of DuckDB's `ASOF JOIN` and kdb's
  * `aj`, which Spark lacks natively).
  *
  * Implemented with the union trick, NOT a range join: tag both sides,
  * union them, and within each key partition order by (ts, side) with
  * right rows first at equal timestamps; a `last(struct, ignoreNulls)`
  * running window carries the most recent right row's values onto each
  * left row (one struct per right row, so simultaneously-null value
  * fields never mix values from different right rows). Cost is ONE
  * shuffle on the keys and a linear scan per partition — no quadratic
  * key×key candidate explosion, no range-join blow-up, and skewed keys
  * parallelize exactly as well as any window over the same keys. This is
  * the formulation that survives 100 TB; a broadcast-range-join variant
  * only helps when the right side is tiny.
  *
  * The right side must be unique per (keys, tsCol); callers dedup first
  * (e.g. keep the highest-priority row per timestamp) so the carried
  * value is well-defined — matching the determinism DuckDB's ASOF gets
  * from its sort.
  */
object AsOfJoin {

  private val SideCol = "__graft_asof_side"
  private val ValCol = "__graft_asof_vals"

  /** @param left      probe rows; all columns preserved
    * @param right     reference rows, unique per (keys, tsCol)
    * @param keys      equi-join keys
    * @param tsCol     ordering column name (present on both sides)
    * @param valueCols right columns to carry onto left rows (null when no
    *                  right row precedes the left row)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(right.columns.contains),
      s"right side must contain value columns $valueCols")
    require(valueCols.forall(c => !leftCols.contains(c)),
      s"value columns $valueCols collide with left columns")
    val valStruct = struct(valueCols.map(col): _*)
    val valType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val l = left.select(
      leftCols.map(col) :+ lit(null).cast(valType).as(ValCol) :+
        lit(1).as(SideCol): _*)
    val r = right.select(
      leftCols.map(c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        valStruct.as(ValCol) :+ lit(0).as(SideCol): _*)
    // right rows sort BEFORE left rows at the same timestamp → inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn(ValCol, last(col(ValCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$ValCol.$c").as(c)): _*)
  }
}
