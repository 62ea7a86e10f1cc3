package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys. AQE's skew-join splitting covers
  * sort-merge joins at runtime; these are the explicit forms for the cases
  * AQE can't rewrite — broadcast-ineligible skewed equi-joins and
  * holistic (non-algebraic) aggregations — and they make the salting
  * factor an auditable parameter instead of a runtime heuristic.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Salted equi-join: the (large, skewed) left side gets a deterministic
    * salt in [0, saltFactor); the right side is replicated saltFactor
    * times. The join key becomes (keys..., salt), so one hot key spreads
    * over saltFactor reducers. Results are identical to the unsalted join;
    * cost is replicating the right side, so keep it for small-to-medium
    * right relations that exceed the broadcast threshold.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // Right-side replication is only result-identical for left-preserving
    // join types; a right/full outer join would emit each unmatched right
    // row saltFactor times.
    val leftPreserving = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti", "cross")
    require(leftPreserving.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports left-preserving join types only, got '$joinType'")
    // salt derives from the whole left row hash — uniform, deterministic
    val salted = left.withColumn(SaltCol,
      pmod(hash(left.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Two-phase salted aggregation for algebraic aggregates over skewed
    * keys: phase 1 aggregates on (keys, salt), phase 2 merges partials on
    * keys. `partial` computes the per-salt partials; `merge` combines
    * them. Example: count → (count, sum).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFactor: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    df.withColumn(SaltCol, pmod(hash(df.columns.map(col).toSeq: _*), lit(saltFactor)))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
