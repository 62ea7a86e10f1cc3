package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixture construction:
  * exact-count stratified selection and temperature (α) re-weighting
  * across strata (languages, sources, quality buckets).
  *
  * Everything is driven by a DETERMINISTIC pseudo-random permutation of
  * the id column, so a sample is reproducible across runs, engines and
  * cluster layouts — the property a training pipeline needs for
  * resumable dataset builds (and what lets the driver's DuckDB oracle
  * recompute the exact same sample).
  */
object Sampling {

  /** Deterministic pseudo-random permutation key: the Knuth
    * multiplicative hash `(id mod 2^31) · 2654435761 mod 2^32`
    * (2654435761 = ⌊2^32/φ⌋, the golden-ratio multiplier). Sequential
    * ids scatter uniformly; the arithmetic stays inside a signed 64-bit
    * product (max 2^31·2654435761 < 2^63) so it evaluates identically
    * in any engine with 64-bit integer math — unlike xxhash64, which
    * only Spark computes. Swap in `xxhash64` for corpora whose ids
    * exceed 2^31 distinct values per stratum and don't need cross-engine
    * reproducibility.
    */
  def permKey(id: Column): Column =
    (id % lit(2147483648L)) * lit(2654435761L) % lit(4294967296L)

  /** Exact-count stratified sample: per stratum, the `quota` rows with
    * the smallest `(permKey(id), id)` — EXACTLY the rows
    * `row_number() OVER (PARTITION BY stratum ORDER BY key, id) <= quota`
    * would select, computed WITHOUT ranking whole strata. A plain window
    * funnels each stratum through one task — a 100 TB corpus with a
    * dozen languages means a dozen tasks sorting terabytes. Instead:
    *
    *  1. histogram: count rows per (stratum, key-bucket) where
    *     bucket = key >> 16 — at most 65 536 buckets per stratum, an
    *     aggregate over a two-column projection (map-side partial);
    *  2. a cumulative sum over the TINY histogram finds each stratum's
    *     boundary bucket (where the running count crosses the quota)
    *     and how many rows of it are still needed;
    *  3. rows in buckets BELOW the boundary pass outright (map-side
    *     broadcast-join filter); only the boundary bucket's rows —
    *     ~1/65536 of the stratum — are ranked to take the remainder.
    *
    * Strata smaller than their quota are taken whole. Ties in the key
    * break by id, so the selection is total and deterministic.
    *
    * @param quotas one row per stratum: (`stratumCol`, `quota`); strata
    *   absent from `quotas` are excluded from the sample
    */
  def stratifiedSampleExact(df: DataFrame, idCol: String, stratumCol: String,
                            quotas: DataFrame): DataFrame = {
    val q = quotas.select(col(stratumCol),
      col("quota").cast("long").as("__quota"))
    val keyed = df.withColumn("__key", permKey(col(idCol)))
      .withColumn("__b", (col("__key") / lit(65536L)).cast("long"))
    val hist = keyed.groupBy(col(stratumCol), col("__b")).count()
    val w = Window.partitionBy(stratumCol).orderBy(col("__b"))
    val cum = hist.withColumn("__cum", sum(col("count")).over(w))
      .withColumn("__before", col("__cum") - col("count"))
      .join(q, stratumCol)
    // boundary bucket: first bucket where the running count reaches the
    // quota; a stratum with total < quota has none (taken whole)
    val boundary = cum.filter(col("__cum") >= col("__quota"))
      .groupBy(col(stratumCol))
      .agg(min(struct(col("__b"), col("__before"))).as("__bnd"))
      .select(col(stratumCol), col("__bnd.__b").as("__bb"),
        col("__bnd.__before").as("__taken"))
      .join(q, stratumCol)
      .withColumn("__need", col("__quota") - col("__taken"))
      .select(stratumCol, "__bb", "__need")
    // the histogram/boundary relations hold at most strata × 65536 and
    // strata rows — always broadcastable
    val joined = keyed.join(broadcast(boundary), Seq(stratumCol), "left")
      // inner-join semantics on the quota list: drop unlisted strata
      .join(broadcast(q.select(stratumCol)), Seq(stratumCol))
    val below = joined
      .filter(col("__bb").isNull || col("__b") < col("__bb"))
    val wB = Window.partitionBy(stratumCol)
      .orderBy(col("__key"), col(idCol))
    val atBoundary = joined.filter(col("__b") === col("__bb"))
      .withColumn("__rn", row_number().over(wB))
      .filter(col("__rn") <= col("__need"))
      .drop("__rn")
    below.unionByName(atBoundary)
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Temperature (α) mixture quotas: stratum i gets
    * `floor(totalN · count_i^α / Σ_j count_j^α)` rows, capped at its
    * size — α = 1 reproduces the corpus mix, α = 0 flattens to uniform,
    * the usual α ∈ (0, 1) up-weights low-resource strata (the
    * multilingual-LM sampling rule). Feed the result to
    * [[stratifiedSampleExact]]. The allocation floors, so up to
    * (#strata − 1) of `totalN` goes unassigned — deterministic, never
    * over-quota.
    */
  def temperatureQuotas(df: DataFrame, stratumCol: String, alpha: Double,
                        totalN: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val weighted = counts.withColumn("__w", pow(col("__n"), lit(alpha)))
    val total = weighted.agg(sum(col("__w"))).head.getDouble(0)
    weighted.select(col(stratumCol),
      least(col("__n"),
        floor(lit(totalN) * col("__w") / lit(total)).cast("long"))
        .as("quota"))
  }
}
