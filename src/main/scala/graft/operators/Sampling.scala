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

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much its hashed n-gram feature profile looks like
    * a TARGET slice, then flag the top `selectPerMille`‰ for selection.
    *
    * Features are unigrams ∪ bigrams of the normalized word stream
    * (lowercase, non-alphanumerics → space — the [[TextAnalysis]] gram
    * normalization), hashed into `nBuckets` buckets via the md5-prefix
    * hash ([[permKey]]'s rationale: identical in any engine, unlike
    * `hash()`/`xxhash64`). Bucket weight = the add-one-smoothed
    * probability RATIO `p_target(b) / p_raw(b)` quantized to integer
    * micro-units, and a document's score is the integer dot product
    * `Σ_b count_doc(b) · w_e6(b)` — every step a correctly-rounded
    * IEEE op (count ratios, one divide, ×1e6, +0.5, floor), so both
    * engines produce bit-identical integers and the sum is
    * order-independent. (The original DSIR sums LOG ratios; the
    * linear-ratio variant keeps the same "which buckets does the
    * target over-represent" signal while staying bit-reproducible —
    * libm `log` ulps differ across engines. Documented deviation.)
    *
    * Scale shape: the tokenize/explode stage is the hot path
    * (spread off single-split sources); the bucket-weight table is
    * ≤ `nBuckets` rows and BROADCASTS into the per-doc dot product, so
    * scoring is one gram-keyed partial agg + a map-side join — no
    * all-pairs, no driver state. The selection flag is a TWO-PASS
    * EXACT THRESHOLD (r12 verdict #2 — the previous corpus-wide
    * `row_number` window moved one row per document through a single
    * task): [[kthValueLong]] finds the k-th largest score in a bounded
    * number of histogram passes, ties at the boundary score admit by
    * ascending id via a second bounded rank inside the boundary rows
    * only, and the flag itself is a map-side comparison. Same selected
    * set as `ORDER BY score DESC, id` row-numbering (ids must be
    * unique integrals — they are document keys). No plan node of the
    * operator is a partitionless window (PlanShapeSpec pins it).
    *
    * Returns one row per document: `(idCol, dsir_score, selected)`;
    * documents with no features score 0.
    */
  def dsirImportance(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, nBuckets: Int = 1024,
                     selectPerMille: Int = 200): DataFrame = {
    require(nBuckets > 0 && selectPerMille >= 0 && selectPerMille <= 1000,
      s"bad dsir params: nBuckets=$nBuckets, perMille=$selectPerMille")
    // the boundary tie-cut ranks ids through kthValueLong's long cast:
    // a non-integral id would cast to NULL and silently vanish from
    // the rank histogram — refuse at planning like TopKByScoreAgg's
    // requireIntegralId (review r13; the replaced window ordered any
    // type, this path deliberately trades that for boundedness)
    docs.schema.fields.find(_.name.equalsIgnoreCase(idCol))
      .map(_.dataType).foreach {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => ()
        case t => throw new IllegalArgumentException(
          s"dsirImportance needs an integral id column for the bounded " +
            s"selection rank; '$idCol' is $t")
      }
    val words = Dedup.spread(docs).select(col(idCol), isTarget.as("__t"),
      filter(split(trim(regexp_replace(lower(col(textCol)),
        "[^a-z0-9]+", " ")), " "), x => x =!= "").as("w"))
    // ONE tokenize pass (the lmScore precedent): unigrams and bigrams
    // explode from a single normalized word array — a union of two
    // explodes would re-run the regex/split stage once per leg. The
    // size guard keeps sequence() off the [1,0] descending trap.
    // Cached: the feature stream feeds BOTH the bucket census and the
    // per-doc counts (callers' Verify/Bench clear per-query caches).
    val fb = words.select(col(idCol), col("__t"), explode(
        concat(col("w"),
          when(size(col("w")) >= 2,
            transform(sequence(lit(1), size(col("w")) - 1),
              i => array_join(slice(col("w"), i, lit(2)), " ")))
            .otherwise(array().cast("array<string>")))).as("g"))
      .select(col(idCol), col("__t"),
        (conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
          % nBuckets).as("b"))
      .cache()
    // bucket census: raw ⊇ target, so every occurring bucket has a row.
    // The two census totals ride in on a broadcast one-row cross join
    // (NOT a partitionless window — the arithmetic is bit-identical,
    // the plan shape is map-side)
    val bc = fb.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct"))
    val totals = bc.agg(sum(col("ct")).as("__tct"), sum(col("cr")).as("__tcr"))
    val w8 = bc.crossJoin(broadcast(totals)).select(col("b"),
      floor(((col("ct") + lit(1.0)) /
          (col("__tct") + lit(nBuckets.toLong))) /
        ((col("cr") + lit(1.0)) /
          (col("__tcr") + lit(nBuckets.toLong))) *
        lit(1000000.0) + lit(0.5)).cast("long").as("wgt"))
    val db = fb.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n"))
    val scored = db.join(broadcast(w8), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("n") * col("wgt")).as("__score"))
    val withScore = docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__score"), lit(0L)).as("dsir_score"))
      .cache()
    // k = floor(n·‰/1000) — identical to the old `rn·1000 ≤ n·‰` rule
    val n = withScore.count()
    val k = n * selectPerMille / 1000
    val selectedCol =
      if (k <= 0) lit(false)
      else if (k >= n) lit(true)
      else {
        val (s, above) = kthValueLong(withScore, "dsir_score", k,
          largest = true)
        val tAdmit = k - above // boundary-score ties taken, smallest ids
        val boundary = withScore.filter(col("dsir_score") === lit(s))
        val ties = boundary.count()
        if (tAdmit <= 0) col("dsir_score") > lit(s)
        else if (tAdmit >= ties) col("dsir_score") >= lit(s)
        else {
          val (idCut, _) = kthValueLong(boundary, idCol, tAdmit,
            largest = false)
          col("dsir_score") > lit(s) ||
            (col("dsir_score") === lit(s) &&
              col(idCol).cast("long") <= lit(idCut))
        }
      }
    withScore.withColumn("selected", selectedCol)
  }

  /** Exact k-th largest (or smallest) value of a long column, plus the
    * count of rows strictly ORDERED BEFORE it, without a global sort:
    * iterative histogram refinement — each pass buckets the candidate
    * value range into ≤ 2^20 slots (one distributed aggregate, ≤ 2^20
    * driver rows), the driver walks the tiny histogram to the bucket
    * containing rank k and recurses into it. A 64-bit value domain
    * resolves in ≤ 4 passes; the final pass histograms exact values.
    * This is the scale-safe replacement for a corpus-wide
    * `row_number()` window (one row per document through ONE task —
    * the r12 verdict's flagged shape) and the same histogram-threshold
    * idea [[stratifiedSampleExact]] uses per stratum, generalized to
    * the full long range.
    */
  private[graft] def kthValueLong(df0: DataFrame, c: String, k: Long,
                                  largest: Boolean): (Long, Long) = {
    require(k >= 1, s"rank must be positive, got $k")
    val df = df0.select(col(c).cast("long").as("__v"))
    val mm = df.agg(min(col("__v")).as("mn"), max(col("__v")).as("mx")).head()
    require(!mm.isNullAt(0), "kthValueLong on an empty input")
    var lo = mm.getLong(0)
    var hi = mm.getLong(1)
    // (hi − lo) must fit a signed long so bucket arithmetic stays exact;
    // real score/id domains are non-negative and never approach it
    require(BigInt(hi) - BigInt(lo) < BigInt(Long.MaxValue),
      s"value span [$lo, $hi] exceeds the supported range")
    val ord = if (largest) Ordering.Long.reverse else Ordering.Long
    val MaxB = 1L << 20
    var rank = k    // 1-based rank within [lo, hi], in `ord` order
    var before = 0L // rows strictly ordered before the [lo, hi] range
    while (true) {
      val nVals = hi - lo + 1 // no overflow per the require above
      if (nVals >= 1 && nVals <= MaxB) {
        val hist = df.filter(col("__v") >= lit(lo) && col("__v") <= lit(hi))
          .groupBy(col("__v")).agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1)(ord)
        var cum = 0L
        hist.foreach { case (v, cnt) =>
          if (cum + cnt >= rank) return (v, before + cum)
          cum += cnt
        }
        throw new IllegalStateException(
          s"rank $rank exceeds the ${cum} rows in [$lo, $hi]")
      }
      val w = ((BigInt(nVals) + MaxB - 1) / MaxB).toLong
      val hist = df.filter(col("__v") >= lit(lo) && col("__v") <= lit(hi))
        .select(expr(s"CAST((__v - ${lo}L) DIV ${w}L AS LONG)").as("__bk"))
        .groupBy(col("__bk")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)(ord)
      // explicit loop, not collectFirst-with-a-side-effecting-guard: the
      // accumulator must advance exactly once per element, which an
      // isDefinedAt-then-apply evaluation path would silently break
      // (ADVICE r13)
      var cum = 0L
      var bk = -1L
      var bi = 0
      while (bk < 0 && bi < hist.length) {
        val (b, cnt) = hist(bi)
        if (cum + cnt >= rank) bk = b else cum += cnt
        bi += 1
      }
      if (bk < 0) throw new IllegalStateException(
        s"rank $rank exceeds the ${cum} rows in [$lo, $hi]")
      before += cum
      rank -= cum
      // lo + bk·w ≤ hi always (bk·w ≤ span); only the bucket's UPPER
      // edge can overflow when the domain reaches near Long.MaxValue —
      // in that case hi is already the tighter bound (review r13)
      lo = lo + bk * w
      hi = if (lo > Long.MaxValue - (w - 1)) hi
           else math.min(hi, lo + (w - 1))
    }
    throw new IllegalStateException("unreachable")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a token `budget` across strata so every
    * stratum gets an EQUAL share, except strata too small to absorb it
    * without exceeding `maxEpochs` repetitions — those are capped at
    * `maxEpochs × total_tokens` and their leftover re-spreads over the
    * rest. Deterministic integer closed form instead of UniMax's
    * real-valued iterative waterfill: with strata ascending by cap
    * `c_i` (rank i of k, prefix sum S_i), the capped set is provably a
    * prefix, and stratum i is capped iff
    * `c_i·(k−i+1) + S_{i−1} ≤ budget`; the p capped strata take their
    * caps and each uncapped stratum takes `(budget − S_p) DIV (k−p)`
    * (floor — up to k−p−1 tokens of the budget stay unassigned,
    * deterministic, never over). If the budget exceeds every cap, all
    * strata cap and the remainder is unallocated by design.
    *
    * Input: one row per document with its stratum and token count.
    * Output: one row per stratum —
    * `(stratum, total_tokens, cap_tokens, allocated_tokens, epochs_e6)`
    * where `epochs_e6 = allocated·1e6 DIV total` (integer micro-units).
    * The per-stratum table is tiny BY CONSTRUCTION (one row per
    * language/source), so the rank window is driver-cheap at any
    * corpus scale; the heavy part — per-doc token counts — arrives
    * pre-aggregated map-side.
    */
  def unimaxAllocation(docs: DataFrame, stratumCol: String,
                       tokensCol: String, budget: Long,
                       maxEpochs: Int): DataFrame = {
    require(budget >= 0 && maxEpochs >= 1,
      s"bad unimax params: budget=$budget, maxEpochs=$maxEpochs")
    val totals = docs.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).as("total_tokens"))
      .withColumn("cap_tokens", col("total_tokens") * lit(maxEpochs.toLong))
    val asc = Window.orderBy(col("cap_tokens"), col(stratumCol))
    val all = Window.partitionBy()
    val ranked = totals
      .withColumn("__i", row_number().over(asc))
      .withColumn("__k", count(lit(1)).over(all))
      .withColumn("__s_prev",
        coalesce(sum(col("cap_tokens")).over(
          asc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__capped",
        col("cap_tokens") * (col("__k") - col("__i") + 1) +
          col("__s_prev") <= lit(budget))
    val shared = ranked
      .withColumn("__p", sum(when(col("__capped"), 1L).otherwise(0L))
        .over(all))
      .withColumn("__s_p", sum(when(col("__capped"), col("cap_tokens"))
        .otherwise(lit(0L))).over(all))
    shared.select(col(stratumCol), col("total_tokens"), col("cap_tokens"),
      when(col("__capped"), col("cap_tokens"))
        .otherwise(expr(s"($budget - __s_p) DIV (__k - __p)"))
        .as("allocated_tokens"))
      .withColumn("epochs_e6",
        when(col("total_tokens") > 0,
          expr("allocated_tokens * 1000000 DIV total_tokens"))
          .otherwise(lit(0L)))
  }

  /** TOKEN-BUDGET EXECUTION: select documents per stratum, in
    * deterministic id order, until the stratum's token budget is spent —
    * the doc-granularity EXECUTOR of a mixture plan
    * ([[unimaxAllocation]] decides how many tokens each stratum GETS;
    * this picks the documents that spend them). A document is admitted
    * while the tokens taken BEFORE it are under the budget, so the
    * crossing document rides whole (budgets are targets, not hard caps —
    * truncating mid-document would corrupt it; the overshoot is bounded
    * by one document).
    *
    * SCALE SHAPE (r13 verdict #2 — the previous per-stratum cumulative
    * window moved EVERY document of a stratum through ONE task; strata
    * are languages, so at 100 TB that is terabytes per core): the
    * cumulative sum is a TWO-LEVEL distributed prefix sum, the
    * [[stratifiedSampleExact]] histogram discipline weighted by tokens:
    *
    *  1. bucket the id domain into ≤ 65 536 ranges and aggregate
    *     `sum(n_tokens)` per (stratum, bucket) — one map-side partial
    *     aggregate, ≤ strata × 65 536 driver rows (the [[kthValueLong]]
    *     driver bound);
    *  2. the DRIVER computes each bucket's token offset (tokens in
    *     earlier buckets of its stratum) from the tiny histogram — no
    *     stratum-partitioned plan window anywhere (PlanShapeSpec pins
    *     the q150 plan);
    *  3. buckets whose offset already meets the budget are PRUNED
    *     before any sort — the broadcast-joined offset table only
    *     carries buckets that can still admit — and surviving rows get
    *     `taken_before = bucket offset + within-bucket prefix` via a
    *     window partitioned by (stratum, bucket): ~1/65 536 of a
    *     stratum per task, embarrassingly parallel.
    *
    * Ids must be unique INTEGRALS per stratum (document keys are) —
    * the range bucketing needs integer id arithmetic, the same trade
    * [[dsirImportance]] documents. `budgets` is
    * `(stratumCol, allocated_tokens)` — exactly [[unimaxAllocation]]'s
    * output shape; strata absent from it are excluded. Output
    * `(stratum, id, n_tokens, taken_before)` — bit-identical to the
    * single-window formulation (integer sums are order-independent).
    */
  def tokenBudgetSample(docs: DataFrame, stratumCol: String, idCol: String,
                        textCol: String, budgets: DataFrame): DataFrame = {
    docs.schema.fields.find(_.name.equalsIgnoreCase(idCol))
      .map(_.dataType).foreach {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => ()
        case t => throw new IllegalArgumentException(
          s"tokenBudgetSample needs an integral id column for the " +
            s"bucketed prefix sum; '$idCol' is $t")
      }
    // ONE tokenize pass: the projection feeds both the bucket histogram
    // and the final read (callers' Verify/Bench clear per-query caches)
    val toks = docs.select(col(stratumCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .cache()
    val mm = toks.agg(min(col(idCol).cast("long")).as("mn"),
      max(col(idCol).cast("long")).as("mx")).head()
    // a NULL min means every id is null (or no rows): lo=hi=0 keeps the
    // arithmetic total — null ids themselves route to bucket -1 below
    val (lo, hi) =
      if (mm.isNullAt(0)) (0L, 0L) else (mm.getLong(0), mm.getLong(1))
    require(BigInt(hi) - BigInt(lo) < BigInt(Long.MaxValue),
      s"id span [$lo, $hi] exceeds the supported range")
    val nB = 65536L
    val w = ((BigInt(hi) - BigInt(lo) + nB) / nB).toLong // ceil(span/nB)
    // NULL ids take bucket -1: it sorts before every real bucket and
    // the within-bucket ORDER BY puts nulls first — exactly where the
    // replaced window's ascending nulls-first order admitted them
    // (review r14: a bare cast would null the histogram key and crash
    // the driver walk)
    val bkt = expr(s"COALESCE(CAST((CAST(`${idCol}` AS LONG) - ${lo}L) " +
      s"DIV ${w}L AS LONG), -1L)")
    // driver-bounded histogram: ≤ strata × 65 536 non-empty buckets
    val hist = toks.groupBy(col(stratumCol).as("__s"), bkt.as("__b"))
      .agg(sum(col("n_tokens")).as("__tw"))
      .collect()
    val offsets = hist
      .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .iterator.flatMap { case (s, rows) =>
        var cum = 0L
        rows.sortBy(_._2).map { case (_, b, tw) =>
          val before = cum; cum += tw; (s, b, before)
        }
      }.toSeq
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sType = toks.schema.fields
      .find(_.name.equalsIgnoreCase(stratumCol)).get.dataType
    val offDf = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsets.map { case (s, b, o) =>
        Row(s, b, o) }: _*),
      StructType(Seq(StructField(stratumCol, sType),
        StructField("__b", LongType), StructField("__off", LongType))))
    // budget prune BEFORE the per-bucket sort: a bucket whose offset
    // already meets its stratum's budget can admit nothing — the inner
    // join drops it (and strata absent from `budgets`, matching the old
    // inner-join semantics)
    val liveBuckets = offDf
      .join(budgets.select(col(stratumCol), col("allocated_tokens")),
        Seq(stratumCol))
      .filter(col("__off") < col("allocated_tokens"))
    val wB = Window.partitionBy(col(stratumCol), col("__b"))
      .orderBy(col(idCol))
    toks.withColumn("__b", bkt)
      .join(broadcast(liveBuckets), Seq(stratumCol, "__b"))
      .withColumn("taken_before", col("__off") + coalesce(
        sum(col("n_tokens"))
          .over(wB.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("taken_before") < col("allocated_tokens"))
      .select(col(stratumCol), col(idCol), col("n_tokens"),
        col("taken_before"))
  }
}
