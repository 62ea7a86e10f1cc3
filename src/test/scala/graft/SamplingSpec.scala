package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic stratified / temperature sampling: the histogram
  * threshold selection must equal a whole-stratum ranking window
  * exactly, and the α allocation must hold its contract bounds.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSampleExact equals the whole-stratum ranking window") {
    // strata of very different sizes, ids scattered, one stratum under
    // its quota (taken whole), one exactly at it
    val rows =
      (1 to 5000).map(i => (i.toLong * 7 + 3, "big")) ++
      (1 to 40).map(i => (100000L + i * 13, "small")) ++
      (1 to 70).map(i => (200000L + i * 11, "exact"))
    val df = rows.toDF("id", "g")
    val quotas = Seq(("big", 900L), ("small", 70L), ("exact", 70L))
      .toDF("g", "quota")

    val got = Sampling.stratifiedSampleExact(df, "id", "g", quotas)
      .select("id", "g").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet

    val w = Window.partitionBy("g")
      .orderBy(Sampling.permKey(col("id")), col("id"))
    val want = df
      .join(quotas, "g")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("quota"))
      .select("id", "g").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet

    assert(got == want)
    assert(got.count(_._2 == "big") == 900)
    assert(got.count(_._2 == "small") == 40, "under-quota stratum whole")
    assert(got.count(_._2 == "exact") == 70)

    // strata missing from the quota list are excluded entirely
    val partial = Sampling.stratifiedSampleExact(df, "id", "g",
      Seq(("big", 10L)).toDF("g", "quota"))
    assert(partial.select("g").distinct().collect().map(_.getString(0))
      .toSeq == Seq("big"))
    assert(partial.count() == 10)

    // zero quota selects nothing; determinism across invocations
    assert(Sampling.stratifiedSampleExact(df, "id", "g",
      Seq(("big", 0L)).toDF("g", "quota")).count() == 0)
    val again = Sampling.stratifiedSampleExact(df, "id", "g", quotas)
      .select("id", "g").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(again == got)
  }

  test("kthValueLong: exact rank threshold in bounded histogram passes " +
      "(both directions, ties, wide value range)") {
    // values deliberately WIDER than one 2^20 bucket level so the
    // recursion actually descends, with heavy ties
    val rnd = new scala.util.Random(42)
    val vals = (1 to 4000).map(_ =>
      (rnd.nextInt(50) match {
        case x if x < 10 => 7L                    // tie block
        case x if x < 20 => 1L << 40              // high tie block
        case _ => rnd.nextLong() % (1L << 44)     // scattered, ± range
      }))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val sortedDesc = vals.sorted(Ordering.Long.reverse)
    val sortedAsc = vals.sorted
    for (k <- Seq(1L, 2L, 37L, 400L, 3999L, 4000L)) {
      val (dv, dAbove) = Sampling.kthValueLong(df, "v", k, largest = true)
      assert(dv == sortedDesc((k - 1).toInt), s"desc value at k=$k")
      assert(dAbove == sortedDesc.count(_ > dv), s"desc above-count at k=$k")
      val (av, aBelow) = Sampling.kthValueLong(df, "v", k, largest = false)
      assert(av == sortedAsc((k - 1).toInt), s"asc value at k=$k")
      assert(aBelow == sortedAsc.count(_ < av), s"asc below-count at k=$k")
    }
    // degenerate: all values identical
    val one = (1 to 10).map(i => (i.toLong, 5L)).toDF("id", "v")
    assert(Sampling.kthValueLong(one, "v", 4, largest = true) == (5L, 0L))
  }

  test("dsirImportance selection equals the ranking-window reference, " +
      "boundary ties resolved by ascending id") {
    // duplicate texts force SCORE TIES so the boundary id-cut path runs
    val docs = (1 to 300).map { i =>
      val txt = i % 5 match {
        case 0 => "the quick brown fox jumps"
        case 1 => "der schnelle braune fuchs"
        case 2 => "the quick brown fox jumps"   // tie with case 0
        case 3 => "completely different words here"
        case _ => "the lazy dog sleeps"
      }
      (i.toLong, txt, if (i % 3 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val got = Sampling.dsirImportance(docs, "doc_id", "text",
      isTarget = col("lang") === "en", nBuckets = 64, selectPerMille = 333)
    val byId = got.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(byId.size == 300)
    // reference: the exact global ranking the operator must reproduce
    val scores = byId.toSeq.map { case (id, (s, _)) => (id, s) }
    val wantSel = scores.sortBy { case (id, s) => (-s, id) }
      .take(300 * 333 / 1000).map(_._1).toSet
    assert(wantSel.size == 99)
    byId.foreach { case (id, (_, sel)) =>
      assert(sel == wantSel(id), s"doc $id selected=$sel want=${wantSel(id)}")
    }
    // boundary must actually have been tied (else the fixture is weak)
    val cut = scores.sortBy { case (id, s) => (-s, id) }.apply(98)._2
    assert(scores.count(_._2 == cut) > 1,
      "fixture must exercise the tied-boundary id cut")
  }

  test("temperatureQuotas: α contract (caps, floors, direction)") {
    val df = (1 to 1600).map(i => (i.toLong,
      if (i <= 1000) "big" else if (i <= 1500) "mid" else "small"))
      .toDF("id", "g")

    def q(alpha: Double, n: Long): Map[String, Long] =
      Sampling.temperatureQuotas(df, "g", alpha, n).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    // α = 1 reproduces the corpus proportions (up to flooring)
    val prop = q(1.0, 160)
    assert(prop("big") == 100 && prop("mid") == 50 && prop("small") == 10)
    // floors: never exceeds totalN
    assert(q(0.5, 160).values.sum <= 160)
    // α < 1 shifts share from big to small strata
    val cool = q(0.5, 160)
    assert(cool("big") < prop("big") && cool("small") > prop("small"))
    // α = 0 is uniform
    val uni = q(0.0, 30)
    assert(uni.values.toSet == Set(10L))
    // per-stratum cap: quota never exceeds the stratum size
    val over = q(0.0, 10000)
    assert(over("small") <= 100)
  }

  test("tokenBudgetSample: greedy per-stratum admission, crossing doc rides") {
    import spark.implicits._
    // stratum a: docs of 4 tokens each, budget 10 → docs 1,2 admitted
    // (taken_before 0, 4) and doc 3 ADMITTED TOO (taken_before 8 < 10 —
    // the crossing doc rides whole); doc 4 rejected (12 >= 10).
    // stratum b: budget 0 → nothing, not even the first doc.
    val docs = Seq(
      (1L, "a", "w w w w"), (2L, "a", "w w w w"),
      (3L, "a", "w w w w"), (4L, "a", "w w w w"),
      (5L, "b", "x x")
    ).toDF("doc_id", "lang", "text")
    val budgets = Seq(("a", 10L), ("b", 0L))
      .toDF("lang", "allocated_tokens")
    val out = graft.operators.Sampling
      .tokenBudgetSample(docs, "lang", "doc_id", "text", budgets)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 4L, 0L), (2L, 4L, 4L), (3L, 4L, 8L)),
      s"got $out")
  }

  test("tokenBudgetSample: NULL ids admit first (the window's " +
      "nulls-first order), never crash the histogram walk") {
    import spark.implicits._
    // review r14: a bare cast nulled the bucket key and the driver's
    // getLong threw; null ids must ride bucket -1 instead — admitted
    // ahead of every real id, exactly where ORDER BY id ASC put them
    val docs = Seq(
      (Option.empty[Long], "a", "w w w"),   // 3 tokens, admitted first
      (Option(1L), "a", "w w w w"),         // taken_before 3
      (Option(2L), "a", "w w w w")          // taken_before 7 >= 6: out
    ).toDF("doc_id", "lang", "text")
    val budgets = Seq(("a", 6L)).toDF("lang", "allocated_tokens")
    val out = graft.operators.Sampling
      .tokenBudgetSample(docs, "lang", "doc_id", "text", budgets)
      .collect()
      .map(r => (if (r.isNullAt(1)) -99L else r.getLong(1), r.getLong(3)))
      .toSet
    assert(out == Set((-99L, 0L), (1L, 3L)), s"got $out")
  }
}
