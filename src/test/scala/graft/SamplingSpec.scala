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
}
