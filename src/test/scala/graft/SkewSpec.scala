package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join / aggregation must be result-identical to the plain forms. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 1
  private lazy val skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) (i % 7).toLong else 1L, i.toLong)
  }.toDF("k", "v")

  private lazy val dim = (0 to 6).map(k => (k.toLong, s"name$k")).toDF("k", "name")

  test("saltedJoin equals plain join on skewed data") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin rejects right-preserving join types") {
    // right-side replication would emit unmatched right rows saltFactor
    // times under right/full outer — result-identity only holds for
    // left-preserving types, so those must be refused loudly
    for (jt <- Seq("right", "right_outer", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8, joinType = jt)
      }
      assert(e.getMessage.contains("left-preserving"))
    }
    // left outer still works and matches the plain join
    val plain = skewed.join(dim, Seq("k"), "left")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8, joinType = "left")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedAggregate equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(Long, Long, Long)].collect().sorted
    val salted = Skew.saltedAggregate(skewed, Seq("k"), saltFactor = 8,
      partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      merge = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .as[(Long, Long, Long)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
