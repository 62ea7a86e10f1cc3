package graft

import org.apache.spark.sql.functions._

import graft.core.{IngestFlags, SourceConfig}
import graft.merge.ChangeSet
import graft.operators.Similarity

/** Structural plan pins — the properties the 100 TB design leans on,
  * asserted against the OPTIMIZED/EXECUTED plans so a regression in
  * pushdown, join strategy, or codegen surfaces as a red test instead
  * of a silent slowdown the bench's machine-noise envelope might hide.
  * Assertions are deliberately loose string probes (plan rendering
  * changes across Spark versions; the PROPERTY must hold, not the
  * exact text).
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("filter and projection reach the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") < 10.0)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters:") &&
      scan.contains("LessThan(l_quantity"),
      s"the filter must push to the scan:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_comment"),
      "projection pruning must drop unreferenced columns from the scan")
  }

  test("change-set diff plans broadcast joins, target cached once") {
    val target = (1 to 2000)
      .map(i => (i.toLong, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        s"v$i"))
      .toDF("id", "upd", "payload")
    val source = (1990 to 2010)
      .map(i => (i.toLong, java.sql.Timestamp.valueOf("2026-01-02 00:00:00"),
        s"w$i"))
      .toDF("id", "upd", "payload")
    val cached = target.cache()
    try {
      val cs = ChangeSet.build(source, cached,
        SourceConfig("t", "t", Seq("id"), Seq("upd")).naturalKeys,
        Seq("upd"), IngestFlags(), allowDeletes = true)
      val plan = cs.queryExecution.executedPlan.toString()
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(bhj >= 2,
        s"small change batches must broadcast against the target " +
          s"($bhj BroadcastHashJoin):\n${plan.take(2000)}")
      assert(plan.contains("InMemoryTableScan"),
        "the multi-consumed target must read from the cache")
    } finally cached.unpersist()
  }

  test("brute cosine top-k runs inside whole-stage codegen") {
    val vecs = (1 to 200)
      .map(i => (i.toLong, Array.tabulate(8)(d => 1.0f / (i % 7 + d + 1))))
      .toDF("id", "embedding")
    val queries = vecs.limit(3)
    val df = Similarity.bruteForceTopK(queries, vecs, "id", "embedding", 5)
    df.collect() // AQE finalizes the physical plan on execution
    val plan = df.queryExecution.executedPlan.toString()
    // `*(n)` prefixes mark whole-stage-codegen stages in the compact
    // rendering; the scoring projection must sit inside one
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
      s"the scoring pipeline must stay codegen'd:\n${plan.take(1500)}")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"),
      "no interpreted UDF may enter the scoring path")
  }

  test("manifest-pruned read scans only surviving files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-planshape-").toString
    val t = graft.table.SnapshotTable.at(root)
    t.createOrReplace((1 to 1000).map(i => (i.toLong, i % 10))
      .toDF("id", "p").repartitionByRange(8, col("id")))
    val (kept, total) = t.pruneCounts(col("id") <= 100L)
    assert(kept < total, s"range layout must prune ($kept/$total)")
    // the pruned read stays correct (the census above proves the scan
    // set shrank; correctness of the kept slice is the other half)
    val df = t.readWhere(spark, col("id") <= 100L)
    assert(df.count() == 100)
  }
}
