package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Targeted plan dumps for the r14 optimization round's claims: each
  * stage builds exactly the DataFrame a claim concerns (the full-query
  * `Explain` output hides mid-query plans — e.g. a lifecycle query's
  * final read no longer shows the deletion-vector mask it used three
  * commits earlier) and prints `explain("formatted")` under a labeled
  * header, for `plans/r14/<label>_{before,after}.txt`.
  *
  * Usage: runMain graft.PlanDump <sfDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.get("graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    def dump(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n#################### $label ####################")
      try df.explain("formatted")
      catch { case e: Throwable =>
        println(s"[plandump] $label failed: ${e.getMessage}") }
      spark.catalog.clearCache()
    }

    // 1. v3 DV-masked read (q144/q143/q148/q153/q158 class): the probe
    //    shape — before: BroadcastHashJoin + per-row blob + dv_contains;
    //    after: a single Filter with dv_mask_contains, no join node.
    dump("dv_masked_read") {
      val root = Files.createTempDirectory("graft-pd-dv-").toString + "/t"
      val t = graft.table.SnapshotTable.at(root)
      val orders = spark.read.parquet(s"$d/orders.parquet")
      t.createOrReplace(orders, properties = Map("format-version" -> "3"))
      t.deleteWherePositional(spark, col("o_orderkey") % 9 === 1)
      t.read(spark)
    }

    // 2. keyed multi-commit changelog feed (q95/q92/q85/q89/q138 class):
    //    after shows InMemoryTableScan over the NetDiff survivors where
    //    before re-evaluated the full fingerprint pipelines per leg.
    dump("changelog_feed_keyed") {
      val root = Files.createTempDirectory("graft-pd-cl-").toString
      val orders = spark.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      orders.createOrReplaceTempView("graft_pd_src")
      spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM graft_pd_src")
      spark.sql(s"UPDATE graft.`$root` SET o_totalprice = o_totalprice + 1" +
        " WHERE o_orderkey % 5 = 0")
      spark.sql(s"DELETE FROM graft.`$root` WHERE o_orderkey % 7 = 0")
      val t = graft.table.SnapshotTable.at(root)
      t.readChangelog(spark, 1L, t.currentVersion, keys = Seq("o_orderkey"))
    }

    // 3. PQ codebook training (q124/q126): before = union of m
    //    independent Lloyd pipelines (m broadcasts + m aggregates per
    //    iteration); after = ONE blocked pipeline.
    dump("pq_codebooks") {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      graft.operators.Similarity.trainPqCodebooks(
        emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    }

    // 4. shingle hashing (q35/q36/q37 + every shingle consumer): before
    //    repeats the lower+regexp_replace+split+xxhash chain ~6x inside
    //    one expression; after binds it once via transform(array(...)).
    dump("shingle_hashes") {
      spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"),
          graft.functions.TextFunctions.shingleHashes(col("text"), 3)
            .as("sh"))
    }

    // ---- r15 stages (plans/r15/<label>_{before,after}.txt) ----

    // 5. net changelog view (q138/q92 bootstrap class): before = two
    //    exceptAll legs (each embedding BOTH survivor pipelines); after
    //    = ONE ±1-netting aggregate shared by both legs via cache.
    dump("changelog_net") {
      val root = Files.createTempDirectory("graft-pd-net-").toString
      val orders = spark.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      orders.createOrReplaceTempView("graft_pd_net_src")
      spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM graft_pd_net_src")
      spark.sql(s"UPDATE graft.`$root` SET o_totalprice = o_totalprice + 1" +
        " WHERE o_orderkey % 5 = 0")
      spark.sql(s"DELETE FROM graft.`$root` WHERE o_orderkey % 7 = 0")
      val t = graft.table.SnapshotTable.at(root)
      t.readChangelogNet(spark, 1L, t.currentVersion)
    }

    // 6. merge resolve (q14-q17/q25/q95 class): before = anti join +
    //    semi join of the change batch against target keys (two key
    //    joins); after = one distinct + one left join, filter-classified.
    dump("merge_apply") {
      val orders = spark.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val changes = orders.filter(col("o_orderkey") % 5 === 0)
        .withColumn(graft.core.MetaColumns.Op,
          when(col("o_orderkey") % 10 === 0, lit("U")).otherwise(lit("D")))
      graft.merge.Merge(orders, changes, Seq("o_orderkey"),
        keepDeletes = false)
    }

    // 7. gopher quality rules (q142 class): before = the trim/split
    //    token + line arrays re-evaluated per consuming output column;
    //    after = one Generate evaluating each array once per row.
    dump("gopher_rules") {
      graft.operators.TextAnalysis.gopherQualityRules(
        spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
    }

    // 8. C4 line filter (q154 class): same no-CSE pattern as 7 on the
    //    line array (split + filter chain).
    dump("line_filter") {
      graft.operators.TextAnalysis.lineFilter(
        spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
    }

    spark.stop()
  }
}
