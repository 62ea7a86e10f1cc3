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

    spark.stop()
  }
}
