package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** `write.graft.distribution-mode` (Iceberg's write.distribution-mode):
  * hash = one file per partition value per commit (the default layout);
  * range = a range exchange on (partition cols, sort cols) whose
  * near-disjoint per-file bounds make range scans prune; none = zero
  * shuffle, the writer's own layout lands as-is (bulk-import shape).
  * AQE is disabled inside the test — at test scale its coalescing
  * folds every tiny exchange to one partition, which at real scale is
  * a feature (it never folds 100 GB), but here would hide the layout
  * difference the modes exist to produce.
  */
class DistributionModeSpec extends SparkSpec {

  private def fresh() =
    SnapshotTable.at(Files.createTempDirectory("graft-distmode-").toString)

  test("hash/range/none shape the file layout; content identical") {
    // 8 INPUT splits (no shuffle — AQE can't coalesce them) × 3 values
    val df = spark.range(0, 2400, 1, 8)
      .select((col("id") % 3).cast("string").as("p"), col("id"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // HASH (default): the clustering exchange buys one file per
      // partition value per commit
      val h = fresh()
      h.createOrReplace(df, Seq("p"))
      assert(h.currentManifest.files.size == 3,
        s"hash mode files (${h.currentManifest.files.size})")
      // NONE: no exchange — every input split fans out across every
      // partition dir (8 tasks × 3 values), zero shuffle
      val n = fresh()
      n.createOrReplace(df, Seq("p"),
        Map("write.graft.distribution-mode" -> "none"))
      assert(n.currentManifest.files.size == 24,
        s"none mode files (${n.currentManifest.files.size})")
      // RANGE + sort order: consecutive tasks hold consecutive
      // (p, id) slices — per-file id bounds turn selective where hash
      // mode's one-file-per-value covers the full range
      val r = fresh()
      r.createOrReplace(df, Seq("p"), Map(
        "write.graft.distribution-mode" -> "range",
        "write.graft.sort-order" -> "id"))
      val total = r.currentManifest.files.size
      assert(total > 3, s"range mode splits values across tasks ($total)")
      val (kept, _) = r.pruneCounts(col("id") <= 100L)
      assert(kept < total, s"range layout must prune ($kept/$total)")
      assert(h.pruneCounts(col("id") <= 100L)._1 == 3,
        "hash mode's full-range files cannot prune this")
      // content identical across all three layouts
      val want = df.select(col("p"), col("id")).collect().map(_.toString)
        .sorted.toSeq
      for (t <- Seq(h, n, r))
        assert(t.read(spark).select(col("p"), col("id")).collect()
          .map(_.toString).sorted.toSeq == want)
      // range applies to UNPARTITIONED tables with a sort order too
      val u = fresh()
      u.createOrReplace(df.repartition(4), Nil, Map(
        "write.graft.distribution-mode" -> "range",
        "write.graft.sort-order" -> "id"))
      assert(u.pruneCounts(col("id") <= 100L)._1 <
        u.currentManifest.files.size)
      // unknown mode refuses loudly
      val bad = fresh()
      val e = intercept[IllegalArgumentException] {
        bad.createOrReplace(df, Seq("p"),
          Map("write.graft.distribution-mode" -> "round-robin"))
      }
      assert(e.getMessage.contains("hash|range|none"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("Iceberg WRITE DISTRIBUTED BY PARTITION / LOCALLY ORDERED BY " +
      "SQL spellings land the distribution/sort properties") {
    val df = spark.range(0, 300, 1, 4)
      .select((col("id") % 3).cast("string").as("p"), col("id"))
    val t = fresh()
    t.createOrReplace(df, Seq("p"))
    def props = t.currentManifest.properties
    // LOCALLY ORDERED BY = per-task sort, no required distribution
    spark.sql(s"ALTER TABLE graft.`${t.root}` WRITE LOCALLY ORDERED BY id")
    assert(props.get("write.graft.distribution-mode").contains("none"))
    assert(props.get("write.graft.sort-order").contains("id"))
    // DISTRIBUTED BY PARTITION + LOCALLY ORDERED BY tail = hash + sort
    spark.sql(s"ALTER TABLE graft.`${t.root}` WRITE DISTRIBUTED BY " +
      "PARTITION LOCALLY ORDERED BY id, p")
    assert(props.get("write.graft.distribution-mode").contains("hash"))
    assert(props.get("write.graft.sort-order").contains("id,p"))
    // DISTRIBUTED BY PARTITION alone REPLACES the write order (Iceberg
    // SetWriteDistributionAndOrdering semantics): the sort clears
    spark.sql(s"ALTER TABLE graft.`${t.root}` WRITE DISTRIBUTED BY PARTITION")
    assert(props.get("write.graft.distribution-mode").contains("hash"))
    assert(!props.contains("write.graft.sort-order"))
    // and the landed mode drives the next commit's layout: hash = one
    // file per partition value for this append (AQE off — its toy-scale
    // coalescing folds the 3 hash slices to one, same as the first test)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val v0 = t.currentManifest.files.size
      t.append(spark, df)
      assert(t.currentManifest.files.size == v0 + 3,
        "hash distribution must cluster the append to one file per value")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
