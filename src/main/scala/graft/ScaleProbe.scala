package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Similarity, TextAnalysis}

/** Local scale probe for the LLM-pipeline operators: amplifies the sf0.1
  * corpus (documents ×K with id remap + a shard token appended so
  * near-dup structure survives but exact fingerprints differ; embeddings
  * ×K with a deterministic per-copy perturbation) and times the operators
  * whose 100 TB behavior matters. Prints one JSON line per stage.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [docCopies] [embCopies]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("manifest")) { manifestProbe(); return }
    if (args.headOption.contains("bloom")) {
      // fast loop for the multi-row-group bloom-skip stage only
      val spark0 = graft.core.GraftSession.get("graft-scale-probe")
      val li0 = spark0.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .withColumn("c", explode(sequence(lit(0), lit(3))))
        .select((col("l_orderkey") * 4 + col("c")).as("l_orderkey"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val blockSize0 = math.max(1L, li0.agg(max("l_orderkey")).head
        .getLong(0) / 32)
      bloomStage(spark0,
        li0.withColumn("p", expr(s"(l_orderkey - 1) DIV $blockSize0")))
      spark0.stop(); return
    }
    // "storage": run only the storage-layer probes (stats pruning,
    // z-order, compaction variants, spec evolution) — skips the long
    // operator sweeps when iterating on the table layer
    val storageOnly = args.headOption.contains("storage")
    // "cc": only the minhash-pairs → connected-components stage (the r7
    // contraction evidence loop — the full sweep costs ~15 min)
    val ccOnly = args.headOption.contains("cc")
    // "mixture": only the mixture-design stages (DSIR importance,
    // cross-source overlap) — the fast loop for the sampling operators
    val mixtureOnly = args.headOption.contains("mixture")
    val sfDir =
      if (args.length > 0 && !storageOnly && !ccOnly && !mixtureOnly)
        args(0)
      else "/root/testdata/sf0.1"
    val docCopies = if (args.length > 1) args(1).toInt else 100
    val embCopies = if (args.length > 2) args(2).toInt else 50
    val spark = graft.core.GraftSession.get("graft-scale-probe")
    import spark.implicits._

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"$name","sec":$dt%.2f,"rows":$rows}""")
      spark.catalog.clearCache()
    }

    if (!storageOnly) {
    // documents ×K: copy c of doc d gets id d*K+c and a copy-marker token
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
    val docs = docs0
      .withColumn("c", explode(sequence(lit(0), lit(docCopies - 1))))
      .select((col("doc_id") * docCopies + col("c")).as("doc_id"),
        concat(col("text"), lit(" copymarker"), col("c").cast("string")).as("text"),
        col("lang"), col("n_chars"))
      .repartition(64)
      .cache()
    val nDocs = docs.count()
    println(s"""{"stage":"amplify_docs","rows":$nDocs}""")

    if (ccOnly) {
      // NOT timed(): timed clears the cache between stages, which would
      // silently re-run the whole MinHash plan TWICE inside CC's
      // symmetrize union — the r7 980s red herring
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          threshold = 0.5, maxBucketSize = 200)
        .select("id_a", "id_b").cache()
      val t0 = System.nanoTime()
      val nPairs = pairs.count()
      println(f"""{"stage":"cc_pairs_materialize","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$nPairs}""")
      val t1 = System.nanoTime()
      val nodes = Graph.connectedComponents(pairs, "id_a", "id_b").count()
      println(f"""{"stage":"cc_only","sec":${(System.nanoTime() - t1) / 1e9}%.2f,"rows":$nodes}""")
      pairs.unpersist(); docs.unpersist()
      spark.stop(); return
    }

    if (mixtureOnly) {
      timed("dsir_importance") {
        // filter on the selection flag so the optimizer cannot skip
        // the scoring dot product or the ranking (a bare count() can)
        graft.operators.Sampling.dsirImportance(docs, "doc_id", "text",
          isTarget = col("lang") === "en")
          .filter(col("selected")).count()
      }
      timed("exact_substr_remove") {
        // the removal pass at corpus scale: amplified copies guarantee
        // heavy window duplication, so the coverage explode (≤n per
        // DUPLICATE window) carries real volume; sum(n_removed) forces
        // the full rebuild
        Dedup.exactSubstrRemove(docs, "doc_id", "text", n = 8)
          .agg(sum(col("n_removed")).cast("long")).head.getLong(0)
      }
      timed("source_overlap") {
        TextAnalysis.crossGroupOverlap(
          docs.withColumn("src",
            concat(lit("s"), pmod(col("doc_id"), lit(20)).cast("string"))),
          "src", "text", n = 3).count()
      }
      timed("token_budget_sample") {
        // the r13-flagged shape at corpus scale: the bucketed prefix
        // sum must admit each stratum's budget without moving a whole
        // stratum through one task (40% budget → ~40% of each stratum
        // admitted, so the cut bites; sum(taken_before) forces the full
        // prefix computation)
        val strat = docs.withColumn("src",
          concat(lit("s"), pmod(col("doc_id"), lit(20)).cast("string")))
        val alloc = strat.groupBy(col("src"))
          .agg((sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            * 2L / 5L).as("allocated_tokens"))
        graft.operators.Sampling.tokenBudgetSample(
          strat, "src", "doc_id", "text", alloc)
          .agg(count(lit(1)), sum(col("taken_before")))
          .head.getLong(0)
      }
      docs.unpersist()
      spark.stop(); return
    }

    timed("exact_dedup") {
      Dedup.exact(docs, "doc_id", "text").count()
    }
    timed("minhash_neardup") {
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5,
        maxBucketSize = 200).count()
    }
    timed("dedup_clusters_cc") {
      // materialize the pair edges first, as a real pipeline would —
      // CC should be timed on its own work, not on re-running LSH
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          threshold = 0.5, maxBucketSize = 200)
        .select("id_a", "id_b").cache()
      try {
        pairs.count()
        Graph.connectedComponents(pairs, "id_a", "id_b").count()
      } finally pairs.unpersist()
    }
    timed("pagerank_3iter") {
      // iterative power-iteration shape at corpus scale: 3 arithmetic
      // out-links per node + a 10% hub spike onto node 0 (in-degree
      // skew absorbed by partial aggregation) — per-round one join +
      // one aggregate, plan growth cut by the localCheckpoint
      val ids = docs.select(col("doc_id"))
      val e = ids.select(col("doc_id").as("s"),
          ((col("doc_id") * 3 + 1) % nDocs).as("t"))
        .unionByName(ids.select(col("doc_id").as("s"),
          ((col("doc_id") * 7 + 2) % nDocs).as("t")))
        .unionByName(ids.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("s"), lit(0L).as("t")))
      Graph.pageRank(e, "s", "t", iters = 3).count()
    }
    timed("chunk_dedup") {
      Dedup.chunkDedup(docs, "doc_id", "text", 64).count()
    }
    timed("bloom_ref_dedup") {
      // half the corpus as "history": the Bloom rejects most of the
      // other half map-side; result = exact anti-join
      Dedup.dedupAgainstReference(docs,
        docs.filter(col("doc_id") % 2 === 0).select("text"), "text").count()
    }
    timed("quality_scores") {
      TextAnalysis.qualityScore(docs, "text").count()
    }
    timed("repetition_metrics") {
      TextAnalysis.repetitionMetrics(docs, "doc_id", "text").count()
    }
    timed("seq_pack") {
      TextAnalysis.packSequences(docs, "doc_id", "text", 512, nShards = 64).count()
    }
    timed("dsir_importance") {
      // hashed-feature explode is the hot stage (~120 features/doc);
      // the bucket-weight table stays <=1024 rows and broadcasts.
      // Filter on the flag so the optimizer cannot skip the scoring.
      graft.operators.Sampling.dsirImportance(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
        .filter(col("selected")).count()
    }
    timed("source_overlap") {
      // 20 synthetic sources over the amplified corpus: the gram-keyed
      // self-join's fan-out is bounded by the source count, so pair
      // rows ~ distinct grams x C(20,2) at worst, never docs^2
      TextAnalysis.crossGroupOverlap(
        docs.withColumn("src",
          concat(lit("s"), pmod(col("doc_id"), lit(20)).cast("string"))),
        "src", "text", n = 3).count()
    }
    docs.unpersist()

    // write amplification: merge a 1% change batch into a 600k-row table
    // under copy-on-write vs merge-on-read and report bytes written
    {
      import graft.table.SnapshotTable
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      val changes = li.filter(col("l_orderkey") % 97 === 0)
        .withColumn("l_quantity", col("l_quantity") + lit(1.0))
        .withColumn("op", lit("U"))
      def bytesUnder(p: java.nio.file.Path): Long = {
        val st = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala
            .filter(f => java.nio.file.Files.isRegularFile(f) &&
              f.toString.endsWith(".parquet"))
            .map(java.nio.file.Files.size).sum
        } finally st.close()
      }
      def mergeProbe(name: String, mor: Boolean): Unit = {
        val tbl = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory(s"graft-wamp-$name").toString)
        tbl.createOrReplace(li)
        val before = bytesUnder(tbl.root)
        val t0 = System.nanoTime()
        if (mor)
          tbl.mergeMoR(spark, changes, Seq("l_orderkey", "l_linenumber"),
            keepDeletes = false)
        else
          tbl.merge(spark, changes, Seq("l_orderkey", "l_linenumber"),
            keepDeletes = false)
        val dt = (System.nanoTime() - t0) / 1e9
        val written = bytesUnder(tbl.root) - before
        val rows = tbl.read(spark).count()
        println(f"""{"stage":"$name","sec":$dt%.2f,"rows":$rows,"bytes_written":$written}""")
        spark.catalog.clearCache()
      }
      mergeProbe("cow_merge_1pct", mor = false)
      mergeProbe("mor_merge_1pct", mor = true)
    }
    }

    // storage-layer scale probes: stats pruning, z-order, selective
    // compaction — the read/maintenance features whose value only shows
    // against a table with many files
    {
      import graft.table.SnapshotTable
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .withColumn("c", explode(sequence(lit(0), lit(3))))
        .select((col("l_orderkey") * 4 + col("c")).as("l_orderkey"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity"))

      // data-derived 10% cutoffs (the testdata's key density is not
      // TPC-H's — never hardcode range assumptions into a probe)
      val mx = li.agg(max("l_orderkey"), max("l_partkey")).head
      val oCut = mx.get(0).asInstanceOf[Number].longValue / 10
      val pCut = mx.get(1).asInstanceOf[Number].longValue / 10

      // stats-pruned scan vs full scan on a range-clustered 2.4M-row table
      val st = SnapshotTable.at(
        java.nio.file.Files.createTempDirectory("graft-statsprobe").toString)
      st.createOrReplace(li.repartitionByRange(64, col("l_orderkey")))
      val cond = col("l_orderkey") <= oCut
      val (kept, total) = st.pruneCounts(cond)
      timed(s"stats_pruned_scan_${kept}of$total") {
        st.readWhere(spark, cond).count()
      }
      timed("full_scan_filter") {
        st.read(spark).filter(cond).count()
      }

      // z-order rewrite cost + two-dimension prune census
      timed("zorder_rewrite_2_4m") {
        st.rewriteZOrder(spark, Seq("l_orderkey", "l_partkey"), minFiles = 64)
        st.currentManifest.files.size.toLong
      }
      val zo = st.pruneCounts(col("l_orderkey") <= oCut)
      val zp = st.pruneCounts(col("l_partkey") <= pCut)
      println(s"""{"stage":"zorder_prune_census","orderkey_kept":${zo._1},""" +
        s""""partkey_kept":${zp._1},"total":${zo._2}}""")

      // selective compaction: partition by CONTIGUOUS orderkey blocks so
      // MoR delete-file key bounds can exonerate untouched partitions,
      // fragment block 0 with three MoR merges (each appends small delta
      // files + an equality delete), then compact — only block 0's group
      // should be rewritten, everything else carried by reference
      val pt = SnapshotTable.at(
        java.nio.file.Files.createTempDirectory("graft-compactprobe").toString)
      val blockSize = math.max(1L,
        mx.get(0).asInstanceOf[Number].longValue / 32)
      val withP = li.withColumn("p", expr(s"(l_orderkey - 1) DIV $blockSize"))
      pt.createOrReplace(withP, Seq("p"))
      (1 to 3).foreach { i =>
        pt.mergeMoR(spark,
          withP.filter(col("p") === 0 && pmod(col("l_orderkey"), lit(100)) === i)
            .withColumn("l_quantity", col("l_quantity") + lit(1.0))
            .withColumn("op", lit("U")),
          Seq("l_orderkey", "l_partkey", "l_suppkey"), keepDeletes = false)
      }
      val beforeFiles = pt.currentManifest.files.map(_.path).toSet
      timed("selective_compact") {
        pt.compact(spark)
        val after = pt.currentManifest.files.map(_.path).toSet
        val carried = (after intersect beforeFiles).size
        println(s"""{"stage":"selective_compact_census","carried":$carried,""" +
          s""""rewritten":${(after diff beforeFiles).size},""" +
          s""""before":${beforeFiles.size}}""")
        pt.read(spark).count()
      }

      // streaming tail at 2.4M rows: pass 1 pins `latest` (no emission);
      // one ~1%-of-a-partition append lands; pass 2's micro-batch plans
      // from the manifest doc diff and reads ONLY the appended files —
      // the pass costs stream machinery + the appended rows, nowhere
      // near the 2.4M-row scan a naive tail would pay
      val ts = SnapshotTable.at(
        java.nio.file.Files.createTempDirectory("graft-tailprobe").toString)
      ts.createOrReplace(withP, Seq("p"))
      val tailCkpt =
        java.nio.file.Files.createTempDirectory("graft-tailprobe-ckpt").toString
      val tailOut =
        java.nio.file.Files.createTempDirectory("graft-tailprobe-out").toString
      def tailPass(): Unit = {
        val q = spark.readStream.format("graft-table").load(ts.root.toString)
          .writeStream.format("parquet").option("path", tailOut)
          .option("checkpointLocation", tailCkpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      timed("stream_tail_pin_pass") { tailPass(); 0L }
      val appended = withP.filter(col("p") === 0 &&
        pmod(col("l_orderkey"), lit(100)) === 7)
        .withColumn("l_quantity", col("l_quantity") + lit(2.0))
      ts.append(spark, appended)
      timed("stream_tail_batch") {
        tailPass()
        spark.read.parquet(tailOut).count()
      }

      // delete-pressure compaction at 2.4M rows: block 0 accumulates 3%
      // masked rows (three 1% MoR merges), block 1 only 1%; with the bar
      // at 2% the selective compact must rewrite block 0, carry block 1
      // WITH its delete still resolving on read, and touch nothing else
      val dp = SnapshotTable.at(
        java.nio.file.Files.createTempDirectory("graft-delpressure").toString)
      dp.createOrReplace(withP, Seq("p"))
      (1 to 3).foreach { i =>
        dp.mergeMoR(spark,
          withP.filter(col("p") === 0 && pmod(col("l_orderkey"), lit(100)) === i)
            .withColumn("l_quantity", col("l_quantity") + lit(1.0))
            .withColumn("op", lit("U")),
          Seq("l_orderkey", "l_partkey", "l_suppkey"), keepDeletes = false)
      }
      // block 1's updated rows MOVE to block 0 (mutable partition value),
      // so block 1 keeps exactly one data file — its selection can only
      // come from delete pressure, never the bin-pack criterion
      dp.mergeMoR(spark,
        withP.filter(col("p") === 1 && pmod(col("l_orderkey"), lit(100)) === 1)
          .withColumn("l_quantity", col("l_quantity") + lit(1.0))
          .withColumn("p", lit(0L))
          .withColumn("op", lit("U")),
        Seq("l_orderkey", "l_partkey", "l_suppkey"), keepDeletes = false)
      val dpBefore = dp.currentManifest.files.map(_.path).toSet
      val delsBefore = dp.currentManifest.deleteFiles.size
      timed("delete_pressure_compact") {
        dp.compact(spark, deleteRatio = Some(0.02))
        val m2 = dp.currentManifest
        val rewrittenP = m2.files.filterNot(f => dpBefore(f.path))
          .map(_.partition("p")).distinct.sorted
        println(s"""{"stage":"delete_pressure_census",""" +
          s""""deletes_before":$delsBefore,""" +
          s""""deletes_kept":${m2.deleteFiles.size},""" +
          s""""rewritten_partitions":${rewrittenP.mkString("[", ",", "]")},""" +
          s""""carried":${m2.files.count(f => dpBefore(f.path))}}""")
        dp.read(spark).count()
      }

      // NEGATED-predicate pruning at 2.4M rows (the NNF rewrite): a
      // NOT BETWEEN over the range-clustered key must keep only the
      // head/tail files — before the rewrite every NOT/!= predicate
      // scanned all 64
      {
        val inner = col("l_orderkey") >= oCut && col("l_orderkey") <= oCut * 9
        val (keptNot, totalNot) = st.pruneCounts(!inner)
        println(s"""{"stage":"not_prune_census","kept":$keptNot,""" +
          s""""total":$totalNot}""")
        timed("not_pruned_scan") { st.readWhere(spark, !inner).count() }
      }

      // metadata DELETE at 2.4M rows: dropping a whole partition is a
      // pure manifest commit — zero parquet bytes written, no Spark job
      // — while an intra-partition predicate pays exactly one
      // partition's copy-on-write. The 100 TB story: retiring a day of
      // data costs O(manifest), not O(data).
      {
        def pBytes(p: java.nio.file.Path): Long = {
          val s = java.nio.file.Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala
              .filter(f => java.nio.file.Files.isRegularFile(f) &&
                f.toString.endsWith(".parquet"))
              .map(java.nio.file.Files.size).sum
          } finally s.close()
        }
        val md = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-metadelprobe").toString)
        md.createOrReplace(withP, Seq("p"))
        val before = pBytes(md.root)
        timed("metadata_delete_whole_partition") {
          md.deleteWhere(spark, col("p") === 0)
          require(md.currentManifest.operation == "delete" &&
            pBytes(md.root) == before,
            "whole-partition delete must write zero parquet bytes")
          md.read(spark).count()
        }
        val cowBefore = pBytes(md.root)
        timed("cow_delete_intra_partition") {
          md.deleteWhere(spark,
            col("p") === 1 && pmod(col("l_orderkey"), lit(100)) === 5)
          md.read(spark).count()
        }
        println(s"""{"stage":"cow_delete_bytes_written",""" +
          s""""bytes":${pBytes(md.root) - cowBefore}}""")
        // file-scoped DELETE: append a second file into partition 2,
        // then delete a range implicating only the ORIGINAL file — the
        // bystander carries by reference, so the rewrite's write cost
        // is one file, not the partition
        md.append(spark, withP.filter(col("p") === 2)
          .withColumn("l_orderkey", col("l_orderkey") + lit(100000000L)))
        val fsBefore = pBytes(md.root)
        val filesBefore = md.currentManifest.files.map(_.path).toSet
        timed("cow_delete_file_scoped") {
          md.deleteWhere(spark,
            col("p") === 2 && col("l_orderkey") < 100000000L &&
              pmod(col("l_orderkey"), lit(100)) === 5)
          md.read(spark).count()
        }
        val carried = md.currentManifest.files.map(_.path)
          .count(filesBefore)
        println(s"""{"stage":"cow_delete_file_scoped_census",""" +
          s""""bytes":${pBytes(md.root) - fsBefore},""" +
          s""""carried":$carried}""")
      }

      // metadata COUNT under pending POSITIONAL deletes: the tombstone
      // census subtracts in O(tombstones) while the fallback scan pays
      // the full table — the r8-verdict "steady MoR delete workload"
      // evidence
      {
        val mc = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-metacountprobe").toString)
        mc.createOrReplace(withP, Seq("p"))
        mc.deleteWherePositional(spark,
          pmod(col("l_orderkey"), lit(1000)) === 3) // ~0.1% tombstoned
        require(mc.currentManifest.deleteFiles.exists(_.positional))
        timed("meta_count_pending_pos_deletes") {
          mc.rowCount(spark).getOrElse(
            sys.error("positional deletes must not decline the meta count"))
        }
        timed("scan_count_pending_pos_deletes") { mc.read(spark).count() }
      }

      // Iceberg v3 at 2.4M rows: lineage read (inheritance = broadcast
      // file-map join + codegen'd coalesce) vs the plain scan, the
      // deletion-vector delete commit (folded bitmap sidecar bytes —
      // compare v2's tombstone-row parquet above), the bitmap-masked
      // read, and the metadata COUNT under a pending vector
      {
        val v3 = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-v3probe").toString)
        v3.createOrReplace(withP, Seq("p"),
          properties = Map("format-version" -> "3"))
        timed("v3_plain_read") { v3.read(spark).count() }
        timed("v3_lineage_read") {
          v3.readLineage(spark).filter(col("_row_id") >= 0L).count()
        }
        var dvBytes = 0L
        timed("v3_dv_delete_0p1pct") {
          val m = v3.deleteWherePositional(spark,
            pmod(col("l_orderkey"), lit(1000)) === 7)
          dvBytes = m.deleteFiles.filter(_.dv)
            .map(d => java.nio.file.Files.size(v3.root.resolve(d.path))).sum
          m.deleteFiles.count(_.dv).toLong
        }
        println(s"""{"stage":"v3_dv_sidecar_bytes","bytes":$dvBytes}""")
        timed("v3_dv_masked_read") { v3.read(spark).count() }
        timed("v3_meta_count_under_dv") {
          v3.rowCount(spark).getOrElse(
            sys.error("a pending DV must not decline the meta count"))
        }
        // r15 scale envelope: DENSE debt (25% of every file tombstoned)
        // read twice — the broadcast-map fast path vs the distributed
        // (path, pos) anti-join the read falls back to past the
        // configured byte bound (forced here). At a real high-density
        // census the fallback is what keeps the driver/executors from
        // holding every pending vector; counts must agree exactly.
        var denseDvBytes = 0L
        timed("v3_dv_delete_25pct") {
          val m = v3.deleteWherePositional(spark,
            pmod(col("l_orderkey"), lit(4)) === 1)
          denseDvBytes = m.deleteFiles.filter(_.dv)
            .map(d => java.nio.file.Files.size(v3.root.resolve(d.path))).sum
          m.deleteFiles.count(_.dv).toLong
        }
        println(s"""{"stage":"v3_dense_dv_bytes","bytes":$denseDvBytes}""")
        var nBroadcast = 0L
        var nFallback = 0L
        timed("v3_dense_dv_read_broadcast") {
          nBroadcast = v3.read(spark).count(); nBroadcast
        }
        spark.conf.set("graft.read.dv.broadcast-max-bytes", "1")
        try timed("v3_dense_dv_read_distributed_antijoin") {
          nFallback = v3.read(spark).count(); nFallback
        }
        finally spark.conf.unset("graft.read.dv.broadcast-max-bytes")
        require(nBroadcast == nFallback,
          s"DV fallback read diverged: $nBroadcast vs $nFallback")
      }

      bloomStage(spark, withP)

      // VARIANT shredding at 2.4M rows: props JSON parses to a variant
      // column, the declared $.k leaf (k = l_orderkey, correlated with
      // the block partitioning) materializes as the engine's physical
      // shred column — the point-lookup census shows manifest pruning
      // on a leaf that, unshredded, would force a full scan + per-row
      // variant extraction
      {
        val vt = SnapshotTable.at(java.nio.file.Files
          .createTempDirectory("graft-variantprobe").toString)
        val withV = withP.select(col("l_orderkey"), col("p"),
          expr("parse_json(concat('{\"k\": ', l_orderkey, " +
            "', \"q\": ', l_quantity, '}'))").as("props_v"))
        timed("variant_shred_write_2_4m") {
          vt.createOrReplace(withV, Seq("p"), properties = Map(
            "write.graft.variant.shred.props_v" -> "k:bigint"))
          vt.currentManifest.files.size.toLong
        }
        val probeK = withP.agg(max(col("l_orderkey"))).head.getLong(0) / 2
        val (kept, total) = vt.pruneCounts(
          expr(s"try_variant_get(props_v, '$$.k', 'bigint') = ${probeK}L"))
        println(s"""{"stage":"variant_shred_prune_census","kept":$kept,"total":$total}""")
        timed("variant_shred_point_lookup") {
          vt.readWhere(spark,
            expr(s"try_variant_get(props_v, '$$.k', 'bigint') = ${probeK}L"))
            .count()
        }
        timed("variant_full_scan_extract") {
          vt.read(spark).filter(
            expr(s"try_variant_get(props_v, '$$.k', 'bigint') = ${probeK}L"))
            .count()
        }
      }

      // where-scoped compaction at 2.4M rows: fragment every partition,
      // then touch up ONE — the scoped rewrite stats and rewrites only
      // the implicated group while the full call pays for all of them
      {
        val wc = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-wherecompact").toString)
        wc.createOrReplace(withP, Seq("p"))
        wc.append(spark, withP.filter(
          pmod(col("l_orderkey"), lit(50)) === 3)) // fragment all groups
        val frag = wc.currentManifest.files.size
        var scopedAfter = 0
        timed("compact_where_scoped_one_partition") {
          wc.compact(spark, where = Some(col("p") === 0L))
          scopedAfter = wc.currentManifest.files.size
          scopedAfter.toLong
        }
        println(s"""{"stage":"compact_where_census","before":$frag,""" +
          s""""after_scoped":$scopedAfter}""")
        timed("compact_full_remaining") {
          wc.compact(spark)
          wc.currentManifest.files.size.toLong
        }
      }

      // tail-split stream admission at 2.4M rows: a 32-file backfill
      // commit streams as 32/8 = 4 bounded micro-batches — per-slice
      // planning is a manifest diff + slice, never a table scan
      {
        val ts = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-tailsplit").toString)
        ts.createOrReplace(withP.limit(1000))
        ts.append(spark, withP.repartition(32)) // the wide backfill
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-tailsplit-ckpt").toString
        val seen = new java.util.concurrent.atomic.AtomicInteger(0)
        val got = new java.util.concurrent.atomic.AtomicLong(0L)
        timed("stream_tail_split_32files_8cap") {
          val q = spark.readStream.format("graft-table")
            .option("startVersion", "1")
            .option("maxFilesPerTrigger", "8")
            .load(ts.root.toString)
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.DataFrame, _: Long) =>
                val c = b.count()
                if (c > 0) { seen.incrementAndGet(); got.addAndGet(c) }
                ()
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming
              .Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          got.get()
        }
        println(s"""{"stage":"stream_tail_split_census","batches":${seen.get()}}""")
        require(seen.get() == 4, s"32 files under an 8-file cap: ${seen.get()}")
      }

      // NDV stats at 2.4M rows: the full compute pays one scan; after a
      // ~1% append the recompute unions sketches over ONLY the delta
      // files (the O(new data) path) — compare against the exact
      // count-distinct scan both in cost and estimate
      {
        val nv = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-ndvprobe").toString)
        nv.createOrReplace(withP, Seq("p"))
        val statCols = Seq("l_orderkey", "l_partkey")
        var full: Map[String, Long] = Map.empty
        timed("ndv_stats_full") {
          full = nv.computeTableStats(spark, statCols)
          full("l_orderkey")
        }
        nv.append(spark, withP.filter(
          pmod(col("l_orderkey"), lit(100)) === 7)
          .withColumn("l_orderkey", col("l_orderkey") + lit(100000000L)))
        var incr: Map[String, Long] = Map.empty
        timed("ndv_stats_incremental_1pct_append") {
          incr = nv.computeTableStats(spark, statCols)
          incr("l_orderkey")
        }
        require(nv.tableStats.exists(_._2 == "incremental"),
          "the append-only recompute must take the delta path")
        var exact = 0L
        timed("ndv_exact_scan") {
          exact = nv.read(spark)
            .select(countDistinct(col("l_orderkey"))).head.getLong(0)
          exact
        }
        println(s"""{"stage":"ndv_accuracy","estimate":${incr("l_orderkey")},""" +
          s""""exact":$exact}""")
        require(math.abs(incr("l_orderkey") - exact).toDouble /
          math.max(1L, exact) < 0.05, "sketch estimate within 5%")

        // PER-PARTITION stats (r13): same incremental discipline,
        // grouped by partition — the append touches ~1% of rows across
        // partitions, the delta groupBy + per-partition hll_union must
        // stay O(new data) like the table-level path above
        var pFull: Seq[(String, String, Long)] = Nil
        timed("partition_stats_full") {
          pFull = nv.computePartitionStats(spark, statCols)
          pFull.size.toLong
        }
        nv.append(spark, withP.filter(
          pmod(col("l_orderkey"), lit(100)) === 13)
          .withColumn("l_orderkey", col("l_orderkey") + lit(200000000L)))
        var pIncr: Seq[(String, String, Long)] = Nil
        timed("partition_stats_incremental_1pct_append") {
          pIncr = nv.computePartitionStats(spark, statCols)
          pIncr.size.toLong
        }
        require(nv.partitionStats.exists(_._2 == "incremental"),
          "the append-only partition recompute must take the delta path")
        println(s"""{"stage":"partition_stats_census",""" +
          s""""partitions":${pIncr.map(_._1).distinct.size},""" +
          s""""rows":${pIncr.size}}""")
      }

      // keyed CDC replication at 2.4M rows (r9 verdict #3/#7): the
      // replica bootstraps from an insert-only changelog feed as a
      // FAST-APPEND (live files carry by reference — never the old
      // full-table exceptAll shuffle), then a ~1% multi-commit keyed
      // increment applies through the partition-scoped merge with keys
      // taken from the TABLE's declared identifier fields. The census
      // proves O(touched) write amplification with numbers.
      {
        def bytesUnder(p: java.nio.file.Path): Long = {
          val s = java.nio.file.Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala
              .filter(f => java.nio.file.Files.isRegularFile(f) &&
                f.toString.endsWith(".parquet"))
              .map(java.nio.file.Files.size).sum
          } finally s.close()
        }
        val src = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-cdcrepl-src").toString)
        src.createOrReplace(withP, Seq("p"))                       // v1
        src.setIdentifierFields(Seq("l_orderkey", "l_partkey", "l_suppkey"))
        val keys = src.identifierFields
        val rep = SnapshotTable.at(
          java.nio.file.Files.createTempDirectory("graft-cdcrepl-dst").toString)
        rep.createOrReplace(withP.limit(0), Seq("p"))  // empty, partitioned
        timed("cdc_replica_bootstrap_fast_append") {
          rep.applyChangelog(spark, src.readChangelog(spark, 0L, 1L))
          require(rep.currentManifest.operation == "append",
            "insert-only bootstrap must fast-append, not rewrite")
          rep.read(spark).count()
        }
        val syncedV = src.currentVersion
        // multi-commit increment confined to partition 0: two keyed
        // updates + one delete (collapses per key before the merge)
        src.updateWhere(spark,
          Seq("l_quantity" -> (col("l_quantity") + lit(1.0))),
          col("p") === 0L && pmod(col("l_orderkey"), lit(100)) === 3)
        src.updateWhere(spark,
          Seq("l_quantity" -> (col("l_quantity") + lit(1.0))),
          col("p") === 0L && pmod(col("l_orderkey"), lit(100)) === 4)
        src.deleteWhere(spark,
          col("p") === 0L && pmod(col("l_orderkey"), lit(1000)) === 5)
        val repBefore = bytesUnder(rep.root)
        val repFiles = rep.currentManifest.files.map(_.path).toSet
        timed("cdc_replica_keyed_increment_1pct") {
          rep.applyChangelog(spark,
            src.readChangelog(spark, syncedV, src.currentVersion, keys), keys)
          rep.read(spark).count()
        }
        val m2 = rep.currentManifest
        val rewrittenP = m2.files.filterNot(f => repFiles(f.path))
          .map(_.partition("p")).distinct.sorted
        println(s"""{"stage":"cdc_replica_census",""" +
          s""""bytes_written":${bytesUnder(rep.root) - repBefore},""" +
          s""""rewritten_partitions":${rewrittenP.mkString("[", ",", "]")},""" +
          s""""carried":${m2.files.count(f => repFiles(f.path))}}""")
        require(rewrittenP == Seq("0"),
          s"keyed apply must rewrite ONLY partition 0, got $rewrittenP")
        require(rep.read(spark).exceptAll(src.read(spark)).isEmpty,
          "replica must equal the source after the keyed increment")
      }

      // partition-spec evolution at 2.4M rows: the evolve commit itself
      // is metadata-only (no data IO); the first merge after it rewrites
      // ONLY the legacy block it touches (migrating it to the new spec);
      // compaction migrates the remaining legacy groups eagerly
      val pe = SnapshotTable.at(
        java.nio.file.Files.createTempDirectory("graft-pevoprobe").toString)
      val withPQ = li
        .withColumn("pa", expr(s"(l_orderkey - 1) DIV $blockSize"))
        .withColumn("pb", pmod(col("l_orderkey"), lit(16)))
      pe.createOrReplace(withPQ, Seq("pa"))
      val peBefore = pe.currentManifest.files.map(_.path).toSet
      timed("evolve_spec_metadata_only") {
        pe.evolvePartitioning(spark, Seq("pb"))
        pe.currentManifest.files.size.toLong
      }
      timed("merge_after_evolution_one_block") {
        pe.merge(spark,
          withPQ.filter(col("pa") === 0 &&
              pmod(col("l_orderkey"), lit(100)) === 1)
            .withColumn("l_quantity", col("l_quantity") + lit(1.0))
            .withColumn("op", lit("U")),
          Seq("l_orderkey", "l_partkey", "l_suppkey"), keepDeletes = false)
        val after = pe.currentManifest.files
        val carried = after.count(f => peBefore(f.path))
        val migrated = after.count(_.partition.keySet == Set("pb"))
        println(s"""{"stage":"evolution_merge_census","carried":$carried,""" +
          s""""migrated":$migrated,"total":${after.size}}""")
        pe.read(spark).count()
      }
      timed("compact_migrates_legacy") {
        pe.compact(spark)
        val allMigrated =
          pe.currentManifest.files.forall(_.partition.keySet == Set("pb"))
        println(s"""{"stage":"evolution_compact_census",""" +
          s""""all_migrated":$allMigrated,""" +
          s""""files":${pe.currentManifest.files.size}}""")
        pe.read(spark).count()
      }

      // CHANGELOG at 2.4M rows: an append step diffs in O(appended
      // files); a one-partition CoW update nets over ONLY the touched
      // partition's files (the exceptAll is bounded by the rewrite, not
      // the table); a rename's epoch read costs ~the plain scan
      val cl = SnapshotTable.at(
        java.nio.file.Files.createTempDirectory("graft-clprobe").toString)
      cl.createOrReplace(withP, Seq("p"))
      cl.append(spark,
        withP.filter(col("p") === 3 && pmod(col("l_orderkey"), lit(100)) === 7)
          .withColumn("l_quantity", col("l_quantity") + lit(2.0)))
      timed("changelog_append_step") {
        cl.readChangelog(spark, 1L, 2L).count()
      }
      cl.updateWhere(spark, Seq("l_quantity" -> lit(1.0)),
        col("p") === 0 && pmod(col("l_orderkey"), lit(100)) === 1)
      timed("changelog_cow_net_step") {
        val net = cl.readChangelog(spark, 2L, 3L)
        val n = net.count()
        val byType = net.groupBy(col("_change_type")).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        println(s"""{"stage":"changelog_cow_census",""" +
          s""""inserts":${byType.getOrElse("insert", 0L)},""" +
          s""""deletes":${byType.getOrElse("delete", 0L)}}""")
        n
      }
      timed("scan_before_rename") { cl.read(spark).count() }
      cl.renameColumn("l_quantity", "qty")
      timed("scan_after_rename_epochs") { cl.read(spark).count() }

      // ARRAY-ELEMENT bounds at 2.4M rows (r10 verdict #6): tags arrays
      // range-clustered on the id — array_contains on a point value must
      // keep O(1) of 64 files from element bounds alone, and the pruned
      // scan beats the full filter by the unread files
      {
        val ae = SnapshotTable.at(java.nio.file.Files
          .createTempDirectory("graft-arrayprobe").toString)
        val aeDf = spark.range(2400000L).select(col("id"),
          array(col("id"), col("id") + 1, col("id") + 2).as("tags"))
          .repartitionByRange(64, col("id"))
        ae.createOrReplace(aeDf)
        val probeCond = array_contains(col("tags"), lit(1200000L))
        val (kept, total) = ae.pruneCounts(probeCond)
        println(s"""{"stage":"array_element_prune_census",""" +
          s""""kept":$kept,"total":$total}""")
        timed("array_contains_pruned_scan") {
          ae.readWhere(spark, probeCond).count()
        }
        timed("array_contains_full_filter") {
          ae.read(spark).filter(probeCond).count()
        }
      }

      // DISTRIBUTION MODES at 2.4M rows: partition by a HASH-like value
      // (key % 4 — zero key locality, unlike withP's range blocks, so
      // the partitioning itself buys no bounds) and contrast the
      // layouts: hash mode's one-file-per-value spans the full key
      // range (no prune), range mode's (p, sort-key) slices subdivide
      // each partition's key range 32/4 = 8 ways and prune to the
      // matching slices; none mode trades files for the saved shuffle.
      // (The value count must stay well below the shuffle slice count:
      // the range key leads with p, so p-values ≥ slices would consume
      // every slice and leave the sort column unsplit — the same sizing
      // rule Iceberg's range distribution lives by.)
      {
        val hashed = withP.withColumn("p", pmod(col("l_orderkey"), lit(4)))
        // AQE partition coalescing folds 2 MB range slices back together
        // at probe scale (64 MB advisory) — at 100 TB each slice clears
        // the advisory size and survives. Coalescing is disabled for
        // these writes so the probe measures the LAYOUT the modes
        // produce, not the toy data size.
        val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
        val coalesceOld = spark.conf.get(coalesceKey)
        spark.conf.set(coalesceKey, "false")
        def modeTable(mode: String, extra: Map[String, String] = Map.empty) = {
          val t = SnapshotTable.at(java.nio.file.Files
            .createTempDirectory(s"graft-distmode-$mode").toString)
          t.createOrReplace(hashed, Seq("p"),
            Map("write.graft.distribution-mode" -> mode) ++ extra)
          t
        }
        val probe = col("l_orderkey") <= oCut
        val h = modeTable("hash")
        val r = modeTable("range", Map("write.graft.sort-order" -> "l_orderkey"))
        val nn = modeTable("none")
        val (hk, ht) = h.pruneCounts(probe)
        val (rk, rt) = r.pruneCounts(probe)
        println(s"""{"stage":"distribution_mode_census",""" +
          s""""hash_kept":$hk,"hash_total":$ht,""" +
          s""""range_kept":$rk,"range_total":$rt,""" +
          s""""none_files":${nn.currentManifest.files.size}}""")
        spark.conf.set(coalesceKey, coalesceOld)
        timed("range_mode_pruned_scan") { r.readWhere(spark, probe).count() }
        timed("hash_mode_pruned_scan") { h.readWhere(spark, probe).count() }
      }

      // VIEW store at 1k REPLACE versions (r10 verdict #7): each create
      // LISTS the version dir to find the next number — O(versions) per
      // REPLACE by design; this probe records the constant. Reads parse
      // only the current doc and stay O(1) in the version count.
      {
        val vdir = java.nio.file.Files
          .createTempDirectory("graft-viewprobe").toString
        val vroot = s"$vdir/v1k"
        val t0 = System.nanoTime()
        (1 to 1000).foreach(i => graft.table.ViewStore.create(vroot,
          s"SELECT $i AS x", orReplace = true, ifNotExists = false))
        val dt = (System.nanoTime() - t0) / 1e9
        // dt seconds over 1000 replaces ≡ dt milliseconds per replace
        println(f"""{"stage":"view_replace_x1000","sec":$dt%.2f,""" +
          f""""per_replace_ms":$dt%.3f}""")
        val t1 = System.nanoTime()
        val cur = graft.table.ViewStore.currentVersion(vroot)
        val sqlTxt = graft.table.ViewStore.sql(vroot)
        require(cur == 1000L && sqlTxt.contains("1000"))
        println(f"""{"stage":"view_read_at_1k_versions",""" +
          f""""sec":${(System.nanoTime() - t1) / 1e9}%.4f}""")
      }
    }

    if (!storageOnly) {
    // embeddings ×K: deterministic per-copy perturbation of one dimension
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = emb0
      .withColumn("c", explode(sequence(lit(0), lit(embCopies - 1))))
      .select((col("vec_id") * embCopies + col("c")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === pmod(col("c"), lit(64)),
            x + (col("c") % 7).cast("float") * 0.01f).otherwise(x))
          .as("embedding"))
      .repartition(64)
      .cache()
    val nEmb = emb.count()
    println(s"""{"stage":"amplify_embeddings","rows":$nEmb}""")

    timed("kmeans_train_k64x2") {
      Similarity.trainCentroids(emb, "vec_id", "embedding", k = 64, iters = 2)
        .count()
    }
    timed("ivf_ann_topk") {
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        k = 64, iters = 2)
      Similarity.ivfTopK(emb, cents,
        emb.filter(col("vec_id") % 1000 === 0), "vec_id", "embedding",
        k = 10, nProbe = 4).count()
    }
    locally {
      // SQ8 flat ANN at 100k vectors: the index is a real BINARY column
      // — record its exact byte census vs the float32 corpus (the 4×
      // at-rest/in-shuffle claim, measured not asserted), then the flat
      // byte-kernel scan for the same 0.1% query set
      val bounds = Similarity.sq8Bounds(emb, "embedding").cache()
      val codes = Similarity.sq8Encode(emb, "vec_id", "embedding", bounds)
        .cache()
      timed("sq8_encode") { codes.count() }
      val codeBytes = codes.agg(sum(length(col("codes")))).head.getLong(0)
      val floatBytes = emb.agg(sum(size(col("embedding")) * 4L)).head
        .getLong(0)
      println(s"""{"stage":"sq8_index_bytes","code_bytes":$codeBytes,""" +
        s""""float32_bytes":$floatBytes}""")
      timed("sq8_topk") {
        Similarity.sq8TopK(emb, emb.filter(col("vec_id") % 1000 === 0),
          "vec_id", "embedding", k = 10, shortlist = 50).count()
      }
    }
    timed("pq_encode_and_topk") {
      // PQ at 100k vectors: train 8×16 codebooks, encode (m bytes a
      // vector), ADC-score a 0.1% query set to a 50-shortlist, exact
      // re-rank — the IVF-PQ scoring half at corpus scale
      val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16, iters = 2)
      Similarity.pqTopK(emb, books, emb.filter(col("vec_id") % 1000 === 0),
        "vec_id", "embedding", k = 10, m = 8,
        shortlist = 50).count()
    }
    locally {
      // IVFADC (composed IVF×PQ) vs the exhaustive flat-ADC above: the
      // candidate census is the scale evidence — ADC-scored rows shrink
      // by the probed-cell fraction (Q·N → Σ probed cell sizes), the
      // difference between a billion-vector index answering and
      // scanning. Two nprobe points record the recall/work trade.
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        k = 64, iters = 2).cache()
      timed("ivfpq_train_centroids_k64") { cents.count() }
      val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16, iters = 2).cache()
      timed("ivfpq_train_codebooks_8x16") { books.count() }
      val queries = emb.filter(col("vec_id") % 1000 === 0)
      for (np <- Seq(4, 8)) {
        timed(s"ivfpq_topk_nprobe$np") {
          Similarity.ivfPqTopK(emb, cents, books, queries,
            "vec_id", "embedding", k = 10, m = 8, nProbe = np,
            shortlist = 50).count()
        }
      }
      // exact candidate census at nprobe=4: probed-cell candidate rows
      // vs the exhaustive Q·(N-1) the flat layout scores
      val nQ = queries.count()
      val probedRows = Similarity.ivfCandidateCensus(emb, cents, queries,
        "vec_id", "embedding", nProbe = 4)
      println(s"""{"stage":"ivfpq_candidate_census","nprobe":4,""" +
        s""""candidate_rows":$probedRows,"exhaustive_rows":${nQ * (nEmb - 1)}}""")
      // label-constrained approximate hard negatives (q152's operator):
      // same cell routing under the label inequality — the census is
      // the admitted (anchor, other-label candidate) rows vs the exact
      // miner's full product
      val anchors = emb.filter(col("vec_id") % 1000 === 0)
        .withColumn("label", pmod(col("vec_id"), lit(5)))
      val corpus = emb.withColumn("label", pmod(col("vec_id"), lit(5)))
      timed("hard_negatives_ivf_topk") {
        Similarity.hardNegativesIvf(anchors, corpus, cents,
          "vec_id", "embedding", "label", k = 5, nProbe = 4).count()
      }
      val hnRows = Similarity.hardNegativesIvfCensus(anchors, corpus,
        cents, "vec_id", "embedding", "label", nProbe = 4)
      println(s"""{"stage":"hard_negatives_ivf_census","nprobe":4,""" +
        s""""candidate_rows":$hnRows,"exhaustive_rows":${nQ * (nEmb - nEmb / 5)}}""")
    }
    timed("embed_neardup_lsh") {
      Dedup.embeddingNearDups(emb, "vec_id", "embedding",
        threshold = 0.98, signBits = 12, tables = 8, maxBucketSize = 2000)
        .count()
    }
    timed("semantic_dedup_sweep") {
      // pair edges → components → per-id sweep map (SemDeDup shape); at
      // 0.98 the amplified copies of each base vector form one cluster
      val sweep = graft.operators.Pipelines.semanticDedup(emb,
        "vec_id", "embedding", threshold = 0.98, signBits = 12, tables = 8)
      val kept = sweep.filter(col("kept")).count()
      println(s"""{"stage":"semantic_dedup_census","kept":$kept}""")
      sweep.count()
    }
    emb.unpersist()
    }
    if (!storageOnly) {
      // deterministic exact-quota sampling over the amplified corpus:
      // histogram threshold selection, no whole-stratum window
      val docsS = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "lang")
        .withColumn("c", explode(sequence(lit(0), lit(docCopies - 1))))
        .select((col("doc_id") * docCopies + col("c")).as("doc_id"), col("lang"))
        .repartition(64).cache()
      val nS = docsS.count()
      timed(s"stratified_sample_${nS}") {
        val quotas = docsS.select(col("lang")).distinct()
          .withColumn("quota", lit(10000L))
        graft.operators.Sampling
          .stratifiedSampleExact(docsS, "doc_id", "lang", quotas).count()
      }
      docsS.unpersist()
    }
    spark.stop()
  }

  /** Manifest-at-scale probe (`runMain graft.ScaleProbe manifest`) — no
    * data files, no Spark jobs: 2^20 file entries ≈ a 100 TB table at
    * ~100 MB files. Proves the chunked manifest keeps planning and
    * commits O(touched documents), not O(live files):
    *   - opening the table parses the main document only (chunk refs);
    *   - metadata row count answers from rollups with zero doc parses;
    *   - a partition point-lookup plans from ONE bucket's document;
    *   - a one-partition commit parses one bucket and writes one new
    *     document — the full O(n) serialization happens once at table
    *     birth, never per commit.
    * A range predicate on an unclustered column is reported too: hash
    * buckets mix partitions, so doc-level skipping honestly does NOT
    * apply there (file-level stats still bound the data scan).
    */
  /** Per-column parquet BLOOM FILTERS at 2.4M rows, MULTI-row-group
    * (r13 verdict #4 — the r12 probe could only record parity at one
    * row group per file, where the filter can't beat footer bounds):
    * `write.parquet.row-group-size-bytes` forces many row groups per
    * file, and the probed column `k` is a multiplicative scramble of
    * l_orderkey, so EVERY row group's min/max spans the whole domain
    * (no stats/page-index skip is possible) — any reduction in
    * scan-output rows is the bloom row-group skip and nothing else.
    */
  private def bloomStage(spark: SparkSession,
                         withP: DataFrame): Unit = {
    import graft.table.SnapshotTable
    val scattered = withP.withColumn("k",
      pmod(col("l_orderkey") * lit(2654435761L), lit(1L << 31)))
    val bl = SnapshotTable.at(java.nio.file.Files
      .createTempDirectory("graft-bloomprobe").toString)
    bl.createOrReplace(scattered, Seq("p"), properties = Map(
      "write.parquet.bloom-filter-enabled.column.k" -> "true",
      "write.parquet.row-group-size-bytes" -> (128 * 1024).toString))
    val nb = SnapshotTable.at(java.nio.file.Files
      .createTempDirectory("graft-nobloomprobe").toString)
    nb.createOrReplace(scattered, Seq("p"), properties = Map(
      "write.parquet.row-group-size-bytes" -> (128 * 1024).toString))
    // footer evidence: the fixture really is multi-row-group
    val firstFile = bl.currentManifest.files.head
    val rgCount = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      scala.util.Using.resource(ParquetFileReader.open(
        HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(
            bl.root.resolve(firstFile.path).toString),
          spark.sparkContext.hadoopConfiguration)))(
        _.getFooter.getBlocks.size)
    }
    val probeKey = scattered
      .filter(col("l_orderkey") === lit(1L)).select(col("k"))
      .head.getLong(0)
    def lookup(t: SnapshotTable): (Long, Long, Double) = {
      val df = t.readWhere(spark, col("k") === probeKey)
      val t0 = System.nanoTime()
      val hits = df.collect().length.toLong
      val sec = (System.nanoTime() - t0) / 1e9
      // scan-node output rows = rows surviving parquet's own
      // row-group/page filtering (Spark's Filter above the scan is not
      // counted) — THE skip metric
      val scanned = df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      (hits, scanned, sec)
    }
    val (hitsB, scanB, secB) = lookup(bl)
    val (hitsN, scanN, secN) = lookup(nb)
    require(hitsB == hitsN, s"bloom twin disagreement: $hitsB vs $hitsN")
    println(f"""{"stage":"bloom_rowgroup_skip","row_groups_per_file":$rgCount,"scan_rows_bloom":$scanB,"scan_rows_nobloom":$scanN,"hits":$hitsB,"sec_bloom":$secB%.2f,"sec_nobloom":$secN%.2f}""")
  }

  private def manifestProbe(): Unit = {
    import graft.table._
    import java.nio.file.{Files => JF}
    import org.apache.spark.sql.functions.col
    val nFiles = 1 << 20
    val nParts = 4096
    val root = JF.createTempDirectory("graft-manifest-probe")
    val meta = JF.createDirectories(root.resolve("meta"))
    def entry(i: Int, seq: Long): FileEntry = {
      val p = i % nParts
      val lo = i.toLong * 1000
      FileEntry(s"data/v$seq/p=$p/part-$i.parquet",
        Map("p" -> p.toString), seq,
        stats = Map("id" -> ColBounds(lo.toString, (lo + 999).toString),
          "p" -> ColBounds(p.toString, p.toString)),
        nulls = Map("id" -> 0L), rows = 1000L)
    }
    def timed[T](name: String)(f: => T): T = {
      val c0 = ManifestJson.chunkParses.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val parses = ManifestJson.chunkParses.get() - c0
      val usedMb = (Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory) / (1 << 20)
      println(f"""{"stage":"$name","sec":$dt%.3f,""" +
        f""""chunk_doc_parses":$parses,"heap_used_mb":$usedMb}""")
      r
    }
    timed(s"manifest_full_write_$nFiles") {
      val entries = (0 until nFiles).map(entry(_, 1L))
      ManifestJson.write(meta.resolve("v1.json"),
        Manifest(1L, 1000L, "id BIGINT, p INT", entries, Seq("p"), Map.empty))
      JF.write(meta.resolve("_current"),
        "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    System.gc()
    val tbl = SnapshotTable.at(root.toString)
    val m1 = timed("manifest_open")(tbl.currentManifest)
    val fl = m1.files.asInstanceOf[FileList]
    println(s"""{"stage":"manifest_shape","docs":${fl.chunks.size},""" +
      s""""files":${timed("file_census")(m1.files.size)},""" +
      s""""rows":${timed("rowcount_rollup")(tbl.rowCount.getOrElse(-1L))}}""")
    timed("point_lookup_planning") {
      val (kept, total) = tbl.pruneCounts(col("p") === 7)
      println(s"""{"stage":"point_lookup_kept","kept":$kept,"total":$total}""")
    }
    timed("range_planning_unclustered") {
      val (kept, total) = tbl.pruneCounts(col("id") <= 100000)
      println(s"""{"stage":"range_kept","kept":$kept,"total":$total}""")
    }
    // metadata-only filtered COUNT/MIN/MAX at 2^20 entries: the census
    // must ride the chunk point-skip (r7 "what's wrong" #3 — the naive
    // m.files walk parsed every document); parses print with the stage
    locally {
      val spark = graft.core.GraftSession.get("graft-scale-probe")
      timed("sql_partition_filtered_count") {
        val n = tbl.partitionFilteredCount(spark, Seq("p"), col("p") === 7)
        require(n.contains(256L * 1000),
          s"partition p=7 holds 256 files x 1000 rows, got $n")
      }
      timed("sql_partition_filtered_minmax") {
        val mm = tbl.partitionFilteredMinMax(spark, Seq("p"),
          col("p") === 7, "id")
        require(mm.exists(_._2.isDefined), s"witnessed extremes absent: $mm")
      }
    }
    // one-partition merge commit at the manifest layer: exactly what
    // SnapshotTable.merge does after the data write — split off the
    // touched bucket, rewrite it, carry 127 documents by reference
    timed("one_partition_commit") {
      val touched = Set(Map("p" -> "7"))
      val (clean, loose, touchedFiles) = fl.splitTouched(touched)
      val fresh = touchedFiles.indices.map(i => entry(7 + i * nParts, 2L))
      ManifestJson.write(meta.resolve("v2.json"),
        Manifest(2L, 2000L, "id BIGINT, p INT",
          new FileList(loose ++ fresh, clean, fl.nBuckets, meta),
          Seq("p"), Map.empty))
      JF.write(meta.resolve("_current"),
        "2".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val tbl2 = SnapshotTable.at(root.toString)
    timed("reopen_after_commit") {
      require(tbl2.currentManifest.files.size == nFiles,
        s"expected $nFiles files after the one-partition commit")
      require(tbl2.rowCount.contains(nFiles * 1000L))
    }
    // @entries / @all_files at the 2^20-entry manifest (r11): both
    // distribute over chunk documents; entries' DELETED census is an
    // executor-side anti-join of two scans (never a driver set);
    // all_files parses each SHARED doc once across both snapshots —
    // chunk_doc_parses prints with the stages
    locally {
      val spark = graft.core.GraftSession.get("graft-scale-probe")
      timed("entries_relation_2v") {
        val byStatus = tbl2.entriesRelation(spark)
          .groupBy(col("status")).count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        println(s"""{"stage":"entries_census",""" +
          s""""added":${byStatus.getOrElse(1, 0L)},""" +
          s""""existing":${byStatus.getOrElse(0, 0L)},""" +
          s""""deleted":${byStatus.getOrElse(2, 0L)}}""")
        require(byStatus.getOrElse(1, 0L) == 256L,
          "ADDED = the one-partition commit's fresh files")
      }
      timed("all_files_relation_2v") {
        require(tbl2.allFilesRelation(spark).count() >= nFiles.toLong,
          "all_files must cover both snapshots' distinct files")
      }
    }
    // @all_entries across MANY retained snapshots sharing chunk docs
    // (r12 verdict #6): stack 14 more carry-by-reference commits on the
    // 2^20-entry manifest — 16 snapshots × ~128 docs × 2 scan sides
    // would be ~4096 re-parses per census; the shared parse-once cache
    // must keep chunk_doc_parses at O(distinct docs)
    locally {
      val spark = graft.core.GraftSession.get("graft-scale-probe")
      val fl2 = tbl2.currentManifest.files.asInstanceOf[FileList]
      timed("stack_14_carry_commits") {
        (3L to 16L).foreach { v =>
          ManifestJson.write(meta.resolve(s"v$v.json"),
            Manifest(v, 1000L * v, "id BIGINT, p INT",
              new FileList(fl2.inline :+ entry((v * 7).toInt, v),
                fl2.chunks, fl2.nBuckets, meta),
              Seq("p"), Map.empty, parent = v - 1))
          JF.write(meta.resolve("_current"),
            v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      val tbl3 = SnapshotTable.at(root.toString)
      timed("all_entries_16v") {
        val n = tbl3.allEntriesRelation(spark).count()
        println(s"""{"stage":"all_entries_census","rows":$n,""" +
          s""""snapshots":${tbl3.manifestVersions.size},""" +
          s""""docs_per_snapshot":${fl2.chunks.size}}""")
        require(n > 16L * nFiles / 2, s"stacked census too small: $n")
      }
      spark.catalog.clearCache()
    }
    // explicit manifest rewrite at 2^20 entries: the deliberate
    // O(live files) commit — bounds what a CALL rewrite_manifests costs
    // on a 100 TB table (everything else above stays O(touched docs))
    timed(s"rewrite_manifests_$nFiles") {
      tbl2.rewriteManifests(3000L)
      require(tbl2.currentManifest.files.size == nFiles)
    }
    // orphan sweep at the 2^20-entry manifest (r9 verdict #1): the old
    // driver path materializes EVERY live path of every retained
    // snapshot into one Set and walks the whole data tree
    // single-threaded — the 100 TB driver-memory/latency killer. The
    // distributed path parses unique chunk docs and lists per-commit
    // dirs on executors, anti-joins, and the driver holds only the
    // answer. Stub a 2^16-file data tree (half live, half strays) so
    // listing cost is real; the census cost comes from the full 2^20
    // manifest either way. heap_used_mb prints with each stage.
    locally {
      val spark = graft.core.GraftSession.get("graft-scale-probe")
      val nLive = 1 << 15
      timed(s"orphan_fixture_write_${2 * nLive}") {
        var i = 0
        while (i < nLive) {
          val p = root.resolve(entry(i, 1L).path)
          JF.createDirectories(p.getParent)
          JF.write(p, Array[Byte](1))
          JF.write(p.resolveSibling(s"part-stray-$i.parquet"), Array[Byte](2))
          i += 1
        }
      }
      val sweepClock = System.currentTimeMillis() + 4L * 24 * 3600 * 1000
      def strayCount: Long = {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(JF.walk(root.resolve("data")))(
          _.iterator().asScala.count(
            _.getFileName.toString.startsWith("part-stray-")).toLong)
      }
      System.gc()
      timed("orphan_sweep_driver_walk") {
        val removed = tbl2.removeOrphanFiles(nowMs = sweepClock)
        require(removed.count(_.contains("part-stray-")) == nLive,
          "driver sweep must reclaim every stray")
      }
      timed("orphan_restub") {
        var i = 0
        while (i < nLive) {
          val p = root.resolve(entry(i, 1L).path)
          JF.write(p.resolveSibling(s"part-stray-$i.parquet"), Array[Byte](2))
          i += 1
        }
      }
      System.gc()
      timed("orphan_sweep_distributed") {
        val removed = tbl2.removeOrphanFiles(spark,
          3L * 24 * 3600 * 1000, sweepClock, 0L)
        require(removed.count(_.contains("part-stray-")) == nLive,
          "distributed sweep must reclaim every stray")
      }
      require(strayCount == 0L)
      // live stubs survived both sweeps
      require(JF.exists(root.resolve(entry(0, 1L).path)) &&
        JF.exists(root.resolve(entry(nLive - 1, 1L).path)),
        "live files must survive both sweeps")
    }
  }
}
