package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions) // SQL DML/relations (q71)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated prefix filter for local iteration
    // (SPARK_GRAFT_ONLY=q49,q60); the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith)) }
    // storage-backed lifecycle queries (temp tables, commit IO) swing
    // ±30% with machine load — their cost is filesystem commits, not plan
    // execution — so they get 3 attempts and report the MEDIAN;
    // plan-bound queries keep best-of-2 (min is the steady-state number).
    val lifecycle = Set(
      "q20_replace", "q21_snapshot_lifecycle", "q22_bucket_transform",
      "q23_maintenance", "q24_ingest_job", "q25_dms_cdc_job",
      "q26_stats_pruned_scan", "q27_zorder_scan", "q28_time_travel",
      "q29_incremental_read", "q60_stream_cdc_ingest", "q61_stream_dedup",
      "q62_mor_lifecycle", "q67_schema_evolution",
      "q68_partition_evolution", "q70_drop_column", "q71_sql_merge",
      "q72_sql_update_delete", "q73_catalog_merge", "q74_sql_insert",
      "q75_stream_table_tail", "q76_sql_maintenance", "q77_sql_alter",
      "q78_stream_table_sink", "q79_branch_wap", "q80_metadata_tables",
      "q84_positional_delete", "q85_changelog", "q86_sql_rename_widen",
      "q89_stream_changelog", "q90_stream_interval_join",
      "q91_sort_order_scan", "q92_cdc_apply", "q94_dynamic_overwrite",
      "q95_cdc_keyed_replication", "q96_sql_partition_ddl",
      "q97_transform_prune", "q98_meta_count", "q99_sql_branch_wap",
      "q100_show_partitions", "q101_meta_minmax_filtered", "q102_ref_ddl",
      "q103_stream_bytes_admission", "q104_add_files", "q105_cherrypick",
      "q106_snapshot_mgmt", "q107_snapshot_table", "q108_wap_publish",
      "q109_metadata_delete", "q110_stream_from_timestamp",
      "q111_meta_count_pending_deletes", "q112_ref_retention",
      "q113_table_stats_ndv", "q114_ancestors_of",
      "q115_sort_strategy_rewrite", "q116_stream_tail_split",
      "q117_struct_lifecycle", "q118_bucket_string_prune",
      "q119_view_lifecycle", "q120_catalog_view_lifecycle",
      "q121_entries_all_files", "q125_sql_rename_to",
      "q127_position_deletes", "q130_metadata_namespace",
      "q134_register_table", "q135_migrate_in_place",
      "q137_stream_outer_join", "q138_changelog_net_view")
    // plan-bound but variance-prone (BENCH_NOTES.md): extra attempt,
    // still reporting the min
    val extraAttempt = Set("q49_embed_top_pairs")
    // plan-bound queries that swung hardest with driver-JVM state in the
    // r7 round-of-record (BENCH_NOTES.md r8: q35 43.9s in-process vs
    // 5.3s same-code isolated) — isolated alongside the lifecycle set
    val heavy = Set(
      "q35_minhash_neardup", "q36_simhash_neardup", "q37_ngram_jaccard",
      "q38_embed_topk", "q49_embed_top_pairs", "q53_dedup_clusters",
      "q83_semantic_dedup", "q124_embed_ann_pq", "q126_embed_ann_ivfpq",
      "q136_embed_ann_truncated")
    // Isolation mode: run each lifecycle/heavy query in a fresh child
    // JVM (classpath + JVM flags inherited) — the accumulated-driver-
    // state swings (q60 r5 / q84 r6 / the q35-q53 block r7: 3-12×
    // in-suite vs isolated) vanish, making round-over-round numbers
    // comparable. ON BY DEFAULT since r8 (the r7 round-of-record
    // measured driver-JVM entropy, not the engine); SPARK_GRAFT_ISOLATE=0
    // opts out for quick local iteration.
    val isolate = !sys.env.get("SPARK_GRAFT_ISOLATE")
      .exists(v => Set("0", "false", "off").contains(v.toLowerCase))
    // JVM/codegen warm-up on the smallest sf so steady-state throughput is
    // measured, not first-call classloading. Isolated-bound queries warm
    // up inside their own child JVM (BenchOne) — warming them here too
    // would only burn wall-clock in a JVM that never times them.
    selected.foreach { case (name, fn) =>
      if (!(isolate && (lifecycle(name) || heavy(name)))) {
        try fn(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }
    def runIsolated(name: String, attempts: Int): Seq[(Double, Option[String])] = {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin); cmd.addAll(jvmArgs)
      cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
      cmd.add("graft.BenchOne")
      cmd.add(name); cmd.add(sfDir); cmd.add(attempts.toString); cmd.add(cpus)
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
        .getLines().toList
      p.waitFor()
      out.find(_.startsWith("BENCHONE\t")) match {
        case Some(line) =>
          line.split('\t').drop(1).toSeq.map {
            case f if f.startsWith("t:") => (f.drop(2).toDouble, None)
            case f => (0.0, Some(f.stripPrefix("e:")))
          }
        case None => Seq((0.0, Some(
          s"isolated child produced no result (exit ${p.exitValue()})")))
      }
    }
    val results = selected.map { case (name, fn) =>
      // tracked PER ATTEMPT: a query is an error only when every attempt
      // failed; one flaky attempt must neither masquerade as a fast
      // success nor discard the other attempts' valid timings.
      val nAttempts = if (lifecycle(name) || extraAttempt(name)) 3 else 2
      val attempts: Seq[(Double, Option[String])] =
        if (isolate && heavy(name) && !lifecycle(name))
          // SEPARATE child JVMs, one timed attempt each: with both
          // attempts inside one child, a single co-loaded JVM sample
          // became the round's number of record three rounds running
          // (r11 VERDICT: driver q53 63.6s vs 2.9-4.4s on unchanged
          // code) — min across independent children is robust to it
          (1 to math.max(2, nAttempts)).flatMap(_ => runIsolated(name, 1))
        else if (isolate && (lifecycle(name) || heavy(name)))
          runIsolated(name, nAttempts)
        else (0 until nAttempts).map { _ =>
          val t0 = System.nanoTime()
          val outcome =
            try { fn(spark, sfDir).count(); None }
            catch { case e: Throwable => Some(BenchOne.escape(e)) }
          val t = (System.nanoTime() - t0) / 1e9
          // per-query isolation: operators may cache intermediates
          spark.catalog.clearCache()
          (t, outcome)
        }
      // per-attempt detail on STDERR (the driver parses stdout's JSON):
      // the raw evidence a min/median hides — attempt degradation inside
      // one child JVM vs a uniformly slow machine read differently when
      // a round-over-round regression needs a root cause
      System.err.println(("BENCH_ATTEMPTS\t" + name + "\t" +
        attempts.map {
          case (t, None) => f"$t%.3f"
          case (_, Some(e)) => s"err:$e"
        }.mkString("\t")))
      val good = attempts.collect { case (t, None) => t }.sorted
      if (good.nonEmpty) {
        val t = if (lifecycle(name)) good(good.size / 2) else good.head
        (name, t, None)
      } else (name, 0.0, attempts.last._2)
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val mode = if (isolate) "isolated-lifecycle+heavy" else "in-process"
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","mode":"$mode"}"""
    println(line)
    // durable copy: a truncated stdout capture (BENCH_r09 lost q01-q29)
    // must never lose the round's numbers. SPARK_GRAFT_BENCH_OUT
    // overrides the destination; the default lands in the launch cwd
    // (the repo root under the driver's invocation).
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "BENCH_local.json")),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () } // stdout still rules
    spark.stop()
  }
}
