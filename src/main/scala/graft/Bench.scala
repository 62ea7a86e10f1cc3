package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * CAPTURE SURVIVABILITY (r12 verdict #1 — the driver's r12 capture
  * timed out with nothing parseable): after EVERY query the running
  * partial result is (a) rewritten durably to `BENCH_local.json` and
  * (b) printed as a `BENCH_PARTIAL\t<json>` stdout line — a timeout at
  * any point still yields a usable prefix (the driver recovers from
  * the LAST partial line; the bare final JSON line remains the primary
  * contract and is still the only line starting with `{`). Fixed
  * overhead is cut the same round: cheap lifecycle queries run 4 per
  * child JVM instead of one each (isolation from the heavy set and
  * from accumulated PARENT state is what the mode buys — four cheap
  * storage lifecycles sharing one fresh child never reproduced the
  * r9-r11 phantom, which needed a heavy query co-loaded after a long
  * suite), expensive lifecycle queries keep their own child, and q137
  * runs ONE attempt (each attempt is three stateful micro-batch runs,
  * 12-21 s by design — BENCH_NOTES).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // quiet-window protocol (r12 verdict #7): a bench of record should
    // start when the 1-min load is below nCPU/4. Opt-in via
    // SPARK_GRAFT_QUIET_WAIT_SECS (the wait budget) — the driver's
    // capture must never stall its own timeout, so default is off; the
    // measured load lands in the JSON either way so a loaded run is
    // self-describing instead of needing a narrative.
    val quietCap = cpus.toDouble / 4
    sys.env.get("SPARK_GRAFT_QUIET_WAIT_SECS").flatMap(_.toLongOption)
      .foreach { budget =>
        val deadline = System.currentTimeMillis() + budget * 1000
        var l = loadAvg()
        while (l > quietCap && System.currentTimeMillis() < deadline) {
          System.err.println(f"BENCH_WAIT\tload $l%.2f > cap $quietCap%.2f")
          Thread.sleep(15000)
          l = loadAvg()
        }
      }
    val load0 = loadAvg()
    // COVERAGE-FIRST DEADLINE (r13 verdict #1): the r13 driver capture
    // timed out after only 64/145 queries because expensive solo
    // children (q137 alone: 122 s under driver load) ran BEFORE ~70
    // cheap batched lifecycle queries. Two defenses: (a) child ORDER is
    // now batched-lifecycle -> solo-lifecycle -> heavy, so a timeout
    // eats the expensive tail, not the coverage-dense middle; (b) an
    // optional wall-clock budget (SPARK_GRAFT_BENCH_DEADLINE_SECS) that,
    // once 70% spent, degrades the remaining work to ONE attempt in
    // larger batches — partial coverage beats full attempts of a prefix.
    val benchStart = System.currentTimeMillis()
    val deadlineSecs = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE_SECS")
      .flatMap(_.toLongOption)
    def degraded(): Boolean = deadlineSecs.exists { d =>
      System.currentTimeMillis() - benchStart > d * 700 } // 70% of d*1000
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
      "q137_stream_outer_join", "q138_changelog_net_view",
      "q140_partition_stats", "q143_row_lineage", "q144_deletion_vectors",
      "q145_column_defaults", "q147_stream_dedup_watermark",
      "q148_lineage_changelog", "q151_variant_shred",
      "q153_partition_stats_dv_debt",
      // r14 mid-build additions, classified this round: q158 is a
      // multi-commit v3 table + two AvailableNow stream passes — the
      // q143/q148 class
      "q158_stream_lineage_cdc")
    // plan-bound queries that swung hardest with driver-JVM state in the
    // r7 round-of-record (BENCH_NOTES.md r8: q35 43.9s in-process vs
    // 5.3s same-code isolated) — isolated alongside the lifecycle set
    val heavy = Set(
      "q35_minhash_neardup", "q36_simhash_neardup", "q37_ngram_jaccard",
      "q38_embed_topk", "q49_embed_top_pairs", "q53_dedup_clusters",
      "q83_semantic_dedup", "q124_embed_ann_pq", "q126_embed_ann_ivfpq",
      "q136_embed_ann_truncated", "q149_hard_negatives",
      "q152_hard_negatives_ivf",
      // r14 mid-build addition: the SQ8 ANN sibling of q124/q126/q136
      "q157_embed_ann_sq8")
    // ONE attempt: each q137 attempt is three stateful micro-batch
    // passes with dual-stream state (12-21 s by design — the single
    // biggest line item of the r12 capture timeout)
    val oneAttempt = Set("q137_stream_outer_join")
    // heavy queries whose independent children have agreed within 20%
    // across consecutive rounds (BENCH_NOTES r9/r11 per-attempt
    // tables) — one child suffices; the swingy ones keep min-of-2
    val singleChild = Set("q37_ngram_jaccard", "q38_embed_topk")
    // lifecycle queries expensive enough that co-loading them with
    // others could re-create the co-loaded-child phantom (the r9-r11
    // regression mechanism): they keep a child JVM of their own
    val soloLifecycle = Set(
      "q62_mor_lifecycle", "q90_stream_interval_join",
      "q95_cdc_keyed_replication", "q115_sort_strategy_rewrite",
      "q130_metadata_namespace", "q137_stream_outer_join",
      // r13 second session: the three multi-action v3 lifecycles read
      // 6.7-17s at sf0.1 under load — heavy enough to co-load-inflate
      // a shared child's later queries
      "q143_row_lineage", "q144_deletion_vectors",
      "q148_lineage_changelog", "q158_stream_lineage_cdc")
    // Isolation mode: lifecycle/heavy queries run in fresh child JVMs
    // (classpath + JVM flags inherited) — the accumulated-driver-state
    // swings (q60 r5 / q84 r6 / the q35-q53 block r7: 3-12× in-suite
    // vs isolated) vanish, making round-over-round numbers comparable.
    // ON BY DEFAULT since r8; SPARK_GRAFT_ISOLATE=0 opts out for quick
    // local iteration.
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
    def attemptsFor(name: String): Int =
      if (oneAttempt(name)) 1
      else if (lifecycle(name)) 3
      else 2

    /** One child JVM running the given (query, attempts) specs in
      * order; returns per-query attempt outcomes parsed from the
      * child's `BENCHONE\t<name>\t<field>...` lines.
      */
    def runChild(specs: Seq[(String, Int)])
        : Map[String, Seq[(Double, Option[String])]] = {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin); cmd.addAll(jvmArgs)
      cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
      cmd.add("graft.BenchOne")
      cmd.add(specs.map { case (n, a) => s"$n:$a" }.mkString(","))
      cmd.add(sfDir); cmd.add(cpus)
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
        .getLines().toList
      p.waitFor()
      out.filter(_.startsWith("BENCHONE\t")).map { line =>
        val parts = line.split('\t').toSeq
        parts(1) -> parts.drop(2).map {
          case f if f.startsWith("t:") => (f.drop(2).toDouble, None)
          case f => (0.0, Some(f.stripPrefix("e:")))
        }
      }.toMap
    }

    // ---- incremental result accumulation + survivable emission ----
    val acc = scala.collection.mutable.LinkedHashMap[
      String, (Double, Option[String])]()
    // raw good-attempt timings per query — feeds the final quiet
    // re-pin's >2x-spread flag
    val spreads = scala.collection.mutable.Map[String, Seq[Double]]()
    // pre-re-pin values of queries the final quiet pass improved —
    // surfaced in the JSON so a floor never lives only in prose
    val requiet = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mode = if (isolate) "isolated-lifecycle+heavy" else "in-process"
    val benchOut = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json"))
    def render(): String = {
      val qs = acc.toSeq.collect { case (k, (v, None)) =>
        "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
      // full JSON-string escaping incl. control chars: BenchOne.escape
      // only strips \n/\t, and a message carrying \r (JNI/Windows-path
      // errors) would corrupt the very partial lines the survivable
      // capture exists for
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val errs = acc.toSeq.collect { case (k, (_, Some(m))) =>
        "\"" + k + "\":\"" + esc(m) + "\""
      }.mkString("{", ",", "}")
      val total = acc.valuesIterator.collect { case (v, None) => v }.sum
      val rq = requiet.toSeq.map { case (k, v) =>
        "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"requiet":$rq,"sf":"$sfDir","mode":"$mode","load":[$load0%.2f,${loadAvg()}%.2f]}"""
    }
    def persist(line: String): Unit =
      // durable copy: a truncated stdout capture (BENCH_r09 lost
      // q01-q29; BENCH_r12 lost everything) must never lose the round
      try java.nio.file.Files.write(benchOut,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case scala.util.control.NonFatal(_) => () } // stdout rules
    def record(name: String,
               attempts: Seq[(Double, Option[String])]): Unit = {
      // per-attempt detail on STDERR (the driver parses stdout): the
      // raw evidence a min/median hides — attempt degradation inside
      // one child vs a uniformly slow machine read differently when a
      // round-over-round regression needs a root cause
      System.err.println("BENCH_ATTEMPTS\t" + name + "\t" +
        attempts.map {
          case (t, None) => f"$t%.3f"
          case (_, Some(e)) => s"err:$e"
        }.mkString("\t"))
      // a query is an error only when every attempt failed; one flaky
      // attempt must neither masquerade as a fast success nor discard
      // the other attempts' valid timings
      val good = attempts.collect { case (t, None) => t }.sorted
      spreads(name) = good
      acc(name) =
        if (good.nonEmpty)
          (if (lifecycle(name)) good(good.size / 2) else good.head, None)
        else (0.0, attempts.lastOption.map(_._2.getOrElse("no result"))
          .orElse(Some("no attempts")))
      val line = render()
      persist(line)
      println("BENCH_PARTIAL\t" + line)
    }
    def missing(n: String): Seq[(Double, Option[String])] =
      Seq((0.0, Some("isolated child produced no result")))

    // 1. in-process queries (plan-bound, not heavy)
    selected.foreach { case (name, fn) =>
      if (!(isolate && (lifecycle(name) || heavy(name)))) {
        val attempts = (0 until attemptsFor(name)).map { _ =>
          val t0 = System.nanoTime()
          val outcome =
            try { fn(spark, sfDir).count(); None }
            catch { case e: Throwable => Some(BenchOne.escape(e)) }
          val t = (System.nanoTime() - t0) / 1e9
          // per-query isolation: operators may cache intermediates
          spark.catalog.clearCache()
          (t, outcome)
        }
        record(name, attempts)
      }
    }
    if (isolate) {
      // 2. BATCHED lifecycle children FIRST (coverage-dense: ~70 cheap
      // queries, 4 per child amortizing Spark startups — r11 spent
      // 2021 s wall for 234 s measured, almost all child JVM spin-up).
      // Under a 70%-spent deadline the batch widens to 8 and attempts
      // drop to 1 — coverage beats attempt count when time is short.
      val lifeNames = selected.map(_._1).filter(lifecycle)
      val (solos, batchable) = lifeNames.partition(soloLifecycle)
      val queue = scala.collection.mutable.Queue(batchable: _*)
      while (queue.nonEmpty) {
        val deg = degraded()
        val g = (1 to (if (deg) 8 else 4)).flatMap(_ =>
          if (queue.nonEmpty) Some(queue.dequeue()) else None)
        val res = runChild(g.map(n =>
          (n, if (deg) 1 else attemptsFor(n))))
        g.foreach(n => record(n, res.getOrElse(n, missing(n))))
      }
      // 3. SOLO lifecycle children (expensive multi-commit lifecycles
      // that would co-load-inflate a shared child)
      solos.foreach { n =>
        val res = runChild(Seq((n, if (degraded()) 1 else attemptsFor(n))))
        record(n, res.getOrElse(n, missing(n)))
      }
      // 4. heavy queries LAST: SEPARATE child JVMs, one timed attempt
      // each — with both attempts inside one child, a single co-loaded
      // JVM sample became the round's number of record three rounds
      // running (r11 VERDICT: driver q53 63.6s vs 2.9-4.4s on
      // unchanged code); min across independent children is robust
      selected.map(_._1).filter(n => heavy(n) && !lifecycle(n))
        .foreach { n =>
          val children =
            if (singleChild(n) || degraded()) 1 else 2
          val att = (1 to children).flatMap(_ =>
            runChild(Seq((n, 1))).getOrElse(n, missing(n)))
          record(n, att)
        }
      // 5. FINAL QUIET RE-PIN (r13 verdict #8): queries whose attempt
      // spread exceeded 2x ran under transient load — their floor
      // should live in the record JSON, not in BENCH_NOTES prose.
      // Opt-in (SPARK_GRAFT_REQUIET_SECS = wait budget for a quiet
      // window); each flagged query re-runs once in a fresh child and
      // the record keeps min(old, re-run) with the pre-re-pin value
      // preserved under "requiet".
      sys.env.get("SPARK_GRAFT_REQUIET_SECS").flatMap(_.toLongOption)
        .foreach { budget =>
          val flagged = spreads.collect {
            case (n, ts) if ts.size >= 2 && ts.min > 0 &&
              ts.max / ts.min > 2.0 => n
          }.toSeq.sorted
          if (flagged.nonEmpty) {
            val deadline = System.currentTimeMillis() + budget * 1000
            var l = loadAvg()
            while (l > quietCap && System.currentTimeMillis() < deadline) {
              System.err.println(
                f"BENCH_REQUIET_WAIT\tload $l%.2f > cap $quietCap%.2f")
              Thread.sleep(15000)
              l = loadAvg()
            }
            flagged.foreach { n =>
              runChild(Seq((n, 1))).getOrElse(n, Nil).collect {
                case (t, None) => t
              }.minOption.foreach { t =>
                acc.get(n).foreach {
                  case (old, None) if t < old =>
                    requiet(n) = old
                    acc(n) = (t, None)
                    val line = render()
                    persist(line); println("BENCH_PARTIAL\t" + line)
                  case _ => ()
                }
              }
            }
          }
        }
    }
    val line = render()
    println(line)
    persist(line)
    spark.stop()
  }
}
