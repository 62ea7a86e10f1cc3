package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.OffsetDateTime

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.table.JsonLite

/** Config-driven multi-table runner: the Airflow-free equivalent of the
  * reference's DAG factories (dags/data_ingestion_dms.py:151-182 +
  * dms_flows.yaml / appflow_flows.yaml). A flow config declares
  * `{source: {table: {type, schema, keep_deletes, keys, updated_at,
  * partition_by}}}`; the runner builds the per-table job, runs it, and —
  * exactly like the DAGs (data_ingestion_dms.py:179-182) — appends the
  * set-difference test ONLY for `full`/`replace` ingests (incremental/cdc
  * raw windows no longer equal the table).
  *
  * Tables run CONCURRENTLY on a bounded pool, mirroring the DAG's
  * parallel per-table task fan-out (data_ingestion_dms.py:165-176,
  * Airflow scheduler slots ≙ the pool bound). Safe because each table
  * owns a disjoint warehouse root and output dir, and Spark schedules
  * jobs from multiple threads natively; results keep config order and
  * the first failure propagates after the pool drains.
  *
  * Config format is JSON (this build is offline — no YAML dependency);
  * the structure mirrors the reference's YAML one-to-one.
  */
object FlowRunner {

  final case class FlowResult(source: String, table: String,
                              mode: IngestMode, tested: Boolean)

  def run(spark: SparkSession, configPath: String, rawRoot: String,
          warehouseRoot: String, outputRoot: String,
          runDatetime: OffsetDateTime,
          parallelism: Int = 4): Seq[FlowResult] = {
    val json = new String(Files.readAllBytes(Paths.get(configPath)),
      StandardCharsets.UTF_8)
    val flows = JsonLite.parse(json).asInstanceOf[Map[String, Any]]
    val specs = flows.toSeq.sortBy(_._1).flatMap { case (source, tablesAny) =>
      val tables = tablesAny.asInstanceOf[Map[String, Any]]
      tables.toSeq.sortBy(_._1).map { case (tableName, specAny) =>
        (source, tableName, specAny.asInstanceOf[Map[String, Any]])
      }
    }
    def runOne(source: String, tableName: String,
               spec: Map[String, Any]): FlowResult = {
      def str(k: String, default: String) =
        spec.get(k).map(_.asInstanceOf[String]).getOrElse(default)
      def bool(k: String) =
        spec.get(k).exists(_.asInstanceOf[Boolean])
      val isDms = source.startsWith("dms")
      val mode = IngestMode.parse(str("type", "full"))
      val cfg = SourceConfig(
        database = str("database", source),
        table = tableName,
        naturalKeys = str("keys", if (isDms) "recid" else "Id")
          .split(',').toSeq,
        updatedAtFields = str("updated_at",
          if (isDms) "modifieddatetime" else "SystemModstamp").split(',').toSeq,
        partitionColumns = spec.get("partition_by")
          .map(_.asInstanceOf[String].split(',').toSeq).getOrElse(Nil),
        mode = mode,
        flags = IngestFlags(keepDeletes = bool("keep_deletes")),
        optimize = Optimize.parse(str("optimize", "speed")))
      val job: IngestionJob =
        if (isDms)
          new DmsStyleJob(spark, cfg, source, str("schema", "schema1"),
            rawRoot, warehouseRoot, outputRoot, runDatetime)
        else
          new AppflowStyleJob(spark, cfg, source,
            rawRoot, warehouseRoot, outputRoot, runDatetime)
      job.run()
      val tested =
        mode == IngestMode.Full || mode == IngestMode.Replace
      if (tested) job.test()
      FlowResult(source, tableName, mode, tested)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, specs.size)))
    try {
      val futures = specs.map { case (s, t, sp) =>
        pool.submit(new java.util.concurrent.Callable[FlowResult] {
          override def call(): FlowResult = runOne(s, t, sp)
        })
      }
      // await EVERY future before surfacing a failure: throwing at the
      // first failed get() would return while later tables are still
      // ingesting and committing in pool threads — the caller would see
      // a failed run whose warehouse keeps mutating afterward. Outcomes
      // stay in config order; the first failure (by that order) is
      // rethrown once everything has stopped.
      val outcomes = futures.map(f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException => Left(e.getCause)
          case e: InterruptedException =>
            // the CALLER is being cancelled — don't keep blocking on the
            // remaining tables; interrupt the workers and restore the flag
            pool.shutdownNow()
            Thread.currentThread().interrupt()
            throw e
        })
      outcomes.collectFirst { case Left(e) => e }.foreach(throw _)
      outcomes.collect { case Right(r) => r }
    } finally pool.shutdown()
  }
}
