package graft

import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

import graft.core._
import graft.ingest.{AppflowStyleJob, DmsStyleJob, IngestionJob}

/** CLI with the reference's surface (reference:
  * src/data_ingestion/app.py:15-59 — `--datetime --source --table --type
  * --no-insert --no-update --no-delete --keep-deletes --optimize --test`)
  * plus local-path arguments replacing the S3/Glue plumbing.
  *
  * Example:
  * {{{
  * run --datetime 2026-08-12T00:00:00+00:00 --source appflow --table orders \
  *     --type full --keys o_orderkey --updated-at o_orderdate \
  *     --raw-root /data/raw --warehouse /data/warehouse --out /data/out [--test]
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    def req(k: String): String =
      a.getOrElse(k, sys.error(s"missing required --$k"))

    // the reference parses %z, which accepts both +00:00 and +0000 — do too
    val dtRaw = req("datetime")
    val dt =
      try OffsetDateTime.parse(dtRaw,
        DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssXXX"))
      catch { case _: java.time.format.DateTimeParseException =>
        OffsetDateTime.parse(dtRaw,
          DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssZ"))
      }

    // multi-table flow mode: --flows <config.json> runs every table in the
    // flow config (the reference's DAG-factory surface, Airflow-free)
    if (a.contains("flows")) {
      val preexistingF =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val sparkF = GraftSession.get("graft-flows")
      try {
        val results = graft.ingest.FlowRunner.run(sparkF, a("flows"),
          req("raw-root"), req("warehouse"), req("out"), dt)
        results.foreach(r => println(
          s"[flow] ${r.source}.${r.table} mode=${r.mode} tested=${r.tested}"))
      } finally if (!preexistingF) sparkF.stop()
      return
    }
    val source = req("source")
    val isDms = source.startsWith("dms")
    // per-family key defaults (reference: salesforce.py:48-52 Id /
    // SystemModstamp; dmsdatabase1.py:73-77 recid / modifieddatetime) and
    // env-derived database naming (salesforce.py:46 {env}_clean_{source})
    val defaultKeys = if (isDms) "recid" else "Id"
    val defaultUpd = if (isDms) "modifieddatetime" else "SystemModstamp"
    val database = a.get("database")
      .orElse(a.get("env").map(e => s"${e}_clean_$source"))
      .getOrElse(source)
    val cfg = SourceConfig(
      database = database,
      table = req("table"),
      naturalKeys = a.getOrElse("keys", defaultKeys).split(',').toSeq,
      updatedAtFields = a.getOrElse("updated-at", defaultUpd).split(',').toSeq,
      partitionColumns = a.get("partition-by").map(_.split(',').toSeq).getOrElse(Nil),
      mode = IngestMode.parse(a.getOrElse("type", "full")),
      flags = IngestFlags(
        insert = !a.contains("no-insert"),
        update = !a.contains("no-update"),
        delete = !a.contains("no-delete"),
        keepDeletes = a.contains("keep-deletes")),
      optimize = Optimize.parse(a.getOrElse("optimize", "speed")))

    // only stop the session if this invocation created it (embedded callers
    // — tests, notebooks — share one session via getOrCreate)
    val preexisting =
      org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
    val spark = GraftSession.get(s"graft-${cfg.qualifiedName}")
    try {
      val job: IngestionJob = source match {
        case s if s.startsWith("dms") =>
          new DmsStyleJob(spark, cfg, s, a.getOrElse("schema", "schema1"),
            req("raw-root"), req("warehouse"), req("out"), dt)
        case s =>
          new AppflowStyleJob(spark, cfg, s,
            req("raw-root"), req("warehouse"), req("out"), dt)
      }
      if (a.contains("test")) job.test() else job.run()
    } finally if (!preexisting) spark.stop()
  }

  /** `--key value` and bare `--flag` parsing, no external dependency. */
  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val k = args(i)
      require(k.startsWith("--"), s"unexpected argument: $k")
      val key = k.stripPrefix("--")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        b += (key -> args(i + 1)); i += 2
      } else { b += (key -> "true"); i += 1 }
    }
    b.result()
  }
}
