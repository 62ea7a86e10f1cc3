package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.Ingestion

/** Property-style test of the SURVEY.md §2.12 mode × flag matrix: random
  * seeded scenarios are run through the engine AND through an independent
  * in-memory model of the reference semantics; outputs must match as
  * multisets. This is the coverage the single-scenario oracles can't give:
  * arbitrary overlaps, duplicate-free key spaces, stale updates, and every
  * flag combination.
  */
class ModeMatrixPropertySpec extends SparkSpec {
  import spark.implicits._

  case class Row(id: Long, upd: Int, v: Double)

  private def ts(i: Int) = Timestamp.valueOf(f"2026-01-0${i + 1} 00:00:00")

  /** Independent model of full/incremental semantics. */
  private def model(source: Seq[Row], target: Seq[Row], mode: IngestMode,
                    flags: IngestFlags): Map[Long, (Row, Boolean)] = {
    val s = source.map(r => r.id -> r).toMap
    val t = target.map(r => r.id -> r).toMap
    val allowDeletes = mode == IngestMode.Full
    val out = scala.collection.mutable.Map[Long, (Row, Boolean)]()
    for ((id, tr) <- t) {
      s.get(id) match {
        case Some(sr) if flags.update && sr.upd > tr.upd =>
          out(id) = (sr, false) // update wins
        case Some(_) =>
          out(id) = (tr, false) // match but not newer (or updates off)
        case None =>
          if (flags.delete && allowDeletes) {
            if (flags.keepDeletes) out(id) = (tr, true) // soft delete
            // else: hard delete — row gone
          } else out(id) = (tr, false) // deletes off / incremental
      }
    }
    if (flags.insert)
      for ((id, sr) <- s if !t.contains(id)) out(id) = (sr, false)
    out.toMap
  }

  test("engine matches the model over 30 random mode/flag scenarios") {
    val rnd = new scala.util.Random(7)
    for (i <- 0 until 30) {
      val targetRows = (0 until 25).filter(_ => rnd.nextBoolean())
        .map(k => Row(k, rnd.nextInt(3), rnd.nextInt(100)))
      val sourceRows = (0 until 25).filter(_ => rnd.nextBoolean())
        .map(k => Row(k, rnd.nextInt(3), rnd.nextInt(100)))
      val mode = if (rnd.nextBoolean()) IngestMode.Full else IngestMode.Incremental
      val flags = IngestFlags(
        insert = rnd.nextBoolean(), update = rnd.nextBoolean(),
        delete = rnd.nextBoolean(), keepDeletes = rnd.nextBoolean())
      val cfg = SourceConfig("p", "p", Seq("id"), Seq("upd"),
        mode = mode, flags = flags)

      def df(rows: Seq[Row]) = {
        val base = rows.map(r => (r.id, ts(r.upd), r.v)).toDF("id", "upd", "v")
        Ingestion.stamp(base, ts(0), flags.keepDeletes)
      }
      val got = Ingestion.applyMode(df(sourceRows), df(targetRows), cfg)
      val gotMap =
        if (flags.keepDeletes)
          got.select("id", "upd", "v", MetaColumns.HardDeleted)
            .collect().map(r => r.getLong(0) ->
              ((r.getTimestamp(1), r.getDouble(2)), r.getBoolean(3))).toMap
        else got.select("id", "upd", "v")
          .collect().map(r => r.getLong(0) ->
            ((r.getTimestamp(1), r.getDouble(2)), false)).toMap
      val expected = model(sourceRows, targetRows, mode, flags)
        .map { case (id, (r, del)) => id -> ((ts(r.upd), r.v), del) }
      assert(gotMap == expected,
        s"scenario $i mode=$mode flags=$flags\n tgt=$targetRows\n src=$sourceRows")
    }
  }
}
