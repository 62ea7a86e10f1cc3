package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.Ingestion
import graft.merge.{ChangeSet, Merge}

/** Change detection + merge semantics on hand-built scenarios, including
  * composite natural keys and every mode × flag cell of SURVEY.md §2.12.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // target: 4 rows keyed (k1,k2)
  private def target = Seq(
    (1L, "a", ts("2026-01-01 00:00:00"), 10.0),
    (2L, "a", ts("2026-01-01 00:00:00"), 20.0),
    (3L, "b", ts("2026-01-01 00:00:00"), 30.0),
    (4L, "b", ts("2026-01-01 00:00:00"), 40.0)
  ).toDF("k1", "k2", "updated_at", "v")

  // source: key (1,a) unchanged, (2,a) newer, (3,b) stale update (ignored),
  // (4,b) missing (delete), (5,c) new
  private def source = Seq(
    (1L, "a", ts("2026-01-01 00:00:00"), 10.0),
    (2L, "a", ts("2026-02-01 00:00:00"), 21.0),
    (3L, "b", ts("2025-12-01 00:00:00"), 31.0),
    (5L, "c", ts("2026-02-01 00:00:00"), 50.0)
  ).toDF("k1", "k2", "updated_at", "v")

  private val keys = Seq("k1", "k2")
  private val upd = Seq("updated_at")

  test("inserts / deletes / updates detect the right composite keys") {
    assert(ChangeSet.inserts(source, target, keys).select("k1").as[Long]
      .collect().toSet == Set(5L))
    assert(ChangeSet.deletes(source, target, keys, keepDeletes = false)
      .select("k1").as[Long].collect().toSet == Set(4L))
    assert(ChangeSet.updates(source, target, keys, upd)
      .select("k1").as[Long].collect().toSet == Set(2L))
  }

  test("full merge applies I/U/D; stale update ignored") {
    val cfg = SourceConfig("t", "t", keys, upd, mode = IngestMode.Full)
    val out = Ingestion.applyMode(source, target, cfg)
      .select("k1", "v").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 10.0, 2L -> 21.0, 3L -> 30.0, 5L -> 50.0))
  }

  test("incremental merge keeps vanished keys") {
    val cfg = SourceConfig("t", "t", keys, upd, mode = IngestMode.Incremental)
    val out = Ingestion.applyMode(source, target, cfg)
      .select("k1").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("disabled flags empty the corresponding legs") {
    val noIns = ChangeSet.build(source, target, keys, upd,
      IngestFlags(insert = false), allowDeletes = true)
    assert(noIns.filter($"op" === "I").count() == 0)
    assert(noIns.filter($"op" === "D").count() == 1)
    val noDel = ChangeSet.build(source, target, keys, upd,
      IngestFlags(delete = false), allowDeletes = true)
    assert(noDel.filter($"op" === "D").count() == 0)
    val noUpd = ChangeSet.build(source, target, keys, upd,
      IngestFlags(update = false), allowDeletes = true)
    assert(noUpd.filter($"op" === "U").count() == 0)
  }

  test("soft delete keeps the row flagged and skips re-deleting") {
    val tgt = target.withColumn(MetaColumns.HardDeleted,
      when($"k1" === 3L, true).otherwise(false)) // 3 already soft-deleted
    val src = source.filter($"k1" === 1L)
      .withColumn(MetaColumns.HardDeleted, lit(false))
    val changes = ChangeSet.build(src, tgt, keys, upd,
      IngestFlags(keepDeletes = true), allowDeletes = true)
    // deletes detected: 2 and 4 (3 is excluded — already flagged)
    assert(changes.filter($"op" === "D").select("k1").as[Long]
      .collect().toSet == Set(2L, 4L))
    val merged = Merge(tgt, changes, keys, keepDeletes = true)
    val flags = merged.select("k1", MetaColumns.HardDeleted)
      .as[(Long, Boolean)].collect().toMap
    assert(flags == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("cdc dedup keeps the latest row per key, deterministic on ties") {
    val batch = Seq(
      (1L, ts("2026-01-01 00:00:00"), "old", "U"),
      (1L, ts("2026-02-01 00:00:00"), "new", "U"),
      (1L, ts("2026-02-01 00:00:00"), "tie", "U"), // same ts — tiebreak on val? no: on tiebreakers
      (2L, ts("2026-01-01 00:00:00"), "only", "D")
    ).toDF("k", "updated_at", "payload", "op")
      .withColumn("seq", monotonically_increasing_id())
    val deduped = ChangeSet.dedupLatest(batch, Seq("k"), Seq("updated_at"),
      tiebreakers = Seq("payload"))
    val got = deduped.select("k", "payload").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "tie", 2L -> "only")) // "tie" > "new" desc
  }

  test("insert marker for an existing key matches no MERGE clause → target kept") {
    val tgt = Seq((1L, "a", ts("2026-01-01 00:00:00"), 10.0))
      .toDF("k1", "k2", "updated_at", "v")
    val changes = Seq(
      (1L, "a", ts("2026-02-01 00:00:00"), 99.0, "I"), // malformed: key exists
      (2L, "b", ts("2026-02-01 00:00:00"), 20.0, "I")  // genuinely new
    ).toDF("k1", "k2", "updated_at", "v", "op")
    val out = Merge(tgt, changes, keys, keepDeletes = false)
      .select("k1", "v").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 10.0, 2L -> 20.0)) // 1 untouched, 2 inserted
  }

  test("not-matched rows insert unconditionally, matching the reference's MERGE") {
    val tgt = Seq((1L, "a", ts("2026-01-01 00:00:00"), 10.0))
      .toDF("k1", "k2", "updated_at", "v")
    val changes = Seq(
      (2L, "b", ts("2026-02-01 00:00:00"), 20.0, "U"), // U, not matched → INSERT
      (3L, "c", ts("2026-02-01 00:00:00"), 30.0, "D")  // D, not matched → INSERT (!)
    ).toDF("k1", "k2", "updated_at", "v", "op")
    val hard = Merge(tgt, changes, keys, keepDeletes = false)
      .select("k1", "v").as[(Long, Double)].collect().toMap
    assert(hard == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // with keepDeletes the resurrected D row arrives pre-flagged deleted
    val tgt2 = tgt.withColumn(MetaColumns.HardDeleted, lit(false))
    val changes2 = changes.withColumn(MetaColumns.HardDeleted, lit(false))
    val soft = Merge(tgt2, changes2, keys, keepDeletes = true)
      .select("k1", MetaColumns.HardDeleted).as[(Long, Boolean)].collect().toMap
    assert(soft == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("numeric widening across batches merges via union coercion") {
    val tgt = Seq((1L, ts("2026-01-01 00:00:00"), 5)) // v: int
      .toDF("k1", "updated_at", "v")
    val src = Seq((1L, ts("2026-02-01 00:00:00"), 7L), // v: long (widened)
        (2L, ts("2026-02-01 00:00:00"), 9L))
      .toDF("k1", "updated_at", "v")
    val cfg = SourceConfig("t", "t", Seq("k1"), Seq("updated_at"),
      mode = IngestMode.Full)
    val out = Ingestion.applyMode(src, tgt, cfg)
      .select("k1", "v").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 7L, 2L -> 9L))
  }

  test("replace mode returns the source verbatim (diffCount oracle shape)") {
    val cfg = SourceConfig("t", "t", keys, upd, mode = IngestMode.Replace)
    val out = Ingestion.applyMode(source, target, cfg)
    assert(out.exceptAll(source).unionByName(source.exceptAll(out)).count() == 0)
  }

  test("merge plan: one matched-probe join, change batch scanned once") {
    // r15 exchange-sharing pin: the clause resolution is ONE outer join
    // against the distinct target keys (was an anti + a semi — the
    // change batch shuffled/scanned twice), plus the untouched-rows
    // anti join. Exactly 2 joins total, and duplicate-key targets still
    // collapse to ONE applied row per change (the distinct's job).
    val tgt = Seq(
      (1L, "a", ts("2026-01-01 00:00:00"), 10.0),
      (1L, "a", ts("2026-01-01 00:00:00"), 11.0), // duplicate target key
      (2L, "b", ts("2026-01-01 00:00:00"), 20.0)
    ).toDF("k1", "k2", "updated_at", "v")
    val changes = Seq(
      (1L, "a", ts("2026-02-01 00:00:00"), 99.0, "U"),
      (2L, "b", ts("2026-02-01 00:00:00"), 0.0, "D"),
      (5L, "c", ts("2026-02-01 00:00:00"), 50.0, "I")
    ).toDF("k1", "k2", "updated_at", "v", "op")
    val merged = Merge(tgt, changes, keys, keepDeletes = false)
    val out = merged.select("k1", "v").as[(Long, Double)].collect().toSeq
      .sorted
    // both copies of key (1,a) evict; ONE updated row replaces them
    assert(out == Seq((1L, 99.0), (5L, 50.0)))
    val plan = merged.queryExecution.executedPlan.toString
    assert("(?i)join".r.findAllIn(plan).size >= 1)
    assert("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 2,
      s"merge must plan exactly 2 joins (untouched anti + matched probe):\n$plan")
  }
}
