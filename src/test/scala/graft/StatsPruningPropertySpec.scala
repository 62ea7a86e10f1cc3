package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Fuzz guard for manifest-stats file pruning: for a seeded stream of
  * random predicates (comparisons, IN, AND/OR nests, IS [NOT] NULL,
  * startsWith — over longs, doubles, strings-with-nulls, timestamps, and
  * a partition column), `readWhere` must return EXACTLY the rows of the
  * unpruned filter. A pruning bug is a silently-wrong-results bug, so
  * this property runs over both an unpartitioned range-clustered table
  * and a partitioned one.
  */
class StatsPruningPropertySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")

  private def mkData = (1 to 2000).map { i =>
    (i.toLong,
      Timestamp.valueOf(f"2026-01-${i % 27 + 1}%02d 10:00:00"),
      i / 100.0,
      if (i % 5 == 0) null else f"${('a' + i % 26).toChar}%c$i%05d",
      (i % 4).toLong)
  }.toDF("id", "ts", "v", "s", "p")

  private val rnd = new scala.util.Random(42)

  /** A (column, type-matched literal) pair — ANSI coercion rejects
    * cross-type comparisons, and pruning declines them anyway.
    */
  private def colAndLit(): (Column, () => Column) =
    Seq[(String, () => Column)](
      "id" -> (() => lit(rnd.nextInt(2600).toLong - 100)), // in and out of range
      "ts" -> (() => lit(Timestamp.valueOf(
        f"2026-01-${rnd.nextInt(30) + 1}%02d ${rnd.nextInt(24)}%02d:00:00"))),
      "v" -> (() => lit(rnd.nextDouble() * 25.0 - 2.0)),
      "s" -> (() => lit(f"${('a' + rnd.nextInt(28)).toChar}%c${rnd.nextInt(2100)}%05d")),
      "p" -> (() => lit(rnd.nextInt(6).toLong - 1))
    )(rnd.nextInt(5)) match { case (n, g) => (col(n), g) }

  private def atom(): Column = rnd.nextInt(11) match {
    case 0 => colAndLit()._1.isNull
    case 1 => colAndLit()._1.isNotNull
    case 2 => col("s").startsWith(
      Seq("", "a", "b9", "z", "m0", "é")(rnd.nextInt(6)))
    case 3 =>
      val (c, g) = colAndLit(); c.isin(g(), g(), g())
    case 4 =>
      val (c, g) = colAndLit(); c =!= g()
    case n =>
      val (c, g) = colAndLit(); val l = g()
      (n % 5) match {
        case 0 => c < l
        case 1 => c <= l
        case 2 => c === l
        case 3 => c >= l
        case _ => c > l
      }
  }

  // a third of subtrees negate — exercising the NNF rewrite the prune
  // evaluator runs (De Morgan + comparison inversion) against row truth
  private def pred(depth: Int): Column = {
    val p =
      if (depth == 0 || rnd.nextInt(3) == 0) atom()
      else if (rnd.nextBoolean()) pred(depth - 1) && pred(depth - 1)
      else pred(depth - 1) || pred(depth - 1)
    if (rnd.nextInt(3) == 0) !p else p
  }

  private def check(tbl: SnapshotTable, what: String): Unit = {
    (1 to 40).foreach { i =>
      val cond = pred(2)
      // count + id checksum: equal multisets of surviving rows
      val got = tbl.readWhere(spark, cond)
        .agg(count(lit(1)), coalesce(sum("id"), lit(0L))).head
      val want = tbl.read(spark).filter(cond)
        .agg(count(lit(1)), coalesce(sum("id"), lit(0L))).head
      assert(got == want, s"$what predicate #$i diverged: $cond")
    }
  }

  test("pruned scans equal unpruned filters on 40 random predicates (flat)") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-prune-prop-").toString)
    tbl.createOrReplace(mkData.repartitionByRange(8, col("id")))
    check(tbl, "flat")
  }

  test("pruned scans equal unpruned filters on 40 random predicates (partitioned)") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-prune-prop-p-").toString)
    tbl.createOrReplace(mkData, Seq("p"))
    check(tbl, "partitioned")
  }

  test("negated predicates prune at the manifest: != point, NOT BETWEEN, NOT IN") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-prune-not-").toString)
    // 8 range-clustered files over id 1..2000 → ~250-wide id ranges
    tbl.createOrReplace(mkData.repartitionByRange(8, col("id")))
    val (total, all) = (tbl.pruneCounts(lit(true))._2, 8)
    assert(total == all)
    // != keeps every file EXCEPT ones whose range is pinned to the value —
    // here no file pins, so the real assertion is NOT BETWEEN / De Morgan:
    // NOT(500 <= id <= 1600) keeps only the head and tail files
    val (keptNotBetween, _) =
      tbl.pruneCounts(!(col("id") >= 500L && col("id") <= 1600L))
    assert(keptNotBetween < total,
      s"NOT BETWEEN must prune interior files, kept $keptNotBetween/$total")
    // NOT(id < 1800): only tail files survive
    val (keptNotLt, _) = tbl.pruneCounts(!(col("id") < 1800L))
    assert(keptNotLt <= 2, s"NOT < must prune the head, kept $keptNotLt")
    // != against a single-value file: pin one file to a constant column
    val tbl2 = SnapshotTable.at(
      Files.createTempDirectory("graft-prune-ne-").toString)
    tbl2.createOrReplace(
      (1 to 100).map(i => (i.toLong, 7L)).toDF("id", "k").coalesce(1))
    tbl2.append(spark,
      (101 to 200).map(i => (i.toLong, 9L)).toDF("id", "k").coalesce(1))
    assert(tbl2.pruneCounts(col("k") =!= 7L) == ((1, 2)),
      "!= must skip the file whose bounds pin k = 7")
    assert(tbl2.pruneCounts(!col("k").isin(7L, 9L)) == ((0, 2)),
      "NOT IN covering both pinned files must prune everything")
    // and row truth still holds through the pruned read
    assert(tbl2.readWhere(spark, col("k") =!= 7L).count() == 100)
  }

  test("sequential random DELETEs equal the three-valued row filter " +
      "(metadata drops, rewrites, and bystanders included)") {
    // a DELETE bug is silent data LOSS, so the fuzz drives the real
    // mutation path: before each delete the expected survivors are
    // computed from the LIVE table (rows where cond is false or NULL),
    // the delete runs, and the table must agree exactly. Sequential
    // deletes walk the table through metadata drops, straddler
    // rewrites, bystander carries, and no-op censuses.
    def drive(tbl: SnapshotTable, what: String, seed: Column): Unit = {
      var drops = 0
      // the seeded predicate aligns with whole files, so the sequence
      // provably exercises the metadata-drop path before the random
      // straddlers take over
      (0 to 12).foreach { i =>
        val cond = if (i == 0) seed else pred(2)
        val want = tbl.read(spark)
          .filter(coalesce(!cond, lit(true)))
          .agg(count(lit(1)), coalesce(sum("id"), lit(0L))).head
        val vBefore = tbl.currentVersion
        tbl.deleteWhere(spark, cond)
        if (tbl.currentVersion != vBefore &&
            tbl.currentManifest.operation == "delete") drops += 1
        val got = tbl.read(spark)
          .agg(count(lit(1)), coalesce(sum("id"), lit(0L))).head
        assert(got == want, s"$what DELETE #$i diverged on: $cond")
      }
      assert(drops >= 1, s"$what: the seeded whole-file delete must land " +
        "as a metadata commit")
      info(s"$what: $drops of 13 deletes were pure metadata commits")
    }
    val flat = SnapshotTable.at(
      Files.createTempDirectory("graft-del-prop-").toString)
    // two single-file commits with disjoint id ranges: the seed aligns
    // with commit 1's file EXACTLY (quantile-split range files wouldn't
    // guarantee the boundary)
    flat.createOrReplace(mkData.filter(col("id") <= 1000L).coalesce(1))
    flat.append(spark, mkData.filter(col("id") > 1000L).coalesce(1))
    drive(flat, "flat", col("id") <= 1000L)
    val part = SnapshotTable.at(
      Files.createTempDirectory("graft-del-prop-p-").toString)
    part.createOrReplace(mkData, Seq("p"))
    // a second commit per partition seeds same-partition bystanders
    part.append(spark, mkData.withColumn("id", col("id") + 10000L))
    drive(part, "partitioned", col("p") === 2L) // whole-partition drop
  }

  test("sequential random UPDATEs equal the when(cond)-otherwise row " +
      "map — partition-moving assignments included") {
    // UPDATE's contract: assignments evaluate against the PRE-update row
    // exactly where cond is TRUE (null/false rows untouched). The fuzz
    // mirrors that as a when/otherwise projection computed from the
    // LIVE table before each update; on the partitioned table every
    // third update reassigns the partition column itself, driving the
    // moved-rows census and same-partition bystander carries.
    def drive(tbl: SnapshotTable, what: String, movable: Boolean): Unit = {
      (1 to 10).foreach { i =>
        val cond = pred(2)
        val moves = movable && i % 3 == 0
        val assigns: Seq[(String, Column)] =
          if (moves) Seq("p" -> pmod(col("p") + 1, lit(4)))
          else Seq("v" -> (col("v") + 1.0))
        val hit = coalesce(cond, lit(false))
        val wantDf = tbl.read(spark).select(
          col("id"),
          when(hit, pmod(col("p") + (if (moves) 1 else 0), lit(4)))
            .otherwise(col("p")).as("p"),
          when(hit, col("v") + (if (moves) 0.0 else 1.0))
            .otherwise(col("v")).as("v"))
        val want = wantDf.agg(count(lit(1)), coalesce(sum("id"), lit(0L)),
          coalesce(sum(col("p") * 1000000 + col("v").cast("long")), lit(0L)))
          .head
        tbl.updateWhere(spark, assigns, cond)
        val got = tbl.read(spark)
          .agg(count(lit(1)), coalesce(sum("id"), lit(0L)),
            coalesce(sum(col("p") * 1000000 + col("v").cast("long")), lit(0L)))
          .head
        assert(got == want,
          s"$what UPDATE #$i (moves=$moves) diverged on: $cond")
      }
    }
    val flat = SnapshotTable.at(
      Files.createTempDirectory("graft-upd-prop-").toString)
    flat.createOrReplace(mkData.repartitionByRange(8, col("id")))
    drive(flat, "flat", movable = false)
    val part = SnapshotTable.at(
      Files.createTempDirectory("graft-upd-prop-p-").toString)
    part.createOrReplace(mkData, Seq("p"))
    part.append(spark, mkData.withColumn("id", col("id") + 10000L))
    drive(part, "partitioned", movable = true)
  }

  test("time-unit and truncate partition-value ranges are exact") {
    import graft.table.StatsPruning._
    import org.apache.spark.sql.types._
    def micros(s: String): BigDecimal = {
      val i = java.time.LocalDateTime.parse(s)
        .toInstant(java.time.ZoneOffset.UTC) // session TZ is UTC
      BigDecimal(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    }
    // month over timestamps: [Mar 1, Apr 1) minus a micro
    assert(timeRange("month", TimestampType, "2026-03").contains(
      (NumB(micros("2026-03-01T00:00")), NumB(micros("2026-04-01T00:00") - 1))))
    // year over dates: epoch-day closed range
    val d0 = java.time.LocalDate.of(2025, 1, 1).toEpochDay
    val d1 = java.time.LocalDate.of(2026, 1, 1).toEpochDay - 1
    assert(timeRange("year", DateType, "2025").contains(
      (NumB(BigDecimal(d0)), NumB(BigDecimal(d1)))))
    // hour over NTZ wall-clock
    assert(timeRange("hour", TimestampNTZType, "2026-02-28-23").contains(
      (NumB(micros("2026-02-28T23:00")), NumB(micros("2026-03-01T00:00") - 1))))
    // hours never derive from a date; garbage declines
    assert(timeRange("hour", DateType, "2026-02-28-23").isEmpty)
    assert(timeRange("month", TimestampType, "not-a-month").isEmpty)
    // truncate: integer block, string prefix cap
    assert(truncRange(LongType, 5, "-10").contains(
      (NumB(BigDecimal(-10)), NumB(BigDecimal(-6)))))
    assert(truncRange(StringType, 4, "beta").contains(
      (StrB("beta"), StrB("beta￿"))))
    assert(truncRange(StringType, 4, "béta").isEmpty, "non-ASCII declines")
  }
}
