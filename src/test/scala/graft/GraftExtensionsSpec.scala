package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.table.SnapshotTable

/** GraftExtensions must give a session built with ONLY
  * `withExtensions(new GraftExtensions)` (the code-free
  * `spark.sql.extensions` deployment) the whole SQL surface: `graft_*`
  * functions and `graft`.`/path`-style table identifiers, including
  * MoR delete resolution on the read path.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions session resolves graft functions and path relations") {
    val base = spark // materialize the shared context first
    import base.implicits._

    val root = Files.createTempDirectory("graft-ext-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 20).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    // a MoR merge leaves pending equality deletes — the SQL read must
    // sequence-resolve them, not just list files
    tbl.mergeMoR(base,
      Seq((5L, "S5", "U"), (99L, "S99", "I")).toDF("id", "s", "op"),
      Seq("id"), keepDeletes = false)
    assert(tbl.currentManifest.deleteFiles.nonEmpty)

    // fresh session on the same context, extensions only (no Registry call)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base)
      val out = s2.sql(
        s"SELECT id, s, graft_bucket(id, 4) AS b FROM graft.`$root`")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
        .toMap
      assert(out.size == 21)
      assert(out(5L)._1 == "S5") // update applied via delete resolution
      assert(out(99L)._1 == "S99") // insert present
      assert(out(1L)._1 == "s1")
      // function value matches the DataFrame-side expression in the base session
      val expected = graft.functions.Bucket.bucket(1L, 4)
      assert(out(1L)._2 == expected)
      // @-suffixes: version time travel + metadata relations through SQL
      assert(s2.sql(s"SELECT count(*) AS c FROM graft.`$root@v1`")
        .head.getLong(0) == 20)
      val hist = s2.sql(
        s"SELECT version, is_current FROM graft.`$root@history` ORDER BY version")
        .collect()
      assert(hist.length == 2 && hist.last.getBoolean(1))
      assert(s2.sql(s"SELECT count(*) AS c FROM graft.`$root@files`")
        .head.getLong(0) == tbl.currentManifest.files.size)
      // a graft-database identifier over a NON-table path falls through
      // to the normal resolver (and therefore fails as table-not-found)
      intercept[Exception] {
        s2.sql("SELECT * FROM graft.`/definitely/not/a/table`").collect()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
