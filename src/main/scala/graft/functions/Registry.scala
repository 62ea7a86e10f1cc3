package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql` users get the same codegen'd kernels as the DataFrame API
  * (the reference registered its bucket UDF for SQL use the same way —
  * src/data_ingestion/ingestion/dmsdatabase1.py:18-24).
  */
object Registry {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Registers: graft_bucket(key, n), graft_simhash(array<long>),
    * graft_jaccard(sortedA, sortedB), graft_vector_dot(a, b),
    * graft_minhash(array<long>, k), graft_hyperplane_keys(vec, bits,
    * tables), graft_sig_overlap(sigA, sigB), graft_zvalue(cols...).
    */
  /** Name → expression builder for every engine function — shared by
    * session-level registration here and cluster-level injection through
    * [[graft.GraftExtensions]].
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_bucket" -> (exprs =>
      IcebergBucketExpr(exprs.head, intArg(exprs(1), "bucket count"))),
    "graft_simhash" -> (exprs => Simhash64Expr(exprs.head)),
    "graft_jaccard" -> (exprs => SortedLongJaccard(exprs.head, exprs(1))),
    "graft_vector_dot" -> (exprs => FloatVectorDot(exprs.head, exprs(1))),
    "graft_minhash" -> (exprs =>
      MinHashSignatureExpr(exprs.head, intArg(exprs(1), "signature length"))),
    "graft_hyperplane_keys" -> (exprs => HyperplaneKeysExpr(exprs.head,
      intArg(exprs(1), "sign bits"), intArg(exprs(2), "tables"))),
    "graft_sig_overlap" -> (exprs => EqualSlotFraction(exprs.head, exprs(1))),
    "graft_zvalue" -> (exprs => ZValueExpr(exprs)))

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftBridge.registerFunction(spark, name, b)
    }
}
