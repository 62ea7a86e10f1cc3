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
  def registerAll(spark: SparkSession): Unit = {
    GraftBridge.registerFunction(spark, "graft_bucket",
      exprs => IcebergBucketExpr(exprs.head, intArg(exprs(1), "bucket count")))
    GraftBridge.registerFunction(spark, "graft_simhash",
      exprs => Simhash64Expr(exprs.head))
    GraftBridge.registerFunction(spark, "graft_jaccard",
      exprs => SortedLongJaccard(exprs.head, exprs(1)))
    GraftBridge.registerFunction(spark, "graft_vector_dot",
      exprs => FloatVectorDot(exprs.head, exprs(1)))
    GraftBridge.registerFunction(spark, "graft_minhash",
      exprs => MinHashSignatureExpr(exprs.head, intArg(exprs(1), "signature length")))
    GraftBridge.registerFunction(spark, "graft_hyperplane_keys",
      exprs => HyperplaneKeysExpr(exprs.head,
        intArg(exprs(1), "sign bits"), intArg(exprs(2), "tables")))
    GraftBridge.registerFunction(spark, "graft_sig_overlap",
      exprs => EqualSlotFraction(exprs.head, exprs(1)))
    GraftBridge.registerFunction(spark, "graft_zvalue",
      exprs => ZValueExpr(exprs))
  }
}
