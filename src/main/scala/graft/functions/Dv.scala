package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** DELETION VECTORS (Iceberg v3): one bitmap of dead row ordinals per
  * data file, replacing v2's `(path, pos)` tombstone rows. The v3 spec
  * stores roaring bitmaps in Puffin sidecars; this engine keeps the same
  * LOGICAL content (file → set of dead ordinals, one vector per file,
  * folded at write) in its own run-length encoding — positional deletes
  * cluster (a predicate kills runs of adjacent rows), so sorted
  * `(start, length)` runs compress as hard as roaring's run containers
  * without importing a format the offline build can't carry.
  *
  * Binary layout (big-endian): magic `GDV1` (4 bytes) · int32 run count ·
  * runs of (int64 start, int64 length), sorted ascending, non-overlapping,
  * non-adjacent. Membership is a binary search over runs — O(log runs)
  * per probed row, inside whole-stage codegen via [[DvContains]].
  */
object Dv {
  private val Magic = Array[Byte]('G', 'D', 'V', '1')

  /** Encode a SORTED array of DISTINCT non-negative ordinals. The
    * contract is CHECKED, not assumed: an unsorted or duplicated input
    * would encode overlapping runs whose binary search then returns
    * silently wrong membership — the one failure mode a bitmap mask
    * must never have.
    */
  def fromSortedPositions(pos: Array[Long]): Array[Byte] = {
    var runs = 0
    var i = 0
    while (i < pos.length) {
      require(pos(i) >= 0 && (i == 0 || pos(i) > pos(i - 1)),
        s"deletion-vector positions must be sorted, distinct and " +
          s"non-negative (violation at index $i)")
      var j = i + 1
      while (j < pos.length && pos(j) == pos(j - 1) + 1) j += 1
      runs += 1
      i = j
    }
    val buf = java.nio.ByteBuffer.allocate(8 + runs * 16)
    buf.put(Magic)
    buf.putInt(runs)
    i = 0
    while (i < pos.length) {
      var j = i + 1
      while (j < pos.length && pos(j) == pos(j - 1) + 1) j += 1
      buf.putLong(pos(i))
      buf.putLong((j - i).toLong)
      i = j
    }
    buf.array()
  }

  private def checkMagic(dv: Array[Byte]): java.nio.ByteBuffer = {
    require(dv.length >= 8 && dv(0) == 'G' && dv(1) == 'D' &&
      dv(2) == 'V' && dv(3) == '1',
      "not a GDV1 deletion vector (corrupt or foreign binary payload)")
    val buf = java.nio.ByteBuffer.wrap(dv)
    buf.position(4)
    buf
  }

  /** Static so generated code can call it: probe the broadcast
    * (file → vector) map and binary-search the file's runs. A missing
    * entry means the file has no pending vector — not masked. The map is
    * keyed by [[org.apache.spark.unsafe.types.UTF8String]] so the
    * per-row probe hashes the row's path bytes in place — no String
    * conversion, and crucially NO per-row copy of the vector blob (the
    * former broadcast-JOIN shape paid an `UnsafeRow.getBinary` copy of
    * the whole vector for EVERY probed row: a 0.26 MB vector × 150k rows
    * was ~40 GB of memcpy — measured 8.8 s vs 0.24 s for the copy-free
    * probe at sf0.1).
    */
  def maskContains(bc: AnyRef, file: org.apache.spark.unsafe.types.UTF8String,
      pos: Long): Boolean = {
    val m = bc
      .asInstanceOf[org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
          Array[Byte]]]]
      .value
    val blob = m.get(file)
    blob != null && contains(blob, pos)
  }

  /** Static so generated code can call it: binary search over runs. */
  def contains(dv: Array[Byte], pos: Long): Boolean = {
    // fail-loud contract: a truncated vector masks nothing and would
    // silently RESURRECT deleted rows — an encoded empty vector is
    // exactly 8 bytes, so no legitimate blob is shorter
    if (dv.length < 8 ||
        !(dv(0) == 'G' && dv(1) == 'D' && dv(2) == 'V' && dv(3) == '1'))
      throw new IllegalArgumentException(
        "not a GDV1 deletion vector (corrupt, truncated or foreign binary)")
    val buf = java.nio.ByteBuffer.wrap(dv)
    val n = buf.getInt(4)
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val start = buf.getLong(8 + mid * 16)
      val len = buf.getLong(16 + mid * 16)
      if (pos < start) hi = mid - 1
      else if (pos >= start + len) lo = mid + 1
      else return true
    }
    false
  }

  def cardinality(dv: Array[Byte]): Long = {
    val buf = checkMagic(dv)
    val n = buf.getInt
    var total = 0L
    var i = 0
    while (i < n) {
      buf.getLong // start
      total += buf.getLong
      i += 1
    }
    total
  }

  def positions(dv: Array[Byte]): Array[Long] = {
    val buf = checkMagic(dv)
    val n = buf.getInt
    val out = Array.newBuilder[Long]
    var i = 0
    while (i < n) {
      val start = buf.getLong
      val len = buf.getLong
      var k = 0L
      while (k < len) { out += start + k; k += 1 }
      i += 1
    }
    out.result()
  }

  // Column API (bridged — the repo invariant: Column↔Expression only via
  // GraftBridge)
  def dvContains(dv: Column, pos: Column): Column =
    GraftBridge.column(DvContains(GraftBridge.catalystExpression(dv),
      GraftBridge.catalystExpression(pos)))
  def dvMaskContains(
      dvs: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
          Array[Byte]]],
      file: Column, pos: Column): Column =
    GraftBridge.column(DvMaskContains(GraftBridge.catalystExpression(file),
      GraftBridge.catalystExpression(pos), dvs))
  def dvFromPositions(sortedPos: Column): Column =
    GraftBridge.column(DvFromPositions(
      GraftBridge.catalystExpression(sortedPos)))
  def dvPositions(dv: Column): Column =
    GraftBridge.column(DvPositions(GraftBridge.catalystExpression(dv)))
  def dvCardinality(dv: Column): Column =
    GraftBridge.column(DvCardinality(GraftBridge.catalystExpression(dv)))
}

/** Row-ordinal membership in a deletion vector — the MoR read-side mask.
  * Codegen'd static call so the masked scan stays inside whole-stage
  * codegen (this runs once per row of every DV-dirty file).
  */
case class DvContains(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "dv_contains"
  override def nullSafeEval(dv: Any, pos: Any): Any =
    Dv.contains(dv.asInstanceOf[Array[Byte]], pos.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (dv, pos) =>
      s"graft.functions.Dv.contains($dv, $pos)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Row-ordinal membership against a BROADCAST (file → deletion-vector)
  * map — the v3 MoR read-side mask. Replaces the former broadcast-JOIN +
  * [[DvContains]] shape: a join materializes the matched vector BLOB into
  * every probed row (`UnsafeRow.getBinary` copies the whole byte array
  * per access), so the mask cost was O(rows × vector size). This probe
  * keeps one copy of each vector in the broadcast and touches it in
  * place — O(rows × log runs), zero per-row allocation (the path key
  * hashes the row's own bytes via UTF8String). Stays inside whole-stage
  * codegen. NULL file/pos (never produced by the metadata columns) read
  * as not-masked: a mask must never DROP a row it cannot attribute.
  */
case class DvMaskContains(left: Expression, right: Expression,
    dvs: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
        Array[Byte]]])
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(org.apache.spark.sql.types.StringType, LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dv_mask_contains"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val f = left.eval(input)
    val p = right.eval(input)
    if (f == null || p == null) false
    else Dv.maskContains(dvs,
      f.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      p.asInstanceOf[java.lang.Long].longValue())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val fe = left.genCode(ctx)
    val pe = right.genCode(ctx)
    val ref = ctx.addReferenceObj("dvMaskBc", dvs, "java.lang.Object")
    ev.copy(
      code = fe.code + pe.code + code"""
        boolean ${ev.value} = !${fe.isNull} && !${pe.isNull} &&
          graft.functions.Dv.maskContains($ref, ${fe.value}, ${pe.value});
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Encode a sorted-distinct `array<long>` of dead ordinals as a GDV1
  * blob. Runs once per FILE at delete-commit time (after the per-file
  * groupBy), so interpreted eval is fine — no codegen needed.
  */
case class DvFromPositions(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dv_from_positions"
  override def nullSafeEval(a: Any): Any =
    Dv.fromSortedPositions(a.asInstanceOf[ArrayData].toLongArray())
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Decode a GDV1 blob back to its ordinals (rendering / fold-at-write —
  * bounded by the file's DEAD row count, never its size).
  */
case class DvPositions(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dv_positions"
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(Dv.positions(a.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Dead-ordinal count of a GDV1 blob — O(runs), no materialization. */
case class DvCardinality(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "dv_cardinality"
  override def nullSafeEval(a: Any): Any =
    Dv.cardinality(a.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
