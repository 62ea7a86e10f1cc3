package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-value (Morton order) of up to 8 scalar columns: each value is mapped
  * order-preservingly onto an unsigned 64-bit key, and ALL 64 bits of
  * every key are interleaved round-robin (MSB first) into a `k*8`-byte
  * binary — Spark orders BinaryType by unsigned lexicographic byte
  * comparison, so sorting by this value walks the Morton curve. Full-width
  * interleave matters: real columns (ids, small ints) vary only in their
  * LOW bits, so any fixed truncation to the top bits of the key collapses
  * to a constant; with the full keys the discriminating bits simply
  * appear later in the binary and range partitioning still sees them.
  * Clustering this way makes per-file min/max bounds selective on EVERY
  * listed column — a linear sort helps only its leading column. This is
  * the layout transform behind Iceberg's `rewrite_data_files(strategy =>
  * 'sort', sort_order => 'zorder(...)')` (byte-interleaved there too),
  * reachable from the reference's maintenance path
  * (common/iceberg.py:264-270).
  *
  * Codegen'd: the hot use is a full-table layout rewrite, one evaluation
  * per row of the table.
  */
case class ZValueExpr(children: Seq[Expression],
                      lows: Seq[Long] = Nil, highs: Seq[Long] = Nil)
    extends Expression {
  require(children.nonEmpty && children.size <= 8,
    "zvalue takes 1 to 8 columns")
  require(lows.isEmpty || (lows.size == children.size && highs.size == children.size),
    "per-column key bounds must cover every column")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false // nulls map to the smallest key
  override def prettyName: String = "zvalue"

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot(ZValue.supported)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zvalue does not support type(s): ${bad.map(_.catalogString).mkString(", ")}")
  }

  override def eval(input: InternalRow): Any = {
    val us = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      val raw = if (v == null) 0L else ZValue.toKey(children(i).dataType, v)
      us(i) =
        if (lows.isEmpty) raw
        else ZValue.leftAlign(raw, lows(i), highs(i))
      i += 1
    }
    ZValue.interleave(us)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("zkeys")
    val evals = children.map(_.genCode(ctx))
    val assigns = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val conv = ZValue.converter(c.dataType)
      val raw = s"graft.functions.ZValue.$conv(${e.value})"
      val scaled =
        if (lows.isEmpty) raw
        else s"graft.functions.ZValue.leftAlign($raw, ${lows(i)}L, ${highs(i)}L)"
      s"""
         |${e.code}
         |$arr[$i] = ${e.isNull} ? 0L : $scaled;
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        long[] $arr = new long[${children.size}];
        $assigns
        byte[] ${ev.value} = graft.functions.ZValue.interleave($arr);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** The signed-domain z-key of ONE column (the unsigned key XOR the sign
  * bit, so SIGNED min/max aggregates work on it): how a caller discovers
  * the per-column key bounds that [[ZValueExpr]]'s range normalization
  * needs. A null maps to the domain minimum, matching the z-value's
  * null-lowest convention.
  */
case class ZKeyExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zkey"

  override def checkInputDataTypes(): TypeCheckResult =
    if (ZValue.supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zkey does not support ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Long.MinValue
    else ZValue.toKey(child.dataType, v) ^ Long.MinValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = child.genCode(ctx)
    val conv = ZValue.converter(child.dataType)
    ev.copy(code =
      code"""
        ${e.code}
        long ${ev.value} = ${e.isNull} ? Long.MIN_VALUE
          : (graft.functions.ZValue.$conv(${e.value}) ^ Long.MIN_VALUE);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static kernels for [[ZValueExpr]] — callable from generated code. */
object ZValue {

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType => true
    case _ => false
  }

  /** Generated-code converter name for a column type (argument widening
    * from int/float primitives is Java's).
    */
  def converter(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => "fromLong"
    case FloatType | DoubleType => "fromDouble"
    case StringType => "fromUTF8"
    case other => throw new IllegalArgumentException(s"zvalue: $other")
  }

  /** Interpreted-eval converter (boxed values from `Expression.eval`). */
  def toKey(dt: DataType, v: Any): Long = dt match {
    case ByteType => fromLong(v.asInstanceOf[Byte].toLong)
    case ShortType => fromLong(v.asInstanceOf[Short].toLong)
    case IntegerType | DateType => fromLong(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType =>
      fromLong(v.asInstanceOf[Long])
    case FloatType => fromDouble(v.asInstanceOf[Float].toDouble)
    case DoubleType => fromDouble(v.asInstanceOf[Double])
    case StringType => fromUTF8(v.asInstanceOf[UTF8String])
    case other => throw new IllegalArgumentException(s"zvalue: $other")
  }

  /** Signed long → unsigned key preserving order (flip the sign bit). */
  def fromLong(v: Long): Long = v ^ Long.MinValue

  /** Double → unsigned key preserving IEEE-754 total order: negative
    * values invert all bits (reversing their descending bit order),
    * non-negative set the sign bit (placing them above every negative).
    */
  def fromDouble(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0) ~bits else bits | Long.MinValue
  }

  /** String → unsigned key from the first 8 UTF-8 bytes, big-endian
    * (lexicographic byte order ≈ top-of-key order; ties beyond 8 bytes
    * collapse, which only weakens clustering, never correctness).
    */
  def fromUTF8(s: UTF8String): Long = {
    val b = s.getBytes
    var out = 0L
    var i = 0
    while (i < 8) {
      out = (out << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    out
  }

  /** Left-align a key to its column's observed range: subtract the low
    * bound and shift the range's top bit to bit 63. WITHOUT this, a
    * column whose values span fewer magnitude bits than its neighbor
    * never gets a say in the leading interleaved bits (a 13-bit orderkey
    * next to an 8-bit partkey pushes the first partkey bit 11 positions
    * down the curve), and coarse range splits prune only the wide column.
    * Monotone: offsets lie in [0, range] and the shift loses no bits.
    * All-equal columns (range 0) contribute a constant 0.
    */
  def leftAlign(key: Long, low: Long, high: Long): Long = {
    val range = high - low // unsigned offset arithmetic
    if (range == 0L) 0L
    else (key - low) << java.lang.Long.numberOfLeadingZeros(range)
  }

  /** Interleave all 64 bits of each key, MSB first, round-robin across
    * columns — the Morton curve index as a `k*8`-byte big-endian binary.
    */
  def interleave(us: Array[Long]): Array[Byte] = {
    val k = us.length
    val out = new Array[Byte](k * 8)
    var j = 0 // global output bit, MSB first
    while (j < k * 64) {
      val bit = (us(j % k) >>> (63 - j / k)) & 1L
      if (bit != 0L) out(j >> 3) = (out(j >> 3) | (0x80 >> (j & 7))).toByte
      j += 1
    }
    out
  }
}

/** Column-API surface for the z-value. */
object ZOrder {
  def zvalue(cols: Column*): Column =
    GraftBridge.column(ZValueExpr(cols.map(GraftBridge.expression)))

  /** Z-value with per-column range normalization (key bounds in the
    * UNSIGNED domain, as recovered from [[zkey]] aggregates).
    */
  def zvalueScaled(cols: Seq[Column], lows: Seq[Long], highs: Seq[Long]): Column =
    GraftBridge.column(ZValueExpr(cols.map(GraftBridge.expression), lows, highs))

  /** Signed-domain per-column key, for min/max bound discovery. */
  def zkey(c: Column): Column =
    GraftBridge.column(ZKeyExpr(GraftBridge.expression(c)))
}
