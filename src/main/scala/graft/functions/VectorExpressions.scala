package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in double. This is the inner loop of similarity search
  * (SURVEY.md §7.6) — a custom `Expression` with `doGenCode` so the
  * embedding scan + scoring stays inside whole-stage codegen, vs the
  * `zip_with`/`aggregate` higher-order-function formulation which falls
  * back to interpreted lambda evaluation per element.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // strict input typing: without it, an array<double> argument would be
  // read through ArrayData.getFloat as garbage instead of failing analysis
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  // strict LENGTH checking to match the strict typing: truncating to
  // min(len) would turn a dimension mismatch (e.g. 384-dim rows joined
  // against a 768-dim query after a model swap) into plausible-but-wrong
  // similarities instead of an error
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"float_vector_dot: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "float_vector_dot: dimension mismatch (" + $n + " vs " +
         |      $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaccard similarity of two SORTED, DISTINCT `array<long>` columns via a
  * single merge scan — no per-pair hash-set or union-array allocation,
  * which is what makes `array_intersect`/`array_union` the bottleneck of
  * pairwise dedup verification (candidate pairs × corpus vocabulary). The
  * caller guarantees sortedness (`array_sort` once per row, not per pair).
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_long_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 && m == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($n == 0 && $m == 0) ? 0.0
         |  : ((double) $inter) / ($n + $m - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature of an `array<long>` of shingle hashes: k minima of
  * the universal-hash family h_i(x) = (pmod(x,p)·a_i + b_i) mod p, in ONE
  * pass over the array (k updates per element) with generated code. The
  * higher-order-function formulation (`transform` + `array_min` × k) is
  * interpreted per element and traverses the array k times — this
  * expression is the hot-loop form of the same exact function.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any =
    MinHash.signature(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHash.signature($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHash {
  import TextFunctions.MinHashPrime

  // per-k parameter cache; params are deterministic in the function index
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def params(k: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(k, _ => {
      val ps = TextFunctions.minhashParams(k)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  /** static so generated code can call it directly; exact same values as
    * the column formulation in TextFunctions.minhashSignatureHof
    */
  def signature(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = params(k)
    val p = MinHashPrime
    val mins = Array.fill(k)(p)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val hm = ((h % p) + p) % p
      var j = 0
      while (j < k) {
        val v = (hm * as(j) + bs(j)) % p // hm < 2^31, a < 2^22: no overflow
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** 64-bit SimHash of an `array<long>` of feature hashes: per-bit majority
  * vote, evaluated as a codegen'd loop over the unboxed ArrayData (a Scala
  * UDF here pays Seq[Long] boxing for every feature of every row).
  */
case class Simhash64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    Simhash64Expr.simhash(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Simhash64Expr.simhash($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Simhash64Expr {
  /** static so generated code can call it directly */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Fraction of positions where two equal-length `array<long>` columns
  * agree — the MinHash Jaccard ESTIMATOR (k agreeing slots / k). Used as
  * a cheap candidate pre-filter before exact shingle-set verification:
  * signatures are ~3× smaller than shingle arrays, so low-similarity
  * bucket-collision candidates are pruned without ever shipping their
  * shingle sets through the verify join.
  */
case class EqualSlotFraction(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "equal_slot_fraction"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = $n == 0 ? 0.0 : ((double) $eq) / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All `tables` hyperplane-LSH sign keys of an `array<float>` vector in
  * ONE codegen'd pass — value-identical to the higher-order-function
  * formulation [[graft.operators.Similarity.hyperplaneKey]] applied per
  * seed (which stays as the executable specification). The HOF form costs
  * tables×bits interpreted `zip_with`+`aggregate` evaluations per row (a
  * fresh 64-element array allocation each); this expression resolves the
  * hash-derived hyperplane components once per (bits, tables, dim) into a
  * cached matrix and runs tables×bits×dim fused multiply-adds per row.
  */
case class HyperplaneKeysExpr(child: Expression, bits: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(bits > 0 && bits <= 63 && tables > 0, "need 0 < bits <= 63, tables > 0")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "hyperplane_keys"

  override def nullSafeEval(v: Any): Any =
    HyperplaneKeys.keys(v.asInstanceOf[ArrayData], bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneKeys.keys($c, $bits, $tables)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneKeys {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), Array[Array[Double]]]()

  /** Spark's Murmur3_x86_32.hashInt (seed-chained by the `hash()`
    * expression as h = hashInt(x1, 42); h = hashInt(x2, h); ...) —
    * replicated so components equal `hash(i, lit(j), lit(seed))` exactly.
    */
  private def hashInt(input: Int, seed: Int): Int = {
    var k1 = input * 0xcc9e2d51
    k1 = Integer.rotateLeft(k1, 15); k1 *= 0x1b873593
    var h1 = seed ^ k1
    h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
    h1 ^= 4 // fmix length = 4 bytes
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** hyperplane (t, j) component i = ((hash(i,j,t) pmod 1001) - 500)/500.0
    * — identical to the column formulation in Similarity.hyperplaneKey.
    */
  private def components(bits: Int, tables: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((bits, tables, dim), _ => {
      val out = Array.ofDim[Array[Double]](tables * bits)
      var t = 0
      while (t < tables) {
        var j = 0
        while (j < bits) {
          val c = new Array[Double](dim)
          var i = 0
          while (i < dim) {
            val h = hashInt(t, hashInt(j, hashInt(i, 42))).toLong
            val pm = ((h % 1001L) + 1001L) % 1001L
            c(i) = (pm - 500L).toDouble / 500.0
            i += 1
          }
          out(t * bits + j) = c
          j += 1
        }
        t += 1
      }
      out
    })

  /** static so generated code can call it directly */
  def keys(arr: ArrayData, bits: Int, tables: Int): ArrayData = {
    val dim = arr.numElements()
    val cs = components(bits, tables, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val c = cs(t * bits + j)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += arr.getFloat(i).toDouble * c(i); i += 1 }
        if (acc >= 0.0) key |= (1L << j)
        j += 1
      }
      out(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Iceberg-spec bucket transform as a codegen'd unary expression over
  * the full Appendix-B source-type set: integrals/date/timestamp hash
  * their 8-byte little-endian long widening, strings their UTF-8 bytes,
  * decimals the minimal two's-complement big-endian bytes of the
  * unscaled value (see [[Bucket]]; reference UD1 registered LongType
  * only, src/data_ingestion/ingestion/dmsdatabase1.py:18-24 — a string
  * natural key couldn't use hidden bucket partitioning without this).
  */
case class IcebergBucketExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  require(n > 0, "bucket count must be positive")
  // strict input typing by hand (TypeCollection is private[sql]): an
  // unsupported source must fail ANALYSIS, not hash garbage
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           DateType | TimestampType | TimestampNTZType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support ${other.catalogString} — " +
            "Iceberg buckets int/long/string/date/timestamp/decimal")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case ByteType => Bucket.bucket(v.asInstanceOf[Byte].toLong, n)
    case ShortType => Bucket.bucket(v.asInstanceOf[Short].toLong, n)
    case IntegerType | DateType => Bucket.bucket(v.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      Bucket.bucket(v.asInstanceOf[Long], n)
    case StringType => Bucket.bucketUtf8(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    case _: DecimalType => Bucket.bucketDecimal(v.asInstanceOf[Decimal], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call: String => String = child.dataType match {
      case ByteType | ShortType | IntegerType | DateType =>
        c => s"graft.functions.Bucket.bucket((long)$c, $n)"
      case LongType | TimestampType | TimestampNTZType =>
        c => s"graft.functions.Bucket.bucket($c, $n)"
      case StringType =>
        c => s"graft.functions.Bucket.bucketUtf8($c, $n)"
      case _: DecimalType =>
        c => s"graft.functions.Bucket.bucketDecimal($c, $n)"
    }
    defineCodeGen(ctx, ev, call)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Bounded-size top-k buffer: a binary min-heap ordered WORST-first over
  * (score, id) pairs — better = higher score, ties break to the SMALLER
  * id (the deterministic ordering every ANN operator here uses). Holds at
  * most `k` entries, so a map task's partial aggregate is O(k) memory and
  * the shuffle carries ≤ k rows per (group, map task) — the whole point
  * vs a `row_number` window, whose shuffle carries EVERY scored row.
  * Public top-level (Catalyst aggregate buffer classes must be).
  */
/** SQ8 scalar quantization ENCODE: an `array<float>` vector plus
  * per-dimension `lo`/`step` arrays → a BINARY of one unsigned byte per
  * dimension, `code[d] = clamp(round((v[d]−lo[d])/step[d]), 0, 255)`
  * (`step[d] ≤ 0` ⇒ a constant dimension ⇒ code 0). Binary output is the
  * point: the quantized corpus is genuinely 1 byte/dim at rest and in
  * shuffle — 4× smaller than float32 — not an int array that merely
  * models it. Codegen'd, so index build runs inside whole-stage codegen.
  */
case class Sq8EncodeExpr(vec: Expression, lo: Expression, step: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = vec
  override def second: Expression = lo
  override def third: Expression = step
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(v: Any, l: Any, s: Any): Any = {
    val xv = v.asInstanceOf[ArrayData]
    val xl = l.asInstanceOf[ArrayData]
    val xs = s.asInstanceOf[ArrayData]
    val n = xv.numElements()
    if (xl.numElements() != n || xs.numElements() != n)
      throw new IllegalArgumentException(
        s"sq8_encode: dimension mismatch ($n vs ${xl.numElements()}/" +
          s"${xs.numElements()})")
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val st = xs.getFloat(i)
      var c = 0
      if (st > 0f) {
        val x = math.floor(
          (xv.getFloat(i).toDouble - xl.getFloat(i).toDouble) /
            st.toDouble + 0.5)
        c = if (x < 0) 0 else if (x > 255) 255 else x.toInt
      }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, l, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val st = ctx.freshName("st")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |if ($l.numElements() != $n || $s.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "sq8_encode: dimension mismatch (" + $n + " vs " +
         |      $l.numElements() + "/" + $s.numElements() + ")");
         |}
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  float $st = $s.getFloat($i);
         |  int $c = 0;
         |  if ($st > 0f) {
         |    double $x = Math.floor(
         |      (((double) $v.getFloat($i)) - ((double) $l.getFloat($i)))
         |        / ((double) $st) + 0.5);
         |    $c = $x < 0 ? 0 : ($x > 255 ? 255 : (int) $x);
         |  }
         |  $out[$i] = (byte) $c;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, lo = s, step = t)
}

/** SQ8 asymmetric scoring kernel: `Σ_d qs[d] · (codes[d] & 0xFF)` of a
  * full-precision (pre-scaled) query array against a quantized corpus
  * BINARY. With `qs[d] = q[d]·step[d]`, this differs from the dot of the
  * query against the DEQUANTIZED corpus vector only by `Σ q[d]·lo[d]` —
  * constant per query, so candidate ORDER per query is identical and the
  * shortlist never needs the offset. Codegen'd; the corpus side stays
  * bytes end-to-end.
  */
case class Sq8ByteDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_byte_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qs = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    val n = codes.length
    if (qs.numElements() != n)
      throw new IllegalArgumentException(
        s"sq8_byte_dot: dimension mismatch (${qs.numElements()} vs $n)")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += qs.getFloat(i).toDouble * (codes(i) & 0xFF).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $b.length;
         |if ($a.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "sq8_byte_dot: dimension mismatch (" + $a.numElements() +
         |      " vs " + $n + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) ($b[$i] & 0xFF));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0
  // a is WORSE than b: lower score, or same score and larger id
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long) =
    sa < sb || (sa == sb && ia > ib)
  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // index of the worst among i and its children
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val (ts, ti) = (scores(i), ids(i))
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = ts; ids(w) = ti
      i = w
    }
  }
  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id
      size += 1
      // sift up toward the worst-first root
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val (ts, ti) = (scores(i), ids(i))
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = ts; ids(p) = ti
          i = p
        } else i = 0
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }
  def merge(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
  /** (score, id) pairs best-first: score desc, id asc — the EXACT
    * inverse of [[worse]] (a sortBy on -score would use total ordering,
    * which splits -0.0 from 0.0 where the heap's IEEE compare doesn't).
    */
  def sortedPairs: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((sa, ia), (sb, ib)) => sa > sb || (sa == sb && ia < ib) }
}

/** Top-k aggregate over (score double, id long) rows: returns the ≤ k
  * best-scoring entries as `array<struct<score double, id long>>`, best
  * first (score desc, id asc — deterministic under ties). A
  * TypedImperativeAggregate, so partial aggregation runs map-side with a
  * BOUNDED O(k) buffer per group: the global top-k of N scored rows
  * shuffles ≤ k·tasks rows instead of N (a `row_number()` window would
  * shuffle and sort all N). Null scores/ids are skipped.
  */
case class TopKByScoreAgg(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types._
  require(k > 0, "top-k size must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def inputTypes = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)
  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    // NaN skipped like null: it compares false against everything, so
    // it could neither rank nor be evicted — and it would break the
    // output sort's strict-ordering contract
    if (s != null && id != null && !s.asInstanceOf[Double].isNaN)
      b.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }
  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.merge(o); b
  }
  override def eval(b: TopKBuffer): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      b.sortedPairs.map { case (s, id) =>
        InternalRow(s, id): Any
      })
  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.size)
    bb.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      b.insert(s, id)
      i += 1
    }
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

object VectorFunctions {
  import org.apache.spark.sql.functions._

  private def expr(c: Column): Expression = GraftBridge.expression(c)

  /** dot(a, b) over float vectors, double accumulator, codegen'd. */
  def vectorDot(a: Column, b: Column): Column =
    GraftBridge.column(FloatVectorDot(expr(a), expr(b)))

  /** L2 norm of a float vector. */
  def vectorNorm(a: Column): Column = sqrt(vectorDot(a, a))

  /** Cosine similarity; callers should precompute norms per side once
    * (norm per row, not per pair) and use `vectorDot(a,b)/(na*nb)` — this
    * convenience form recomputes norms and is for small inputs only.
    */
  def cosine(a: Column, b: Column): Column =
    vectorDot(a, b) / (vectorNorm(a) * vectorNorm(b))

  /** Iceberg-style bucket(n, longCol) partition transform. */
  def icebergBucket(c: Column, n: Int): Column =
    // no cast: the expression types per source (int/long widen to the
    // same long hash; string/date/timestamp/decimal hash their own
    // Appendix-B encodings — a cast-to-long would hash the WRONG bytes)
    GraftBridge.column(IcebergBucketExpr(expr(c), n))

  /** Jaccard over sorted distinct long arrays (see [[SortedLongJaccard]]). */
  def sortedLongJaccard(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongJaccard(expr(a), expr(b)))

  /** Codegen'd 64-bit SimHash of an array<long> (see [[Simhash64Expr]]). */
  def simhash64Native(a: Column): Column =
    GraftBridge.column(Simhash64Expr(expr(a)))

  /** Fraction of agreeing slots of two long arrays (MinHash estimator). */
  def equalSlotFraction(a: Column, b: Column): Column =
    GraftBridge.column(EqualSlotFraction(expr(a), expr(b)))

  /** All multi-table hyperplane-LSH keys in one codegen'd pass
    * (see [[HyperplaneKeysExpr]]); equals
    * `array(hyperplaneKey(v, bits, 0), ..., hyperplaneKey(v, bits, T-1))`.
    */
  def hyperplaneKeysNative(v: Column, bits: Int, tables: Int): Column =
    GraftBridge.column(HyperplaneKeysExpr(expr(v), bits, tables))

  /** Bounded top-k aggregate (see [[TopKByScoreAgg]]): the ≤ k best
    * (score, id) pairs per group as array<struct<score, id>>, best first.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKByScoreAgg(expr(score), expr(id), k)
      .toAggregateExpression())

  /** SQ8 encode: float vector + per-dim lo/step → 1-byte-per-dim binary
    * codes (see [[Sq8EncodeExpr]]).
    */
  def sq8Encode(v: Column, lo: Column, step: Column): Column =
    GraftBridge.column(Sq8EncodeExpr(expr(v), expr(lo), expr(step)))

  /** SQ8 asymmetric dot: pre-scaled query floats × corpus byte codes
    * (see [[Sq8ByteDot]]).
    */
  def sq8ByteDot(qs: Column, codes: Column): Column =
    GraftBridge.column(Sq8ByteDot(expr(qs), expr(codes)))
}
