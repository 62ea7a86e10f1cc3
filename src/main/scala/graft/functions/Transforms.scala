package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full Iceberg partition-TRANSFORM vocabulary (Iceberg spec §Partition
  * Transforms; the reference planned `bucket`/`days` for its DMS tables,
  * src/data_ingestion/ingestion/dmsdatabase1.py:79-85) as ONE shared model:
  *
  *   - the property grammar `graft.transform.<pcol> = <spec>` parses here;
  *   - the WRITE side derives the partition column from its source with
  *     [[expr]] (hidden partitioning: writers never supply the column);
  *   - the READ side prunes raw-source predicates through the partition
  *     value with the range math in [[graft.table.StatsPruning]].
  *
  * Time units materialize as human-readable strings in Iceberg's own
  * formats (`yyyy-MM-dd` days already established by round-4 tables keeps
  * DateType for compatibility; months `yyyy-MM`, years `yyyy`, hours
  * `yyyy-MM-dd-HH`), computed in the SESSION timezone for TimestampType
  * and as wall-clock for NTZ — exactly the zone rules the pruning range
  * decode applies, so the two sides can never disagree.
  */
object Transforms {

  sealed trait Spec {
    /** The raw data column the partition value derives from. */
    def src: String
    /** Canonical property-value spelling (what `parse` round-trips). */
    def canonical: String
    /** Iceberg's default derived-field name. */
    def defaultName: String
  }
  final case class Bucket(n: Int, src: String) extends Spec {
    def canonical = s"bucket($n,$src)"
    def defaultName = s"${src}_bucket"
  }
  /** unit ∈ day | month | year | hour. */
  final case class TimeUnit(unit: String, src: String) extends Spec {
    def canonical = unit match {
      case "day" => s"days($src)"
      case "month" => s"months($src)"
      case "year" => s"years($src)"
      case "hour" => s"hours($src)"
    }
    def defaultName = s"${src}_$unit"
  }
  final case class Truncate(w: Int, src: String) extends Spec {
    def canonical = s"truncate($w,$src)"
    def defaultName = s"${src}_trunc"
  }

  private val BucketRe = """(?i)bucket\(\s*(\d+)\s*,\s*([^)]+)\)""".r
  private val UnitRe = """(?i)(days?|months?|years?|hours?)\(([^)]+)\)""".r
  private val TruncRe = """(?i)truncate\(\s*(\d+)\s*,\s*([^)]+)\)""".r

  /** Parse a transform spec string; None for anything unrecognized (the
    * property reader treats that as "no pruning, never an error").
    */
  def parse(s: String): Option[Spec] = s.trim match {
    case BucketRe(n, src) => Some(Bucket(n.toInt, src.trim))
    case TruncRe(w, src) if w.toInt > 0 => Some(Truncate(w.toInt, src.trim))
    case UnitRe(u, src) =>
      val unit = u.toLowerCase.stripSuffix("s")
      Some(TimeUnit(unit, src.trim))
    case _ => None
  }

  /** The derived partition column's type for a source of `srcType`; None
    * when the transform is undefined over that source type.
    */
  def derivedType(spec: Spec, srcType: DataType): Option[DataType] = spec match {
    case Bucket(_, _) => srcType match {
      // the full Iceberg Appendix-B bucket source set (reference UD1 was
      // LongType only): integrals/date/timestamp widen to the long hash,
      // strings hash UTF-8 bytes, decimals their unscaled value
      case ByteType | ShortType | IntegerType | LongType | StringType |
           DateType | TimestampType | TimestampNTZType => Some(IntegerType)
      case _: DecimalType => Some(IntegerType)
      case _ => None
    }
    case TimeUnit("day", _) => srcType match {
      case DateType | TimestampType | TimestampNTZType => Some(DateType)
      case _ => None
    }
    case TimeUnit("hour", _) => srcType match {
      case TimestampType | TimestampNTZType => Some(StringType)
      case _ => None
    }
    case TimeUnit(_, _) => srcType match { // month | year
      case DateType | TimestampType | TimestampNTZType => Some(StringType)
      case _ => None
    }
    case Truncate(_, _) => srcType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        Some(srcType)
      case _ => None
    }
  }

  /** The Column deriving the partition value from the source — built-in
    * codegen'd functions only (`date_format` follows the session timezone
    * for TimestampType and wall-clock for NTZ, matching the pruning
    * decode; integer truncate uses Iceberg's floor semantics so negative
    * values land in the block below zero).
    */
  def expr(spec: Spec, srcType: DataType): Option[Column] = {
    val s = col(spec.src)
    spec match {
      case Bucket(n, _) => derivedType(spec, srcType).map(_ =>
        VectorFunctions.icebergBucket(s, n))
      case TimeUnit("day", _) => derivedType(spec, srcType).map(_ => to_date(s))
      case TimeUnit("month", _) =>
        derivedType(spec, srcType).map(_ => date_format(s, "yyyy-MM"))
      case TimeUnit("year", _) =>
        derivedType(spec, srcType).map(_ => date_format(s, "yyyy"))
      case TimeUnit("hour", _) =>
        derivedType(spec, srcType).map(_ => date_format(s, "yyyy-MM-dd-HH"))
      case Truncate(w, _) => srcType match {
        case StringType => Some(substring(s, 1, w))
        case ByteType | ShortType | IntegerType | LongType =>
          // floor-mod: -7 truncate 5 → -10 (Iceberg spec), kept in the
          // source's own type so partition paths parse back losslessly
          Some((s - ((s % w) + w) % w).cast(srcType))
        case _ => None
      }
    }
  }
}
