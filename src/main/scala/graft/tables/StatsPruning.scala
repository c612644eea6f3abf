package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.Decimal

/** Conservative file-level predicate evaluation against commit-log
  * metadata — ONE implementation shared by scan planning
  * ([[GraftTableFileIndex]]) and the DML blast-radius pre-prune
  * ([[GraftTable]]`.touchedFiles`). The contract everywhere: answer
  * "can any row of this file match?" and NEVER answer a false "no" —
  * unknown expression shapes, columns without stats, and
  * null-semantics corners all answer true (keep the file).
  */
private[graft] object StatsPruning {
  import GraftTable.FileStats

  /** Per-filter file keep/drop decision. Filters over ONLY partition
    * columns evaluate EXACTLY against the file's recorded partition
    * tuple; everything else goes through min/max interval checks.
    */
  def keep(e: Expression, stats: Option[FileStats],
      partVals: Option[Map[String, String]], partitionBy: Seq[String],
      spark: SparkSession): Boolean = {
    val exact = partitionBy.nonEmpty && e.deterministic &&
      e.references.nonEmpty &&
      e.references.forall(a => partitionBy.contains(a.name))
    if (exact) partitionMayMatch(e, partVals, spark)
    else mayMatch(e, stats)
  }

  /** Evaluate a partition-column-only predicate against one file's
    * partition tuple by substituting each attribute with its typed
    * literal (string value cast through Catalyst's own Cast, so
    * "10" = 10 compares in the COLUMN's domain, not lexically). A
    * file survives unless the predicate is definitively non-TRUE:
    * `false` always prunes, and `null` prunes too when every
    * substitution was exact (a filter only passes rows where the
    * predicate IS TRUE, so a genuinely-NULL partition value — Hive's
    * `__HIVE_DEFAULT_PARTITION__` — can never satisfy `pk = x`). A
    * null that came from a missing tuple entry or an unparseable
    * cast keeps conservatively, as before.
    */
  def partitionMayMatch(e: Expression,
      vals: Option[Map[String, String]], spark: SparkSession): Boolean =
    vals match {
      case None => true // no recorded tuple — never prune
      case Some(m) =>
        try {
          var unknown = false // a substitution we cannot vouch for
          val bound = e.transformUp {
            case a: AttributeReference =>
              val v = m.get(a.name) match {
                case None => unknown = true; null
                case Some("__HIVE_DEFAULT_PARTITION__") => null
                case Some(s) =>
                  val c = Cast(Literal(org.apache.spark.unsafe.types
                    .UTF8String.fromString(s),
                    org.apache.spark.sql.types.StringType),
                    a.dataType,
                    Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
                  if (c == null) unknown = true
                  c
              }
              Literal(v, a.dataType)
          }
          bound.eval(InternalRow.empty) match {
            case false => false
            case null if !unknown => false
            case _ => true
          }
        } catch { case _: Exception => true } // unknown shape — keep
    }

  /** Can any row of a file with these stats satisfy `e`? */
  def mayMatch(e: Expression, stats: Option[FileStats]): Boolean = {
    def range(name: String): Option[(Double, Double)] =
      stats.flatMap(s =>
        for { lo <- s.mins.get(name); hi <- s.maxs.get(name) } yield (lo, hi))
    def check(name: String, v: Double)(p: (Double, Double) => Boolean): Boolean =
      range(name).forall { case (lo, hi) => p(lo, hi) }
    // string interval compares run in UTF-8 BYTE order (= code-point
    // order, GraftTable.utf8Cmp) — the order the parquet stats were
    // computed in — so they are faithful for EVERY string
    import GraftTable.{utf8Cmp => cmp}
    def srange(name: String): Option[(String, String)] =
      stats.flatMap(s => for {
        lo <- s.smins.flatMap(_.get(name))
        hi <- s.smaxs.flatMap(_.get(name))
      } yield (lo, hi))
    def scheck(name: String, v: String)(p: (String, String) => Boolean): Boolean =
      srange(name).forall { case (lo, hi) => p(lo, hi) }
    e match {
      case EqualTo(AttrName(a), Str(v)) => scheck(a, v)((lo, hi) => cmp(lo, v) <= 0 && cmp(v, hi) <= 0)
      case EqualTo(Str(v), AttrName(a)) => scheck(a, v)((lo, hi) => cmp(lo, v) <= 0 && cmp(v, hi) <= 0)
      case GreaterThan(AttrName(a), Str(v)) => scheck(a, v)((_, hi) => cmp(hi, v) > 0)
      case GreaterThan(Str(v), AttrName(a)) => scheck(a, v)((lo, _) => cmp(lo, v) < 0)
      case GreaterThanOrEqual(AttrName(a), Str(v)) => scheck(a, v)((_, hi) => cmp(hi, v) >= 0)
      case GreaterThanOrEqual(Str(v), AttrName(a)) => scheck(a, v)((lo, _) => cmp(lo, v) <= 0)
      case LessThan(AttrName(a), Str(v)) => scheck(a, v)((lo, _) => cmp(lo, v) < 0)
      case LessThan(Str(v), AttrName(a)) => scheck(a, v)((_, hi) => cmp(hi, v) > 0)
      case LessThanOrEqual(AttrName(a), Str(v)) => scheck(a, v)((lo, _) => cmp(lo, v) <= 0)
      case LessThanOrEqual(Str(v), AttrName(a)) => scheck(a, v)((_, hi) => cmp(hi, v) >= 0)
      case In(AttrName(a), vs) if vs.nonEmpty && vs.forall(Str.unapply(_).isDefined) =>
        vs.flatMap(Str.unapply).exists(v =>
          scheck(a, v)((lo, hi) => cmp(lo, v) <= 0 && cmp(v, hi) <= 0))
      case StartsWith(AttrName(a), Str(p)) if p.nonEmpty =>
        // LIKE 'P%' matches rows in [P, P⁺) with P⁺ = P last-char+1;
        // the file may match iff its interval overlaps that range.
        // The successor trick needs a safely incrementable last char,
        // so it stays ASCII-guarded; other prefixes just keep the file
        if (!p.forall(c => c >= ' ' && c < 127)) true
        else scheck(a, p)((lo, hi) =>
          cmp(hi, p) >= 0 &&
            (p.last >= 126 || cmp(lo, p.init + (p.last + 1).toChar) < 0))
      case _ => mayMatchNumeric(e, stats, check)
    }
  }

  private def mayMatchNumeric(e: Expression, stats: Option[FileStats],
      check: (String, Double) => ((Double, Double) => Boolean) => Boolean)
      : Boolean = {
    e match {
      case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
      case Or(l, r) => mayMatch(l, stats) || mayMatch(r, stats)
      case EqualTo(AttrName(a), Num(v)) => check(a, v)((lo, hi) => lo <= v && v <= hi)
      case EqualTo(Num(v), AttrName(a)) => check(a, v)((lo, hi) => lo <= v && v <= hi)
      case GreaterThan(AttrName(a), Num(v)) => check(a, v)((_, hi) => hi > v)
      case GreaterThan(Num(v), AttrName(a)) => check(a, v)((lo, _) => lo < v)
      case GreaterThanOrEqual(AttrName(a), Num(v)) => check(a, v)((_, hi) => hi >= v)
      case GreaterThanOrEqual(Num(v), AttrName(a)) => check(a, v)((lo, _) => lo <= v)
      case LessThan(AttrName(a), Num(v)) => check(a, v)((lo, _) => lo < v)
      case LessThan(Num(v), AttrName(a)) => check(a, v)((_, hi) => hi > v)
      case LessThanOrEqual(AttrName(a), Num(v)) => check(a, v)((lo, _) => lo <= v)
      case LessThanOrEqual(Num(v), AttrName(a)) => check(a, v)((_, hi) => hi >= v)
      case In(AttrName(a), vs) if vs.forall(Num.unapply(_).isDefined) =>
        vs.flatMap(Num.unapply).exists(v =>
          check(a, v)((lo, hi) => lo <= v && v <= hi))
      case InSet(AttrName(a), vs) =>
        val nums = vs.toSeq.map(Num.fromValue)
        // a non-numeric member means we can't bound the set → keep
        nums.exists(_.isEmpty) || nums.flatten.exists(v =>
          check(a, v)((lo, hi) => lo <= v && v <= hi))
      case _ => true
    }
  }

  /** Bare column reference (no Cast unwrapping: equality under a cast
    * can reorder values, and pruning must stay conservative).
    */
  private object AttrName {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
  }

  /** String literal (UTF8String at the Catalyst layer). */
  private object Str {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(v.toString)
      case Literal(v: String, _) => Some(v)
      case _ => None
    }
  }

  /** Numeric literal as a double, the commit log's stats domain. */
  private object Num {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v, _) => fromValue(v)
      case _ => None
    }
    def fromValue(v: Any): Option[Double] = v match {
      case null => None
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case f: Float => Some(f.toDouble)
      case d: Double => Some(d)
      case s: Short => Some(s.toDouble)
      case b: Byte => Some(b.toDouble)
      case d: Decimal => Some(d.toDouble)
      case n: java.lang.Number => Some(n.doubleValue)
      case _ => None
    }
  }
}
