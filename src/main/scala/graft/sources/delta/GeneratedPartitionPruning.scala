package graft.sources.delta

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, DayOfMonth, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Month, Year}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DateType

/** Partition pruning through GENERATED partition columns — the production
  * time-partitioning pattern (delta-spark's "generated column partition
  * filter" optimization): a table partitioned by
  * `d GENERATED ALWAYS AS (CAST(ts AS DATE))` must prune on a `ts`
  * predicate even though `ts` itself is not a partition column. Without
  * this, every query that filters on the event time scans all partitions
  * — at 100 TB the difference between touching one day and touching ten
  * years.
  *
  * The rule adds DERIVED partition conjuncts next to the user's data
  * conjuncts; Spark's own `PruneFileSourcePartitions` then pushes them
  * into [[DeltaFileIndex.listFiles]]. Soundness: a derived conjunct only
  * needs to hold for rows the original filter keeps, so
  *
  *  - equality / IN on the source column derives through ANY of the
  *    supported generation functions (`g = f(src)`, so `src = v`
  *    implies `g = f(v)`);
  *  - range conjuncts derive only through MONOTONIC functions (date,
  *    year): `src >= v` implies `f(src) >= f(v)`; strict bounds widen to
  *    inclusive ones (`src > v` implies `f(src) >= f(v)` — never less).
  *    Non-monotonic month/day derive nothing from ranges (month(ts) wraps
  *    every year).
  *
  * Supported generation expressions (the delta-spark set minus
  * formatting): `CAST(src AS DATE)`, `DATE(src)`, `YEAR(src)`,
  * `MONTH(src)`, `DAY(src)`/`DAYOFMONTH(src)`. Everything else derives
  * nothing — pruning is an optimization, never a correctness dependency.
  * Derived literals are evaluated eagerly in the session time zone (the
  * same zone [[DeltaWriter]] computed the stored partition values with).
  * The rule runs in the operator-optimization fixpoint batch, so it
  * re-checks (via `semanticEquals`) that a derived conjunct is not already
  * present before adding — otherwise the batch would never converge. */
object GeneratedPartitionPruning extends Rule[LogicalPlan] {

  private sealed trait Kind { def monotonic: Boolean }
  private case object DateOf extends Kind { val monotonic = true }
  private case object YearOf extends Kind { val monotonic = true }
  private case object MonthOf extends Kind { val monotonic = false }
  private case object DayOf extends Kind { val monotonic = false }

  private val CastDate = """(?i)^\s*CAST\s*\(\s*`?(\w+)`?\s+AS\s+DATE\s*\)\s*$""".r
  private val DateFn = """(?i)^\s*DATE\s*\(\s*`?(\w+)`?\s*\)\s*$""".r
  private val YearFn = """(?i)^\s*YEAR\s*\(\s*`?(\w+)`?\s*\)\s*$""".r
  private val MonthFn = """(?i)^\s*MONTH\s*\(\s*`?(\w+)`?\s*\)\s*$""".r
  private val DayFn = """(?i)^\s*(?:DAY|DAYOFMONTH)\s*\(\s*`?(\w+)`?\s*\)\s*$""".r

  private def parseGen(e: String): Option[(String, Kind)] = e match {
    case CastDate(c) => Some((c, DateOf))
    case DateFn(c) => Some((c, DateOf))
    case YearFn(c) => Some((c, YearOf))
    case MonthFn(c) => Some((c, MonthOf))
    case DayFn(c) => Some((c, DayOf))
    case _ => None
  }

  /** f(literal), eagerly evaluated; None when the value is NULL or the
    * cast fails (no derivation — never a wrong one). */
  private def applyFn(kind: Kind, lit: Literal, tz: String): Option[Literal] = {
    val toDate = Cast(lit, DateType, Some(tz))
    val e: Expression = kind match {
      case DateOf => toDate
      case YearOf => Year(toDate)
      case MonthOf => Month(toDate)
      case DayOf => DayOfMonth(toDate)
    }
    try {
      val v = e.eval(null)
      if (v == null) None else Some(Literal.create(v, e.dataType))
    } catch { case _: Exception => None }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, rel: LogicalRelation)
        if rel.relation.isInstanceOf[HadoopFsRelation] &&
          rel.relation.asInstanceOf[HadoopFsRelation]
            .location.isInstanceOf[DeltaFileIndex] =>
      val snap = rel.relation.asInstanceOf[HadoopFsRelation]
        .location.asInstanceOf[DeltaFileIndex].snapshot
      val resolver = conf.resolver
      // (partition attr, source column, derivation kind) per generated
      // partition column with a supported generation expression
      val gens: Seq[(Attribute, String, Kind)] = snap.partitionColumns.flatMap { pc =>
        snap.schema.fields.find(ff => resolver(ff.name, pc))
          .filter(_.metadata.contains(DeltaWriter.GenerationExpressionKey))
          .flatMap { ff =>
            parseGen(ff.metadata.getString(DeltaWriter.GenerationExpressionKey))
              .flatMap { case (src, kind) =>
                rel.output.find(a => resolver(a.name, ff.name))
                  .map(gAttr => (gAttr, src, kind))
              }
          }
      }
      if (gens.isEmpty) f
      else {
        val tz = conf.sessionLocalTimeZone
        val conjuncts = splitConjuncts(cond)
        def isSrc(e: Expression, src: String): Boolean = e match {
          case a: Attribute => resolver(a.name, src)
          case _ => false
        }
        val derived = Seq.newBuilder[Expression]
        conjuncts.foreach { cj =>
          gens.foreach { case (g, src, kind) =>
            val d: Option[Expression] = cj match {
              case EqualTo(a, l: Literal) if isSrc(a, src) =>
                applyFn(kind, l, tz).map(EqualTo(g, _))
              case EqualTo(l: Literal, a) if isSrc(a, src) =>
                applyFn(kind, l, tz).map(EqualTo(g, _))
              case In(a, ls) if isSrc(a, src) && ls.nonEmpty &&
                  ls.forall(_.isInstanceOf[Literal]) =>
                val vs = ls.map(l => applyFn(kind, l.asInstanceOf[Literal], tz))
                if (vs.forall(_.isDefined)) Some(In(g, vs.flatten.distinct))
                else None
              case GreaterThanOrEqual(a, l: Literal) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(GreaterThanOrEqual(g, _))
              case GreaterThan(a, l: Literal) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(GreaterThanOrEqual(g, _))
              case LessThanOrEqual(a, l: Literal) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(LessThanOrEqual(g, _))
              case LessThan(a, l: Literal) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(LessThanOrEqual(g, _))
              // literal-first spellings flip the bound's direction
              case GreaterThanOrEqual(l: Literal, a) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(LessThanOrEqual(g, _))
              case GreaterThan(l: Literal, a) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(LessThanOrEqual(g, _))
              case LessThanOrEqual(l: Literal, a) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(GreaterThanOrEqual(g, _))
              case LessThan(l: Literal, a) if isSrc(a, src) && kind.monotonic =>
                applyFn(kind, l, tz).map(GreaterThanOrEqual(g, _))
              case _ => None
            }
            d.foreach(derived += _)
          }
        }
        val fresh = derived.result()
          .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        if (fresh.isEmpty) f
        else Filter(fresh.foldLeft(cond)(And(_, _)), rel)
      }
  }
}
