package graft.expr.catalyst

import java.time.LocalDate

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Partition-pruning derivation rule (SURVEY §4 "year between" rewrite,
  * as a Catalyst rule instead of an API-layer hack).
  *
  * Lake tables are partitioned by a `year` column that is BY CONSTRUCTION
  * `year(date)` (reference `returns_flow.py:19` et al.). A query filtering
  * on `date` alone scans every year directory: the date predicate pushes
  * into Parquet row groups but cannot prune partitions. This rule finds
  * columns tagged with [[DeriveYearPruning.Tag]] metadata (attached by
  * `Lake.table`), derives the implied integer bounds from any date
  * comparison conjuncts, and conjoins them — after which Spark's own
  * partition pruning drops whole year directories.
  *
  * Idempotent (skips when the filter already references the year column),
  * so it is safe under the optimizer's run-to-fixpoint batches.
  */
object DeriveYearPruning extends Rule[LogicalPlan] with PredicateHelper {

  /** Column-metadata key, set ON THE DATE COLUMN (partition columns lose
    * user-schema metadata when Spark reconstructs the partition schema;
    * data columns keep it): the value names the integer partition column
    * that is `year(date)` by construction.
    */
  val Tag = "graft_year_partition_col"

  private def yearOf(days: Any): Int =
    LocalDate.ofEpochDay(days.asInstanceOf[Int].toLong).getYear

  /** Strict-bound sharpening: `date < Jan 1 of Y` implies `year <= Y-1`
    * (the conservative `year <= Y` would keep the whole Y partition for
    * the classic `>= Y-1-01-01 AND < Y-01-01` year-slice shape).
    */
  private def yearBelow(days: Any): Int = {
    val d = LocalDate.ofEpochDay(days.asInstanceOf[Int].toLong)
    if (d.getDayOfYear == 1) d.getYear - 1 else d.getYear
  }

  /** `date > Dec 31 of Y` implies `year >= Y+1`. */
  private def yearAbove(days: Any): Int = {
    val d = LocalDate.ofEpochDay(days.asInstanceOf[Int].toLong)
    if (d.getMonthValue == 12 && d.getDayOfMonth == 31) d.getYear + 1 else d.getYear
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Leaf child only: above a join/union the output can contain an
    // unrelated integer column that happens to be named like the tag's
    // target, and a bound on it would silently drop rows. Pushdown lands
    // date filters directly on the relation, which is where pruning
    // matters anyway.
    case f @ Filter(cond, child) if child.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode] =>
      val tagged = child.output.collect {
        case d if d.metadata.contains(Tag) && d.dataType == DateType => d
      }
      if (tagged.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val extra = tagged.flatMap { d =>
          val yearName = d.metadata.getString(Tag)
          child.output.find(a => a.name == yearName && a.dataType == IntegerType) match {
            case Some(y) if !conjuncts.exists(_.references.contains(y)) =>
              conjuncts.flatMap {
                case GreaterThanOrEqual(a: AttributeReference, Literal(v, DateType))
                    if a.semanticEquals(d) && v != null =>
                  Some(GreaterThanOrEqual(y, Literal(yearOf(v))))
                case GreaterThan(a: AttributeReference, Literal(v, DateType))
                    if a.semanticEquals(d) && v != null =>
                  Some(GreaterThanOrEqual(y, Literal(yearAbove(v))))
                case LessThanOrEqual(a: AttributeReference, Literal(v, DateType))
                    if a.semanticEquals(d) && v != null =>
                  Some(LessThanOrEqual(y, Literal(yearOf(v))))
                case LessThan(a: AttributeReference, Literal(v, DateType))
                    if a.semanticEquals(d) && v != null =>
                  Some(LessThanOrEqual(y, Literal(yearBelow(v))))
                case EqualTo(a: AttributeReference, Literal(v, DateType))
                    if a.semanticEquals(d) && v != null =>
                  Some(EqualTo(y, Literal(yearOf(v))))
                case EqualTo(Literal(v, DateType), a: AttributeReference)
                    if a.semanticEquals(d) && v != null =>
                  Some(EqualTo(y, Literal(yearOf(v))))
                case _ => None
              }
            case _ => Seq.empty
          }
        }
        if (extra.isEmpty) f
        else Filter(extra.foldLeft(cond)((c, e) => And(c, e)), child)
      }
  }
}
