package graft.plans

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: rewrite `size(array_intersect(S, T))` to the
  * allocation-free merge-walk [[SortedIntersectCount]] whenever BOTH
  * operands are provably sorted-ascending AND distinct — i.e. they are
  * literally `array_sort(array_distinct(...))` subtrees with the default
  * comparator over strings. The built-in evaluates by building a per-row
  * hash set and materializing the intersection array just to take its
  * length; when only the cardinality is needed the merge walk does the
  * same job with zero allocation.
  *
  * This is the engine's example of the (c) extension tier — a
  * `Rule[LogicalPlan]` injected through [[graft.GraftExtensions]] — kept
  * deliberately narrow: the precondition is part of the matched pattern,
  * so the rewrite is safe by construction (sorted + distinct inputs make
  * `size∘array_intersect` and the merge count coincide).
  */
object IntersectCountRule extends Rule[LogicalPlan] {

  /** `array_sort(array_distinct(x))` with the default ascending
    * comparator, over strings. */
  private def sortedDistinctStrings(e: Expression): Boolean = e match {
    case ArraySort(ArrayDistinct(x), cmp, _) =>
      x.dataType == ArrayType(StringType, containsNull = false) &&
        isAscComparator(cmp)
    case _ => false
  }

  /** The ANALYZED form of ArraySort.defaultComparator over a
    * containsNull=false array: `if (l < r) -1 else if (l > r) 1 else 0`
    * (the analyzer strips the null branches). */
  private def isAscComparator(cmp: Expression): Boolean = cmp match {
    case org.apache.spark.sql.catalyst.expressions.LambdaFunction(
        org.apache.spark.sql.catalyst.expressions.If(
          org.apache.spark.sql.catalyst.expressions.LessThan(a1, b1),
          org.apache.spark.sql.catalyst.expressions.Literal(m1, _),
          org.apache.spark.sql.catalyst.expressions.If(
            org.apache.spark.sql.catalyst.expressions.GreaterThan(a2, b2),
            org.apache.spark.sql.catalyst.expressions.Literal(p1, _),
            org.apache.spark.sql.catalyst.expressions.Literal(z, _))),
        Seq(l, r), _) =>
      m1 == -1 && p1 == 1 && z == 0 &&
        a1.semanticEquals(l) && b1.semanticEquals(r) &&
        a2.semanticEquals(l) && b2.semanticEquals(r)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), legacy)
          if !legacy && sortedDistinctStrings(l) && sortedDistinctStrings(r) =>
        SortedIntersectCount(l, r)
    }
}
