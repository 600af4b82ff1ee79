package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, EqualTo, Expression, GenericInternalRow,
  IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, NamedExpression, RowNumber,
  SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-group top-k as a first-class operator — the engine's example of
  * the full (c) extension tier: logical node + optimizer rewrite rule +
  * planner strategy + physical exec, all injected through
  * [[graft.GraftExtensions]].
  *
  * The declarative form every query writes is
  * {{{ row_number().over(Window.partitionBy(g).orderBy(o)) <= k }}}
  * which Spark plans as Exchange(g) -> FULL SORT of every row in every
  * group -> Window -> Filter: the sort is O(n log n) per group and the
  * exchange moves EVERY scored row. But when the rank is only used as a
  * `<= k` cutoff, top-k needs no global per-group sort at all:
  *
  *  - partial phase (map side): one bounded k-row buffer per group per
  *    partition; every input row costs one compare against the current
  *    k-th (plus O(k) insertion for the rare survivors);
  *  - exchange: moves AT MOST k rows per (group, input partition) —
  *    for qn07-style ANN scoring that is k x partitions rows instead of
  *    the full candidate set;
  *  - final phase (reduce side): same buffer per group, then emit with
  *    rank 1..k.
  *
  * [[TopKRewriteRule]] recognizes the Filter-over-row_number-Window
  * pattern in the optimized plan and swaps in the logical node — query
  * code stays declarative, the rank attribute keeps its exprId so parent
  * operators resolve unchanged, and semantics are exactly row_number's
  * (ties broken by the window order; the queries' orderings are total).
  * Memory contract: O(groups-per-partition x k) rows — the same contract
  * as the hash aggregate this operator replaces a sort for.
  */
case class TopKPerGroup(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Rewrite `Filter(rank <= k, Window(row_number() AS rank OVER (g, o)))`
  * (also `rank < k+1` and `rank === 1`) to [[TopKPerGroup]]. Only fires
  * for a lone row_number window expression — rank()/dense_rank() have
  * different tie semantics and other window functions need the full
  * group anyway.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def asTopK(cond: Expression, w: Window): Option[LogicalPlan] = w match {
    case Window(Seq(a @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(parts, order, _)), _)),
        _, _, child, _) =>
      val rankAttr = a.toAttribute
      val kOpt = cond match {
        case LessThanOrEqual(r: AttributeReference, IntegerLiteral(k)) if r.semanticEquals(rankAttr) => Some(k)
        case LessThan(r: AttributeReference, IntegerLiteral(k)) if r.semanticEquals(rankAttr) => Some(k - 1)
        case EqualTo(r: AttributeReference, IntegerLiteral(1)) if r.semanticEquals(rankAttr) => Some(1)
        case _ => None
      }
      kOpt.filter(_ > 0).map(k => TopKPerGroup(parts, order, k, rankAttr, child))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) => asTopK(cond, w).getOrElse(f)
  }
}

/** Plans the logical node as partial + final [[TopKPerGroupExec]]; the
  * required clustered distribution of the final phase makes
  * EnsureRequirements insert the (k-rows-per-group-per-partition wide)
  * exchange between them.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(group, order, k, rankAttr, child) =>
      val partial = TopKPerGroupExec(partial = true, group, order, k, rankAttr, planLater(child))
      TopKPerGroupExec(partial = false, group, order, k, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    partial: Boolean,
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (group.isEmpty) Seq(org.apache.spark.sql.catalyst.plans.physical.AllTuples)
    else Seq(ClusteredDistribution(group))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    val isPartial = partial
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      // group key -> rows sorted best-first, at most k of them
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.ArrayList[UnsafeRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var buf = heaps.get(key)
        if (buf == null) {
          buf = new java.util.ArrayList[UnsafeRow](limit)
          heaps.put(key.copy(), buf)
        }
        val n = buf.size()
        if (n < limit || ordering.compare(row, buf.get(n - 1)) < 0) {
          // insertion position by binary search over the (tiny) buffer
          var lo = 0; var hi = n
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ordering.compare(row, buf.get(mid)) < 0) hi = mid else lo = mid + 1
          }
          buf.add(lo, row.asInstanceOf[UnsafeRow].copy())
          if (buf.size() > limit) buf.remove(limit)
        }
      }
      val entries = heaps.entrySet().iterator()
      if (isPartial) {
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!cur.hasNext && entries.hasNext) cur = entries.next().getValue.iterator()
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      } else {
        val outProj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()
          private var rank = 0
          override def hasNext: Boolean = {
            while (!cur.hasNext && entries.hasNext) { cur = entries.next().getValue.iterator(); rank = 0 }
            cur.hasNext
          }
          override def next(): InternalRow = {
            rank += 1
            rankRow.setInt(0, rank)
            outProj(joined(cur.next(), rankRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
