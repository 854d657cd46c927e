package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy

/** Row-identity optimizer barrier. [[PrefixScanRewrite]] wraps the
  * shared `range-exchange + pid` subtree in this node before handing
  * it to its two consumers (the local-rank window and the per-pid
  * count aggregate). Catalyst's ColumnPruning pushes projections
  * through every node type it KNOWS (Project, Window, Aggregate,
  * RepartitionByExpression, …) but cannot push through a node it
  * doesn't recognize — so both consumers keep a byte-identical copy
  * of the subtree BELOW the barrier, the two physical range
  * exchanges canonicalize equal, and exchange reuse (AQE stage cache
  * / ReuseExchangeAndSubquery) is guaranteed to materialize the
  * shuffle ONCE. That single materialization is what makes
  * `spark_partition_id()` consistent between the rank and count
  * branches; without it RangePartitioner re-samples bounds per
  * branch (seeded by RDD id) and the offsets silently mismatch the
  * local ranks. PrefixRewriteSpec asserts the one-exchange shape on
  * an executed plan.
  */
final case class PrefixBarrier(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  // declare every child column as referenced: ColumnPruning's generic
  // case prunes ANY node's grandchildren down to
  // `child.references ++ project.references`, which would specialize
  // the two consumers' copies below the barrier and re-introduce the
  // double-sampled exchange this node exists to prevent
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PrefixBarrier = copy(child = newChild)
}

/** Pass-through exec for [[PrefixBarrier]]: preserves rows,
  * partitioning, and ordering. Sits directly above the reused range
  * exchange, where codegen is already broken by the shuffle, so the
  * extra non-codegen node costs one iterator indirection.
  */
final case class PrefixBarrierExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(
      newChild: SparkPlan): PrefixBarrierExec = copy(child = newChild)
}

/** Plans [[PrefixBarrier]] as [[PrefixBarrierExec]]. Injected by
  * `graft.functions.GraftExtensions` alongside the rewrite rule.
  */
object PrefixBarrierStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PrefixBarrier(child) => PrefixBarrierExec(planLater(child)) :: Nil
    case _ => Nil
  }
}
