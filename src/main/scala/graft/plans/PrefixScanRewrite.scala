package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the classic scale-killer
  * `row_number() OVER (ORDER BY k)` — a window with NO partition
  * keys, which Spark executes by sorting the ENTIRE dataset in ONE
  * task — into the range-partitioned prefix-scan plan
  * (`graft.ops.Prefix.globalRowNumbers`' shape, derived
  * automatically):
  *
  * {{{
  *   ranged   = range-repartition child by the window order
  *   withPid  = ranged + spark_partition_id()
  *   localRn  = row_number() OVER (PARTITION BY pid ORDER BY k)
  *   offsets  = per-pid counts -> strict prefix sum  (tiny frame;
  *              its own single-task window runs over ~#partitions
  *              rows, not the data)
  *   result   = localRn ⋈broadcast offsets : off + lrn
  * }}}
  *
  * Semantics: identical numbering for a unique order key. With order
  * ties the assignment WITHIN a tie group is arbitrary — exactly as
  * in the single-task plan, where it depends on the input's physical
  * row order; neither form is deterministic under ties.
  *
  * Scope is deliberately narrow (the place the rewrite is provably
  * safe and valuable): exactly one window expression, RowNumber,
  * empty partition spec, deterministic order keys. The offsets
  * window it GENERATES uses Sum, so the rule cannot match its own
  * output (fixpoint-safe).
  *
  * SIZE-GATED, like Spark's own broadcast threshold: measured at 30M
  * rows / local[8], the single-task sort still wins (20.5 s vs
  * 26.0 s — one core's in-memory sort against two extra full
  * exchanges), so rewriting small inputs is a pessimization. The
  * rule fires only when the child's estimated size reaches
  * `spark.graft.prefixScan.minBytes` (default 4 GiB — past the
  * single-shuffle-partition regime where one task must hold, sort,
  * and often spill the entire dataset and every other core idles).
  * Below the threshold the native plan stands; above it the native
  * plan eventually cannot run at all, which is the point.
  *
  * Registered by `graft.functions.GraftExtensions`
  * (`spark.sql.extensions=graft.functions.GraftExtensions`); library
  * callers who want the explicit operator use
  * `graft.ops.Prefix.globalRowNumbers`.
  */
object PrefixScanRewrite extends Rule[LogicalPlan] {

  val MinBytesKey = "spark.graft.prefixScan.minBytes"
  val MinBytesDefault: Long = 4L * 1024 * 1024 * 1024

  private def minBytes: BigInt =
    BigInt(conf.getConfString(MinBytesKey, MinBytesDefault.toString).toLong)

  private def isGlobalRowNumber(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      w.orderSpec.forall(_.deterministic) &&
      (w.windowExpressions match {
        case Seq(Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(Nil, _, _)), _)) => true
        case _ => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window if isGlobalRowNumber(w) && w.child.resolved &&
        conf.exchangeReuseEnabled &&
        w.child.stats.sizeInBytes >= minBytes =>
      val origAlias = w.windowExpressions.head.asInstanceOf[Alias]
      val child = w.child
      // range layout on the window order. pid consistency between the
      // rank and count consumers is GUARANTEED, not hoped for, by three
      // construction choices (without them RangePartitioner re-samples
      // bounds per execution — seeded by RDD id — and the offsets
      // silently mismatch the local ranks):
      //   1. [[PrefixBarrier]] seals this subtree against ColumnPruning
      //      (the count branch would otherwise prune to the order key
      //      and carry its OWN, differently-sampled range exchange), so
      //      both consumers keep a byte-identical copy and exchange
      //      reuse (gated on exchangeReuseEnabled above) materializes
      //      the shuffle ONCE;
      //   2. the partition count is pinned (optNumPartitions below →
      //      REPARTITION_BY_NUM), so AQE cannot coalesce the reused
      //      stage's partitions differently for the two readers (pid is
      //      read AFTER the exchange; a per-consumer coalesce would
      //      renumber it);
      //   3. PrefixRewriteSpec asserts the executed plan materializes
      //      exactly one range exchange.
      val ranged = RepartitionByExpression(
        w.orderSpec, child, Some(conf.numShufflePartitions))
      val pidAlias = Alias(SparkPartitionID(), "__pfx_pid")()
      val pid = pidAlias.toAttribute
      val withPid = PrefixBarrier(Project(child.output :+ pidAlias, ranged))
      // per-partition rank — parallel, the frame Spark's own
      // row_number uses
      val lrnAlias = Alias(
        WindowExpression(RowNumber(),
          WindowSpecDefinition(Seq(pid), w.orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        "__pfx_lrn")()
      val lrn = lrnAlias.toAttribute
      val localRn = Window(Seq(lrnAlias), Seq(pid), w.orderSpec, withPid)
      // tiny summary: one row per partition. The pid is RE-ALIASED so
      // the join sides' outputs are disjoint (the subtrees share the
      // child; outputs must not).
      val pidRAlias = Alias(pid, "__pfx_pid_r")()
      val pidR = pidRAlias.toAttribute
      val cntAlias = Alias(
        AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
        "__pfx_cnt")()
      val cnt = cntAlias.toAttribute
      val counts = Aggregate(Seq(pid), Seq(pidRAlias, cntAlias), withPid)
      val offAlias = Alias(
        WindowExpression(
          AggregateExpression(Sum(cnt), Complete, isDistinct = false),
          WindowSpecDefinition(Nil, Seq(SortOrder(pidR, Ascending)),
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))),
        "__pfx_sum")()
      val offsets = Window(
        Seq(offAlias), Nil, Seq(SortOrder(pidR, Ascending)), counts)
      val offNzAlias = Alias(
        Coalesce(Seq(offAlias.toAttribute, Literal(0L))), "__pfx_off")()
      val off = offNzAlias.toAttribute
      val offProj = Project(Seq(pidR, offNzAlias), offsets)
      val joined = Join(localRn, offProj, Inner,
        Some(EqualTo(pid, pidR)),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      // same name, same exprId, same IntegerType as the original
      // row_number output — downstream references are untouched
      val rnAlias = Alias(
        Cast(Add(off, Cast(lrn, LongType)), IntegerType),
        origAlias.name)(exprId = origAlias.exprId)
      Project(child.output :+ rnAlias, joined)
  }
}
