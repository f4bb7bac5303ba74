package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import graft.functions.{ExclusiveQuantileAgg, SortedWindow}

/** Whole-operator Catalyst integration for the reference's load-bearing
  * window: `exclusive_quantile_agg(x, q) OVER (PARTITION BY s ORDER BY t
  * ROWS BETWEEN L PRECEDING AND 1 PRECEDING)` — the 177-use rolling
  * no-lookahead quantile (ref sql/gen600_2down_template.sql:69-72,
  * rolling-1000 policy sql/CLAUDE.md:55).
  *
  * Spark's WindowExec evaluates SLIDING frames by re-aggregating the whole
  * frame for every output row (AggregateProcessor has no retraction), which
  * for this aggregate means O(L²) buffer shifts per row — and WindowExec
  * additionally spools each partition into an ExternalAppendOnlyUnsafeRowBuffer
  * before emitting anything. [[SlidingQuantileWindowExec]] replaces both
  * costs for the prior-only frame: rows STREAM through (a prior-only frame
  * never waits on future rows, so nothing is buffered — the operator is
  * pipelined like a projection), and each quantile column keeps an
  * incrementally-maintained sorted multiset (binary-search insert + evict,
  * O(L) memmove per row) — the same [[graft.functions.SortedWindow]] kernel
  * as [[graft.operators.SeriesReplay]], and the same
  * QuantileMultiExclusive.interpolate arithmetic as the declarative
  * expression, so all three paths are bit-identical by construction.
  *
  * Distribution/ordering contracts mirror WindowExec exactly (hash on
  * partitionSpec, sort by partition + order keys), so the planner inserts
  * the identical exchange+sort and downstream stages see the same
  * partitioning — swapping the operator never reshapes the plan around it.
  *
  * [[SlidingQuantileStrategy]] plans a logical Window's sliding exclusive
  * quantiles into this exec (multiple columns share the one pass — q41's
  * five-column census shape); same-spec non-quantile expressions
  * (lag/lead/row_number — the analyzer merges them into the same node) are
  * SPLIT onto a regular Window stacked on the same exchange+sort; nodes
  * with no sliding quantile fall through untouched. Registered via
  * `spark.experimental.extraStrategies` (SparkEntry.ensureConfs) and
  * [[graft.functions.GraftExtensions]], so both the Scala DSL and
  * reference-shaped SQL TEXT get the incremental plan with no API change.
  */
case class SlidingQuantileWindowExec(
    windowExprs: Seq[NamedExpression],
    specs: Seq[SlidingQuantileWindowExec.QuantileSpec],
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ windowExprs.map(_.toAttribute)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec)

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val inputAttrs = child.output
    val partExprs = partitionSpec
    val specsLocal = specs.toArray
    val nQ = specsLocal.length
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val grouping = UnsafeProjection.create(partExprs, inputAttrs)
      val bound = specsLocal.map(s => BindReferences.bindReference(s.input, inputAttrs))
      val qArr = specsLocal.map(s => Array(s.q))
      val look = specsLocal.map(_.lookback)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val appended = new GenericInternalRow(nQ)
      // per-column frame state, reset at each partition-key boundary
      val ring = look.map(l => new Array[java.lang.Double](l))
      val win = look.map(l => new SortedWindow(l + 1))
      var rowIdx = 0L
      var currentKey: UnsafeRow = null

      iter.map { row =>
        val key = grouping(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          rowIdx = 0L
          var j = 0
          while (j < nQ) {
            val r = ring(j)
            var k = 0
            while (k < r.length) { r(k) = null; k += 1 }
            win(j) = new SortedWindow(look(j) + 1)
            j += 1
          }
        }
        var j = 0
        while (j < nQ) {
          val res = win(j).quantiles(qArr(j))
          if (res == null) appended.update(j, null)
          else appended.update(j, res(0))
          // advance the frame: evict the value `lookback` rows back, admit
          // the current row's value (visible only to later rows)
          val l = look(j)
          val slot = (rowIdx % l).toInt
          if (rowIdx >= l) {
            val old = ring(j)(slot)
            if (old != null) win(j).remove(old)
          }
          val v = bound(j).eval(row)
          val boxed =
            if (v == null) null
            else java.lang.Double.valueOf(v.asInstanceOf[Double])
          ring(j)(slot) = boxed
          if (boxed != null) win(j).insert(boxed)
          j += 1
        }
        rowIdx += 1
        numOutputRows += 1
        proj(joined(row, appended))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SlidingQuantileWindowExec =
    copy(child = newChild)
}

object SlidingQuantileWindowExec {
  /** One quantile column: input expression (bound to the child's output at
    * execution), quantile, and frame length L (ROWS -L .. -1). */
  final case class QuantileSpec(input: Expression, q: Double, lookback: Int)
}

/** Plans logical Window nodes whose every expression is a prior-only
  * sliding [[ExclusiveQuantileAgg]] into [[SlidingQuantileWindowExec]];
  * everything else falls through to the built-in WindowExec (returning
  * Nil defers to later strategies). */
object SlidingQuantileStrategy extends SparkStrategy {

  /** Idempotent session registration — the single shared entry point for
    * SparkEntry.ensureConfs and GraftSqlFunctions.registerAll.
    * Synchronized: extraStrategies is a plain mutable var and ensureConfs
    * wraps EVERY registry query, so two threads launching queries on a
    * fresh session would check-then-act concurrently — double-registering
    * this strategy or losing a concurrent writer's registration entirely
    * (r13 review). The lock is per-session, so registration on one
    * session never blocks another. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      val exp = spark.experimental
      if (!exp.extraStrategies.contains(this)) {
        exp.extraStrategies = exp.extraStrategies :+ this
      }
    }

  // strict Literal match: special boundaries (UnboundedPreceding/CurrentRow)
  // are foldable-but-unevaluable leaves, so a foldable-eval probe would
  // throw; anything non-literal simply falls back to WindowExec
  private def frameBound(e: Expression): Option[Int] = e match {
    case Literal(i: Int, org.apache.spark.sql.types.IntegerType) => Some(i)
    case Literal(l: Long, org.apache.spark.sql.types.LongType) if l.isValidInt => Some(l.toInt)
    case _ => None
  }

  /** Alias(WindowExpression(exclusive_quantile_agg, ROWS -L..-1)) → spec. */
  private def extract(ne: NamedExpression): Option[SlidingQuantileWindowExec.QuantileSpec] =
    ne match {
      case Alias(WindowExpression(ae: AggregateExpression,
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, lower, upper))), _)
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case qa: ExclusiveQuantileAgg =>
            (frameBound(lower), frameBound(upper)) match {
              case (Some(lo), Some(-1)) if lo < -1 =>
                Some(SlidingQuantileWindowExec.QuantileSpec(qa.child, qa.q, -lo))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  /** A Window node holding ANY sliding exclusive quantiles is split: the
    * quantile expressions run on [[SlidingQuantileWindowExec]], the rest of
    * the node (lag/lead/row_number/other aggregates over the same
    * partition+order — the analyzer and CollapseWindow merge same-spec
    * expressions into one node) stays on a regular Window planned beneath
    * it. Both operators demand the same distribution+ordering, so the
    * stack shares ONE exchange+sort; a final projection restores the
    * node's original output order (downstream binding is by exprId, but
    * the root schema is positional). */
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case logical.Window(windowExprs, partSpec, orderSpec, child, hint)
        if windowExprs.exists(extract(_).isDefined) =>
      val (quantiles, others) = windowExprs.partition(extract(_).isDefined)
      val specs = quantiles.map(extract(_).get)
      val inner =
        if (others.isEmpty) planLater(child)
        else planLater(logical.Window(others, partSpec, orderSpec, child, hint))
      val exec = SlidingQuantileWindowExec(quantiles, specs, partSpec, orderSpec, inner)
      if (others.isEmpty) exec :: Nil
      else {
        val wanted = child.output ++ windowExprs.map(_.toAttribute)
        org.apache.spark.sql.execution.ProjectExec(wanted, exec) :: Nil
      }
    case _ => Nil
  }
}
