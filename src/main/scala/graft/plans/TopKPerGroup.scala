package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Top-k rows per group as a first-class operator
  * (LogicalPlan + Strategy + physical exec, registered via
  * `SparkSessionExtensions` or `spark.experimental.extraStrategies`).
  *
  * Why a custom operator: the DataFrame route
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`) must
  * shuffle EVERY row of every group and fully sort each partition before
  * it can discard anything. This operator runs a bounded per-group heap on
  * the map side first, so at most k rows per (group, input partition)
  * reach the exchange — at 100 TB with k=3 that is the difference between
  * shuffling the corpus and shuffling a rounding error of it. The same
  * partial/final shape Spark itself uses for global top-k
  * (TakeOrderedAndProject), generalized per group.
  */

/** Logical node: keep the first `k` rows per `groupCols` under `ordering`.
  * Output schema = child schema. */
case class TopKPerGroup(groupCols: Seq[Expression], ordering: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : LogicalPlan = copy(child = newChild)
}

/** Physical two-phase exec. `partial = true` runs pre-shuffle (no
  * distribution requirement); the final copy requires clustering on the
  * group keys, so EnsureRequirements inserts exactly one hash exchange
  * carrying <= k rows per (group, partition). */
case class TopKPerGroupExec(groupCols: Seq[Expression],
                            ordering: Seq[SortOrder], k: Int,
                            child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = groupCols
    val sortOrder = ordering
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // per group: max-heap keyed by the WORST kept row, so a better row
      // evicts the root; memory is O(groups-in-partition * k)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          rowOrd.compare(b, a) // reversed: root = worst under the ordering
      }
      while (it.hasNext) {
        val row = it.next() match {
          case u: UnsafeRow => u
          case other => toUnsafe.apply(other)
        }
        val key = groupProj.apply(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach(h => h.forEach(r => out += r))
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val planned = planLater(child)
      val partial = TopKPerGroupExec(g, o, k, planned, partial = true)
      TopKPerGroupExec(g, o, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push column pruning through TopKPerGroup. The node
  * passes its child's schema through, so without this rule a projection
  * above it can never narrow the scan — the operator would read every
  * column of a wide table to emit two. Keeps group/order references plus
  * whatever the projection needs; reaches a fixed point once the child
  * output equals the needed set. */
object PruneThroughTopK
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList, topk @ TopKPerGroup(g, o, _, child))
        if projList.forall(_.deterministic) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(g.flatMap(_.references)) ++
        AttributeSet(o.flatMap(_.references))
      if (child.output.forall(needed.contains)) p
      else p.copy(child = topk.copy(child =
        Project(child.output.filter(needed.contains), child)))
  }
}

/** Config-file registration: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Installs the
  * TopK physical strategy + pruning rule and exposes the engine's custom
  * codegen expressions to SQL:
  * `graft_strip_accents(s)`, `graft_vector_dot(a, b)`,
  * `graft_winnow_fingerprint(s, k, w)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => PruneThroughTopK)
    e.injectFunction((
      FunctionIdentifier("graft_strip_accents"),
      new ExpressionInfo(classOf[graft.functions.StripAccents].getName,
        "graft_strip_accents"),
      (args: Seq[Expression]) => graft.functions.StripAccents(args.head)))
    e.injectFunction((
      FunctionIdentifier("graft_vector_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName,
        "graft_vector_dot"),
      (args: Seq[Expression]) =>
        graft.functions.DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_winnow_fingerprint"),
      new ExpressionInfo(classOf[graft.functions.WinnowFingerprint].getName,
        "graft_winnow_fingerprint"),
      (args: Seq[Expression]) => graft.functions.WinnowFingerprint(
        args.head,
        if (args.length > 1) intArg(args(1), "k") else 8,
        if (args.length > 2) intArg(args(2), "w") else 4)))
  }
}

object TopKPerGroup {
  /** Ensure the strategy + pruning rule are present on an already-built
    * session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    val opt = spark.experimental.extraOptimizations
    if (!opt.contains(PruneThroughTopK))
      spark.experimental.extraOptimizations = opt :+ PruneThroughTopK
  }

  /** Public API: first `k` rows per group under (col, direction) sort
    * specs. Descending=true means "largest first". */
  def topK(df: DataFrame, groupCols: Seq[String],
           sortSpecs: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val ordering = sortSpecs.map { case (c, desc) =>
      SortOrder(UnresolvedAttribute.quoted(c),
        if (desc) Descending else Ascending)
    }
    Bridge.ofRows(spark, TopKPerGroup(
      groupCols.map(UnresolvedAttribute.quoted),
      ordering, k, Bridge.analyzed(df)))
  }
}
