package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, Cast, Descending, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Whole-operator Catalyst extension: top-k rows per group, planned as a
  * PARTIAL per-partition pass before the shuffle and a FINAL pass after it —
  * the aggregate-style two-phase shape that the equivalent window query
  * (`row_number() OVER (PARTITION BY g ORDER BY o) <= k`) cannot produce.
  *
  * Why this exists: Spark's own `WindowGroupLimit` optimization (which
  * rewrites rank-filter windows) still shuffles every surviving row AND
  * SORTS each partition, because the window contract needs full per-group
  * order. A dedicated operator knows only k rows per group survive, so the
  * partial stage reduces shuffle input to ≤ k rows per (partition, group)
  * with NO sort — per-partition bounded heaps — and the final stage merges
  * heaps per group. At 100 TB with G groups and P map partitions, shuffle
  * volume drops from N rows to min(N, P·G·k), and the O(n log n) sorts
  * become O(n log k) heap maintenance.
  *
  * Memory: each task holds ≤ (groups-in-partition × k) rows. That is the
  * hash-aggregate memory shape; a production version would add spilling
  * (sort-based fallback) exactly as `HashAggregateExec` does.
  *
  * This is rung (c) of the extension ladder (expression → optimizer rule →
  * whole operator): logical node + planner strategy + physical operator,
  * registered through [[GraftExtensions]].
  */
object TopK {

  /** Logical node. `order` must be resolved attributes of `child`; the
    * public API [[topKPerGroup]] resolves by name so the node is born
    * resolved and flows through the analyzer/optimizer untouched. */
  case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, child: LogicalPlan) extends UnaryNode {
    require(k > 0, s"k must be positive, got $k")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
      copy(child = newChild)
  }

  /** Planner strategy: one logical node → partial exec below the (implicit)
    * exchange, final exec above it. EnsureRequirements inserts the hash
    * exchange on the group keys because the final node requires
    * [[ClusteredDistribution]] while the partial's output is unspecified. */
  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroup(g, o, k, child) =>
        TopKPerGroupExec(g, o, k, partial = false,
          TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(groupExprs) :: Nil

    override def nodeName: String =
      if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

    override protected def doExecute(): RDD[InternalRow] = {
      val schema = child.output
      val g = groupExprs
      val o = order
      val limit = k
      val emitSorted = !partial
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(g, schema)
        val base = RowOrdering.create(o, schema)
        val ord = new Ordering[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int = base.compare(a, b)
        }
        // Per group: a max-heap of the k best-so-far rows under `order`
        // (head = current worst). A row displaces the head iff it sorts
        // strictly before it — O(log k) per row, no partition sort.
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
        iter.foreach { row =>
          val u = row.asInstanceOf[UnsafeRow]
          val key = keyProj(u)
          heaps.get(key) match {
            case None =>
              val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
              h.enqueue(u.copy())
              heaps.put(key.copy(), h)
            case Some(h) =>
              if (h.size < limit) h.enqueue(u.copy())
              else if (ord.compare(u, h.head) < 0) { h.dequeue(); h.enqueue(u.copy()) }
          }
        }
        heaps.valuesIterator.flatMap { h =>
          // Final stage emits each group's survivors in `order` (cheap:
          // k log k per group); partial output order is irrelevant — it
          // only feeds the final heaps.
          if (emitSorted) h.dequeueAll.reverseIterator
          else h.iterator
        }
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
      copy(child = newChild)
  }

  /** Optimizer rule: plan the standard rank-filter window pattern
    *
    * {{{ Project(pl, Filter(rn <= k, Window(row_number() AS rn PARTITION BY g ORDER BY o))) }}}
    *
    * as [[TopKPerGroup]] whenever the rank column itself is projected away.
    * Users keep writing the idiomatic window query (DataFrame or SQL); the
    * engine substitutes the partial+final bounded-heap operator, cutting
    * shuffle input from N rows to ≤ P·G·k and eliminating both sorts.
    * Spark's own InferWindowGroupLimit fires in a later batch than custom
    * operator-optimization rules, so this rule sees the raw pattern first
    * (the WindowGroupLimit case below is a belt-and-braces guard).
    *
    * Soundness: row_number() breaks order-ties arbitrarily, and the heap
    * operator keeps an arbitrary k among order-ties — the same semantic
    * class. A query whose results are deterministic under row_number (i.e.
    * whose window ordering is tie-unique) gets identical rows here. The
    * rewrite only fires when:
    *   - the Window computes EXACTLY one expression and it is row_number()
    *     (rank()/dense_rank() keep ties and would need k-widening);
    *   - the filter contains exactly one bound on that rank output (<=k,
    *     <k, =1, or the literal-first mirror), possibly through an
    *     integral cast; other conjuncts may only reference child columns
    *     and are re-planted as a filter ABOVE the operator;
    *   - the partition spec is non-empty (global top-k already plans as
    *     TakeOrderedAndProject via the Limit path);
    *   - the projection above references only the window child's columns,
    *     so dropping the rank output is observationally safe.
    */
  object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

    private object IntBound {
      def unapply(e: Expression): Option[Int] = e match {
        case Literal(v: Int, IntegerType) => Some(v)
        case Literal(v: Long, LongType) if v <= Int.MaxValue.toLong => Some(v.toInt)
        case _ => None
      }
    }

    /** The rank side of the comparison: the attribute, possibly under an
      * integral up-cast the analyzer inserted to match a long literal. */
    private object RankRef {
      def unapply(e: Expression): Option[Attribute] = e match {
        case a: Attribute => Some(a)
        case c: Cast if c.dataType == LongType || c.dataType == IntegerType =>
          c.child match { case a: Attribute => Some(a); case _ => None }
        case _ => None
      }
    }

    private object RankLimit {
      def unapply(e: Expression): Option[(Attribute, Int)] = e match {
        case LessThanOrEqual(RankRef(a), IntBound(k)) => Some((a, k))
        case LessThan(RankRef(a), IntBound(k)) => Some((a, k - 1))
        case EqualTo(RankRef(a), IntBound(1)) => Some((a, 1))
        case GreaterThanOrEqual(IntBound(k), RankRef(a)) => Some((a, k))
        case GreaterThan(IntBound(k), RankRef(a)) => Some((a, k - 1))
        case _ => None
      }
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      // Group-key filter pushdown through the operator: a predicate whose
      // every reference IS one of the group expressions (a bare attribute)
      // is constant within each group, so it removes whole groups — doing
      // that before the heaps is equivalent and prunes the competition.
      // NOT sound for mere arguments of complex group exprs (rows of one
      // group can differ there, and pre-filtering would change which rows
      // compete), hence the bare-attribute restriction. Built-in pushdown
      // can't do this — it doesn't know the node — so the rule does.
      // Composes with the rewrite below: residual conjuncts it re-plants
      // above the operator slide back under it here when group-key-only.
      case f @ Filter(cond, t @ TopKPerGroup(g, _, _, child)) =>
        val groupAttrs = org.apache.spark.sql.catalyst.expressions.AttributeSet(
          g.collect { case a: Attribute => a })
        val (push, keep) = splitConjunctivePredicates(cond)
          .partition(c => c.deterministic && c.references.nonEmpty &&
            c.references.subsetOf(groupAttrs))
        if (push.isEmpty) f
        else {
          val pushed = t.copy(child = Filter(push.reduce(And(_, _)), child))
          keep.reduceOption(And(_, _)).map(Filter(_, pushed)).getOrElse(pushed)
        }

      case p @ Project(pl, Filter(cond, w: Window))
          if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
        w.windowExpressions match {
          case Seq(al @ Alias(WindowExpression(_: RowNumber, _), _))
              if pl.forall(_.references.subsetOf(w.child.outputSet)) =>
            // The filter may conjoin the rank bound with ordinary
            // predicates (`rn = 1 AND NOT deleted` — the CDC compaction
            // shape). Splitting is sound: the residual conjuncts reference
            // only child columns, and in the original plan they run AFTER
            // the window too, so `Filter(rest, TopK)` selects the same
            // rows. Predicate pushdown cannot slide `rest` below the
            // custom node (it is not a known pass-through), so the
            // select-then-filter order is preserved in the final plan.
            val conjuncts = splitConjunctivePredicates(cond)
            val (rankConds, rest) = conjuncts.partition {
              case RankLimit(a, _) => a.exprId == al.exprId
              case _ => false
            }
            val kOpt = rankConds match {
              case Seq(RankLimit(_, k)) if k > 0 => Some(k)
              case _ => None
            }
            if (kOpt.isEmpty ||
                !rest.forall(_.references.subsetOf(w.child.outputSet))) p
            else {
              // If Spark already slid a WindowGroupLimit under the window,
              // plan from its child: the TopK operator subsumes the limit.
              val base = w.child match {
                case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
                case other => other
              }
              val topk = TopKPerGroup(w.partitionSpec, w.orderSpec, kOpt.get, base)
              Project(pl, rest.reduceOption(And(_, _))
                .map(Filter(_, topk)).getOrElse(topk))
            }
          case _ => p
        }
    }
  }

  /** Public API: keep the top `k` rows per group under `orderBy`, resolved
    * by column name against `df` (name → (column, ascending?)). Equivalent
    * to the `row_number` window filter, planned as partial+final heaps.
    */
  def topKPerGroup(df: DataFrame, groupBy: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = GraftPlanBridge.analyzed(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupBy.map(attr), order, k, child))
  }
}
