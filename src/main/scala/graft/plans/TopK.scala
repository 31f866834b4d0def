package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, Cast, DenseRank, Descending, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, Rank, RowNumber, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
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
  * order. A dedicated operator knows only the per-group survivors matter,
  * so the partial stage reduces shuffle input to the local survivor set per
  * (partition, group) with NO sort — per-partition bounded heaps — and the
  * final stage merges survivors per group. At 100 TB with G groups and P
  * map partitions, shuffle volume drops from N rows to min(N, ~P·G·k), and
  * the O(n log n) sorts become O(n log k) heap maintenance.
  *
  * Three rank semantics ([[TopK.RankMode]]):
  *   - [[TopK.RowNum]]: `row_number() <= k` — exactly k rows per group,
  *     arbitrary among order-ties (same class as row_number itself).
  *   - [[TopK.RankTies]]: `rank() <= k` — all rows whose strictly-better
  *     count is < k; boundary ties are all kept, so a group can emit more
  *     than k rows.
  *   - [[TopK.DenseRankTies]]: `dense_rank() <= k` — all rows of the top k
  *     DISTINCT order-values.
  * The tie modes run on an order-keyed treemap of bounded survivor groups
  * instead of a heap; partial-stage retention is a superset of the global
  * answer in every mode (a row's local rank never exceeds its global rank),
  * so partial→final composition is exact.
  *
  * Memory: per-task state is the survivor set (≈ groups-in-partition × k
  * rows; unbounded only where the QUERY's answer is — rank-tie floods).
  * Both stages bound it at `spark.graft.topk.maxRetainedRows`
  * ([[TopK.MaxRetainedRowsKey]], default 4M rows):
  *   - the PARTIAL stage flushes its survivor set downstream and starts
  *     over — always sound, because the final stage re-selects per group
  *     and partial output is only ever a candidate superset;
  *   - the FINAL stage freezes group admission, streams rows of any
  *     not-yet-admitted group to a local spill file, and re-runs the pass
  *     over the spill after emitting the in-memory groups — each pass
  *     admits at least one group, so the recursion terminates with memory
  *     bounded at the budget regardless of group cardinality. This is the
  *     sort-based-fallback discipline `HashAggregateExec` applies, realized
  *     as freeze-and-respill rather than sort.
  *
  * This is rung (c) of the extension ladder (expression → optimizer rule →
  * whole operator): logical node + planner strategy + physical operator,
  * registered through [[GraftExtensions]].
  */
object TopK {

  /** Session conf: max survivor rows held in memory per task before the
    * partial stage flushes / the final stage spills (see class doc). */
  val MaxRetainedRowsKey = "spark.graft.topk.maxRetainedRows"
  private val DefaultMaxRetainedRows: Long = 4L * 1024 * 1024

  sealed trait RankMode extends Serializable
  /** row_number() semantics: exactly k per group, ties broken arbitrarily. */
  case object RowNum extends RankMode
  /** rank() semantics: keep every row with < k strictly-better rows. */
  case object RankTies extends RankMode
  /** dense_rank() semantics: keep all rows of the top k distinct values. */
  case object DenseRankTies extends RankMode

  /** Logical node. `order` must be resolved attributes of `child`; the
    * public API [[topKPerGroup]] resolves by name so the node is born
    * resolved and flows through the analyzer/optimizer untouched.
    *
    * `rankAttr`, when set, appends the within-group rank (per `mode`'s
    * semantics, over `order`) as an extra output column — computed for
    * free in the final stage, which already holds each group's survivors
    * in order. This is what lets [[WindowTopKRewrite]] fire on queries
    * that KEEP the rank column instead of projecting it away. */
  case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, mode: RankMode, child: LogicalPlan,
      rankAttr: Option[Attribute] = None) extends UnaryNode {
    require(k > 0, s"k must be positive, got $k")
    override def output: Seq[Attribute] = child.output ++ rankAttr
    // The rank column is born here, not read from the child.
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
      copy(child = newChild)
  }

  /** Planner strategy: one logical node → partial exec below the (implicit)
    * exchange, final exec above it. EnsureRequirements inserts the hash
    * exchange on the group keys because the final node requires
    * [[ClusteredDistribution]] while the partial's output is unspecified.
    * Only the final exec carries `rankAttr`: ranks are undefined until the
    * group's full candidate set has competed. */
  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroup(g, o, k, m, child, r) =>
        TopKPerGroupExec(g, o, k, m, partial = false,
          TopKPerGroupExec(g, o, k, m, partial = true, planLater(child)), r) :: Nil
      case _ => Nil
    }
  }

  /** One group's bounded survivor set. `insert` returns the retained-row
    * delta (may be negative when an insert evicts a tie group). */
  private sealed trait GroupBuf {
    def insert(u: UnsafeRow): Int
    def emit(sorted: Boolean): Iterator[UnsafeRow]
    /** Survivors in order with their mode-semantics rank (final stage only —
      * ranks are meaningless before the whole group has competed). */
    def emitRanked(): Iterator[(UnsafeRow, Int)]
  }

  /** RowNum: max-heap of the k best-so-far (head = current worst); a row
    * displaces the head iff it sorts strictly before it — O(log k)/row. */
  private final class HeapBuf(ord: Ordering[UnsafeRow], k: Int) extends GroupBuf {
    private val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
    def insert(u: UnsafeRow): Int =
      if (h.size < k) { h.enqueue(u.copy()); 1 }
      else if (ord.compare(u, h.head) < 0) { h.dequeue(); h.enqueue(u.copy()); 0 }
      else 0
    def emit(sorted: Boolean): Iterator[UnsafeRow] =
      if (sorted) h.dequeueAll.reverseIterator else h.iterator
    def emitRanked(): Iterator[(UnsafeRow, Int)] =
      emit(sorted = true).zipWithIndex.map { case (u, i) => (u, i + 1) }
  }

  /** RankTies / DenseRankTies: order-keyed treemap of tie buckets.
    * Invariant after every insert — every bucket satisfies its mode's
    * bound: rank mode keeps bucket B iff |rows strictly before B| < k;
    * dense mode keeps at most k buckets. A row sorting after the last
    * bucket is rejected outright when the bound is already saturated, so
    * per-row cost is O(log d) in the number of live buckets. */
  private final class TieBuf(cmp: java.util.Comparator[InternalRow], k: Int,
      dense: Boolean) extends GroupBuf {
    private val m = new java.util.TreeMap[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]](cmp)
    private var total = 0
    def insert(u: UnsafeRow): Int = {
      if (!m.isEmpty) {
        val c = cmp.compare(u, m.lastKey())
        if (c > 0 && (if (dense) m.size >= k else total >= k)) return 0
      }
      val copy = u.copy()
      val existing = m.get(copy)
      if (existing == null) m.put(copy, mutable.ArrayBuffer(copy)) else existing += copy
      total += 1
      var delta = 1
      if (dense) {
        while (m.size > k) {
          val e = m.pollLastEntry(); total -= e.getValue.size; delta -= e.getValue.size
        }
      } else {
        var done = false
        while (!done && m.size > 1) {
          val sz = m.lastEntry().getValue.size
          if (total - sz >= k) { m.pollLastEntry(); total -= sz; delta -= sz }
          else done = true
        }
      }
      delta
    }
    def emit(sorted: Boolean): Iterator[UnsafeRow] = {
      // treemap iteration is already in `order`; tie buckets in arrival order
      import scala.jdk.CollectionConverters._
      m.values().iterator().asScala.flatMap(_.iterator)
    }
    def emitRanked(): Iterator[(UnsafeRow, Int)] = {
      // rank(): every row of a bucket shares 1 + |strictly-better rows|;
      // dense_rank(): bucket position. Both fall out of the in-order walk.
      import scala.jdk.CollectionConverters._
      var before = 0
      m.values().iterator().asScala.zipWithIndex.flatMap { case (bucket, bi) =>
        val r = if (dense) bi + 1 else before + 1
        before += bucket.size
        bucket.iterator.map(u => (u, r))
      }
    }
  }

  case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, mode: RankMode, partial: Boolean, child: SparkPlan,
      rankAttr: Option[Attribute] = None) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output ++ rankAttr

    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      // GLOBAL top-k (no grouping): the final stage must see every partial
      // survivor, but only ~P×k rows exist by then, so a single-partition
      // merge is the TakeOrdered shape, not a bottleneck.
      else if (groupExprs.isEmpty) AllTuples :: Nil
      else ClusteredDistribution(groupExprs) :: Nil

    override def nodeName: String =
      if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

    override protected def doExecute(): RDD[InternalRow] = {
      val schema = child.output
      val outAttrs = output
      val g = groupExprs
      val o = order
      val limit = k
      val m = mode
      val isPartial = partial
      val withRank = rankAttr.isDefined
      val numFields = schema.length
      val budget = math.max(1L,
        conf.getConfString(MaxRetainedRowsKey, DefaultMaxRetainedRows.toString).toLong)
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(g, schema)
        val base = RowOrdering.create(o, schema)
        val ord = new Ordering[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int = base.compare(a, b)
        }
        val newBuf: () => GroupBuf = m match {
          case RowNum => () => new HeapBuf(ord, limit)
          case RankTies => () => new TieBuf(base, limit, dense = false)
          case DenseRankTies => () => new TieBuf(base, limit, dense = true)
        }
        if (isPartial) new FlushingIterator(iter, keyProj, newBuf, budget)
        else {
          val emitter: GroupBuf => Iterator[InternalRow] =
            if (!withRank) (_.emit(sorted = true))
            else {
              // Append the rank as one extra int column: reuse a single
              // JoinedRow + unsafe projection per task, the standard
              // emit-reused-row contract (the exchange/consumer copies).
              val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
              val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
              val proj = UnsafeProjection.create(outAttrs, outAttrs)
              b => b.emitRanked().map { case (u, r) =>
                rankRow.update(0, r)
                proj(joined(u, rankRow))
              }
            }
          finalPass(iter.map(_.asInstanceOf[UnsafeRow]), keyProj, newBuf,
            budget, numFields, emitter)
        }
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
      copy(child = newChild)
  }

  /** Partial-stage iterator: accumulates per-group survivor sets and, when
    * the retained-row budget is hit, FLUSHES everything downstream and
    * starts over. Early flush only weakens the reduction (more candidate
    * rows cross the shuffle), never the answer — the final stage re-selects
    * per group from whatever candidates arrive. */
  private final class FlushingIterator(input: Iterator[InternalRow],
      keyProj: UnsafeProjection, newBuf: () => GroupBuf, budget: Long)
      extends Iterator[InternalRow] {
    private val groups = mutable.HashMap.empty[UnsafeRow, GroupBuf]
    private var retained = 0L
    private var pending: Iterator[UnsafeRow] = Iterator.empty

    private def drain(): Iterator[UnsafeRow] = {
      val bufs = groups.values.toArray
      groups.clear(); retained = 0L
      bufs.iterator.flatMap(_.emit(sorted = false))
    }

    private def fill(): Unit =
      while (!pending.hasNext && (input.hasNext || groups.nonEmpty)) {
        var flushed = false
        while (!flushed && input.hasNext) {
          val u = input.next().asInstanceOf[UnsafeRow]
          val key = keyProj(u)
          groups.get(key) match {
            case Some(b) => retained += b.insert(u)
            case None =>
              val b = newBuf(); retained += b.insert(u); groups.put(key.copy(), b)
          }
          if (retained >= budget) { pending = drain(); flushed = true }
        }
        if (!flushed && groups.nonEmpty) pending = drain()
      }

    override def hasNext: Boolean = { fill(); pending.hasNext }
    override def next(): InternalRow = { fill(); pending.next() }
  }

  /** Final-stage pass: exact per-group selection. All rows of a group land
    * in this partition (hash-clustered), so each group is wholly in memory
    * OR wholly spilled: once the retained-row budget trips, no NEW groups
    * are admitted — their rows stream to a local spill file — while already
    * admitted groups keep competing in place (their state is capped at the
    * survivor set, so it cannot grow past ~k per group). After the input is
    * exhausted the in-memory groups emit, then the pass re-runs over the
    * spill with a fresh budget; every pass admits ≥ 1 group, so passes
    * strictly shrink the remainder and memory never exceeds the budget. */
  private def finalPass(input: Iterator[UnsafeRow], keyProj: UnsafeProjection,
      newBuf: () => GroupBuf, budget: Long, numFields: Int,
      emitter: GroupBuf => Iterator[InternalRow]): Iterator[InternalRow] = {
    val groups = mutable.HashMap.empty[UnsafeRow, GroupBuf]
    var retained = 0L
    var frozen = false
    var spill: File = null
    var out: DataOutputStream = null
    val writeBuffer = new Array[Byte](4096)
    input.foreach { u =>
      val key = keyProj(u)
      groups.get(key) match {
        case Some(b) => retained += b.insert(u)
        case None =>
          if (!frozen && retained >= budget && groups.nonEmpty) frozen = true
          if (frozen) {
            if (out == null) {
              spill = File.createTempFile("graft-topk-spill", ".bin")
              spill.deleteOnExit()
              val ctx = TaskContext.get()
              if (ctx != null) {
                val f = spill
                ctx.addTaskCompletionListener[Unit](_ => f.delete())
              }
              out = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(spill), 1 << 16))
            }
            out.writeInt(u.getSizeInBytes)
            u.writeToStream(out, writeBuffer)
          } else {
            val b = newBuf(); retained += b.insert(u); groups.put(key.copy(), b)
          }
      }
    }
    val res = groups.valuesIterator.flatMap(emitter)
    if (out == null) res
    else {
      out.writeInt(-1); out.close()
      res ++ {
        // finalPass consumes its input eagerly, so by the time it returns
        // the spill file is fully read and can be deleted.
        val rest = finalPass(readSpill(spill, numFields), keyProj, newBuf,
          budget, numFields, emitter)
        spill.delete()
        rest
      }
    }
  }

  private def readSpill(f: File, numFields: Int): Iterator[UnsafeRow] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f), 1 << 16))
    new Iterator[UnsafeRow] {
      private var nextSize = in.readInt()
      override def hasNext: Boolean = nextSize >= 0
      override def next(): UnsafeRow = {
        val bytes = new Array[Byte](nextSize)
        in.readFully(bytes)
        val row = new UnsafeRow(numFields)
        row.pointTo(bytes, nextSize)
        nextSize = in.readInt()
        if (nextSize < 0) in.close()
        row
      }
    }
  }

  /** Optimizer rule: plan the standard rank-filter window pattern
    *
    * {{{ Project(pl, Filter(rn <= k, Window(rank_fn() AS rn PARTITION BY g ORDER BY o))) }}}
    *
    * as [[TopKPerGroup]] — whether the rank column is projected away or
    * kept (the final stage numbers its in-order survivors and emits the
    * rank as an extra column under the original alias's exprId).
    * Users keep writing the idiomatic window query (DataFrame or SQL); the
    * engine substitutes the partial+final bounded-survivor operator, cutting
    * shuffle input from N rows to ≤ ~P·G·k and eliminating both sorts.
    * Spark's own InferWindowGroupLimit fires in a later batch than custom
    * operator-optimization rules, so this rule sees the raw pattern first
    * (the WindowGroupLimit case below is a belt-and-braces guard).
    *
    * Soundness: the operator's mode mirrors the window function —
    * row_number() keeps an arbitrary k among order-ties (the same semantic
    * class as row_number itself), rank() keeps boundary ties, dense_rank()
    * keeps the top k distinct values. The rewrite only fires when:
    *   - the Window computes EXACTLY one expression and it is row_number(),
    *     rank(), or dense_rank();
    *   - the filter contains exactly one bound on that rank output (<=k,
    *     <k, =1, or the literal-first mirror), possibly through an
    *     integral cast, with a POSITIVE in-int-range literal — a
    *     non-positive or out-of-range bound (e.g. `rn <= -4294967295`)
    *     must NOT truncate into a valid k and turn an empty-result query
    *     into a non-empty one, so those plans are left untouched; other
    *     conjuncts may only reference child columns and are re-planted as
    *     a filter ABOVE the operator;
    *   - the partition spec is non-empty (global top-k already plans as
    *     TakeOrderedAndProject via the Limit path);
    *   - the projection above references only the window child's columns
    *     and (optionally) the rank output — which the operator then emits
    *     itself; any other window-derived reference bails the rewrite.
    */
  object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

    private object IntBound {
      def unapply(e: Expression): Option[Int] = e match {
        case Literal(v: Int, IntegerType) => Some(v)
        // Guard the narrowing: a long outside [1, Int.MaxValue] must not
        // wrap into a plausible k (e.g. -4294967295L.toInt == 1).
        case Literal(v: Long, LongType) if v >= 1L && v <= Int.MaxValue.toLong =>
          Some(v.toInt)
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
      // Strict bounds require k >= 2 so k-1 stays positive — Int.MinValue
      // would otherwise underflow to Int.MaxValue and rewrite an
      // unsatisfiable filter into a real top-k.
      def unapply(e: Expression): Option[(Attribute, Int)] = e match {
        case LessThanOrEqual(RankRef(a), IntBound(k)) if k >= 1 => Some((a, k))
        case LessThan(RankRef(a), IntBound(k)) if k >= 2 => Some((a, k - 1))
        case EqualTo(RankRef(a), IntBound(1)) => Some((a, 1))
        case GreaterThanOrEqual(IntBound(k), RankRef(a)) if k >= 1 => Some((a, k))
        case GreaterThan(IntBound(k), RankRef(a)) if k >= 2 => Some((a, k - 1))
        case _ => None
      }
    }

    private def rankModeOf(e: Expression): Option[RankMode] = e match {
      case _: RowNumber => Some(RowNum)
      case _: Rank => Some(RankTies)
      case _: DenseRank => Some(DenseRankTies)
      case _ => None
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
      case f @ Filter(cond, t: TopKPerGroup) =>
        val groupAttrs = org.apache.spark.sql.catalyst.expressions.AttributeSet(
          t.groupExprs.collect { case a: Attribute => a })
        val (push, keep) = splitConjunctivePredicates(cond)
          .partition(c => c.deterministic && c.references.nonEmpty &&
            c.references.subsetOf(groupAttrs))
        if (push.isEmpty) f
        else {
          val pushed = t.copy(child = Filter(push.reduce(And(_, _)), t.child))
          keep.reduceOption(And(_, _)).map(Filter(_, pushed)).getOrElse(pushed)
        }

      // Empty partitionSpec allowed: a GLOBAL rank filter would otherwise
      // execute as a single-partition WindowExec over the ENTIRE input —
      // the rewrite turns it into per-partition bounded heaps plus a
      // P×k-row final merge.
      case p @ Project(pl, Filter(cond, w: Window))
          if w.orderSpec.nonEmpty =>
        w.windowExpressions match {
          case Seq(al @ Alias(WindowExpression(fn, _), _))
              if rankModeOf(fn).isDefined &&
                pl.forall(_.references.subsetOf(
                  w.child.outputSet + al.toAttribute)) =>
            // Emit the rank column only if the projection still reads it
            // (keeping al's exprId so the references above resolve).
            val rank = if (pl.exists(_.references.contains(al.toAttribute)))
              Some(al.toAttribute) else None
            rewriteRankFilter(cond, w, al, fn, rank)
              .map(Project(pl, _)).getOrElse(p)
          case _ => p
        }

      // The projection-free form (`withColumn(rnk).filter(rnk <= k)` with
      // no trailing select): TopKPerGroup's output with the rank emitted is
      // attribute-for-attribute the Window's own output, so the node swaps
      // in directly with no Project on top.
      case f @ Filter(cond, w: Window)
          if w.orderSpec.nonEmpty =>
        w.windowExpressions match {
          case Seq(al @ Alias(WindowExpression(fn, _), _))
              if rankModeOf(fn).isDefined =>
            rewriteRankFilter(cond, w, al, fn, Some(al.toAttribute)).getOrElse(f)
          case _ => f
        }
    }

    /** Shared core: split the filter into the single rank bound (→ k) and
      * residual conjuncts, and build the TopK node when sound.
      *
      * The filter may conjoin the rank bound with ordinary predicates
      * (`rn = 1 AND NOT deleted` — the CDC compaction shape). Splitting is
      * sound: the residual conjuncts reference only child columns, and in
      * the original plan they run AFTER the window too, so
      * `Filter(rest, TopK)` selects the same rows. Predicate pushdown
      * cannot slide `rest` below the custom node (it is not a known
      * pass-through), so the select-then-filter order is preserved.
      */
    private def rewriteRankFilter(cond: Expression, w: Window, al: Alias,
        fn: Expression, rank: Option[Attribute]): Option[LogicalPlan] = {
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankConds, rest) = conjuncts.partition {
        case RankLimit(a, _) => a.exprId == al.exprId
        case _ => false
      }
      val kOpt = rankConds match {
        case Seq(RankLimit(_, k)) if k > 0 => Some(k)
        case _ => None
      }
      if (kOpt.isEmpty || !rest.forall(_.references.subsetOf(w.child.outputSet)))
        None
      else {
        // If Spark already slid a WindowGroupLimit under the window,
        // plan from its child: the TopK operator subsumes the limit.
        val base = w.child match {
          case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
          case other => other
        }
        val topk = TopKPerGroup(w.partitionSpec, w.orderSpec, kOpt.get,
          rankModeOf(fn).get, base, rank)
        Some(rest.reduceOption(And(_, _)).map(Filter(_, topk)).getOrElse(topk))
      }
    }
  }

  /** Public API: keep the top `k` rows per group under `orderBy`, resolved
    * by column name against `df` (name → (column, ascending?)). Equivalent
    * to the matching rank-function window filter, planned as partial+final
    * bounded survivor sets.
    */
  def topKPerGroup(df: DataFrame, groupBy: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      mode: RankMode = RowNum): DataFrame = {
    val child = GraftPlanBridge.analyzed(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupBy.map(attr), order, k, mode, child))
  }
}
