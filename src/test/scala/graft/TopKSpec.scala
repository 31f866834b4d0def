package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** The custom top-k-per-group operator (logical node + strategy + physical
  * partial/final execs) against the window-function formulation it
  * replaces. */
class TopKSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    // 4 groups × 50 rows with duplicate scores (ties broken by id) spread
    // over several input partitions so the partial stage has real work.
    (0 until 200).map(i => (s"g${i % 4}", i % 7, i.toLong))
      .toDF("grp", "score", "id")
      .repartition(5)
  }

  private def windowed = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .drop("rnk")
  }

  test("matches the row_number window formulation, ties broken") {
    val got = TopK.topKPerGroup(df, Seq("grp"), Seq("score" -> false, "id" -> true), 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    val want = windowed.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    assert(got.length == 12)
    assert(got.sameElements(want))
  }

  test("final stage emits each group's rows in the requested order") {
    val rows = TopK.topKPerGroup(df, Seq("grp"), Seq("score" -> false, "id" -> true), 3)
      .collect()
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val scores = g.map(r => (-r.getInt(1), r.getLong(2))).toSeq
      assert(scores == scores.sorted, s"group rows out of order: $scores")
    }
  }

  test("plans as partial heaps below one hash exchange, final above") {
    val plan = TopK.topKPerGroup(df, Seq("grp"), Seq("id" -> true), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupFinal"), plan)
    assert(plan.contains("TopKPerGroupPartial"), plan)
    val fin = plan.indexOf("TopKPerGroupFinal")
    val ex = plan.indexOf("Exchange hashpartitioning")
    val par = plan.indexOf("TopKPerGroupPartial")
    assert(fin >= 0 && ex > fin && par > ex,
      s"expected Final -> Exchange -> Partial, got:\n$plan")
    // The window formulation cannot avoid sorting; this plan must.
    assert(!plan.contains("Sort "), plan)
  }

  test("partial stage caps shuffle input at k rows per partition-group") {
    // 2 groups × 100 rows in each of 5 partitions; k=2 → the exchange sees
    // at most 5 partitions × 2 groups × 2 rows = 20 rows instead of 1000.
    import spark.implicits._
    val big = (0 until 1000).map(i => (i % 2, i.toLong)).toDF("grp", "id")
      .repartition(5)
    val out = TopK.topKPerGroup(big, Seq("grp"), Seq("id" -> true), 2)
    assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq ==
      Seq((0, 0L), (0, 2L), (1, 1L), (1, 3L)))
    val partialRows = big.rdd.mapPartitions { it => Iterator.single(it.size) }
      .collect()
    assert(partialRows.sum == 1000) // sanity: the input really was 1000 rows
  }

  test("k larger than any group passes everything through") {
    import spark.implicits._
    val small = Seq((1, 10L), (1, 11L), (2, 12L)).toDF("grp", "id")
    val out = TopK.topKPerGroup(small, Seq("grp"), Seq("id" -> false), 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((1, 10L), (1, 11L), (2, 12L)))
  }

  // ---- WindowTopKRewrite: the optimizer substitutes the operator for the
  // standard rank-filter window pattern (users never change their query). --

  private val rewriteRuleName = "graft.plans.TopK$WindowTopKRewrite"

  private def hasTopKLogical(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case t: TopK.TopKPerGroup => t }.nonEmpty

  test("rank-filter window pattern is auto-rewritten to the TopK operator") {
    val q = windowed
    assert(hasTopKLogical(q), q.queryExecution.optimizedPlan.toString)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroupFinal"), physical)
    assert(!physical.contains("Window"), physical)
    assert(!physical.contains("Sort "), physical)
  }

  test("auto-rewritten results equal the un-rewritten window execution") {
    def rows = windowed.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val rewritten = rows
    spark.conf.set("spark.sql.optimizer.excludedRules", rewriteRuleName)
    try {
      assert(!hasTopKLogical(windowed),
        "rule exclusion must disable the rewrite (negative control)")
      assert(rows == rewritten)
      assert(rows.size == 12)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("rewrite fires on the SQL text form too") {
    df.createOrReplaceTempView("topk_rewrite_src")
    val q = spark.sql(
      """SELECT grp, score, id FROM (
        |  SELECT grp, score, id,
        |    row_number() OVER (PARTITION BY grp ORDER BY score DESC, id) AS rnk
        |  FROM topk_rewrite_src)
        |WHERE rnk <= 3""".stripMargin)
    assert(hasTopKLogical(q), q.queryExecution.optimizedPlan.toString)
    assert(q.collect().length == 12)
  }

  test("conjoined residual predicates split: select top-k first, filter after") {
    // rn = 1 AND score > 0 must pick the per-group best row FIRST and only
    // then apply the residual predicate — groups whose best row fails it
    // disappear entirely (they must NOT fall back to their second-best).
    def q = {
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("score").desc, col("id").asc)
      df.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1 && col("id") % 2 === 0)
        .drop("rnk")
    }
    assert(hasTopKLogical(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", rewriteRuleName)
    try {
      assert(!hasTopKLogical(q), "negative control: exclusion must disable the rewrite")
      val want = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(got == want, s"got $got, want $want")
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("group-key filters push below the operator; row-level filters stay above") {
    // grp is a group expression → constant per group → pushing it under
    // the heaps is sound and prunes the competition. score is row-level →
    // pre-filtering it would change which rows compete → must stay above.
    val pushed = TopK.topKPerGroup(df, Seq("grp"), Seq("score" -> false, "id" -> true), 3)
      .filter(col("grp") === "g1")
    // After the push, no Filter remains above the operator (here the
    // pushed predicate collapses all the way into the LocalRelation —
    // downstream rules can keep optimizing it once it's below the node).
    val pPlan = pushed.queryExecution.optimizedPlan.toString
    val pIdx = pPlan.indexOf("TopKPerGroup")
    val fIdx = pPlan.indexOf("Filter")
    assert(pIdx >= 0 && (fIdx < 0 || fIdx > pIdx),
      s"filter must not stay above the operator:\n$pPlan")
    assert(pushed.collect().length == 3)

    val kept = TopK.topKPerGroup(df, Seq("grp"), Seq("score" -> false, "id" -> true), 3)
      .filter(col("score") > 4)
    val kPlan = kept.queryExecution.optimizedPlan.toString
    val kf = kPlan.indexOf("Filter")
    val kt = kPlan.indexOf("TopKPerGroup")
    assert(kf >= 0 && kt > kf, s"row-level filter must stay above:\n$kPlan")
    // And the semantics differ from pre-filtering: each group's top-3 by
    // score desc are 6,6,5 (ids break ties) — the >4 filter keeps all 12.
    assert(kept.collect().length == 12)
  }

  test("rewritten plans equal the window execution on randomized inputs") {
    import spark.implicits._
    // Deliberate tie pressure (scores in 0..3) with a unique tie-break (id)
    // so the window form is deterministic and set-equality is exact.
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val n = 50 + rng.nextInt(250)
      val groups = 1 + rng.nextInt(7)
      val k = 1 + rng.nextInt(5)
      val rows = (0 until n).map(i => (s"g${rng.nextInt(groups)}", rng.nextInt(4), i.toLong))
      def q = {
        val w = Window.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id").asc)
        rows.toDF("grp", "score", "id").repartition(5)
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k).drop("rnk")
      }
      assert(hasTopKLogical(q))
      val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      spark.conf.set("spark.sql.optimizer.excludedRules", rewriteRuleName)
      try {
        val want = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
        assert(got == want, s"trial $trial (n=$n groups=$groups k=$k)")
      } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("rank column surviving the projection rewrites WITH rank emission") {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id").asc)
    val q = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    assert(hasTopKLogical(q), q.queryExecution.optimizedPlan.toString)
    // the emitted ranks must equal the window's own numbering: re-rank the
    // rank-free survivors (top-3 per group) with a fresh window
    val viaWindow = windowed.withColumn("rnk", row_number().over(
      Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id").asc)))
    val got = q.collect().map(r =>
      (r.getAs[String]("grp"), r.getAs[Long]("id"), r.getAs[Int]("rnk"))).sorted
    val exp = viaWindow.collect().map(r =>
      (r.getAs[String]("grp"), r.getAs[Long]("id"), r.getAs[Int]("rnk"))).sorted
    assert(got.toSeq == exp.toSeq)
  }

  test("ranked emission matches rank()/dense_rank() numbering on ties") {
    import spark.implicits._
    // scores with heavy ties: ranks must show gaps (rank) / no gaps (dense)
    val t = (0 until 60).map(i => (s"g${i % 3}", (i % 4) / 2, i.toLong))
      .toDF("grp", "score", "id").repartition(4)
    for ((fnCol, fnName) <- Seq((rank(), "rank"), (dense_rank(), "dense_rank"))) {
      val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id").asc)
      val q = t.withColumn("rnk", fnCol.over(w)).filter(col("rnk") <= 3)
      assert(hasTopKLogical(q), s"$fnName: ${q.queryExecution.optimizedPlan}")
      // an OR-form bound is semantically identical (rnk2 is never null)
      // but is a single non-conjunct predicate RankLimit can't match, so
      // this runs through Spark's own window execution as the baseline
      val noRewrite = t.withColumn("rnk2", fnCol.over(w))
        .filter(col("rnk2") <= 3 || col("rnk2").isNull)
      val got = q.collect().map(r =>
        (r.getAs[String]("grp"), r.getAs[Long]("id"), r.getAs[Int]("rnk"))).sorted.toSeq
      val exp = noRewrite.collect().map(r =>
        (r.getAs[String]("grp"), r.getAs[Long]("id"), r.getAs[Int]("rnk2"))).sorted.toSeq
      assert(got == exp, fnName)
    }
  }

  test("GLOBAL rank filter rewrites too: partial heaps, single-partition merge") {
    // An unpartitioned rank-filter window would execute as ONE WindowExec
    // partition holding the entire input; the rewrite plans it as
    // per-partition k-bounded heaps with a P×k-row final merge instead.
    val global = Window.orderBy(col("score").desc, col("id").asc)
    val globalQ = df.withColumn("rnk", row_number().over(global))
      .filter(col("rnk") <= 3).drop("rnk")
    assert(hasTopKLogical(globalQ), globalQ.queryExecution.optimizedPlan.toString)
    val physical = globalQ.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"), physical)
    val got = globalQ.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // Expected: the 3 globally best (score desc, id asc) rows.
    val want = (0 until 200).map(i => (s"g${i % 4}", i % 7, i.toLong))
      .sortBy { case (_, s, id) => (-s, id) }.take(3).toArray
    assert(got.sortBy(r => (-r._2, r._3)).toSeq == want.toSeq)
    // Tie-aware global mode: ordered by score ALONE, every score-tie is a
    // rank-tie, so rank() <= 3 keeps all rows with < 3 strictly better.
    val tieOrder = Window.orderBy(col("score").desc)
    val rankQ = df.withColumn("rnk", rank().over(tieOrder)).filter(col("rnk") <= 3)
    assert(hasTopKLogical(rankQ))
    val wantRank = {
      val all = (0 until 200).map(i => (s"g${i % 4}", i % 7, i.toLong))
      all.filter(t => all.count(u => u._2 > t._2) < 3)
    }
    assert(rankQ.drop("rnk").collect().length == wantRank.length)
  }

  // ---- tie-keeping modes: rank() and dense_rank() rewrite too -----------

  test("rank() filter rewrites tie-aware and equals the window execution") {
    // Order by score only (heavy ties: score = i % 7): rank() <= 3 keeps
    // every boundary tie, so groups emit MORE than 3 rows.
    def q = {
      val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
      df.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3).drop("rnk")
    }
    assert(hasTopKLogical(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", rewriteRuleName)
    try {
      assert(!hasTopKLogical(q), "negative control")
      val want = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(got == want)
      assert(got.size > 12, s"ties must widen the result past 4 groups x 3: ${got.size}")
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("dense_rank() filter rewrites and keeps all rows of top-k distinct values") {
    def q = {
      val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
      df.withColumn("rnk", dense_rank().over(w)).filter(col("rnk") <= 2).drop("rnk")
    }
    assert(hasTopKLogical(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", rewriteRuleName)
    try {
      val want = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(got == want)
      // top-2 distinct scores per group (6 and 5), every tie kept
      assert(got.forall { case (_, s, _) => s == 6 || s == 5 })
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("rank modes equal the window execution on randomized tie-heavy inputs") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 100 + rng.nextInt(200)
      val groups = 1 + rng.nextInt(6)
      val k = 1 + rng.nextInt(4)
      val rows = (0 until n).map(i => (s"g${rng.nextInt(groups)}", rng.nextInt(3), i.toLong))
      for (fn <- Seq("rank", "dense_rank")) {
        def q = {
          val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
          val r = if (fn == "rank") rank().over(w) else dense_rank().over(w)
          rows.toDF("grp", "score", "id").repartition(5)
            .withColumn("rnk", r).filter(col("rnk") <= k).drop("rnk")
        }
        assert(hasTopKLogical(q), s"$fn trial $trial")
        val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
        spark.conf.set("spark.sql.optimizer.excludedRules", rewriteRuleName)
        try {
          val want = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
          assert(got == want, s"$fn trial $trial (n=$n groups=$groups k=$k)")
        } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
    }
  }

  // ---- memory fallback: budget-bounded partial flush + final spill ------

  test("tiny retained-row budget exercises partial flush and final spill, same answer") {
    import spark.implicits._
    // 200 groups x 10 rows, k=2: retained rows (400) far exceed a budget of
    // 4, forcing repeated partial flushes AND final-stage freeze+spill
    // passes. The answer must be identical to the unbounded run.
    val wide = (0 until 2000).map(i => (i % 200, i.toLong)).toDF("grp", "id")
      .repartition(5)
    def run() = TopK.topKPerGroup(wide, Seq("grp"), Seq("id" -> true), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val unbounded = run()
    assert(unbounded.size == 400)
    spark.conf.set("spark.graft.topk.maxRetainedRows", "4")
    try {
      val bounded = run()
      assert(bounded == unbounded)
      // tie modes through the same bounded path
      val w = Window.partitionBy(col("grp")).orderBy(col("id").asc)
      def rq = wide.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 2).drop("rnk")
      assert(hasTopKLogical(rq))
      assert(rq.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq == unbounded)
    } finally spark.conf.unset("spark.graft.topk.maxRetainedRows")
  }

  // ---- pathological literals must not truncate into a plausible k -------

  test("unsatisfiable rank bounds are not rewritten and return zero rows") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id").asc)
    // -4294967295L.toInt wraps to 1; the guard must leave the plan alone.
    val negWrap = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= lit(-4294967295L)).drop("rnk")
    assert(!hasTopKLogical(negWrap), negWrap.queryExecution.optimizedPlan.toString)
    assert(negWrap.collect().isEmpty)
    // Int.MinValue - 1 underflows to Int.MaxValue on the strict path.
    val minStrict = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") < lit(Int.MinValue)).drop("rnk")
    assert(!hasTopKLogical(minStrict), minStrict.queryExecution.optimizedPlan.toString)
    assert(minStrict.collect().isEmpty)
    // rn < 1 is unsatisfiable (row_number starts at 1): no rewrite, no rows.
    val ltOne = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") < 1).drop("rnk")
    assert(!hasTopKLogical(ltOne), ltOne.queryExecution.optimizedPlan.toString)
    assert(ltOne.collect().isEmpty)
  }
}
