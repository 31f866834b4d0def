package graft

import org.apache.spark.sql.functions._
import graft.functions.{Sketch, Sketches}
import graft.sources.Tables

/** Bottom-k sample sketch (typed Aggregator UDAF): merge algebra, partition
  * invariance, agreement with the TopK physical operator, and quantile
  * sanity.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mergeSketch is associative, commutative, and caps at k") {
    val a = Sketch(Vector(1L, 5L, 9L), Vector(1.0, 5.0, 9.0))
    val b = Sketch(Vector(2L, 5L, 8L), Vector(2.0, 4.0, 8.0))
    val c = Sketch(Vector(3L, 7L), Vector(3.0, 7.0))
    def m(x: Sketch, y: Sketch) = Sketches.mergeSketch(x, y, 4)
    assert(m(a, b) == m(b, a))
    assert(m(m(a, b), c) == m(a, m(b, c)))
    assert(m(a, b) == Sketch(Vector(1L, 2L, 5L, 5L), Vector(1.0, 2.0, 4.0, 5.0)))
    // tie on h resolved by v on both insert orders
    assert(m(Sketch(Vector(5L), Vector(9.0)), Sketch(Vector(5L), Vector(1.0))).vs
      == Vector(1.0, 9.0))
  }

  test("sketch rollup is partition-invariant (exercises partial-agg merges)") {
    val orders = Tables.orders(spark, dir)
    val one = Sketches.quantileSketchRollup(orders.repartition(1)).collect()
    val many = Sketches.quantileSketchRollup(orders.repartition(32)).collect()
    assert(one.length > 0)
    assert(one.toSeq == many.toSeq)
  }

  test("aggregator sample equals the TopK physical operator's bottom-k") {
    val orders = Tables.orders(spark, dir)
    val base = orders.select(
      date_trunc("week", col("o_orderdate")).as("week"),
      expr("cast(conv(substring(md5(cast(o_orderkey as string)), 1, 15), 16, 10) as bigint)").as("h"),
      col("o_totalprice").cast("double").as("v"))
    val viaAgg = base.groupBy(col("week"))
      .agg(Sketches.bottomK()(col("h"), col("v")).as("sk"))
      .select(col("week"), col("sk.vs").as("vs"))
    val viaTopK = graft.plans.TopK.topKPerGroup(
        base, Seq("week"), Seq("h" -> true, "v" -> true), Sketches.K)
      .groupBy(col("week"))
      .agg(expr("transform(array_sort(collect_list(struct(h, v))), s -> s.v)").as("vs"))
    val l = viaAgg.collect().map(r => r.getAs[Any]("week") -> r.getSeq[Double](1)).toMap
    val r = viaTopK.collect().map(r => r.getAs[Any]("week") -> r.getSeq[Double](1)).toMap
    assert(l.keySet == r.keySet)
    l.keys.foreach(k => assert(l(k) == r(k), s"week $k"))
  }

  test("sketch aggregates incrementally across streaming micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val agg = input.toDF().toDF("h", "v")
      .groupBy(lit(1).as("g"))
      .agg(Sketches.bottomK(4)(col("h"), col("v")).as("sk"))
      .select(col("g"), col("sk.hs").as("hs"), col("sk.vs").as("vs"))
    val query = agg.writeStream.format("memory").queryName("sketch_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((10L, 10.0), (3L, 3.0), (7L, 7.0))
      query.processAllAvailable()
      input.addData((1L, 1.0), (9L, 9.0), (2L, 2.0))
      query.processAllAvailable()
      val r = spark.sql("SELECT * FROM sketch_stream").collect().head
      // bottom-4 hashes across BOTH batches: state carried the sketch and
      // merged the second batch into it
      assert(r.getSeq[Long](1) == Seq(1L, 2L, 3L, 7L))
      assert(r.getSeq[Double](2) == Seq(1.0, 2.0, 3.0, 7.0))
    } finally query.stop()
  }

  test("quantile estimates are ordered, in range, and exact for small groups") {
    val orders = Tables.orders(spark, dir)
    val out = Sketches.quantileSketchRollup(orders).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      val (n, p25, p50, p75) = (row.getLong(1), row.getDouble(2), row.getDouble(3), row.getDouble(4))
      assert(n > 0 && n <= Sketches.K)
      assert(p25 <= p50 && p50 <= p75)
    }
    // groups at or under k carry the whole population: estimate == exact
    val exact = orders
      .select(date_trunc("week", col("o_orderdate")).as("week"),
        col("o_totalprice").cast("double").as("v"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("v"))).as("vs"))
      .filter(col("n") <= Sketches.K)
      .select(col("week"),
        round(element_at(col("vs"), greatest(ceil(lit(0.5) * size(col("vs"))), lit(1L)).cast("int")), 2).as("p50"))
      .collect().map(r => r.get(0) -> r.getDouble(1)).toMap
    val est = out.map(r => r.get(0) -> r.getDouble(3)).toMap
    exact.foreach { case (w, p) => assert(est(w) == p, s"week $w") }
  }

  test("bitmap rollup (mutable kryo buffer) matches exact distinct, any layout") {
    // Exercises the full UDAF path — in-place BMBuf accumulation, kryo
    // buffer serde across the partial→final exchange, OR-merge to week
    // grain — against one-shot count(DISTINCT) computed in-plan.
    import graft.functions.Bitmaps
    val events = Tables.events(spark, dir)
    val viaBitmap = Bitmaps.bitmapDistinctRollup(events)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val exact = events
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(count_distinct(col("user_id")).as("d"))
      .select(unix_micros(col("week")), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaBitmap == exact)
    // partition-layout invariance: one partition vs many must agree
    val onePart = Bitmaps.bitmapDistinctRollup(events.repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(onePart == exact)
  }

  test("bitmap overlap equals the naive pairwise intersection, planted and fixture") {
    import graft.functions.Bitmaps
    // Planted: users 0-99 do A, 50-149 do B (overlap 50), 4090-4105 do both
    // C and A straddling a 4096-chunk boundary; D shares nobody.
    val planted = spark.range(100).selectExpr("'A' AS event_type", "id AS user_id")
      .unionAll(spark.range(50, 150).selectExpr("'B' AS event_type", "id AS user_id"))
      .unionAll(spark.range(4090, 4106).selectExpr("'C' AS event_type", "id AS user_id"))
      .unionAll(spark.range(4090, 4106).selectExpr("'A' AS event_type", "id AS user_id"))
      .unionAll(spark.range(1000000, 1000005).selectExpr("'D' AS event_type", "id AS user_id"))
    val got = Bitmaps.bitmapOverlap(planted)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("A", "B")) == ((116L, 100L, 50L)))
    assert(got(("A", "C")) == ((116L, 16L, 16L))) // chunk-boundary straddle
    assert(got(("A", "D")) == ((116L, 5L, 0L)))
    assert(got(("B", "C")) == ((100L, 16L, 0L)))
    assert(got.size == 6)

    // Fixture: every pair matches the naive distinct-pair self-join.
    val events = Tables.events(spark, dir)
    val gotFix = Bitmaps.bitmapOverlap(events)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    val tu = events.select(col("event_type"), col("user_id")).distinct()
    val naive = tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type"), col("b.event_type")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    naive.foreach { case (k, n) => assert(gotFix(k) == n, s"pair $k") }
    assert(gotFix.values.count(_ > 0) == naive.size)
  }

  test("rolling 7-day distinct equals per-window recomputation from raw events") {
    import graft.functions.Bitmaps
    val events = Tables.events(spark, dir)
    val got = Bitmaps.rollingDistinctUsers(events)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Naive per-window recompute in-plan: day spine × range-filtered facts.
    val days = events.select(date_trunc("day", col("ts")).as("day")).distinct()
    val naive = days.as("d").join(
        events.select(date_trunc("day", col("ts")).as("eday"), col("user_id")),
        col("eday").between(expr("day - interval 6 days"), col("day")))
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("u7"))
      .select(unix_micros(col("day")), col("u7"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._2).toMap == naive)
    // The 1-day column is the plain per-day distinct.
    val d1 = events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("u1"))
      .select(unix_micros(col("day")), col("u1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap == d1)
    // Windows widen then saturate: 7-day is never below 1-day.
    got.values.foreach { case (u1, u7) => assert(u7 >= u1) }
  }
}
