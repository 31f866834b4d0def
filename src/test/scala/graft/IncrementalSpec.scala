package graft

import java.sql.Timestamp

import graft.ops.{Incremental, TextStats}

/** Incremental view maintenance and the corpus-model novelty score. */
class IncrementalSpec extends SparkSpec {

  private def ev(id: Long, ts: String, user: Long, value: Double) =
    (id, Timestamp.valueOf(ts), user, "purchase", value, "{}")

  test("delta merge equals one-shot recompute across the cutoff") {
    import spark.implicits._
    // User 10 spans both sides of the 01-24 cutoff (distinct days), user 20
    // exists only in the delta, user 30 only in the base, and user 10 has
    // two same-day events in the delta (the within-batch partial-agg path).
    val df = Seq(
      ev(1, "2024-01-20 10:00:00", 10, 12.34),
      ev(2, "2024-01-23 23:59:59", 10, -5.678),
      ev(3, "2024-01-25 01:00:00", 10, 7.0),
      ev(4, "2024-01-25 02:00:00", 10, 8.999),
      ev(5, "2024-01-26 00:00:00", 20, 100.5),
      ev(6, "2024-01-02 12:00:00", 30, 0.009),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    def render(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day_us"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"),
        r.getAs[Long]("max_cents"))).sorted.toSeq

    val merged = render(Incremental.aggDeltaMerge(df).collect())
    val oneShot = render(Incremental.dailyState(df)
      .selectExpr("user_id", "unix_micros(day) AS day_us", "n_events",
        "sum_cents", "max_cents").collect())
    assert(merged == oneShot)
    // Hand-check the straddling user's delta day: 700 + 899 cents, max 899.
    val d25 = merged.find { case (u, d, _, _, _) =>
      u == 10L && d == Timestamp.valueOf("2024-01-25 00:00:00").getTime * 1000L }
    assert(d25.exists { case (_, _, n, s, m) => n == 2L && s == 1599L && m == 899L })
    // Negative values floor toward -inf on both engines: -5.678 → -568.
    val d23 = merged.find { case (u, d, _, _, _) =>
      u == 10L && d == Timestamp.valueOf("2024-01-23 00:00:00").getTime * 1000L }
    assert(d23.exists { case (_, _, n, s, m) => n == 1L && s == -568L && m == -568L })
  }

  test("merge equals recompute on randomized event sets (any day split)") {
    import spark.implicits._
    // The cutoff sits on a day boundary, so merge==recompute must hold for
    // ANY event distribution — randomized values, users, and times across
    // the month, three trials.
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val events = (1 to 400).map { i =>
        val day = 1 + rng.nextInt(28)
        val sec = rng.nextInt(86400)
        ev(i.toLong, f"2024-01-$day%02d 00:00:00", 1L + rng.nextInt(9),
          (rng.nextDouble() - 0.3) * 1000)
      }.map { case (id, ts0, u, t, v, p) =>
        (id, new java.sql.Timestamp(ts0.getTime + rng.nextInt(86400) * 1000L), u, t, v, p)
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val merged = Incremental.aggDeltaMerge(events).collect()
        .map(_.toSeq).toSeq
      val oneShot = Incremental.dailyState(events)
        .selectExpr("user_id", "unix_micros(day) AS day_us", "n_events",
          "sum_cents", "max_cents")
        .orderBy("user_id", "day_us").collect().map(_.toSeq).toSeq
      assert(merged == oneShot, s"trial $trial")
    }
  }

  test("rare-bigram novelty flags gibberish, passes boilerplate") {
    import spark.implicits._
    // 5 docs share one common phrase (its bigrams hit the corpus head);
    // one doc is unique gibberish (every bigram below the common-min).
    val common = (1 to 5).map(i =>
      (i.toLong, "the quick brown fox jumps", "en", "s", 0L))
    val gibberish = Seq((99L, "zxq wvut plomk ajdhr qqpc", "en", "s", 0L))
    val docs = (common ++ gibberish)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextStats.rareBigramScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("novelty_ppm"), r.getAs[Boolean]("flagged"))).toMap
    (1L to 5L).foreach { i =>
      assert(rows(i)._1 == 0L && !rows(i)._2, s"doc $i: ${rows(i)}")
    }
    assert(rows(99L)._1 == 1000000L && rows(99L)._2, s"doc 99: ${rows(99L)}")
  }

  test("rare-bigram score broadcasts the model head, not the corpus") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, "a b c d e", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val plan = TextStats.rareBigramScore(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
