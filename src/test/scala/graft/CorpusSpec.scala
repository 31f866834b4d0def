package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Properties of the corpus-analysis operators beyond the DuckDB oracle:
  * chunk stitching reconstructs the document, containment finds planted
  * quotes (and only in the contained direction), scripted flows have
  * zero transition entropy, and the calibration table is a valid CDF. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("containment flags the planted quote in the contained direction only") {
    val quoted = (1 to 20).map(i => s"q$i").mkString(" ")
    val host = s"intro words here $quoted and a very long tail " +
      (1 to 40).map(i => s"t$i").mkString(" ")
    val noise = (1 to 30).map(i => s"n$i").mkString(" ")
    val d = docs((1L, quoted, "a"), (2L, host, "a"), (3L, noise, "a"))
    val pairs = Corpus.containmentPairs(d)
      .select("a", "b", "containment_permille").as[(Long, Long, Long)]
      .collect().toSet
    // Every shingle of doc 1 appears in doc 2 → containment 1000.
    assert(pairs.contains((1L, 2L, 1000L)))
    // The host is NOT contained in the quote.
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 1L))
  }

  test("containment top-N caps partners per contained doc, best evidence first") {
    // Doc 1 is quoted verbatim inside FIVE hosts; the unbounded form
    // reports all five, the capped form exactly ContainTopN of them.
    // Hosts share all of doc 1's shingles (equal evidence), so the
    // deterministic tiebreak keeps the smallest host ids.
    val quoted = (1 to 20).map(i => s"q$i").mkString(" ")
    val hosts = (1 to 5).map { h =>
      (10L + h, s"host$h intro $quoted tail$h " +
        (1 to 10).map(i => s"t${h}_$i").mkString(" "), "a")
    }
    val d = docs((Seq((1L, quoted, "a")) ++ hosts): _*)
    val all = Corpus.containmentPairs(d)
      .filter(col("a") === 1L).collect().map(_.getAs[Long]("b")).sorted
    assert(all.length == 5, all.mkString(","))
    val capped = Corpus.containmentTopN(d)
      .filter(col("a") === 1L).collect().map(_.getAs[Long]("b")).sorted
    assert(capped.length == Corpus.ContainTopN, capped.mkString(","))
    assert(capped.toSeq == all.take(Corpus.ContainTopN).toSeq)
    // and the capped rows agree with the unbounded rows where they overlap
    val fullRows = Corpus.containmentPairs(d).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.toString).toMap
    Corpus.containmentTopN(d).collect().foreach { r =>
      val k = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(fullRows(k) == r.toString, s"row mismatch at $k")
    }
  }

  test("a scripted flow has zero next-event entropy; a fair split has one bit") {
    val rows = (0 until 8).flatMap { i =>
      // 'start' always goes to 'a'; 'b' alternates between 'c' and 'd'.
      Seq((i.toLong, 2L * i, "start"), (i.toLong, 2L * i + 1, "a"))
    } ++ (0 until 8).flatMap { i =>
      Seq((100L + i, 2L * i, "b"), (100L + i, 2L * i + 1,
        if (i % 2 == 0) "c" else "d"))
    }
    val events = rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"),
        monotonically_increasing_id().as("event_id"))
    val ent = Corpus.transitionEntropy(events)
      .select("prev_type", "entropy_millibits").as[(String, Long)]
      .collect().toMap
    assert(ent("start") == 0L)
    assert(ent("b") == 1000L)
  }

  test("quality calibration is a CDF: below is monotone and bounded per source") {
    val d = docs(
      (1L, "aaaa", "web"), (2L, "aa11", "web"), (3L, "1111", "web"),
      (4L, "abc!", "pdf"), (5L, "....", "pdf"))
    val rows = Corpus.qualityCalibration(d)
      .select("source", "score", "cnt", "below", "pct_permille")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      val total = rs.map(_._3).sum
      // below accumulates exactly the counts of strictly-smaller scores.
      sorted.foldLeft(0L) { case (acc, (_, _, cnt, below, pct)) =>
        assert(below == acc)
        assert(pct == 1000L * below / math.max(total - 1, 1L))
        acc + cnt
      }
    }
  }

  test("centroid confusion is purely diagonal on separable clusters and " +
    "splits a planted straddler") {
    import graft.ops.Similarity
    // Two well-separated 64-d clusters: label 0 near +0.4 on dims 0-31,
    // label 1 near +0.4 on dims 32-63 (small per-vector jitter), plus one
    // label-0 vector planted AT the label-1 centroid.
    def vec(hot: Range, base: Float, jit: Float): Seq[Float] =
      (0 until 64).map(d => if (hot.contains(d)) base + jit else 0.01f * jit)
    val rows =
      (0 until 8).map(i => (i.toLong, vec(0 until 32, 0.4f, 0.01f * i), 0)) ++
      (0 until 8).map(i => (100L + i, vec(32 until 64, 0.4f, 0.01f * i), 1)) ++
      Seq((999L, vec(32 until 64, 0.4f, 0.0f), 0))
    val e = rows.toDF("vec_id", "embedding", "label")
    val conf = Similarity.centroidConfusion(e)
      .select("label", "pred_label", "n").as[(Int, Int, Long)]
      .collect().map { case (l, p, n) => (l, p) -> n }.toMap
    assert(conf((0, 0)) == 8L)
    assert(conf((1, 1)) == 8L)
    assert(conf((0, 1)) == 1L) // the straddler lands on the other centroid
    assert(!conf.contains((1, 0)))
  }

  test("burst detection flags the replay script, not the steady user") {
    // User 1: 20 events inside one hour plus 20 spread one-per-hour.
    // User 2: one event per hour for 30 hours (max=1 < floor).
    val H = 3600L * 1000000
    val rows =
      (0 until 20).map(i => (1L, 30L * 1000000 + i * 1000)) ++
      (1 to 20).map(i => (1L, i * H + 5)) ++
      (0 until 30).map(i => (2L, i * H + 7))
    val events = rows.toDF("user_id", "us")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"))
    val out = Corpus.burstDetection(events)
      .select("user_id", "n_events", "n_hours", "max_per_hour",
        "burst_ratio_permille")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 40L, 21L, 20L, 1000L * 20 * 21 / 40)))
  }

  test("path trigrams rank the dominant three-step flow first") {
    val rows =
      (0 until 3).flatMap(u => Seq("view", "cart", "purchase").zipWithIndex
        .map { case (t, i) => (u.toLong, i.toLong * 1000000, t) }) ++
      Seq("cart", "purchase", "refund").zipWithIndex
        .map { case (t, i) => (9L, i.toLong * 1000000, t) }
    val events = rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"),
        monotonically_increasing_id().as("event_id"))
    val out = Corpus.pathTrigrams(events)
      .select("rnk", "t1", "t2", "t3", "n")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "view", "cart", "purchase", 3L),
      (2L, "cart", "purchase", "refund", 1L)))
  }

  test("winsorized mean clips exactly the fence-crossing outliers") {
    // 20 values: 1.00..18.00 plus two outliers -100.00 and 500.00.
    // p05 rank = 1 → lo = -10000 (the outlier itself is the 5th-pct cut
    // at n=20: cum(1)*100 = 100 >= 20*5); p95 rank: smallest cents with
    // cum*100 >= 1900 → 18.00. Clipped: -100 -> -100? No: lo_cents is
    // the 1st value (-10000), so nothing clips low; 500.00 clips to 18.
    val vals = (1 to 18).map(_.toDouble) ++ Seq(-100.0, 500.0)
    val events = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "purchase", v) }
      .toDF("event_id", "event_type", "value")
    val out = Corpus.winsorizedStats(events).collect().head
    assert(out.getAs[Long]("n_values") == 20L)
    assert(out.getAs[Long]("lo_cents") == -10000L)
    assert(out.getAs[Long]("hi_cents") == 1800L)
    assert(out.getAs[Long]("n_clipped") == 1L)
    // clipped sum = (-10000) + sum(100..1800 step 100) + 1800
    val expect = (-10000L + (1 to 18).map(_ * 100L).sum + 1800L) / 20L
    assert(out.getAs[Long]("winsorized_mean_cents") == expect)
  }

  test("vocab growth counts each token in its first bucket only") {
    val d = docs((0L, "a b c", "web"), (9L, "b c d e", "web"))
    val out = Corpus.vocabGrowth(d)
      .select("bucket", "new_tokens", "cum_vocab")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 3L), (9L, 2L, 5L)))
  }

  test("identical sources overlap completely; disjoint sources do not pair") {
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    val other = (1 to 30).map(i => s"o$i").mkString(" ")
    val d = docs((1L, shared, "a"), (2L, shared, "b"), (3L, other, "c"))
    val rows = Corpus.sourceOverlap(d)
      .select("src_a", "src_b", "jaccard_permille").as[(String, String, Long)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(rows(("a", "b")) == 1000L)
    assert(!rows.keySet.exists(p => p._2 == "c" || p._1 == "c"))
  }
}
