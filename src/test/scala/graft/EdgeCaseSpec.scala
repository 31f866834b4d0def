package graft

import graft.ops.{Dedup, Pipeline, TextStats}

/** Degenerate-input behavior: the failure modes the scale guards exist for,
  * exercised functionally. A boilerplate corpus (every doc identical) is
  * THE mega-bucket case — without the LSH bucket caps the self-joins go
  * quadratic; with them the operators return quickly and empty.
  */
class EdgeCaseSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("empty corpus: dedup/span/packing operators return empty, no errors") {
    val empty = df(Seq.empty)
    assert(Dedup.exactDedup(empty).count() == 0)
    assert(Dedup.minhashCandidates(empty).count() == 0)
    assert(Dedup.simhashPairs(empty).count() == 0)
    assert(Dedup.duplicateSpans(empty).count() == 0)
    assert(Dedup.jaccardPrefixJoin(empty).count() == 0)
    assert(Pipeline.tokenPacking(empty).count() == 0)
    assert(Pipeline.trainingOrder(empty).count() == 0)
    assert(TextStats.bpeMerges(empty).count() == 0)
    assert(TextStats.rareBigramScore(empty).count() == 0)
    assert(Dedup.splitLeakage(empty).count() == 0)
    import org.apache.spark.sql.functions.lit
    assert(graft.ops.Profiling.columnProfile(
      df(Seq.empty).withColumnRenamed("doc_id", "o_custkey")
        .withColumnRenamed("text", "o_orderstatus")
        .withColumn("o_orderpriority", lit(null).cast("string")))
      .collect().forall(_.getAs[Long]("n_nulls") == 0L))
  }

  test("boilerplate corpus: the bucket caps stop quadratic pair fan-out") {
    // 3000 identical docs: every band/block key collides into ONE bucket of
    // size 3000 > MaxBucketSize=1000. Uncapped, the self-join would emit
    // ~4.5M pairs; capped, the bucket is dropped and the result is empty.
    val boiler = df((1L to 3000L).map(i =>
      (i, "the same boilerplate sentence repeated in every document here")))
    assert(Dedup.minhashCandidates(boiler).count() == 0)
    assert(Dedup.simhashPairs(boiler).count() == 0)
    // exact dedup is cap-free by design — a hash groupBy collapses the
    // whole corpus to one group without any pair join
    val exact = Dedup.exactDedup(boiler).collect()
    assert(exact.length == 1 && exact.head.getAs[Long]("n_docs") == 3000L)
    // the exact similarity join has the same guard: identical docs mean
    // every prefix-token bucket holds all 3000 docs > cap → dropped
    // (recall traded for a bound, same contract as the LSH paths)
    assert(Dedup.jaccardPrefixJoin(boiler).count() == 0)
  }

  test("empty and single-token texts survive every text operator") {
    val weird = df(Seq((1L, ""), (2L, "one"), (3L, "two words"),
      (4L, "   "), (5L, "a b c d e f g h i j")))
    // shingle-based ops skip too-short docs rather than erroring
    assert(Dedup.duplicateSpans(weird).count() == 0) // no 5-gram overlap
    val stats = TextStats.textStats(weird).collect()
    assert(stats.length == 5)
    val packed = Pipeline.tokenPacking(weird).collect()
    assert(packed.length == 5 && packed.forall(_.getAs[Long]("n_tokens") >= 1))
  }

  test("empty/degenerate inputs: selection and graph operators return empty") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.ops.Mixing.dsirWeights(emptyDocs).count() == 0)
    assert(Pipeline.groupSplit(emptyDocs).count() == 0)
    assert(Pipeline.domainCap(emptyDocs).count() == 0)
    assert(Pipeline.lengthDeciles(emptyDocs).count() == 0)
    assert(Pipeline.reservoirSample(emptyDocs).count() == 0)
    val emptyLi = Seq.empty[(Long, Long, Double)]
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    // a graph with no edges has one well-defined answer, not an error
    val tri = graft.ops.Graph.triangleCount(emptyLi).collect()
    assert(tri.length == 1 && tri.head.getAs[Long]("n_triangles") == 0L)
    // dsir with an EMPTY TARGET slice (no 'en' docs) degrades to uniform
    // smoothed weights — scores exist and are equal per token count
    val noTarget = Seq((1L, "x x x", "de", "s", 5L), (2L, "y y y", "fr", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = graft.ops.Mixing.dsirWeights(noTarget).collect()
    assert(w.length == 2 && w.map(_.getAs[Long]("spt_milli")).distinct.length == 1)
  }

  test("empty/degenerate inputs: round-6 session operators return empty") {
    import java.sql.Timestamp
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.ops.Curation.secretScan(emptyDocs).count() == 0)
    assert(Pipeline.lengthBucketing(emptyDocs).count() == 0)
    assert(graft.ops.Multimodal.interleavedPacking(emptyDocs).count() == 0)
    val emptyEvents = Seq.empty[(Long, Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.ops.Temporal.purchaseAttribution(emptyEvents).count() == 0)
    assert(graft.ops.Temporal.userValueTrend(emptyEvents).count() == 0)
    assert(graft.ops.Temporal.dowProfile(emptyEvents).count() == 0)
    // A purchases-only stream (no touches at all) attributes every
    // purchase to 'direct' rather than dropping or erroring.
    val onlyPurchases = Seq(
      (1L, new Timestamp(1000L), 1L, "purchase", 1.0, "{}"),
      (2L, new Timestamp(2000L), 1L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val attr = graft.ops.Temporal.purchaseAttribution(onlyPurchases).collect()
    assert(attr.length == 2 && attr.forall(_.getAs[String]("channel") == "direct"))
  }

  test("empty/degenerate inputs: corpus-analysis operators return empty") {
    import java.sql.Timestamp
    import spark.implicits._
    import graft.ops.Corpus
    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(Corpus.ngramDiversity(emptyDocs).count() == 0)
    assert(Corpus.sourceOverlap(emptyDocs).count() == 0)
    assert(Corpus.containmentPairs(emptyDocs).count() == 0)
    assert(Corpus.qualityCalibration(emptyDocs).count() == 0)
    assert(Corpus.vocabGrowth(emptyDocs).count() == 0)
    val emptyEvents = Seq.empty[(Long, Timestamp, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(Corpus.burstDetection(emptyEvents).count() == 0)
    assert(Corpus.transitionEntropy(emptyEvents).count() == 0)
    assert(graft.ops.Similarity.centroidConfusion(
      Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label"))
      .count() == 0)
    // Sub-shingle/short texts pass the size gates rather than erroring.
    val shorts = Seq((1L, "", "a"), (2L, "one two", "a"), (3L, "  ", "b"))
      .toDF("doc_id", "text", "source")
    assert(Corpus.ngramDiversity(shorts).count() == 0)
    assert(Corpus.containmentPairs(shorts).count() == 0)
  }

  test("a boilerplate corpus has no rare shingles: containment stays empty") {
    import spark.implicits._
    // 3000 identical docs: every shingle's df is 3000 >> ContainDfCap=64,
    // so the rare-shingle candidate gate drops everything — the bound
    // that keeps the pair space off documents² on mega-duplicate crawls.
    val boiler = (1L to 3000L)
      .map(i => (i, "the same boilerplate sentence repeated in every document here", "web"))
      .toDF("doc_id", "text", "source")
    assert(graft.ops.Corpus.containmentPairs(boiler).count() == 0)
  }

  test("a 10k-event bot session keeps the path agg buffer at 8 structs") {
    import java.sql.Timestamp
    import spark.implicits._
    // One user, 10k events 1s apart (never a 30-min gap → ONE session),
    // plus a 2-event control user. The rn<=8 guard means the monster
    // session's collect buffer holds 8 structs, not 10k — functionally:
    // the path is exactly the first 8 event types, n_events is the true
    // 10k, and the run completes quickly.
    val bot = (0 until 10000).map(i =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), 7L,
        if (i % 3 == 0) "view" else "click", 1.0, "{}"))
    val ctl = Seq(
      (20000L, new Timestamp(1700000000000L), 8L, "purchase", 5.0, "{}"),
      (20001L, new Timestamp(1700000001000L), 8L, "error", 0.0, "{}"))
    val events = (bot ++ ctl)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val paths = graft.ops.Temporal.sessionPaths(events).collect()
    val botRow = paths.find(r =>
      r.getAs[Long]("n_events") == 10000L).getOrElse(fail(s"no bot row: ${paths.mkString(";")}"))
    // first 8 events: i=0..7 → view,click,click,view,click,click,view,click
    assert(botRow.getAs[String]("path") ==
      "view>click>click>view>click>click>view>click")
    assert(paths.exists(r => r.getAs[Long]("n_events") == 2L &&
      r.getAs[String]("path") == "purchase>error"))
  }
}
