package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Dedup
import graft.sources.Tables
import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.DupHit

/** Streaming near-dup suppression: the per-row signature must be the
  * BATCH MinHash (else stream and batch disagree about what "duplicate"
  * means), hits must fire across micro-batches, and the bucket cap must
  * bound state on degenerate keys. */
class StreamDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("per-row signature equals the batch explode-groupBy construction") {
    val docs = Tables.documents(spark, dir).limit(200)
    val streamSide = StreamDedup.withSignature(docs)
      .select(col("doc_id"), col("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val batchSide = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(streamSide.keySet == batchSide.keySet)
    streamSide.foreach { case (id, sig) =>
      assert(sig == batchSide(id), s"doc $id signature diverges")
    }
  }

  private case class Doc(doc_id: Long, text: String)

  test("arrivals matching a remembered signature are flagged, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val textA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val textC = "completely different content about spark execution engines and shuffles"
    val input = MemoryStream[Doc]
    val query = StreamDedup.nearDupHits(input.toDF())
      .writeStream.format("memory").queryName("tws_dedup")
      .outputMode(OutputMode.Append()).start()
    def hits(): Seq[DupHit] =
      spark.sql("SELECT * FROM tws_dedup").as[DupHit].collect().toSeq
    try {
      // batch 1: original + same-batch exact dup + a distinct doc.
      input.addData(Doc(1, textA), Doc(2, textA), Doc(3, textC))
      query.processAllAvailable()
      val b1 = hits()
      assert(b1.map(h => (h.doc_id, h.dup_of)).distinct == Seq((2L, 1L)),
        b1.mkString(", "))
      assert(b1.forall(_.matching == 12))

      // batch 2: a later near-dup of doc 1 (one trailing word changed —
      // most 3-shingles shared) must hit the REMEMBERED signature; a fresh
      // distinct doc must not.
      input.addData(
        Doc(4, textA.replace("today", "tonight")),
        Doc(5, "yet another unrelated document mentioning parquet footers and stats"))
      query.processAllAvailable()
      val b2 = hits().filter(_.doc_id == 4)
      assert(b2.nonEmpty, s"cross-batch near-dup not flagged: ${hits()}")
      assert(b2.forall(h => h.dup_of == 1L && h.matching >= StreamDedup.MatchThreshold))
      assert(!hits().exists(h => h.doc_id == 5 || h.doc_id == 3), hits().mkString(", "))

      // batch 3: the bucket cap bounds the working set — a flood of
      // MUTUALLY DISTINCT docs sharing no shingles neither crashes nor
      // emits spurious hits.
      val flood = (100L until 140L).map(i =>
        Doc(i, s"unique filler number $i with tokens alpha$i beta$i gamma$i delta$i"))
      input.addData(flood: _*)
      query.processAllAvailable()
      assert(!hits().exists(_.doc_id >= 100L))
    } finally {
      query.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("the bucket cap stops absorbing signatures but keeps flagging known dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Doc]
    val query = StreamDedup.nearDupHits(input.toDF())
      .writeStream.format("memory").queryName("tws_dedup_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = "shared boilerplate prefix tokens one two three four five six seven"
      // All docs are exact dups of doc 0: the first is stored, the rest
      // all hit it — stored-set size stays 1 regardless of volume.
      val docs = (0L until (StreamDedup.BucketCap + 10L)).map(i => Doc(i, base))
      input.addData(docs: _*)
      query.processAllAvailable()
      val hits = spark.sql("SELECT * FROM tws_dedup_cap").as[DupHit].collect()
      val perDoc = hits.groupBy(_.doc_id)
      assert(!perDoc.contains(0L))
      assert((1L until (StreamDedup.BucketCap + 10L)).forall(i =>
        perDoc(i).forall(_.dup_of == 0L)), "every later arrival flags doc 0")
    } finally {
      query.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
