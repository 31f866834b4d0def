package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Ingest
import graft.streaming.Ingest.{Doc, Packed}

/** The composed streaming ingest path (cap → near-dup suppress → pack) as
  * ONE streaming query — three chained `transformWithState` operators with
  * their states advancing together across micro-batches. StreamCapSpec and
  * StreamDedupSpec prove the stages; this spec proves the COMPOSITION:
  * admission counts, suppression, and shard fill levels all carry over
  * between batches inside a single query.
  */
class IngestPipelineSpec extends SparkSpec {

  private val textA =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val textB =
    "completely different content about spark execution engines and shuffles"
  private def words(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("cap, dedup, and pack states all advance across batches in one query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Pick a near-dup of textA that lands in textA's single-band bucket
    // (the composed pipeline's one-decision-per-doc geometry trades the
    // 6-band recall for composability, so the fixture must collide on THE
    // band): computed from the same signature construction, deterministic.
    val variants = (1 to 20).map(i => textA + s" extra$i")
    val probes = Ingest.signed(
        (textA +: variants).zipWithIndex
          .map { case (t, i) => (i.toLong, "probe", t) }
          .toDF("doc_id", "source", "text"))
      .collect().map(s => s.doc_id -> s).toMap
    def matches(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).count { case (x, y) => x == y }
    val nearDup = variants.zipWithIndex
      .collectFirst { case (t, i)
        if probes(i + 1L).bucket == probes(0L).bucket &&
          matches(probes(i + 1L).sig, probes(0L).sig) >= Ingest.MatchThreshold => t }
      .getOrElse(fail("no variant collides with textA's band-0 bucket"))

    val input = MemoryStream[Doc]
    // cap: 3 docs per source; shards: 40 tokens
    val query = Ingest.pipeline(input.toDS(), k = 3, shardTokens = 40)
      .writeStream.format("memory").queryName("ingest_pipe")
      .outputMode(OutputMode.Append()).start()
    def packed(): Seq[Packed] =
      spark.sql("SELECT * FROM ingest_pipe").as[Packed].collect().toSeq
    try {
      // ---- batch 1: two sources; src1 sends an exact dup in-batch ------
      input.addData(
        Doc(1, "src1", textA),            // 14 tokens -> shard 0 @ 0
        Doc(2, "src1", textA),            // exact dup -> suppressed
        Doc(3, "src1", words(30, "w")),   // 30 tokens -> 14+30 > 40 -> shard 1
        Doc(4, "src2", textB))            // 9 tokens -> src2 shard 0
      query.processAllAvailable()
      val b1 = packed()
      assert(b1.map(_.doc_id).sorted == Seq(1L, 3L, 4L), b1.mkString(", "))
      val d1 = b1.find(_.doc_id == 1L).get
      val d3 = b1.find(_.doc_id == 3L).get
      assert(d1.shard == 0L && d1.offset_tokens == 0L && d1.n_tokens == 14L)
      assert(d3.shard == 1L && d3.offset_tokens == 0L, d3.toString)
      assert(b1.find(_.doc_id == 4L).get.shard == 0L)

      // ---- batch 2: cross-batch dedup + cap saturation + pack carry ----
      input.addData(
        // near-dup of doc 1 (remembered from batch 1) -> suppressed; its
        // own source proves suppression is bucket-keyed (cross-source),
        // and keeps src2's admission budget for docs 7/8
        Doc(5, "src3", nearDup),
        // src1 already admitted 3 (dup counts as admitted) -> capped out
        Doc(6, "src1", words(5, "x")),
        // src2 second admit: 9 + 12 <= 40 -> same shard, offset carries
        Doc(7, "src2", words(12, "y")))
      query.processAllAvailable()
      val b2 = packed()
      assert(!b2.exists(_.doc_id == 5L), "cross-batch near-dup not suppressed")
      assert(!b2.exists(_.doc_id == 6L), "admission cap did not carry over")
      val d7 = b2.find(_.doc_id == 7L).get
      assert(d7.shard == 0L && d7.offset_tokens == 9L,
        s"pack state did not carry across batches: $d7")

      // ---- batch 3: src2 fill rolls into the next shard ----------------
      input.addData(Doc(8, "src2", words(25, "z"))) // 9+12+25 > 40 -> shard 1
      query.processAllAvailable()
      val d8 = packed().find(_.doc_id == 8L).get
      assert(d8.shard == 1L && d8.offset_tokens == 0L, d8.toString)

      // cross-batch totals: admitted = 5 of 8 offered (2 suppressed, 1 capped)
      assert(packed().map(_.doc_id).sorted == Seq(1L, 3L, 4L, 7L, 8L))
    } finally {
      query.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("all three pipeline states survive a checkpointed restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString
    // the memory sink cannot recover from a checkpoint (and MemoryStream
    // offsets do not survive a restart): file source + foreachBatch, the
    // CheckpointSpec vehicle
    val inDir = java.nio.file.Files.createTempDirectory("graft-ingest-in").toString
    def writeBatch(rows: Seq[Doc]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(inDir)
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[Packed]()
    def start() =
      Ingest.pipeline(
          spark.readStream
            .schema("doc_id LONG, source STRING, text STRING")
            .parquet(inDir).as[Doc],
          k = 3, shardTokens = 20)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Packed], _: Long) =>
          df.collect().foreach(sunk.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    try {
      // run 1: seed every state — admission counts (2 of 3), a remembered
      // signature (textA), a near-full shard (19 of 20 tokens)
      writeBatch(Seq(
        Doc(1, "s", textA),           // 14 tokens -> shard 0 @ 0
        Doc(2, "s", words(5, "a"))))  // 5 tokens -> 14+5 <= 20 -> shard 0 @ 14
      val q1 = start()
      q1.processAllAvailable(); q1.stop()
      import scala.jdk.CollectionConverters._
      assert(sunk.asScala.map(_.doc_id).toSeq.sorted == Seq(1L, 2L))
      sunk.clear()

      // run 2, same checkpoint: shard fill, admission count, and
      // signature memory must all resume (docs 3 and 4 land in separate
      // micro-batches so their within-key order is deterministic)
      writeBatch(Seq(
        Doc(3, "s", words(3, "b")),   // 3rd admit; 19+3 > 20 -> SHARD 1 iff
                                      // the fill state survived (fresh state
                                      // would pack it at shard 0 offset 0)
        Doc(6, "t", textA)))          // fresh source, dup of REMEMBERED doc 1
                                      // -> suppressed iff signatures survived
      val q2 = start()
      q2.processAllAvailable()
      writeBatch(Seq(
        Doc(4, "s", words(2, "c"))))  // source 's' now at cap 3 -> capped out
      q2.processAllAvailable(); q2.stop()
      val r2 = sunk.asScala.toSeq
      val d3 = r2.find(_.doc_id == 3L)
      assert(d3.isDefined, s"doc 3 missing: ${r2.mkString(", ")}")
      assert(d3.get.shard == 1L && d3.get.offset_tokens == 0L,
        s"shard fill lost across restart: ${d3.get}")
      assert(!r2.exists(_.doc_id == 4L), "admission count lost across restart")
      assert(!r2.exists(_.doc_id == 6L), "signature memory lost across restart")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
