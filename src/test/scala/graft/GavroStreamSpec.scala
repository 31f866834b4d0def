package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.AvroCodec

/** The `gavro` connector's MICRO_BATCH_READ path: an append-only landing
  * zone tailed as a stream — new files become the next micro-batch, the
  * offset is a last-consumed-NAME watermark, and a checkpointed restart resumes
  * without re-reading. Backfill (batch scan) and tail (this stream) run
  * the identical decode/filter reader stack over identical files. */
class GavroStreamSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, ids: Seq[Long],
      footer: Boolean = false): Unit = {
    val f = new java.io.File(dir, name)
    val os = new java.io.FileOutputStream(f)
    try {
      ids.foreach { id =>
        val vals: Array[Any] = Array(id, UTF8String.fromString(s"ep$id"),
          UTF8String.fromString("GET"), id.toDouble, 1000000L * id)
        val b = AvroCodec.encode(AvroCodec.SystemMetrics, vals(_), _ => false)
        os.write(Array[Byte]((b.length >>> 24).toByte, (b.length >>> 16).toByte,
          (b.length >>> 8).toByte, b.length.toByte))
        os.write(b)
      }
      // a footer makes the file optimize-eligible (merge trusts only
      // footer-declared record boundaries)
      if (footer) graft.sources.GavroFooter.write(os, Seq(0L), Seq.empty)
    } finally os.close()
  }

  test("new files arrive as micro-batches; restart resumes past the offset") {
    val dir = java.nio.file.Files.createTempDirectory("gavro-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-stream-ck").toString
    writeFile(dir, "part-00000.gavro", Seq(1L, 2L))

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.select(col("id")).collect()
          .foreach(r => seen.add(batchId -> r.getLong(0)))
        ()
      }
      .start()

    val q = start()
    q.processAllAvailable()
    assert(seen.size == 2, seen.toString)

    // A new file lands: it alone forms the next batch.
    writeFile(dir, "part-00001.gavro", Seq(3L, 4L, 5L))
    q.processAllAvailable()
    assert(seen.size == 5, seen.toString)
    q.stop()

    // Restart from the checkpoint: only the file that landed while the
    // query was down is read — nothing before the committed offset.
    seen.clear()
    writeFile(dir, "part-00002.gavro", Seq(6L))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.map(_._2).toSet == Set(6L), seen.toString)
  }

  test("pruning and pushed filters ride the streaming reader too") {
    val dir = java.nio.file.Files.createTempDirectory("gavro-stream-f").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-stream-fck").toString
    writeFile(dir, "part-00000.gavro", 1L to 10L)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .filter(col("id") > 7L)
      .select(col("id"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set(8L, 9L, 10L), seen.toString)
  }

  test("disjunctive and NOT filters ride the streaming reader with SQL semantics") {
    // The tree pushdown's STREAMING path: the micro-batch scan shares
    // GavroScanBuilder, so Or/Not trees reach planFile + the reader's
    // three-valued eval per trigger. Semantics pinned against the same
    // filter on the equivalent batch read.
    val dir = java.nio.file.Files.createTempDirectory("gavro-stream-or").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-stream-orck").toString
    writeFile(dir, "part-00000.gavro", 1L to 20L)
    val pred = (col("id") < 4L && col("id") =!= 2L) ||
      col("id") >= 17L || !(col("id") <=> 10L) && col("id").isin(9L, 10L, 11L)
    val want = spark.read.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .filter(pred).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && !want.contains(10L) && want.contains(9L))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .filter(pred)
      .select(col("id"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == want, s"stream ${seen} vs batch $want")
  }

  test("streaming gavro sink publishes per-epoch files the source can tail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("gavro-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-sink-ck").toString
    val input = MemoryStream[Long]
    val recs = input.toDF().select(
      col("value").as("id"),
      concat(lit("/api/e"), col("value")).as("endpoint"),
      lit("GET").as("method"),
      lit(200).as("status_code"),
      pmod(col("value"), lit(500)).cast("int").as("latency_ms"),
      col("value").as("user_id"),
      lit("s").as("session_id"), lit("r1").as("region_name"),
      lit("U").as("user_display_name"), lit("web").as("platform"),
      timestamp_millis(col("value") * 1000).as("created_at"))
    val q = recs.writeStream.format("gavro").option("schema", "request_log")
      .option("checkpointLocation", ckpt).outputMode("append").start(dir)
    try {
      input.addData(1L to 5L: _*); q.processAllAvailable()
      input.addData(6L to 10L: _*); q.processAllAvailable()
    } finally q.stop()
    val names = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".gavro")).sorted.toSeq
    // Epoch-monotonic names, no temp droppings.
    assert(names.nonEmpty && names.forall(_.startsWith("part-e")), names.toString)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))
    assert(names.exists(_.startsWith("part-e0000000000")) &&
      names.exists(_.startsWith("part-e0000000001")), names.toString)
    // Batch read-back: every record from both epochs, exactly once.
    val back = spark.read.format("gavro").option("schema", "request_log").load(dir)
    assert(back.count() == 10L)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 55L)
    // And the same dir TAILS through the gavro streaming source:
    // stream → archive → tail composes.
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val tailCk = java.nio.file.Files.createTempDirectory("gavro-tail-ck").toString
    val tail = spark.readStream.format("gavro").option("schema", "request_log")
      .load(dir).select(col("id"))
      .writeStream.option("checkpointLocation", tailCk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .start()
    tail.processAllAvailable()
    tail.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == (1L to 10L).toSet, seen.toString)
  }

  test("maxFilesPerTrigger drains a 50-file backlog in bounded batches; restart mid-drain loses nothing") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("gavro-bp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-bp-ck").toString
    (0 until 50).foreach(i => writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong)))

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()
    def start() = spark.readStream.format("gavro")
      .option("schema", "system_metrics")
      .option("maxFilesPerTrigger", "10")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
        batches.add(bid -> df.select(col("id")).collect().map(_.getLong(0)).toSeq)
        ()
      }
      .start()

    // First query: stop MID-DRAIN after at least two bounded batches.
    val q = start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (batches.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
    q.stop()
    assert(batches.size >= 2, s"only ${batches.size} batches before stop")

    // Restart from the checkpoint and finish the drain.
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val all = batches.asScala.toSeq
    // Bounded admission: no batch ever exceeded the 10-file cap (each
    // planted file holds one record, so records == files per batch).
    assert(all.forall(_._2.length <= 10),
      s"oversized batch: ${all.map(_._2.length).mkString(",")}")
    // A 50-file backlog with a 10-file cap needs at least 5 batches.
    assert(all.map(_._1).distinct.length >= 5, all.map(_._1).toString)
    // No records lost across the mid-drain restart (foreachBatch is
    // at-least-once, so a replayed batch may duplicate — set semantics).
    assert(all.flatMap(_._2).toSet == (0L until 50L).toSet)
  }

  test("a stream survives OPTIMIZE exactly-once when the watermark covered the absorbed set") {
    import org.apache.spark.sql.functions.{col, expr}
    import scala.jdk.CollectionConverters._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val frame = events.select(graft.sources.AvroCodec.requestLogRec.as("rec"))
      .select(col("rec.*"))
      .withColumn("created_at",
        expr("timestamp_micros(unix_millis(created_at) * 1000)"))
    val dir = java.nio.file.Files.createTempDirectory("gavro-opt-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-opt-stream-ck").toString
    frame.repartition(4).write.format("gavro")
      .option("schema", "request_log").mode("overwrite").save(dir)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("gavro")
      .option("schema", "request_log").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    val n = frame.count()
    assert(seen.size == n)
    // more files land and are consumed — the watermark sits at the end of
    // an archive that is now entirely small files
    frame.limit(20).write.format("gavro")
      .option("schema", "request_log").mode("append").save(dir)
    val qm = start()
    qm.processAllAvailable()
    qm.stop()
    assert(seen.size == n + 20)
    // the archive is optimized while the stream is DOWN: the consumed
    // watermark file is absorbed — the durable .absorbed manifest
    // translates it, so the restart consumes NOTHING old (the whole
    // absorbed set was covered) and ONLY what lands after
    assert(graft.sources.Gavro.optimize(dir).nonEmpty)
    val before = seen.size
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.size == before, // exactly-once: no re-delivery, no loss
      s"translation re-delivered ${seen.size - before} records")
    // and the stream keeps tailing the optimized archive
    frame.limit(7).write.format("gavro")
      .option("schema", "request_log").mode("append").save(dir)
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(seen.size == before + 7, s"post-optimize tail broken: ${seen.size}")
  }

  test("a straddled OPTIMIZE resumes mid-merged-file: unconsumed suffix exactly once") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("gavro-opt-mid").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-opt-mid-ck").toString
    (0 until 4).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    // adopt the hand-placed files into a commit log (optimize requires one)
    graft.sources.Gavro.commitBatch(dir,
      (0 until 4).map(i => f"part-$i%05d.gavro"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    assert(seen.asScala.toSeq.sorted == (0L to 3L), seen.toString)
    // six more files land UNCONSUMED, then the whole archive (consumed
    // prefix + unconsumed tail) is merged into one file: the watermark
    // now points INSIDE the merged file
    (4 until 10).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    graft.sources.Gavro.commitBatch(dir,
      (4 until 10).map(i => f"part-$i%05d.gavro"))
    val merged = graft.sources.Gavro.optimize(dir)
    assert(merged.length == 1, merged.toString)
    // restart: the translation resumes at the first unconsumed
    // constituent's byte offset — records 4..9 exactly once, 0..3 never
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.asScala.toSeq.sorted == (0L to 9L),
      s"mid-file resume broke exactly-once: ${seen.asScala.toSeq.sorted}")
    // steady state: the offset is a plain listed name again
    writeFile(dir, "part-00099.gavro", Seq(99L), footer = true)
    graft.sources.Gavro.commitBatch(dir, Seq("part-00099.gavro"))
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(seen.asScala.toSeq.sorted == ((0L to 9L) :+ 99L), seen.toString)
  }

  test("a merge landing BELOW the live watermark delivers its unconsumed leaves exactly once") {
    import scala.jdk.CollectionConverters._
    // The nasty corner: the watermark file survives the optimize (too
    // big to be a candidate) while UNCONSUMED files above it merge into
    // a numeric output that sorts BELOW it. No single listed name can
    // express "that merge is consumed", so the offset's `thru` field
    // must carry it — delivery exactly once, no loss, no loop.
    val dir = java.nio.file.Files.createTempDirectory("gavro-below").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-below-ck").toString
    // the watermark file: 40 records → well over the tiny merge target
    writeFile(dir, "part-e0000000001-00000.gavro", 100L to 139L, footer = true)
    graft.sources.Gavro.commitBatch(dir, Seq("part-e0000000001-00000.gavro"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    assert(seen.asScala.toSeq.sorted == (100L to 139L), seen.toString)
    // two small UNCONSUMED epoch files land, then merge into part-00000,
    // which sorts below the epoch watermark
    writeFile(dir, "part-e0000000002-00000.gavro", Seq(7L), footer = true)
    writeFile(dir, "part-e0000000003-00000.gavro", Seq(8L), footer = true)
    graft.sources.Gavro.commitBatch(dir,
      Seq("part-e0000000002-00000.gavro", "part-e0000000003-00000.gavro"))
    val merged = graft.sources.Gavro.optimize(dir, targetBytes = 400L)
    assert(merged == Seq("part-00000.gavro"), merged.toString)
    assert(graft.sources.Gavro.listDataFiles(dir).map(_.getName).toSeq ==
      Seq("part-00000.gavro", "part-e0000000001-00000.gavro"))
    // restart: the merged file's leaves are delivered despite sorting
    // below the watermark...
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.asScala.toSeq.sorted == (Seq(7L, 8L) ++ (100L to 139L)),
      s"merge below watermark lost/duplicated: ${seen.asScala.toSeq.sorted}")
    // ...and only once: further triggers deliver nothing, later appends flow
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(seen.size == 42, s"re-delivery loop: ${seen.size}")
    writeFile(dir, "part-e0000000009-00000.gavro", Seq(9L), footer = true)
    graft.sources.Gavro.commitBatch(dir, Seq("part-e0000000009-00000.gavro"))
    val q4 = start()
    q4.processAllAvailable()
    q4.stop()
    assert(seen.asScala.toSeq.sorted == (Seq(7L, 8L, 9L) ++ (100L to 139L)),
      seen.toString)
  }

  test("a WAL-replayed end offset absorbed by OPTIMIZE replays exactly the original batch") {
    // Simulates the crash window Spark's v2 offset log creates: the end
    // offset was durably written, the batch never committed, and an
    // optimize absorbed the end-offset file while the stream was down.
    // planInputPartitions(start, end) must replay exactly the records of
    // (start, end] out of the merged file — no error, no over-read.
    val dir = java.nio.file.Files.createTempDirectory("gavro-replay").toString
    (0 until 4).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    graft.sources.Gavro.commitBatch(dir,
      (0 until 4).map(i => f"part-$i%05d.gavro"))
    val merged = graft.sources.Gavro.optimize(dir)
    assert(merged.length == 1)
    val stream = new graft.sources.GavroMicroBatchStream(
      dir, "system_metrics", Array("id"), Array.empty)
    val parts = stream.planInputPartitions(
      graft.sources.GavroStreamOffset("part-00001.gavro"),
      graft.sources.GavroStreamOffset("part-00002.gavro"))
    val factory = stream.createReaderFactory()
    val ids = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(0)
      r.close(); buf
    }.sorted.toSeq
    assert(ids == Seq(2L), s"replay of (part-00001, part-00002] got $ids")
    // and a replay whose END nothing covers still fails loudly
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(
        graft.sources.GavroStreamOffset("part-00001.gavro"),
        graft.sources.GavroStreamOffset("part-99999.gavro"))
    }
    assert(err.getMessage.contains("truncated or rewritten"), err.getMessage)
  }

  test("OPTIMIZE under a LIVE tail: the running stream drains everything exactly once") {
    import scala.jdk.CollectionConverters._
    // Not a restart scenario: the query stays RUNNING while the archive
    // is compacted beneath it. The trigger that follows the swap
    // translates the (absorbed) watermark mid-flight and the drain
    // continues — 24/7 ingestion with maintenance, the round-11 claim.
    val dir = java.nio.file.Files.createTempDirectory("gavro-live-opt").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-live-opt-ck").toString
    (0 until 20).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    graft.sources.Gavro.commitBatch(dir,
      (0 until 20).map(i => f"part-$i%05d.gavro"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("gavro")
      .option("schema", "system_metrics")
      .option("maxFilesPerTrigger", "3")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => seen.add(r.getLong(0)))
        Thread.sleep(150) // stretch the drain so the swap lands mid-flight
        ()
      }
      .start()
    try {
      // wait until the stream is mid-drain, then compact EVERYTHING —
      // consumed prefix and unconsumed tail merge into one file
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (seen.size < 6 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(seen.size >= 6, s"stream never got going: ${seen.size}")
      assert(graft.sources.Gavro.optimize(dir).nonEmpty)
      // the live query keeps draining across the swap
      q.processAllAvailable()
      assert(seen.asScala.toSeq.sorted == (0L until 20L),
        s"live-tail optimize broke the drain: ${seen.asScala.toSeq.sorted}")
      // and the post-swap tail still flows
      writeFile(dir, "part-00099.gavro", Seq(99L), footer = true)
      graft.sources.Gavro.commitBatch(dir, Seq("part-00099.gavro"))
      q.processAllAvailable()
      assert(seen.asScala.toSeq.sorted == ((0L until 20L) :+ 99L),
        seen.toString)
    } finally q.stop()
  }

  test("a watermark no optimize manifest covers still fails loudly (truncate)") {
    val dir = java.nio.file.Files.createTempDirectory("gavro-trunc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-trunc-ck").toString
    (0 until 3).foreach(i => writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong)))
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(df.count()); ()
      }
      .start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    assert(seen.get() == 3)
    // the watermark file is deleted OUTSIDE any optimize — no manifest
    // covers it, so silent continuation (skip or re-deliver) is ruled out
    assert(new java.io.File(dir, "part-00002.gavro").delete())
    val err = intercept[Exception] {
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("truncated or rewritten"))),
      causes(err).map(_.getMessage).mkString(" | "))
    // don't leak the intentional failure into later suites' shared-
    // session awaitAnyTermination
    spark.streams.resetTerminated()
  }

  test("vacuumManifests: chain pinning, floor honoring, covered continue, uncovered loud error") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("gavro-ret").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-ret-ck").toString
    val commits = new java.io.File(dir, "_graft_commits")
    def manifests(): Seq[String] = Option(commits.listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(_.endsWith(".absorbed")).sorted.toSeq
    (0 until 4).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    graft.sources.Gavro.commitBatch(dir,
      (0 until 4).map(i => f"part-$i%05d.gavro"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .start()
    def drain(): Unit = { val q = start(); q.processAllAvailable(); q.stop() }
    drain()
    assert(seen.asScala.toSeq.sorted == (0L to 3L))
    // first optimize: manifest A absorbs the four originals
    assert(graft.sources.Gavro.optimize(dir).nonEmpty)
    drain() // offset normalizes onto the merged (listed) name
    // two more files land and a second optimize CHAINS: merged1 + the new
    // files are absorbed by manifest B
    (4 until 6).foreach(i =>
      writeFile(dir, f"part-1$i%04d.gavro", Seq(i.toLong), footer = true))
    graft.sources.Gavro.commitBatch(dir,
      (4 until 6).map(i => f"part-1$i%04d.gavro"))
    drain()
    assert(graft.sources.Gavro.optimize(dir).nonEmpty)
    drain()
    assert(seen.asScala.toSeq.sorted == (0L to 5L), seen.toString)
    val Seq(ma, mb) = manifests()
    val cpA = ma.stripSuffix(".absorbed")
    val cpB = mb.stripSuffix(".absorbed")
    // floor at A: A is deletable by the floor but PINNED — B lists A's
    // merged output as a constituent; deleting A would break B's leaf
    // expansion. Nothing is deleted.
    assert(graft.sources.Gavro.vacuumManifests(dir, cpA) == Seq.empty)
    assert(manifests() == Seq(ma, mb))
    // floor at B: the whole chain is below the floor — both go.
    assert(graft.sources.Gavro.vacuumManifests(dir, cpB).sorted ==
      Seq(ma, mb).sorted)
    assert(manifests().isEmpty)
    // covered watermark (a listed name) continues exactly-once with zero
    // history, and the tail still flows
    val before = seen.size
    drain()
    assert(seen.size == before, s"retention re-delivered: ${seen.size - before}")
    writeFile(dir, "part-19999.gavro", Seq(9L), footer = true)
    graft.sources.Gavro.commitBatch(dir, Seq("part-19999.gavro"))
    drain()
    assert(seen.asScala.toSeq.sorted == (0L to 5L) :+ 9L, seen.toString)
    // a checkpoint whose watermark NEEDED a deleted manifest errs loudly
    val stream = new graft.sources.GavroMicroBatchStream(
      dir, "system_metrics", Array("id"), Array.empty)
    val newest = graft.sources.Gavro.listDataFiles(dir).last.getName
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(
        graft.sources.GavroStreamOffset("part-00001.gavro"),
        graft.sources.GavroStreamOffset(newest))
    }
    assert(err.getMessage.contains("truncated or rewritten"), err.getMessage)
  }

  test("protectPrefix: the surviving-watermark burst exists unprotected and is unreachable protected") {
    import scala.jdk.CollectionConverters._
    // Layout that reaches the ONE documented at-least-once corner: four
    // small consumed files plus a BIG consumed file that is not a merge
    // candidate (>= targetBytes), so an optimize absorbs the small
    // neighbors while the offset's watermark file itself survives.
    def build(): (String, java.util.concurrent.ConcurrentLinkedQueue[Long],
        () => Unit) = {
      val dir = java.nio.file.Files.createTempDirectory("gavro-prot").toString
      val ckpt = java.nio.file.Files.createTempDirectory("gavro-prot-ck").toString
      (0 until 4).foreach(i =>
        writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
      writeFile(dir, "part-00004.gavro", 100L until 600L, footer = true)
      graft.sources.Gavro.commitBatch(dir,
        (0 to 4).map(i => f"part-$i%05d.gavro"))
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def drain(): Unit = {
        val q = spark.readStream.format("gavro")
          .option("schema", "system_metrics").load(dir)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.select(col("id")).collect().foreach(r => seen.add(r.getLong(0))); ()
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      drain()
      assert(seen.asScala.toSeq.sorted ==
        ((0L until 4L) ++ (100L until 600L)), "baseline consume broke")
      (dir, seen, () => drain())
    }
    val target = 4096L // smalls qualify; the 500-record file does not
    def listed(dir: String): Seq[String] =
      graft.sources.Gavro.listDataFiles(dir).map(_.getName).toSeq

    // UNPROTECTED: the corner is real — the merged output is re-delivered
    // once (at-least-once by design, never loss), documenting exactly the
    // burst protectPrefix exists to kill.
    val (d1, s1, drain1) = build()
    assert(graft.sources.Gavro.optimize(d1, target).nonEmpty)
    assert(listed(d1).contains("part-00004.gavro"), "watermark was absorbed")
    val before1 = s1.size
    drain1()
    assert(s1.size == before1 + 4,
      s"expected the one-shot burst of the 4 merged records, got +${s1.size - before1}")

    // PROTECTED, watermark would survive: the pass refuses to split the
    // consumed prefix — nothing merges, nothing re-delivers, the tail
    // still flows.
    val (d2, s2, drain2) = build()
    assert(graft.sources.Gavro.optimize(d2, target,
      protectPrefix = Seq("part-00004.gavro")).isEmpty)
    val before2 = s2.size
    drain2()
    assert(s2.size == before2, s"protected optimize re-delivered")
    writeFile(d2, "part-00005.gavro", Seq(7L), footer = true)
    graft.sources.Gavro.commitBatch(d2, Seq("part-00005.gavro"))
    drain2()
    assert(s2.asScala.toSeq.sorted ==
      ((0L until 4L) ++ Seq(7L) ++ (100L until 600L)))

    // PROTECTED, watermark absorbed: with a target big enough to take the
    // whole prefix INCLUDING the watermark file, protection lets the pass
    // proceed and the vanished-watermark translation stays exactly-once.
    val (d3, s3, drain3) = build()
    assert(graft.sources.Gavro.optimize(d3, 1L << 20,
      protectPrefix = Seq("part-00004.gavro")).nonEmpty)
    assert(!listed(d3).contains("part-00004.gavro"))
    val before3 = s3.size
    drain3()
    assert(s3.size == before3, s"vanished-watermark pass re-delivered")

    // MULTI-CONSUMER: a second consumer's floor sits at part-00002 while
    // this one's watermark is part-00004. Protecting only the FLOOR is
    // not enough — the floor file is absorbable, so the pass would
    // proceed and still split THIS consumer's prefix. Passing every
    // consumer's watermark runs the rule to fixpoint: part-00004
    // survives, so every bin at-or-below it is dropped and nothing
    // re-delivers for anyone.
    val (d4, s4, drain4) = build()
    assert(graft.sources.Gavro.optimize(d4, target,
      protectPrefix = Seq("part-00002.gavro", "part-00004.gavro")).isEmpty)
    val before4 = s4.size
    drain4()
    assert(s4.size == before4, s"multi-consumer protection re-delivered")
  }

  test("forced admission and ambiguous re-delivery surface as source metrics") {
    import scala.jdk.CollectionConverters._
    def metric(q: org.apache.spark.sql.streaming.StreamingQuery,
        name: String): Long =
      q.recentProgress.flatMap(p => p.sources.headOption)
        .flatMap(s => Option(s.metrics).map(_.asScala.getOrElse(name, "0")))
        .map(_.toLong).foldLeft(0L)(math.max)

    // ---- forced admission: two merged outputs land below a live epoch
    // watermark; the first trigger after the OPTIMIZE must admit BOTH
    // despite maxBytesPerTrigger=1 — and says so in the source metrics.
    val d1 = java.nio.file.Files.createTempDirectory("gavro-metr1").toString
    val c1 = java.nio.file.Files.createTempDirectory("gavro-metr1-ck").toString
    writeFile(d1, "part-e0000000001-00000.gavro", 100L to 139L, footer = true)
    graft.sources.Gavro.commitBatch(d1, Seq("part-e0000000001-00000.gavro"))
    val seen1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start1() = spark.readStream.format("gavro")
      .option("schema", "system_metrics")
      .option("maxBytesPerTrigger", "1").load(d1)
      .writeStream.option("checkpointLocation", c1)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => seen1.add(r.getLong(0))); ()
      }
      .start()
    val q1 = start1(); q1.processAllAvailable(); q1.stop()
    assert(seen1.asScala.toSeq.sorted == (100L to 139L))
    (2 to 5).foreach(i =>
      writeFile(d1, f"part-e000000000$i%d-00000.gavro", Seq(i.toLong),
        footer = true))
    graft.sources.Gavro.commitBatch(d1,
      (2 to 5).map(i => f"part-e000000000$i%d-00000.gavro"))
    // target sized off the actual DATA section (binBytes counts dataEnd,
    // not file length) so the 4 equal small files pack as exactly two
    // 2-file bins — but still small enough to exclude the big watermark
    // file from candidacy
    val small = graft.sources.GavroFooter.read(
      new java.io.File(d1, "part-e0000000002-00000.gavro")).dataEnd
    val merged = graft.sources.Gavro.optimize(d1, targetBytes = small * 5 / 2)
    assert(merged.size >= 2, s"need >=2 merged bins, got $merged")
    val q2 = start1(); q2.processAllAvailable(); q2.stop()
    assert(seen1.asScala.toSeq.sorted == ((2L to 5L) ++ (100L to 139L)))
    assert(metric(q2, "forcedAdmissionFiles") >= 1,
      q2.recentProgress.map(_.sources.head.metrics).mkString(";"))
    assert(metric(q2, "forcedAdmissionTriggers") >= 1)
    assert(metric(q2, "ambiguousRedeliveredFiles") == 0) // this path is exact

    // ---- ambiguity: the surviving-watermark burst increments the
    // re-delivery counter (the WARN's machine-readable twin).
    val d2 = java.nio.file.Files.createTempDirectory("gavro-metr2").toString
    val c2 = java.nio.file.Files.createTempDirectory("gavro-metr2-ck").toString
    (0 until 4).foreach(i =>
      writeFile(d2, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    writeFile(d2, "part-00004.gavro", 100L until 600L, footer = true)
    graft.sources.Gavro.commitBatch(d2,
      (0 to 4).map(i => f"part-$i%05d.gavro"))
    val seen2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start2() = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(d2)
      .writeStream.option("checkpointLocation", c2)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => seen2.add(r.getLong(0))); ()
      }
      .start()
    val p1 = start2(); p1.processAllAvailable(); p1.stop()
    assert(graft.sources.Gavro.optimize(d2, 4096L).nonEmpty)
    val p2 = start2(); p2.processAllAvailable(); p2.stop()
    assert(metric(p2, "ambiguousRedeliveredFiles") >= 1,
      p2.recentProgress.map(_.sources.head.metrics).mkString(";"))
  }

  test("maintain: the one-call nightly job reads consumer checkpoints and runs the safe cycle") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("gavro-maint").toString
    val ckA = java.nio.file.Files.createTempDirectory("gavro-maint-a").toString
    val ckB = java.nio.file.Files.createTempDirectory("gavro-maint-b").toString
    // Stage the commits so B's mid-prefix position is DETERMINISTIC:
    // B drains while only files 0-1 exist-and-are-committed, the rest
    // are WRITTEN after the log exists (the first commit would otherwise
    // ADOPT any pre-existing data files) and committed later.
    (0 to 1).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    graft.sources.Gavro.commitBatch(dir,
      (0 to 1).map(i => f"part-$i%05d.gavro"))
    (2 until 4).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    writeFile(dir, "part-00004.gavro", 100L until 600L, footer = true)
    def consumer(ckpt: String,
        seen: java.util.concurrent.ConcurrentLinkedQueue[Long]) =
      spark.readStream.format("gavro").option("schema", "system_metrics")
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().foreach(r => seen.add(r.getLong(0))); ()
        }
        .start()
    val seenA = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val seenB = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drainA(): Unit = { val q = consumer(ckA, seenA); q.processAllAvailable(); q.stop() }
    val qb1 = consumer(ckB, seenB); qb1.processAllAvailable(); qb1.stop()
    assert(seenB.asScala.toSeq.sorted == Seq(0L, 1L), seenB.toString)
    assert(graft.sources.Gavro.checkpointPosition(ckB, dir)
      .exists(_.last == "part-00001.gavro"))
    graft.sources.Gavro.commitBatch(dir,
      (2 to 4).map(i => f"part-$i%05d.gavro"))
    drainA()
    assert(seenA.asScala.toSeq.sorted == ((0L until 4L) ++ (100L until 600L)))

    // ---- maintain #1: B's mid-prefix watermark + A's surviving big file
    // => nothing may merge; no retention floor yet (thru empty everywhere)
    val r1 = graft.sources.Gavro.maintain(dir, Seq(ckA, ckB),
      targetBytes = 4096L)
    assert(r1.merged.isEmpty, r1.toString)
    assert(r1.protectedWatermarks.size == 2, r1.toString)
    assert(r1.thruFloor.isEmpty && r1.manifestsDeleted.isEmpty)
    // both consumers continue exactly-once
    val beforeA = seenA.size
    drainA()
    assert(seenA.size == beforeA)
    val qb2 = consumer(ckB, seenB); qb2.processAllAvailable(); qb2.stop()
    assert(seenB.asScala.toSeq.sorted == ((0L until 4L) ++ (100L until 600L)),
      s"B lost/duplicated: ${seenB.size}")

    // ---- phase 2: more files, both consume, then a REAL merge under
    // protection (every watermark file absorbed => pass proceeds)
    (5 to 7).foreach(i =>
      writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong), footer = true))
    graft.sources.Gavro.commitBatch(dir,
      (5 to 7).map(i => f"part-$i%05d.gavro"))
    drainA()
    val qb3 = consumer(ckB, seenB); qb3.processAllAvailable(); qb3.stop()
    val r2 = graft.sources.Gavro.maintain(dir, Seq(ckA, ckB),
      targetBytes = 1L << 20)
    assert(r2.merged.nonEmpty, r2.toString)
    // a post-merge batch makes both consumers' thru cross the swap
    writeFile(dir, "part-10008.gavro", Seq(8L), footer = true)
    graft.sources.Gavro.commitBatch(dir, Seq("part-10008.gavro"))
    drainA()
    val qb4 = consumer(ckB, seenB); qb4.processAllAvailable(); qb4.stop()
    assert(seenA.asScala.toSeq.sorted ==
      ((0L until 4L) ++ (5L to 8L) ++ (100L until 600L)), "A diverged")
    assert(seenB.asScala.toSeq.sorted == seenA.asScala.toSeq.sorted, "B diverged")

    // ---- maintain #3: both thru floors present => manifest retention
    // fires; vacuum (grace 0) reclaims the absorbed originals' bytes
    val r3 = graft.sources.Gavro.maintain(dir, Seq(ckA, ckB),
      targetBytes = 4096L, graceMs = 0L)
    assert(r3.thruFloor.nonEmpty, r3.toString)
    assert(r3.manifestsDeleted.nonEmpty, r3.toString)
    assert(r3.orphansDeleted.nonEmpty, r3.toString)
    // and the world still works: one more file, both consumers, once each
    writeFile(dir, "part-10009.gavro", Seq(9L), footer = true)
    graft.sources.Gavro.commitBatch(dir, Seq("part-10009.gavro"))
    val a0 = seenA.size
    drainA()
    assert(seenA.size == a0 + 1)
    val qb5 = consumer(ckB, seenB); qb5.processAllAvailable(); qb5.stop()
    assert(seenB.asScala.toSeq.sorted == seenA.asScala.toSeq.sorted)

    // legacy count-based checkpoint offsets resolve through the table
    // listing, so pre-name-watermark consumers stay protected too
    val legacy = java.nio.file.Files.createTempDirectory("gavro-maint-leg").toFile
    new java.io.File(legacy, "offsets").mkdirs()
    new java.io.File(legacy, "commits").mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(legacy, "offsets/0").toPath, "v1\n{}\n{\"files\":2}")
    java.nio.file.Files.writeString(
      new java.io.File(legacy, "commits/0").toPath, "{}")
    val listed2 = graft.sources.Gavro.listDataFiles(dir)
    assert(graft.sources.Gavro.checkpointPosition(legacy.toString, dir)
      .exists(_.last == listed2(1).getName))

    // a mistyped checkpoint path fails LOUDLY — silently dropping a
    // consumer from the protect set would be the worst possible default
    intercept[IllegalArgumentException] {
      graft.sources.Gavro.maintain(dir, Seq("/no/such/checkpoint"))
    }
    // an EXISTING directory that is not a streaming checkpoint (e.g.
    // the parent of the real one) is equally loud — only a truly empty
    // dir counts as a configured-but-unstarted consumer
    val notCkpt = java.nio.file.Files
      .createTempDirectory("gavro-maint-notck").toFile
    new java.io.File(notCkpt, "queryA").mkdirs()
    intercept[IllegalArgumentException] {
      graft.sources.Gavro.maintain(dir, Seq(notCkpt.getAbsolutePath))
    }
    // ...but a configured-yet-unstarted consumer (dir exists, Spark has
    // written nothing) must NOT abort the nightly job for everyone; it
    // conservatively blocks manifest retention until it commits
    val unstarted = java.nio.file.Files
      .createTempDirectory("gavro-maint-new").toString
    val r4 = graft.sources.Gavro.maintain(dir, Seq(ckA, ckB, unstarted))
    assert(r4.thruFloor.isEmpty, r4.toString)

  }

  test("maxBytesPerTrigger admits at least one file and bounds each batch") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("gavro-bpb").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-bpb-ck").toString
    (0 until 6).foreach(i => writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong)))
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream.format("gavro")
      .option("schema", "system_metrics")
      // 1 byte: below any single file's size — the at-least-one-file
      // progress guarantee is what keeps an oversized file from wedging
      // the stream forever.
      .option("maxBytesPerTrigger", "1")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count().toInt); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.sum == 6, sizes.mkString(","))
    assert(sizes.forall(_ == 1), s"byte cap admitted >1 file: $sizes")
  }
}
