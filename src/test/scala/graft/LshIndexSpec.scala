package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, LshIndex}
import graft.sources.Tables

/** The materialized MinHash-LSH dedup index: persisted round-trip of
  * signatures and band rows, build-once reuse under the pointer
  * protocol, probe ≡ the in-query incremental rebuild, and band-sliced
  * file pruning on the bands table. */
class LshIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  test("persisted sigs and bands round-trip exactly") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_rt").toString
    LshIndex.buildAndWrite(docs, dir)
    val inMem = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("sig")).toVector).toMap
    val onDisk = LshIndex.loadSigs(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("sig")).toVector).toMap
    assert(onDisk == inMem)
    assert(inMem.valuesIterator.forall(_.length == 12))
    val bandsMem = Dedup.bands(Dedup.minhashSignatures(docs)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band_idx"),
        r.getAs[String]("band_key"))).toSet
    val bandsDisk = LshIndex.loadBands(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band_idx"),
        r.getAs[String]("band_key"))).toSet
    assert(bandsDisk == bandsMem)
    assert(bandsMem.size == inMem.size * 6)
  }

  test("ensure builds once; probe equals the in-query incremental rebuild") {
    val dir = LshIndex.ensure(spark, sfDir)
    val marker = new java.io.File(dir, "bands")
      .listFiles().filter(_.getName.endsWith(".gavro")).head
    val mtime = marker.lastModified()
    assert(LshIndex.ensure(spark, sfDir) == dir)
    assert(marker.lastModified() == mtime)
    val probed = LshIndex.probeNewBatch(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard")))
    val rebuilt = Dedup.minhashIncremental(Dedup.nearCorpus(
        Tables.documents(spark, sfDir))).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard")))
    assert(probed.nonEmpty)
    assert(probed.sorted.sameElements(rebuilt.sorted))
    // every emitted pair touches the new batch — old×old never re-derived
    assert(probed.forall(_._2 >= LshIndex.NewFrom))
  }

  test("appended index: two commits per table, fully-materialized probe equals the union probe") {
    val dir = LshIndex.ensureAppended(spark, sfDir)
    def commits(table: String) = new java.io.File(s"$dir/$table",
        graft.sources.Gavro.CommitsDir)
      .listFiles().map(_.getName).count(_.endsWith(".commit"))
    assert(commits("sigs") == 2 && commits("bands") == 2)
    assert(LshIndex.ensureAppended(spark, sfDir) == dir) // idempotent
    assert(commits("sigs") == 2 && commits("bands") == 2)
    val appended = LshIndex.probeAppended(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard")))
    val unioned = LshIndex.probeNewBatch(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard")))
    assert(appended.nonEmpty)
    assert(appended.sorted.sameElements(unioned.sorted))
  }

  test("dedup-on-ingest loop: one sketch per batch, anti-join filter, append survivors, next batch sees them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // a private index copy (the loop mutates it)
    val dir = java.nio.file.Files.createTempDirectory("lsh_ingest").toString
    LshIndex.buildAndWrite(docs, dir)
    val base = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val someId = base.keys.min
    val floor = 50000L
    val rejected = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val accepted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val sketchBudgetBroken =
      new java.util.concurrent.atomic.AtomicReference[String](null)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        val sketchesBefore = graft.ops.Dedup.sketchPlans.get
        // probe AND keep the batch's signatures: the append below reuses
        // them, so the whole loop iteration sketches the batch once
        val (pairs, sigs) = LshIndex.probeBatchKeepSigs(spark, dir, b, floor)
        // any batch doc colliding with the standing corpus at
        // est_jaccard >= 0.5 is a dup and is dropped — as a FRAME, so the
        // filter below is an anti-join, not a driver-side isin (the dup
        // set is unbounded at scale)
        val dupIds = pairs.filter(col("est_jaccard") >= 0.5)
          .select(col("doc_b").as("doc_id")).distinct()
          .localCheckpoint(true)
        dupIds.collect().foreach(r => rejected.add(r.getLong(0)))
        val fresh = b.join(dupIds, Seq("doc_id"), "left_anti")
        fresh.select(col("doc_id")).collect()
          .foreach(r => accepted.add(r.getLong(0)))
        // append survivors WITHOUT re-sketching: filter the probe's
        // checkpointed signatures to the survivors and fold those in
        val freshSigs = sigs.join(dupIds, Seq("doc_id"), "left_anti")
        if (!freshSigs.isEmpty) LshIndex.appendSigs(spark, dir, freshSigs)
        val sketched = graft.ops.Dedup.sketchPlans.get - sketchesBefore
        if (sketched != 1 && sketchBudgetBroken.get == null)
          sketchBudgetBroken.set(s"batch ran $sketched sketch passes, want 1")
        b.unpersist(); ()
      }
      .start()
    // batch 1: one near-dup of a corpus doc (first token dropped) + one
    // genuinely novel doc
    val nearDup = base(someId).substring(base(someId).indexOf(' ') + 1)
    val novel = "zzqx glorp wibble frotz yoik snarf blib quux nargle veep"
    input.addData((floor + 1, nearDup), (floor + 2, novel))
    q.processAllAvailable()
    assert(rejected.asScala.toSet == Set(floor + 1), rejected.toString)
    assert(accepted.asScala.toSet == Set(floor + 2))
    // nightly maintenance runs MID-STREAM between triggers: compaction
    // must be invisible to the loop (no failed trigger, same answers)
    LshIndex.maintain(spark, dir)
    // batch 2: a near-dup OF THE BATCH-1 SURVIVOR — only catchable
    // because the survivor was appended to the persisted index (and
    // survived the compaction above)
    val novelDup = novel.substring(novel.indexOf(' ') + 1)
    input.addData((floor + 3, novelDup))
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"trigger failed: ${q.exception}")
    q.stop()
    assert(rejected.asScala.toSet == Set(floor + 1, floor + 3),
      s"cross-batch dup not caught: $rejected")
    assert(accepted.asScala.toSet == Set(floor + 2))
    assert(sketchBudgetBroken.get == null, s"${sketchBudgetBroken.get}")
  }

  test("maintain compacts a living index: logs collapse, occupancy merges, probe unchanged") {
    import graft.sources.{Gavro, GavroFooter}
    val dir = java.nio.file.Files.createTempDirectory("lsh_maint").toString
    val documents = Tables.documents(spark, sfDir)
    LshIndex.buildAndWrite(docs, dir)
    // the planted batch folded in as THREE separate appends — three
    // commits per table, three occupancy rows per repeatedly-touched
    // bucket, band slots scattered over three file generations
    val planted = graft.ops.Dedup.nearCorpus(documents)
      .filter(col("doc_id") >= LshIndex.NewFrom)
    (0 until 3).foreach(r => LshIndex.appendBatch(spark, dir,
      planted.filter(pmod(col("doc_id"), lit(3)) === r)))
    def probe() = LshIndex.probeMaterialized(spark, dir, LshIndex.NewFrom)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"))).toSeq
    def occRows() = LshIndex.loadBuckets(spark, dir).count()
    val before = probe()
    val occBefore = occRows()
    assert(before.nonEmpty)
    assert(Gavro.commitRecordsSinceCheckpoint(s"$dir/buckets") == 4) // build + 3
    LshIndex.maintain(spark, dir)
    // same answer from the compacted artifact
    assert(probe() == before)
    // every log collapsed to its checkpoint
    Seq("sigs", "bands", "buckets").foreach(t =>
      assert(Gavro.commitRecordsSinceCheckpoint(s"$dir/$t") == 0, t))
    // occupancy merged back to ONE row per bucket
    val occAfter = occRows()
    assert(occAfter < occBefore, s"$occBefore -> $occAfter")
    assert(LshIndex.loadBuckets(spark, dir)
      .groupBy(col("band_idx"), col("band_key")).count()
      .agg(max(col("count"))).first().getLong(0) == 1)
    // the bands layout is one-slot-per-file again (footer min == max)
    val bandFiles = Gavro.listDataFiles(s"$dir/bands")
    assert(bandFiles.nonEmpty)
    assert(bandFiles.forall { f =>
      val s = GavroFooter.read(f).stats("slot")
      s.min == s.max
    })
    // a further append then probes correctly against the compacted base
    LshIndex.appendBatch(spark, dir, planted
      .select((col("doc_id") + 1000).as("doc_id"), col("text")))
    assert(LshIndex.probeMaterialized(spark, dir, LshIndex.NewFrom)
      .count() > before.length)
  }

  test("append WAL marker: a crashed append fails probes loudly; a live one does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lsh_wal").toString
    LshIndex.buildAndWrite(docs, dir)
    val floor = 50000L
    val delta = Seq((floor + 1L,
      "zzqx glorp wibble frotz yoik snarf blib quux nargle veep"))
      .toDF("doc_id", "text")
    val marker = new java.io.File(dir, "_graft_append_inflight")
    // a completed append leaves no marker behind
    LshIndex.appendBatch(spark, dir, delta)
    assert(!marker.exists, "completed append left its WAL marker")
    assert(LshIndex.probeBatch(spark, dir, delta
      .select((col("doc_id") + 1).as("doc_id"), col("text")), floor)
      .collect() != null)
    // a CRASHED append = a stale marker: the probe must fail loudly
    // (the occupancy rows it trusts may be missing the torn batch)
    graft.sources.Gavro.store.atomicReplace(marker, "0")
    assert(marker.setLastModified(
      System.currentTimeMillis() - LshIndex.AppendStallMs - 60000))
    val e = intercept[IllegalArgumentException] {
      LshIndex.probeBatch(spark, dir, delta, floor)
    }
    assert(e.getMessage.contains("torn"), e.getMessage)
    // …and an APPEND refuses over the crash evidence rather than burying
    // it (a replace-then-delete would hide the tear forever)
    val e2 = intercept[IllegalStateException] {
      LshIndex.appendBatch(spark, dir, delta)
    }
    assert(e2.getMessage.contains("torn"), e2.getMessage)
    // a YOUNG marker is an append legitimately in flight — probes
    // proceed, a SECOND append refuses (one appender at a time)
    graft.sources.Gavro.store.atomicReplace(marker, "1")
    LshIndex.probeBatch(spark, dir, delta, floor).collect()
    val e3 = intercept[IllegalStateException] {
      LshIndex.appendBatch(spark, dir, delta)
    }
    assert(e3.getMessage.contains("in flight"), e3.getMessage)
    assert(marker.delete())
    // with the marker gone, appends run again
    LshIndex.appendBatch(spark, dir, delta
      .select((col("doc_id") + 10).as("doc_id"), col("text")))
    assert(!marker.exists)
  }

  test("incremental maintain compacts only the grown slots; untouched files keep their names") {
    import spark.implicits._
    import graft.sources.{Gavro, GavroFooter}
    val dir = java.nio.file.Files.createTempDirectory("lsh_incr").toString
    LshIndex.buildAndWrite(docs, dir) // one file per slot
    val floor = 50000L
    val someText = docs.orderBy(col("doc_id")).limit(1).collect()(0)
      .getAs[String]("text")
    // a 2-doc append touches ≤12 of 48 slots — growth concentrates there
    val delta = Seq(
      (floor + 1, someText.substring(someText.indexOf(' ') + 1)),
      (floor + 2, "zzqx glorp wibble frotz yoik snarf blib quux nargle veep"))
      .toDF("doc_id", "text")
    LshIndex.appendBatch(spark, dir, delta)
    def bandFiles(): Map[String, Int] =
      Gavro.listDataFiles(s"$dir/bands").map { f =>
        val s = GavroFooter.read(f).stats("slot")
        val (lo, hi) = (s.min.asInstanceOf[Number].longValue,
          s.max.asInstanceOf[Number].longValue)
        assert(lo == hi, s"${f.getName} spans slots")
        f.getName -> lo.toInt
      }.toMap
    val before = bandFiles()
    val hotSlots = before.groupBy(_._2).filter(_._2.size >= 2).keySet
    assert(hotSlots.nonEmpty && hotSlots.size <= 12, s"$hotSlots")
    val coldFiles = before.filterNot(f => hotSlots(f._2)).keySet
    assert(coldFiles.nonEmpty, "append touched every slot — test needs a smaller delta")
    def probe() = LshIndex.probeMaterialized(spark, dir, floor).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
    val pairsBefore = probe()
    assert(pairsBefore.nonEmpty)
    LshIndex.maintainIncremental(spark, dir)
    val after = bandFiles()
    // untouched slots' files survive byte-identically under their names
    assert(coldFiles.subsetOf(after.keySet),
      s"cold files rewritten: ${coldFiles -- after.keySet}")
    // grown slots collapsed to one file each
    hotSlots.foreach { s =>
      assert(after.count(_._2 == s) == 1, s"slot $s not compacted") }
    // total work was slot-local: files written == hot slots
    assert(after.size == before.size - hotSlots.size)
    // logs folded, tripwire intact, answers unchanged
    Seq("sigs", "bands", "buckets").foreach(t =>
      assert(Gavro.commitRecordsSinceCheckpoint(s"$dir/$t") == 0, t))
    assert(probe() == pairsBefore)
    // occupancy merged only where it grew; still ≤ one row per bucket
    assert(LshIndex.loadBuckets(spark, dir)
      .groupBy(col("band_idx"), col("band_key")).count()
      .agg(max(col("count"))).first().getLong(0) == 1)
    // a second incremental pass with nothing grown is a no-op: names stable
    LshIndex.maintainIncremental(spark, dir)
    assert(bandFiles() == after)
  }

  test("slot pruning: a small probe opens few band files, flat as the corpus grows") {
    import spark.implicits._
    // Same collision-free filler as the shuffle-bytes test: the probe's
    // ANSWER is identical across corpora while the persisted index grows.
    def filler(n: Int) = spark.range(n)
      .select((col("id") + 100000).as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, 39), " +
          "i -> substring(md5(concat(cast(id as string), '-', cast(i as string))), 1, 8)))")
          .as("text"))
    val floor = 10000000L
    val someText = docs.orderBy(col("doc_id")).limit(1).collect()(0)
      .getAs[String]("text")
    // a 2-doc delta — the serve-trigger shape file pruning exists for:
    // its band rows touch ≤ 12 of the 6·SaltM layout slots
    val delta = Seq(
      (floor + 1, someText.substring(someText.indexOf(' ') + 1)),
      (floor + 2, "zzqx glorp wibble frotz yoik snarf blib quux nargle veep"))
      .toDF("doc_id", "text").localCheckpoint(true)
    def probeOpens(fillerDocs: Int): (Int, Int, Set[(Long, Long)]) = {
      val corpus = docs.unionByName(filler(fillerDocs)).localCheckpoint(true)
      val dir = java.nio.file.Files
        .createTempDirectory(s"lsh_prune_$fillerDocs").toString
      LshIndex.buildAndWrite(corpus, dir)
      val total = new java.io.File(dir, "bands").listFiles()
        .count(_.getName.endsWith(".gavro"))
      val (pairs, opened) = graft.sources.Gavro.trackFileOpens {
        LshIndex.probeBatch(spark, dir, delta, floor).collect()
          .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      }
      (opened.count(_.contains("/bands/")), total, pairs)
    }
    val (openedSmall, totalSmall, pairsSmall) = probeOpens(2000)
    val (openedBig, totalBig, pairsBig) = probeOpens(8000)
    assert(pairsSmall.nonEmpty && pairsSmall == pairsBig,
      "filler must not change the probe answer")
    // the salted build lays out one slot per file
    assert(totalSmall == 48 && totalBig == 48, s"$totalSmall/$totalBig files")
    // a 2-doc probe touches ≤ 12 slots — well under half the table
    assert(openedSmall > 0 && openedSmall <= 12,
      s"probe opened $openedSmall/$totalSmall band files")
    // and growing the corpus 4× must not widen the probe's file set
    assert(openedBig <= openedSmall,
      s"probe file opens grew with the corpus: $openedSmall -> $openedBig")
  }

  test("probe shuffle bytes are O(delta): flat across corpus growth, far below recompute") {
    // Two standing corpora that differ ONLY in collision-free filler (40
    // unique md5 tokens per doc — no shared buckets with anything), so
    // the probe's ANSWER is identical while the persisted tables grow 4×.
    // The claim under test, in bytes not wall time: every exchange in the
    // probe plan carries O(delta), so total shuffle-write bytes must not
    // track corpus size — while the in-query recompute's must.
    def filler(n: Int) = spark.range(n)
      .select((col("id") + 100000).as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, 39), " +
          "i -> substring(md5(concat(cast(id as string), '-', cast(i as string))), 1, 8)))")
          .as("text"))
    val floor = 10000000L
    val delta = docs
      .select((col("doc_id") + floor).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      .localCheckpoint(true)
    def shuffled(body: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) { acc.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // task-end events are async; settle until the counter stops moving
        var last = -1L
        var stable = 0
        var polls = 0
        while (stable < 3 && polls < 50) {
          if (acc.get == last) stable += 1 else { stable = 0; last = acc.get }
          Thread.sleep(100); polls += 1
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      acc.get
    }
    def probeBytes(fillerDocs: Int): (Long, Set[(Long, Long)]) = {
      val corpus = docs.unionByName(filler(fillerDocs)).localCheckpoint(true)
      val dir = java.nio.file.Files.createTempDirectory(s"lsh_od_$fillerDocs")
        .toString
      LshIndex.buildAndWrite(corpus, dir)
      var pairs: Set[(Long, Long)] = Set.empty
      val bytes = shuffled {
        pairs = LshIndex.probeBatch(spark, dir, delta, floor).collect()
          .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      }
      (bytes, pairs)
    }
    val (smallBytes, smallPairs) = probeBytes(2000)
    val (bigBytes, bigPairs) = probeBytes(8000)
    assert(smallPairs.nonEmpty && smallPairs == bigPairs,
      "filler must not change the probe answer")
    assert(bigBytes < math.max(smallBytes * 3 / 2, smallBytes + 64 * 1024),
      s"probe shuffle grew with the corpus: $smallBytes -> $bigBytes bytes")
    // the recompute baseline DOES track corpus size — and dwarfs the probe
    val bigCorpus = docs.unionByName(filler(8000)).localCheckpoint(true)
    val recomputeBytes = shuffled {
      Dedup.minhashIncremental(bigCorpus.unionByName(delta), newFrom = floor)
        .write.format("noop").mode("overwrite").save()
    }
    assert(recomputeBytes > bigBytes * 2,
      s"expected recompute ($recomputeBytes B) >> probe ($bigBytes B)")
  }

  test("probe cap accounting matches the in-query rule at the exact boundary") {
    import spark.implicits._
    // One text shared by N standing docs and 1 arriving doc puts all six
    // of its buckets at exactly N+1 members: the mega-bucket cap must
    // evaluate over persisted occupancy + delta count TOGETHER, just as
    // the in-query window count does over the union. N+1 == MaxBucketSize
    // keeps the bucket; one more standing copy drops it — on BOTH paths.
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val floor = 50000L
    def standing(n: Long) = spark.range(n)
      .select(col("id").as("doc_id"), lit(t).as("text"))
    val delta = Seq((floor + 1L, t)).toDF("doc_id", "text")
    def probeOf(n: Long): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory(s"lsh_cap_$n").toString
      LshIndex.buildAndWrite(standing(n), dir)
      LshIndex.probeBatch(spark, dir, delta, floor).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
    }
    def rebuiltOf(n: Long): Seq[(Long, Long)] =
      Dedup.minhashIncremental(standing(n).unionByName(delta), floor)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        .toSeq
    val atCap = probeOf(Dedup.MaxBucketSize - 1L)
    assert(atCap.length == Dedup.MaxBucketSize - 1,
      s"bucket at exactly the cap must pair: ${atCap.length}")
    assert(atCap.toSet == rebuiltOf(Dedup.MaxBucketSize - 1L).toSet)
    val overCap = probeOf(Dedup.MaxBucketSize.toLong)
    assert(overCap.isEmpty, s"bucket over the cap must drop: $overCap")
    assert(rebuiltOf(Dedup.MaxBucketSize.toLong).isEmpty)
  }

  test("probe edge cases: empty delta, all-short-docs delta") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lsh_edge").toString
    LshIndex.buildAndWrite(docs, dir)
    // a serve trigger can legitimately receive an empty micro-batch
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LshIndex.probeBatch(spark, dir, empty, 50000L).collect().isEmpty)
    // docs under 3 tokens sketch to nothing — same as empty, no crash
    val short = Seq((50001L, "too short")).toDF("doc_id", "text")
    assert(LshIndex.probeBatch(spark, dir, short, 50000L).collect().isEmpty)
  }

  test("a probe touching >64 buckets answers exactly (key pushdown past the old IN cap)") {
    import spark.implicits._
    // A 20-doc delta touches ~120 buckets — past the pre-r15 64-value IN
    // cap (which silently dropped ALL record/block-level skipping for
    // such probes), within [[Gavro.InPushMax]]. The contract is the same
    // equality every probe path carries: pushed-keys plan ≡ the in-query
    // incremental rebuild.
    val floor = 50000L
    val sources = docs.orderBy(col("doc_id")).limit(10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val nearDups = sources.zipWithIndex.map { case ((_, t), i) =>
      (floor + i, t.substring(t.indexOf(' ') + 1)) }
    val novel = (0 until 10).map(i => (floor + 100 + i,
      (0 until 12).map(j => s"nv${i}x$j").mkString(" ")))
    val delta = (nearDups ++ novel).toSeq.toDF("doc_id", "text")
      .localCheckpoint(true)
    val touched = Dedup.bands(Dedup.minhashSignatures(delta))
      .select(col("band_idx"), col("band_key")).distinct().count()
    assert(touched > 64, s"delta only touches $touched buckets — grow it")
    val dir = java.nio.file.Files.createTempDirectory("lsh_bigin").toString
    LshIndex.buildAndWrite(docs, dir)
    val probed =
      LshIndex.probeBatch(spark, dir, delta, floor).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Double]("est_jaccard"))).toSet
    val rebuilt = Dedup.minhashIncremental(docs.unionByName(delta), floor)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"))).toSet
    assert(probed.nonEmpty && probed == rebuilt)
  }

  test("floor-aware occupancy: maintained buckets files sort by max_doc; a recent-floor scan skips blocks") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.Gavro
    val dir = java.nio.file.Files.createTempDirectory("lsh_floor").toString
    val documents = Tables.documents(spark, sfDir)
    LshIndex.buildAndWrite(docs, dir)
    val planted = graft.ops.Dedup.nearCorpus(documents)
      .filter(col("doc_id") >= LshIndex.NewFrom)
    (0 until 3).foreach(r => LshIndex.appendBatch(spark, dir,
      planted.filter(pmod(col("doc_id"), lit(3)) === r)))
    def probe() = LshIndex.probeMaterialized(spark, dir, LshIndex.NewFrom)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"))).toSeq
    val before = probe()
    assert(before.nonEmpty)
    // tiny blocks so the merged slot files carry MANY per-block stats —
    // at production block size the fixture table is single-block per file
    LshIndex.maintain(spark, dir, blockBytes = 512L)
    assert(probe() == before)
    // layout: every buckets file non-decreasing in max_doc (block footer
    // ranges are tight exactly when this holds)
    Gavro.listDataFiles(s"$dir/buckets").foreach { f =>
      val meta = graft.sources.GavroFooter.read(f)
      val ms = meta.blockStats.map(_("max_doc"))
      assert(ms.nonEmpty, s"${f.getName}: no per-block max_doc stats")
      ms.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.max.asInstanceOf[Number].longValue <=
            b.min.asInstanceOf[Number].longValue ||
            a.max.asInstanceOf[Number].longValue <=
              b.max.asInstanceOf[Number].longValue,
            s"${f.getName}: blocks not max_doc-ordered")
        case _ => ()
      }
    }
    // the probe's hot-bucket discovery shape: max_doc >= recent floor.
    // Post-maintain every slot file spans all history, so FILE stats
    // can't skip — the sorted blocks must.
    // Counted as BLOCKS (partition-shape-independent): split packing may
    // merge contiguous admitted blocks into one task, but the skip claim
    // here is about block admission, which plannedBlocks reports exactly.
    def partitions(d: org.apache.spark.sql.DataFrame): Long =
      d.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b }.head.scan
        .asInstanceOf[graft.sources.GavroScan].plannedBlocks
    val all = spark.read.format("gavro").option("schema", "lsh_buckets")
      .load(s"$dir/buckets").select(col("band_idx"), col("band_key"))
    val hot = spark.read.format("gavro").option("schema", "lsh_buckets")
      .load(s"$dir/buckets").filter(col("max_doc") >= LshIndex.NewFrom)
      .select(col("band_idx"), col("band_key"))
    val (totalBlocks, hotBlocks) = (partitions(all), partitions(hot))
    assert(totalBlocks > 48, s"need multi-block files, got $totalBlocks")
    assert(hotBlocks < totalBlocks / 2,
      s"recent-floor scan read $hotBlocks of $totalBlocks blocks")
    // and the skipped blocks hid nothing: row-exact vs an unpruned count
    assert(hot.count() == all.count() - spark.read.format("gavro")
      .option("schema", "lsh_buckets").load(s"$dir/buckets")
      .filter(col("max_doc") < LshIndex.NewFrom).count())
  }

  test("byte-aware incremental trigger: only slots with enough SMALL-file debt compact") {
    import spark.implicits._
    import graft.sources.{Gavro, GavroFooter}
    val dir = java.nio.file.Files.createTempDirectory("lsh_bytes").toString
    LshIndex.buildAndWrite(docs, dir) // base slot files: a few KB each
    def files(): Map[String, (Int, Long)] =
      Gavro.listDataFiles(s"$dir/bands").map { f =>
        f.getName -> (GavroFooter.read(f).stats("slot")
          .min.asInstanceOf[Number].intValue, Gavro.dataStore.length(f))
      }.toMap
    // the size frontier between the base slot files (thousands of rows
    // each) and the tiny per-trigger delta files appended below
    val baseMin = files().values.map(_._2).min
    val floor = 50000L
    val someText = docs.orderBy(col("doc_id")).limit(1).collect()(0)
      .getAs[String]("text")
    val delta = Seq(
      (floor + 1, someText.substring(someText.indexOf(' ') + 1)),
      (floor + 2, "zzqx glorp wibble frotz yoik snarf blib quux nargle veep"))
      .toDF("doc_id", "text")
    LshIndex.appendBatch(spark, dir, delta)
    val afterOne = files()
    assert(afterOne.values.exists(_._2 < baseMin),
      "delta files must undercut the base files for this test's frontier")
    // a small-file threshold BELOW every file size: nothing is debt, the
    // pass must be a byte-identical no-op even though the old COUNT rule
    // sees 2-file slots everywhere it appended
    LshIndex.maintainIncremental(spark, dir, smallFileBytes = 1L)
    assert(files() == afterOne, "no-debt pass must not rewrite anything")
    LshIndex.appendBatch(spark, dir, delta
      .select((col("doc_id") + 10).as("doc_id"), col("text")))
    val afterTwo = files()
    // with the frontier as the threshold, debt = the delta files only: a
    // slot compacts iff it collected TWO of them (the big base file alone
    // never counts, however many bytes it holds)
    val small = afterTwo.filter(_._2._2 < baseMin)
    val hotSlots = small.groupBy(_._2._1).filter(_._2.size >= 2).keySet
    assert(hotSlots.nonEmpty, "test needs slots with two small delta files")
    val coldFiles = afterTwo.filterNot(f => hotSlots(f._2._1)).keySet
    LshIndex.maintainIncremental(spark, dir, smallFileBytes = baseMin)
    val afterMaint = files()
    // exactly the over-budget slots compacted; every other file survives
    assert(coldFiles.subsetOf(afterMaint.keySet),
      s"cold files rewritten: ${coldFiles -- afterMaint.keySet}")
    hotSlots.foreach { s =>
      assert(afterMaint.count(_._2._1 == s) == 1, s"slot $s not compacted") }
    // answers unchanged through it all
    assert(LshIndex.probeMaterialized(spark, dir, floor).collect().nonEmpty)
  }

  test("band_idx footer stats slice the bands table by band") {
    val dir = LshIndex.ensure(spark, sfDir)
    val files = new java.io.File(dir, "bands").listFiles()
      .filter(_.getName.endsWith(".gavro")).sortBy(_.getName)
    assert(files.length > 1, "bands not range-partitioned")
    val preds = Seq(graft.sources.GavroPred("band_idx", "=", 0))
    val planned = files.flatMap(f => graft.sources.GavroSkip.planFile(f, preds))
    val all = files.flatMap(f => graft.sources.GavroSkip.planFile(f, Seq.empty))
    assert(planned.length < all.length,
      s"band slice planned ${planned.length}/${all.length}")
    assert(planned.nonEmpty)
  }

  test("over-cap slotKeys degrades to the flat pushdown pair, never a bare FilterExec") {
    // The r16 cliff: a slotKeys tree past Gavro.TreeLeafMax (any future
    // SaltM/NumBands bump) was rejected WHOLE by pushFilters, silently
    // losing file pruning, block skipping AND decode-time drops. The
    // degrade must instead push the flat `slot IN + band_key IN` pair —
    // equivalent on index data because slot = hash(band_key): a key only
    // ever lives in its own slot, so the cross terms the flat form
    // admits match nothing.
    val dir = LshIndex.ensure(spark, sfDir)
    val raw = spark.read.format("gavro").option("schema", "lsh_bands")
      .load(s"$dir/bands").select(col("slot"), col("band_key")).distinct()
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val bySlot = raw.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, a) => s -> a.map(_._2).sorted.toSeq }
    // 12 touched slots, each's keys split into 6 entries → 72 entries =
    // 144 leaves, past the 128 cap; the MERGED 12-entry form stays under
    // it and is the semantic reference.
    val touched = bySlot.zipWithIndex.collect {
      case ((s, ks), i) if i % 4 == 0 && ks.length >= 6 => s -> ks.take(12)
    }.take(12)
    assert(touched.length == 12, s"fixture holds ${touched.length} wide slots")
    val overCap = touched.flatMap { case (s, ks) =>
      ks.grouped(math.max(1, ks.length / 6)).map(s -> _).toSeq
    }
    assert(2 * overCap.length > graft.sources.Gavro.TreeLeafMax,
      s"${overCap.length} entries do not exceed the cap")
    def rows(sk: Seq[(Int, Seq[String])]) =
      LshIndex.loadBands(spark, dir, slotKeys = Some(sk))
    val want = rows(touched).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val df = rows(overCap)
    // Full pushdown survives the degrade: both flat conjuncts serialize
    // into the scan, so no FilterExec remains above it…
    assert(df.queryExecution.executedPlan.collect {
      case fe: org.apache.spark.sql.execution.FilterExec => fe }.isEmpty,
      "over-cap slotKeys left a post-scan FilterExec")
    // …file-level pruning survives (12 of the 48 slot files open)…
    val (got, opened) = graft.sources.Gavro.trackFileOpens {
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    }
    val bandOpens = opened.count(_.contains("/bands/"))
    assert(bandOpens <= touched.length,
      s"flat degrade opened $bandOpens band files for ${touched.length} slots")
    // …and the answer is exactly the tree form's.
    assert(got == want && got.nonEmpty)
  }
}
