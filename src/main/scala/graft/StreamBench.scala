package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput harness — measures what the KPI micro-batch path
  * sustains on this machine, against the reference's published capacity
  * target (BASELINE.md: 4,000 events/sec with 10 s micro-batches).
  *
  * A `rate` source generates events at the requested rate; they are mapped
  * onto the engine's event schema and driven through the SAME
  * `Frames.kpiFrame` builder the correctness oracle verifies (watermark +
  * sliding window + multi-agg), into a noop sink in update mode. The
  * summary reports input vs processed rows/sec and batch durations from
  * `StreamingQueryProgress` — "keeping up" means processed ≥ input and
  * batch duration below the trigger interval.
  *
  * A second mode drives the `transformWithState` session tracker
  * (RocksDB state store, event-time timers) — the stateful-processor
  * throughput number, with per-user state writes on every event.
  *
  * A third mode drives the `transformWithState` + `MapState` top-k
  * leaderboard — per-delta point reads/writes against RocksDB map state
  * plus a per-group member scan each batch.
  *
  * A fourth mode measures END-TO-END FRESHNESS through the full serving
  * pipeline — rate source → kpiFrame → foreachBatch KvSink → RESP wire
  * (in-JVM protocol-accurate stub) → fetch-on-notify WebSocket push → a
  * raw RFC 6455 client: for every received `metrics` frame, freshness =
  * client receive wall-time − the snapshot's `updatedAt` (the KPI
  * window's end, i.e. the newest event time the snapshot can reflect).
  * Reported as p50/p99 at BOTH the reference's 10 s trigger and a 1 s
  * trigger, against the PRD's <60 s dashboard-freshness target
  * (reference: docs/prd.md:50-52).
  *
  * Usage: sbt "runMain graft.StreamBench [rowsPerSecond] [seconds] [kpi|sessions|leaderboard|freshness]"
  *        (defaults 100000 eps for 30 s ≈ 25× the reference target)
  */
object StreamBench {

  /** The canonicality stamp ([[Canonical]] — the shared gate): streaming
    * latency tails are even more contention-sensitive than batch wall
    * time, so a record without this flag cannot be compared
    * like-for-like across rounds. */
  // SHA captured at class-init (= launch), not at stamp time: an edit
  // landing mid-run must not relabel the measured code.
  private val launchSha = Canonical.gitSha()

  private def canonicalStamp(start: Array[Double]): String =
    s""""loadavg_start":[${start.mkString(",")}],""" +
      s""""loadavg_end":[${Canonical.readLoadavg().mkString(",")}],""" +
      s""""canonical":${Canonical.isCanonical(start)},""" +
      s""""git_sha":"$launchSha""""

  def main(args: Array[String]): Unit = {
    val eps = args.headOption.map(_.toInt).getOrElse(100000)
    val runSecs = args.lift(1).map(_.toInt).getOrElse(30)
    val mode = args.lift(2).getOrElse("kpi")
    val loadavgStart = Canonical.readLoadavg()
    val spark = Session.local("graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "freshness") {
      freshness(spark, eps, runSecs, loadavgStart); spark.stop(); return
    }

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", eps.toString)
      .option("numPartitions", "8")
      .load()

    val sink = mode match {
      case "sessions" =>
        import spark.implicits._
        // transformWithState requires the RocksDB provider (multiple
        // column families: value state + timers)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        graft.streaming.SessionTracker(
          rate.select(
              pmod(col("value"), lit(50000)).as("userId"),
              col("timestamp").as("ts"),
              (pmod(col("value"), lit(1000)) / lit(10.0)).as("amount"))
            .withWatermark("ts", "5 seconds")
            .as[graft.streaming.SessionTracker.Ev],
          gapMs = 10000L)
          .toDF()
          .writeStream.format("noop").outputMode("append")
      case "leaderboard" =>
        import spark.implicits._
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // 64 groups × 10k members: every delta is a MapState point
        // read+write; every batch re-scans arriving groups' members.
        graft.streaming.Leaderboard(
          rate.select(
              concat(lit("g"), pmod(col("value"), lit(64))).as("group"),
              concat(lit("m"), pmod(col("value"), lit(640000))).as("member"),
              (pmod(col("value"), lit(1000)) / lit(10.0)).as("delta"))
            .as[graft.streaming.Leaderboard.Score],
          k = 10)
          .toDF()
          .writeStream.format("noop").outputMode("update")
      case _ =>
        val events = rate.select(
          col("value").as("event_id"),
          col("timestamp").as("ts"),
          pmod(col("value"), lit(100000)).as("user_id"),
          // mix of the event types the KPI union consumes
          when(pmod(col("value"), lit(4)) === 0, "purchase")
            .when(pmod(col("value"), lit(4)) === 1, "signup")
            .when(pmod(col("value"), lit(4)) === 2, "error")
            .otherwise("click").as("event_type"),
          (pmod(col("value"), lit(1000)) / lit(10.0)).as("value"),
          lit("{}").as("props"))
        graft.ops.Frames.kpiFrame(events)
          .writeStream.format("noop").outputMode("update")
    }
    val query = sink.trigger(Trigger.ProcessingTime("1 second")).start()
    Thread.sleep(runSecs * 1000L)
    val progress = query.recentProgress.toList
    query.stop()
    spark.stop()

    // Drop the warm-up batch (plan compile + codegen) and empty ticks.
    val batches = progress.filter(p => p.numInputRows > 0).drop(1)
    if (batches.isEmpty) { println("""{"error":"no batches"}"""); return }
    val durs = batches.map(_.batchDuration.toDouble).sorted
    def pct(p: Double) = durs(math.min(durs.length - 1, (p * durs.length).toInt))
    val totalRows = batches.map(_.numInputRows).sum
    val procRps = batches.map(_.processedRowsPerSecond).sum / batches.length
    val inRps = batches.map(_.inputRowsPerSecond).sum / batches.length
    // Keeping up = draining as fast as the source produces (no backlog
    // growth). Batch duration carries a ~1 s fixed floor (32-partition
    // shuffle + state-store commits), which bounds LATENCY, not throughput.
    val keepingUp = procRps >= inRps * 0.95
    println(
      s"""{"metric":"stream_${mode}_eps","target_eps":$eps,"run_secs":$runSecs,""" +
      s""""batches":${batches.length},"total_rows":$totalRows,""" +
      s""""avg_input_rps":${inRps.round},"avg_processed_rps":${procRps.round},""" +
      s""""batch_ms_p50":${pct(0.5).round},"batch_ms_p95":${pct(0.95).round},""" +
      s""""batch_ms_max":${durs.last.round},""" +
      s""""keeping_up":$keepingUp,${canonicalStamp(loadavgStart)}}""")
  }

  /** End-to-end freshness: events → kpiFrame → KvSink → RESP wire → WS
    * push → client, measured per delivered `metrics` frame.
    *
    * Anchor: the micro-batch's data CUT (wall time at foreachBatch entry
    * ≈ trigger fire — the newest event the published snapshot can
    * reflect; the KPI window's own `updatedAt` is a future-dated window
    * END, useless as a staleness anchor). Each delivered frame is
    * correlated FIFO with its batch cut: `pipeline_ms` = aggregation +
    * sink write + RESP publish + snapshot fetch + WS delivery. An event
    * additionally waits up to one trigger interval for its cut, so the
    * PRD-comparable worst case is `trigger + pipeline_p99`. */
  private def freshness(spark: org.apache.spark.sql.SparkSession,
      eps: Int, runSecs: Int, loadavgStart: Array[Double]): Unit = {
    val stub = new graft.streaming.RespServerStub
    val kv = new graft.streaming.RespKvStore("127.0.0.1", stub.port)
    val ws = graft.streaming.WsPush.start(kv)
    // ---- raw RFC 6455 client: handshake, then read server text frames
    val sock = new java.net.Socket("127.0.0.1", ws.port)
    val cOut = sock.getOutputStream
    cOut.write(("GET / HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n" +
      "Connection: Upgrade\r\nSec-WebSocket-Key: Z3JhZnRiZW5jaGtleTAwMQ==\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
    cOut.flush()
    val cIn = new java.io.BufferedInputStream(sock.getInputStream)
    var prev4 = 0
    while (prev4 != 0x0d0a0d0a) {
      val c = cIn.read()
      if (c < 0) throw new java.io.EOFException("freshness: handshake")
      prev4 = ((prev4 << 8) | c) & 0xffffffff
    }
    val cuts = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val lats = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val reader = new Thread(() => {
      try {
        while (!sock.isClosed) {
          val b0 = cIn.read(); val b1 = cIn.read()
          if (b0 < 0 || b1 < 0) throw new java.io.EOFException
          var len = (b1 & 0x7f).toLong
          if (len == 126) len = (cIn.read() << 8) | cIn.read()
          else if (len == 127) {
            len = 0; (0 until 8).foreach(_ => len = (len << 8) | cIn.read())
          }
          val buf = new Array[Byte](len.toInt)
          var off = 0
          while (off < len) {
            val r = cIn.read(buf, off, len.toInt - off)
            if (r < 0) throw new java.io.EOFException
            off += r
          }
          if ((b0 & 0x0f) == 1) {
            val text = new String(buf, "UTF-8")
            if (text.startsWith("""{"event":"metrics""")) {
              // FIFO-correlate with the publishing batch's data cut; the
              // connect-time snapshot frame precedes any cut → skipped.
              val cut = cuts.poll()
              if (cut != null)
                lats.add(System.currentTimeMillis() - cut.longValue)
            }
          }
        }
      } catch { case _: Exception => () }
    }, "freshness-ws-client")
    reader.setDaemon(true)
    reader.start()

    def phase(trigger: String, triggerMs: Long, secs: Int): String = {
      cuts.clear(); lats.clear()
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", eps.toString)
        .option("numPartitions", "8").load()
      val events = rate.select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(100000)).as("user_id"),
        when(pmod(col("value"), lit(4)) === 0, "purchase")
          .when(pmod(col("value"), lit(4)) === 1, "signup")
          .when(pmod(col("value"), lit(4)) === 2, "error")
          .otherwise("click").as("event_type"),
        (pmod(col("value"), lit(1000)) / lit(10.0)).as("value"),
        lit("{}").as("props"))
      val writer = graft.streaming.KvSink.kpiWriter(kv)
      val q = graft.ops.Frames.kpiFrame(events)
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // data cut ≈ trigger fire: offsets were taken just before entry.
          // Enqueue BEFORE publishing (the frame races the queue add
          // otherwise), and only for batches that will publish.
          val cut = System.currentTimeMillis()
          df.persist()
          try {
            if (!df.isEmpty) { cuts.add(cut); writer(df, id) }
          } finally df.unpersist()
        }
        .trigger(Trigger.ProcessingTime(trigger)).start()
      Thread.sleep(secs * 1000L)
      q.stop()
      val xs = { import scala.jdk.CollectionConverters._
        lats.iterator().asScala.toVector.map(_.longValue).sorted }
      if (xs.isEmpty) s""""$trigger":{"frames":0}"""
      else {
        def pct(p: Double) = xs(math.min(xs.length - 1, (p * xs.length).toInt))
        s""""$trigger":{"frames":${xs.length},"pipeline_ms_p50":${pct(0.5)},""" +
          s""""pipeline_ms_p99":${pct(0.99)},"pipeline_ms_max":${xs.last},""" +
          s""""worst_freshness_ms":${triggerMs + pct(0.99)}}"""
      }
    }

    // the reference's 10 s trigger needs enough ticks for a stable tail
    val r10 = phase("10 seconds", 10000L, math.max(runSecs, 60))
    val r1 = phase("1 second", 1000L, runSecs)
    sock.close(); ws.close(); kv.close(); stub.close()
    println(s"""{"metric":"stream_freshness","target_eps":$eps,""" +
      s""""prd_target_ms":60000,$r10,$r1,${canonicalStamp(loadavgStart)}}""")
  }
}
