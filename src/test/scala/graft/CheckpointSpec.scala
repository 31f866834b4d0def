package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{InMemoryKvStore, Jobs, Keys, Serve}

/** W7: checkpointed restart — a second run from the same checkpoint resumes
  * at the recorded offsets and processes only newly-arrived files. Also
  * exercises the serving-layer readers over the resulting KV state.
  */
class CheckpointSpec extends SparkSpec {

  private def writeBatch(dir: String, rows: Seq[(Long, String, Long, String, Double, String)],
      part: String): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, uid, et, v, p) =>
      (id, Timestamp.valueOf(ts), uid, et, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("restart from checkpoint processes only new data (W7) and serves reads") {
    val in = Files.createTempDirectory("graft-ckpt-in").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-state").toString
    val kv = new InMemoryKvStore

    writeBatch(in, Seq(
      (0L, "2024-01-01 00:01:00", 1L, "purchase", 10.0, "{}"),
      (1L, "2024-01-01 00:03:00", 2L, "click", 2.0, "{}")), "a")
    val run1 = Jobs.transactionsJob(
      () => Jobs.fileEventStream(spark, in), kv, ckpt, Trigger.AvailableNow())
    run1.foreach(_.awaitTermination(60000))
    run1.foreach(q => if (q.isActive) q.stop())
    val feedAfter1 = kv.lists(Keys.ActivityFeed).length
    assert(feedAfter1 == 2)

    // second run, same checkpoint: one new event arrives; only it is pushed
    writeBatch(in, Seq(
      (2L, "2024-01-01 00:05:00", 3L, "purchase", 5.0, "{}")), "b")
    val run2 = Jobs.transactionsJob(
      () => Jobs.fileEventStream(spark, in), kv, ckpt, Trigger.AvailableNow())
    run2.foreach(_.awaitTermination(60000))
    run2.foreach(q => if (q.isActive) q.stop())
    val feed = kv.lists(Keys.ActivityFeed)
    assert(feed.length == 3) // not 5: events 0/1 were not reprocessed
    assert(feed.head.contains("evt_2"))

    // serving-layer parity: numbers re-typed from the KV strings
    val metrics = Serve.getMetrics(kv)
    assert(metrics("orders") == 2L) // both purchases aggregated (update mode)
    assert(metrics("revenue").isInstanceOf[Double])
    assert(Serve.parseNumber("12") == 12L)
    assert(Serve.parseNumber("12.5") == 12.5)
    assert(Serve.parseNumber("HEALTHY") == "HEALTHY")
  }

  test("parquet file sink is exactly-once across a checkpointed restart") {
    val in = Files.createTempDirectory("graft-fsink-in").toString
    val out = Files.createTempDirectory("graft-fsink-out").toString
    val ckpt = Files.createTempDirectory("graft-fsink-ckpt").toString

    def run(): Unit = {
      val q = Jobs.fileEventStream(spark, in)
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("event_type"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      if (q.isActive) q.stop()
    }
    writeBatch(in, Seq(
      (0L, "2024-01-01 00:01:00", 1L, "purchase", 10.0, "{}"),
      (1L, "2024-01-01 00:02:00", 2L, "click", 2.0, "{}")), "a")
    run()
    // restart from the same checkpoint with one new input file: committed
    // batch 1 must NOT be re-emitted (the sink's transaction log +
    // checkpointed offsets give end-to-end exactly-once for file sinks)
    writeBatch(in, Seq(
      (2L, "2024-01-01 00:03:00", 3L, "purchase", 5.0, "{}")), "b")
    run()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L), s"expected exactly-once output, got $ids")
    // the sink's _spark_metadata transaction log is what readers honor
    assert(new java.io.File(s"$out/_spark_metadata").exists())
  }

  test("mapGroupsWithState state survives a checkpointed restart") {
    import spark.implicits._
    import graft.streaming.CdcMaterializer
    import graft.streaming.CdcMaterializer.CdcOp
    val in = Files.createTempDirectory("graft-cdc-in").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString

    def writeOps(ops: Seq[CdcOp]): Unit =
      ops.toDF().coalesce(1).write.mode("append").parquet(in)
    def run(): Seq[org.apache.spark.sql.Row] = {
      // foreachBatch, not the memory sink: memory-sink queries refuse to
      // recover from a checkpoint.
      val got = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val src = spark.readStream
        .schema(Seq.empty[CdcOp].toDF().schema).parquet(in).as[CdcOp]
      val q = CdcMaterializer(src).toDF()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= batch.collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(CdcMaterializer.outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      if (q.isActive) q.stop()
      got.toSeq
    }

    writeOps(Seq(CdcOp(1L, 100L, 1L, "c", 10.0, deleted = false)))
    run()
    // Restart from the checkpoint; a STALE op for key 1 arrives. If the
    // per-key state had not been restored, last-writer-wins would wrongly
    // emit the stale value as current.
    writeOps(Seq(CdcOp(1L, 50L, 0L, "u", 99.0, deleted = false)))
    val out2 = run()
    assert(out2.length == 1)
    val r = out2.head
    assert(r.getAs[Long]("eventId") == 1L && r.getAs[Double]("value") == 10.0,
      s"state lost across restart: $r")
  }
}
