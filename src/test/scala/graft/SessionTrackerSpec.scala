package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.SessionTracker
import graft.streaming.SessionTracker.{Ev, Session}

/** The transformWithState session tracker: event-time timers close idle
  * sessions as the watermark advances; RocksDB state store (required by
  * the API, and the provider you'd run at scale). */
class SessionTrackerSpec extends SparkSpec {

  private val Gap = 10000L // 10 s idle gap for test brevity

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  test("timer closes an idle session; active sessions keep accumulating") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val query = SessionTracker(
      input.toDS().withWatermark("ts", "0 seconds"), Gap)
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // Two users; user 1's burst then silence, user 2 active later.
      input.addData(Ev(1L, ts(1000), 5.0), Ev(1L, ts(4000), 7.0))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM tws_sessions").count() == 0)

      // User 2's event advances the watermark past 4000 + Gap → user 1's
      // timer fires and the session closes with both events folded in.
      input.addData(Ev(2L, ts(20000), 1.0))
      query.processAllAvailable()
      val s1 = spark.sql("SELECT * FROM tws_sessions").as[Session].collect()
      assert(s1.toSeq == Seq(Session(1L, 1000, 4000, 2, 12.0)))

      // User 2 stays active within the gap: nothing new closes…
      input.addData(Ev(2L, ts(25000), 2.0))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM tws_sessions").count() == 1)

      // …until the watermark passes ITS idle deadline; the stale timer
      // registered at 20000+Gap must not have split the session.
      input.addData(Ev(3L, ts(60000), 0.0))
      query.processAllAvailable()
      val s2 = spark.sql("SELECT * FROM tws_sessions ORDER BY userId")
        .as[Session].collect()
      assert(s2.toSeq == Seq(
        Session(1L, 1000, 4000, 2, 12.0),
        Session(2L, 20000, 25000, 2, 3.0)))
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session state and timers survive a checkpointed restart") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-tws-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt").toString
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def writeEvs(evs: Seq[Ev]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(in)
    def run(): Seq[Session] = {
      // foreachBatch: memory-sink queries refuse checkpoint recovery.
      val got = scala.collection.mutable.ArrayBuffer.empty[Session]
      val src = spark.readStream.schema(Seq.empty[Ev].toDF().schema)
        .parquet(in).as[Ev].withWatermark("ts", "0 seconds")
      val q = SessionTracker(src, Gap).toDF()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.as[Session].collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      if (q.isActive) q.stop()
      got.toSeq
    }
    try {
      writeEvs(Seq(Ev(1L, ts(1000), 5.0)))
      assert(run().isEmpty) // session open, timer pending
      // Restart: an in-gap event must EXTEND the restored session (state
      // lost ⇒ a fresh session starting at 5000 would be emitted instead).
      writeEvs(Seq(Ev(1L, ts(5000), 7.0)))
      assert(run().isEmpty)
      // Restart again: a far-future event advances the watermark past the
      // restored timer's deadline — the full three-batch session closes.
      writeEvs(Seq(Ev(2L, ts(60000), 1.0)))
      val out = run()
      assert(out == Seq(Session(1L, 1000, 5000, 2, 12.0)),
        s"state/timer lost across restart: $out")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("a gap crossed inside one batch emits the finished session immediately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val query = SessionTracker(
      input.toDS().withWatermark("ts", "0 seconds"), Gap)
      .writeStream.format("memory").queryName("tws_sessions_split")
      .outputMode(OutputMode.Append()).start()
    try {
      // One batch, one user, two bursts Gap-separated (and out of order:
      // the processor folds in event-time order, not arrival order).
      input.addData(Ev(7L, ts(30000), 3.0), Ev(7L, ts(1000), 1.0), Ev(7L, ts(2000), 1.0))
      query.processAllAvailable()
      val s = spark.sql("SELECT * FROM tws_sessions_split").as[Session].collect()
      assert(s.toSeq == Seq(Session(7L, 1000, 2000, 2, 2.0)))
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
