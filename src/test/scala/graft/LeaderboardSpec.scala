package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Leaderboard
import graft.streaming.Leaderboard.{Score, Standing}

/** The transformWithState top-k leaderboard: MapState running totals,
  * per-batch bounded-heap standings. */
class LeaderboardSpec extends SparkSpec {

  test("standings update across batches; an outsider accumulates into the top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Score]
    val query = Leaderboard(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("tws_board")
      .outputMode(OutputMode.Update()).start()
    def board(batch: Long): Seq[Standing] =
      spark.sql("SELECT * FROM tws_board").as[Standing].collect().toSeq
    try {
      input.addData(
        Score("eu", "ada", 10.0), Score("eu", "bob", 8.0), Score("eu", "cyd", 1.0),
        Score("us", "dan", 5.0))
      query.processAllAvailable()
      val b1 = board(0)
      assert(b1.filter(_.group == "eu").sortBy(_.rank) == Seq(
        Standing("eu", 1, "ada", 10.0), Standing("eu", 2, "bob", 8.0)))
      assert(b1.filter(_.group == "us") == Seq(Standing("us", 1, "dan", 5.0)))

      // cyd was OUTSIDE the top-2 — her earlier 1.0 must still count: the
      // map state is why (a bounded top-k list would have forgotten it).
      // Batch 2 must emit cyd at #1 (1.0 + 9.5) over ada.
      input.addData(Score("eu", "cyd", 9.5))
      query.processAllAvailable()
      val b2 = board(1)
      assert(b2.contains(Standing("eu", 1, "cyd", 10.5)), b2.mkString(", "))
      assert(b2.contains(Standing("eu", 2, "ada", 10.0)), b2.mkString(", "))

      // Untouched group 'us' emitted nothing new in batch 2.
      assert(b2.filter(_.group == "us") == Seq(Standing("us", 1, "dan", 5.0)))
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

  test("MapState totals survive a checkpointed restart") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-lb-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lb-ckpt").toString
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    def writeScores(rows: Seq[Score]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(in)
    def run(): Seq[Standing] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Standing]
      val src = spark.readStream
        .schema(Seq.empty[Score].toDF().schema).parquet(in).as[Score]
      val q = Leaderboard(src, k = 2).toDF()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= batch.as[Standing].collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      if (q.isActive) q.stop()
      got.toSeq
    }

    try {
      writeScores(Seq(Score("g", "ada", 10.0), Score("g", "bob", 3.0)))
      run()
      // Restart from the checkpoint: bob's +8 must MERGE with the restored
      // 3.0 (total 11), not start from zero — proving the map state came
      // back from RocksDB, and the pre-restart input was not re-read.
      writeScores(Seq(Score("g", "bob", 8.0)))
      val out2 = run()
      assert(out2.contains(Standing("g", 1, "bob", 11.0)), out2.mkString(", "))
      assert(out2.contains(Standing("g", 2, "ada", 10.0)), out2.mkString(", "))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("minTotal eviction bounds state with the documented standings tolerance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Score]
    val query = Leaderboard(input.toDS(), k = 2, minTotal = Some(5.0))
      .writeStream.format("memory").queryName("tws_board_evict")
      .outputMode(OutputMode.Update()).start()
    def latest(): Seq[Standing] =
      spark.sql("SELECT * FROM tws_board_evict").as[Standing].collect().toSeq
    try {
      // Two heavy members clear the threshold; dust does not.
      input.addData(
        Score("g", "ada", 10.0), Score("g", "bob", 8.0), Score("g", "dust", 1.0))
      query.processAllAvailable()
      val b1 = latest().sortBy(_.rank)
      // Heavy members unperturbed by eviction — same standings as the
      // no-eviction semantics would give.
      assert(b1 == Seq(Standing("g", 1, "ada", 10.0), Standing("g", 2, "bob", 8.0)), b1)

      // dust was EVICTED (1.0 < 5.0): its next arrival restarts from zero —
      // 4.9 alone stays under the threshold, so it still can't rank, and
      // its reported-would-be total is a lower bound on the true 5.9.
      input.addData(Score("g", "dust", 4.9))
      query.processAllAvailable()
      val b2 = latest().filter(_.rank <= 2).sortBy(_.rank).distinct
      assert(b2.forall(_.member != "dust"), b2.mkString(", "))

      // A member whose single-batch delta clears the threshold enters and
      // accumulates exactly from there on (no tolerance once >= minTotal).
      input.addData(Score("g", "eve", 20.0))
      query.processAllAvailable()
      input.addData(Score("g", "eve", 1.0))
      query.processAllAvailable()
      assert(latest().contains(Standing("g", 1, "eve", 21.0)), latest().mkString(", "))
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

  test("ranks are dense, ties break by member, k bounds the emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Score]
    val query = Leaderboard(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("tws_board2")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Score("g", "a", 5.0), Score("g", "b", 5.0), Score("g", "c", 5.0),
        Score("g", "d", 5.0), Score("g", "e", 7.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM tws_board2").as[Standing].collect().toSeq
      // 5 members, k=3: e first, then the tied 5.0s in member order, cut at 3.
      assert(rows.sortBy(_.rank).map(s => (s.rank, s.member, s.total)) == Seq(
        (1, "e", 7.0), (2, "a", 5.0), (3, "b", 5.0)))
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
