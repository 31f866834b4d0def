package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CdcMaterializer.CdcOp
import graft.streaming.Scd2Materializer
import graft.streaming.Scd2Materializer.Scd2Row

/** Streaming SCD2 maintenance: open/close emissions per micro-batch,
  * version numbering across deletes, stale-op rejection, and the
  * reconciliation theorem — replaying the stream's emissions (last write
  * per (key, version)) equals the batch scd2History rebuild over the same
  * applied ops. */
class Scd2Spec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("open/close emissions, persistent version counter, stale rejection") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[CdcOp]
      val batches =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Scd2Row])]
      val q = Scd2Materializer(in.toDS()).toDF().writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.as[Scd2Row].collect().toSeq
          batches.synchronized { batches += id -> rows }
          ()
        }
        .start()

      def run(ops: CdcOp*): Seq[Scd2Row] = {
        val before = batches.synchronized(batches.flatMap(_._2).length)
        in.addData(ops: _*)
        q.processAllAvailable()
        batches.synchronized(batches.flatMap(_._2).drop(before).toSeq)
      }

      // Insert → one open row.
      assert(run(CdcOp(1L, 100L, 1L, "c", 1.0, deleted = false)) ==
        Seq(Scd2Row(1L, 1L, 1L, 1.0, 100L, None, isCurrent = true)))
      // Update → the old version closes AT the new op's ts + a new open.
      assert(run(CdcOp(1L, 200L, 2L, "u", 2.0, deleted = false)).toSet == Set(
        Scd2Row(1L, 1L, 1L, 1.0, 100L, Some(200L), isCurrent = false),
        Scd2Row(1L, 2L, 2L, 2.0, 200L, None, isCurrent = true)))
      // Delete → close only; stale op (positioned before the delete) is a
      // no-op even though no current version exists to compare against.
      assert(run(CdcOp(1L, 300L, 3L, "d", 0.0, deleted = true)) ==
        Seq(Scd2Row(1L, 2L, 2L, 2.0, 200L, Some(300L), isCurrent = false)))
      assert(run(CdcOp(1L, 150L, 9L, "u", 9.9, deleted = false)).isEmpty)
      // Re-insert → numbering continues past the delete's consumed slot
      // (v3 was the delete), matching the batch rebuild's row_number.
      assert(run(CdcOp(1L, 400L, 4L, "c", 7.0, deleted = false)) ==
        Seq(Scd2Row(1L, 4L, 4L, 7.0, 400L, None, isCurrent = true)))
      q.stop()
    }
  }

  test("replayed emissions equal the batch scd2History rebuild") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      // In-order per key (the stream's contract for history equivalence;
      // late data is DROPPED by the stream where a full batch rebuild
      // would splice it in — that asymmetry is the cost of incrementality).
      val ops = Seq(
        CdcOp(1L, 100L, 1L, "c", 1.0, deleted = false),
        CdcOp(1L, 200L, 2L, "u", 2.0, deleted = false),
        CdcOp(1L, 300L, 3L, "d", 0.0, deleted = true),
        CdcOp(1L, 400L, 4L, "c", 7.0, deleted = false),
        CdcOp(2L, 150L, 5L, "c", 5.0, deleted = false),
        CdcOp(2L, 250L, 6L, "u", 6.0, deleted = false),
        CdcOp(3L, 500L, 7L, "d", 0.0, deleted = true))
      val in = MemoryStream[CdcOp]
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
      val q = Scd2Materializer(in.toDS()).toDF().writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.as[Scd2Row].collect().toSeq
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .start()
      // Feed one op per micro-batch — maximal incrementality.
      ops.foreach { o => in.addData(o); q.processAllAvailable() }
      q.stop()

      // Upsert replay: last emission per (key, version) is the record.
      val replayed = emitted.synchronized {
        emitted.zipWithIndex
          .groupBy { case (r, _) => (r.key, r.versionN) }
          .map { case (_, vs) => vs.maxBy(_._2)._1 }
          .toSet
      }
      val envelope = ops.toDF()
        .select(col("key").as("user_id"), col("eventId").as("event_id"),
          col("value"), col("tsMs").as("__source_ts_ms"),
          col("deleted").as("__deleted"))
      val batch = graft.sources.Cdc.scd2History(envelope).collect().map { r =>
        Scd2Row(r.getAs[Long]("user_id"), r.getAs[Long]("version_n"),
          r.getAs[Long]("event_id"), r.getAs[Double]("value"),
          r.getAs[Long]("valid_from_ms"),
          Option(r.getAs[java.lang.Long]("valid_to_ms")).map(_.longValue),
          r.getAs[Boolean]("is_current"))
      }.toSet
      assert(replayed == batch, s"\nreplayed=$replayed\nbatch=$batch")
    }
  }
}
