package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamCap
import graft.streaming.StreamCap.{Admitted, Ev}

/** The transformWithState first-K-per-key admission cap: the per-key
  * budget must hold ACROSS micro-batches, not per batch. */
class StreamCapSpec extends SparkSpec {

  test("admits exactly the first k events per key across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val query = StreamCap.firstKPerKey(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("tws_cap")
      .outputMode(OutputMode.Append()).start()
    def all(): Seq[Admitted] =
      spark.sql("SELECT * FROM tws_cap").as[Admitted].collect().toSeq
    try {
      // batch 1: key a sends 2 (both admitted), key b sends 4 (3 admitted)
      input.addData(Ev("a", 1), Ev("a", 2),
        Ev("b", 10), Ev("b", 11), Ev("b", 12), Ev("b", 13))
      query.processAllAvailable()
      val b1 = all()
      assert(b1.count(_.key == "a") == 2)
      assert(b1.filter(_.key == "b").map(_.admitIdx).sorted == Seq(1L, 2L, 3L))

      // batch 2: a's third event admitted with the CARRIED index; the rest
      // of a and everything from saturated b rejected.
      input.addData(Ev("a", 3), Ev("a", 4), Ev("b", 14))
      query.processAllAvailable()
      val b2 = all()
      assert(b2.count(_.key == "b") == 3, b2.mkString(", "))
      val aRows = b2.filter(_.key == "a").sortBy(_.admitIdx)
      assert(aRows.map(_.admitIdx) == Seq(1L, 2L, 3L), aRows.mkString(", "))

      // batch 3: both saturated — nothing new at all.
      input.addData(Ev("a", 5), Ev("b", 15))
      query.processAllAvailable()
      assert(all().size == b2.size)
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
