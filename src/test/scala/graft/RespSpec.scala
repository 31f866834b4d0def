package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Jobs, Keys, KvSink, RespKvStore}

/** The RESP-wire KvStore against a protocol-accurate in-JVM server stub:
  * every write crosses a real socket in real RESP2 framing, so what the
  * in-memory store verifies logically, this verifies on the wire — the
  * production Redis integration minus only the redis binary itself.
  */
class RespSpec extends SparkSpec {

  test("RESP client round-trips hash/string/list/pubsub over a real socket") {
    val stub = new graft.streaming.RespServerStub
    val kv = new RespKvStore("127.0.0.1", stub.port)
    try {
      assert(kv.ping())
      // hash + ttl + publish
      kv.writeHash("k:h", Map("a" -> "1", "b" -> "x"), ttlSeconds = Some(60),
        channel = Some("ch.h"))
      assert(kv.readHash("k:h") == Map("a" -> "1", "b" -> "x"))
      assert(stub.expires("k:h") == 60L)
      assert(stub.published("ch.h") == List("a=1,b=x"))
      // string + publish
      kv.writeJson("k:j", """{"v":1}""", channel = Some("ch.j"))
      assert(kv.readJson("k:j").contains("""{"v":1}"""))
      assert(kv.readJson("k:absent").isEmpty)
      // list push + trim at maxLen
      (1 to 5).foreach(i => kv.pushToList("k:l", s"item$i", maxLen = 3))
      assert(kv.readList("k:l", 10) == List("item5", "item4", "item3"))
      // pub/sub: a subscriber connection receives later publishes
      val got = new java.util.concurrent.LinkedBlockingQueue[(String, String)]()
      val sub = kv.subscribe(Seq("ch.s")) { (c, p) => got.put((c, p)) }
      try {
        kv.writeJson("k:s", "payload-1", channel = Some("ch.s"))
        val first = got.poll(10, java.util.concurrent.TimeUnit.SECONDS)
        assert(first == ("ch.s", "payload-1"), s"got $first")
      } finally sub.close()
    } finally { kv.close(); stub.close() }
  }

  test("a torn connection reconnects lazily on the next command") {
    val stub = new graft.streaming.RespServerStub
    val kv = new RespKvStore("127.0.0.1", stub.port)
    try {
      kv.writeJson("k:1", "a")
      assert(kv.readJson("k:1").contains("a"))
      // tear the server side down and bring a fresh one up on the SAME
      // port: impossible with ServerSocket reuse timing, so instead tear
      // the CLIENT connection — next command must reconnect transparently.
      kv.close()
      kv.writeJson("k:2", "b") // lazy reconnect inside the client
      assert(kv.readJson("k:2").contains("b"))
      assert(stub.strings("k:1") == "a" && stub.strings("k:2") == "b")
    } finally { kv.close(); stub.close() }
  }

  test("the transactions job writes its contract through the RESP wire") {
    import spark.implicits._
    val stub = new graft.streaming.RespServerStub
    val kv = new RespKvStore("127.0.0.1", stub.port)
    val in = Files.createTempDirectory("graft-resp-in").toString
    val ckpt = Files.createTempDirectory("graft-resp-ckpt").toString
    Seq(
      (0L, Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "purchase", 10.0, "{}"),
      (1L, Timestamp.valueOf("2024-01-01 00:02:00"), 2L, "signup", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:03:00"), 3L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val queries = Jobs.transactionsJob(
      () => Jobs.fileEventStream(spark, in), kv, ckpt, Trigger.AvailableNow())
    try {
      queries.foreach(_.awaitTermination(60000))
      // the 3 transaction-job keys landed in the STUB's state — i.e. the
      // bytes actually traveled the protocol
      assert(stub.hashes(Keys.KpiCurrent)("orders") == "1")
      assert(stub.hashes.keys.exists(_.startsWith("nexus:kpi:snapshot:")))
      assert(stub.lists(Keys.ActivityFeed).nonEmpty)
      assert(stub.strings(Keys.RegionsCurrent).startsWith("["))
      assert(stub.published.contains(Keys.ChannelKpi))
      assert(stub.published.contains(Keys.ChannelActivity))
      // trend read-back (W9) went through HGETALL on the wire: the trend
      // fields exist because kpiWriter could READ the snapshot it wrote
      assert(stub.hashes(Keys.KpiCurrent).contains("revenueTrend"))
    } finally {
      queries.foreach(q => if (q.isActive) q.stop())
      kv.close(); stub.close()
    }
  }
}
