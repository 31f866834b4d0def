package graft

import java.io.{BufferedInputStream, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import graft.streaming.{InMemoryKvStore, Keys, WsPush}

/** The WebSocket push surface against a hand-rolled client: RFC 6455
  * handshake verified (Sec-WebSocket-Accept), nine snapshot frames on
  * connect, fetch-on-notify broadcast after a publish — the reference
  * ws_manager contract (`{"event": ..., "data": ...}` with REST-identical
  * payloads).
  */
class WsSpec extends SparkSpec {

  private def readFrame(in: InputStream): String = {
    val b0 = in.read(); val b1 = in.read()
    assert((b0 & 0xff) == 0x81, s"expected FIN+text frame, got $b0")
    var len = (b1 & 0x7f).toLong
    if (len == 126) len = (in.read() << 8) | in.read()
    else if (len == 127) { len = 0; (0 until 8).foreach(_ => len = (len << 8) | in.read()) }
    val buf = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val r = in.read(buf, off, len.toInt - off)
      assert(r >= 0, "stream closed mid-frame"); off += r
    }
    new String(buf, UTF_8)
  }

  test("handshake, snapshot-on-connect, and publish broadcast over real sockets") {
    val kv = new InMemoryKvStore
    kv.writeJson(Keys.PlatformBreakdown, """[{"name":"ios","value":1}]""")
    val server = WsPush.start(kv)
    val sock = new Socket("127.0.0.1", server.port)
    try {
      val out = sock.getOutputStream
      val clientKey = "dGhlIHNhbXBsZSBub25jZQ==" // the RFC 6455 example key
      out.write((s"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Key: $clientKey\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val in = new BufferedInputStream(sock.getInputStream)
      // read the HTTP response head
      val head = new java.lang.StringBuilder
      var prev4 = 0
      var c = in.read()
      while (c >= 0 && prev4 != 0x0d0a0d0a) {
        head.append(c.toChar); prev4 = ((prev4 << 8) | c) & 0xffffffff; c = in.read()
      }
      // one byte of the first frame was consumed by the head loop exit?
      // No: the loop stops AFTER consuming the final \n of the head; `c`
      // holds the first frame byte. Push it back via a sequence stream.
      val stream = new java.io.SequenceInputStream(
        new java.io.ByteArrayInputStream(Array(c.toByte)), in)
      assert(head.toString.startsWith("HTTP/1.1 101"), head.toString)
      // RFC 6455 §1.3 worked example: this key must produce this accept
      assert(head.toString.contains("Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo="),
        head.toString)
      // nine snapshot frames on connect, event names sorted
      val events = (1 to 9).map(_ => readFrame(stream))
      val names = events.map(_.split("\"")(3))
      assert(names == names.sorted && names.toSet.size == 9, names.mkString(","))
      val platform = events.find(_.contains("\"event\":\"platform\"")).get
      assert(platform.endsWith(""""data":[{"name":"ios","value":1}]}"""), platform)
      // a publish triggers a broadcast frame with the refreshed payload
      kv.writeJson(Keys.PlatformBreakdown, """[{"name":"web","value":2}]""",
        channel = Some(Keys.ChannelPlatform))
      val pushed = readFrame(stream)
      assert(pushed == """{"event":"platform","data":[{"name":"web","value":2}]}""",
        pushed)
    } finally { sock.close(); server.close() }
  }

  test("a truncated client frame closes the connection instead of desyncing") {
    val kv = new InMemoryKvStore
    val server = WsPush.start(kv)
    val sock = new Socket("127.0.0.1", server.port)
    try {
      val out = sock.getOutputStream
      out.write(("GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val in = new BufferedInputStream(sock.getInputStream)
      var prev4 = 0
      var c = in.read()
      while (c >= 0 && prev4 != 0x0d0a0d0a) {
        prev4 = ((prev4 << 8) | c) & 0xffffffff; c = in.read()
      }
      val stream = new java.io.SequenceInputStream(
        new java.io.ByteArrayInputStream(Array(c.toByte)), in)
      (1 to 9).foreach(_ => readFrame(stream)) // drain snapshots
      // A malformed masked frame claiming a 16-bit extended length but
      // truncated mid-header: the old parser folded read()'s -1 into the
      // length / spun on a stalled skip; the fix treats EOF as close.
      out.write(Array(0x81.toByte, 0xfe.toByte, 0x01.toByte)) // len high byte only
      out.flush()
      sock.shutdownOutput() // EOF mid-extended-length
      // server must close its side promptly (read returns -1, no spin)
      sock.setSoTimeout(5000)
      val tail = new Array[Byte](4096)
      var n = stream.read(tail) // possibly buffered frames, then EOF
      while (n > 0) n = stream.read(tail)
      assert(n == -1, "server did not close after truncated frame")
    } finally { sock.close(); server.close() }
  }
}
