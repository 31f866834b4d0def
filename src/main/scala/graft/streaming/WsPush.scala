package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, Closeable, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/** The reference's WebSocket push surface (src/api/services/
  * ws_manager.py): each frame is `{"event":"<name>","data":<payload>}`
  * with the payload identical to the matching REST snapshot route; on
  * connect the client immediately receives all nine current snapshots,
  * then fetch-on-notify broadcasts as the KV store publishes. Implemented
  * as a minimal RFC 6455 server directly over sockets (HTTP upgrade
  * handshake + server→client text frames — the half of the protocol a
  * push feed needs), so like [[Resp]] and [[Api]] it carries zero
  * dependencies.
  */
object WsPush {

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2). */
  def acceptKey(clientKey: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest((clientKey + WsGuid).getBytes(UTF_8)))

  /** One server→client TEXT frame (FIN set, unmasked, 7/16/64-bit len). */
  def encodeTextFrame(text: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val header =
      if (payload.length < 126) Array[Byte](0x81.toByte, payload.length.toByte)
      else if (payload.length < 65536)
        Array[Byte](0x81.toByte, 126, (payload.length >>> 8).toByte, payload.length.toByte)
      else {
        val b = java.nio.ByteBuffer.allocate(10)
        b.put(0x81.toByte); b.put(127.toByte); b.putLong(payload.length.toLong)
        b.array()
      }
    header ++ payload
  }

  /** The wire frame for one event: REST-identical payload wrapped in the
    * reference's envelope. */
  def eventFrame(kv: KvStore, event: String): String =
    s"""{"event":"$event","data":${Api.eventJson(kv, event)}}"""

  final class Handle(server: ServerSocket) extends Closeable {
    val port: Int = server.getLocalPort
    override def close(): Unit =
      try server.close() catch { case _: Exception => () }
  }

  def start(kv: KvStore, port: Int = 0): Handle = {
    val server = new ServerSocket(port)
    val acceptor = new Thread(() => {
      while (!server.isClosed) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(kv, sock), "graft-ws-conn")
          t.setDaemon(true); t.start()
        } catch { case _: Exception => () }
      }
    }, "graft-ws-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    new Handle(server)
  }

  private def serve(kv: KvStore, sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    var sub: Closeable = null
    try {
      // ---- HTTP upgrade handshake (read EXACTLY through the blank
      // line — one byte more would block before the 101 goes out) -------
      val head = new java.lang.StringBuilder
      var prev4 = 0
      while (prev4 != 0x0d0a0d0a) {
        val c = in.read()
        if (c < 0) throw new java.io.EOFException("ws: truncated handshake")
        head.append(c.toChar)
        prev4 = ((prev4 << 8) | c) & 0xffffffff
      }
      val key = head.toString.linesIterator
        .find(_.toLowerCase.startsWith("sec-websocket-key:"))
        .map(_.split(":", 2)(1).trim)
        .getOrElse(throw new java.io.IOException("ws: missing key"))
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
      out.flush()
      // ---- initial snapshot: all nine events (reference
      // _send_initial_snapshot), then fetch-on-notify broadcasts. Frames
      // are QUEUED per connection and written by a dedicated writer
      // thread, so a slow client never back-pressures the publisher (the
      // driver's foreachBatch thread) — the reference's async-queue
      // design, and the same decoupling Api's SSE route uses. -----------
      val queue = new java.util.concurrent.LinkedBlockingQueue[String]()
      Api.ChannelToEvent.values.toSeq.sorted.foreach(e => queue.put(eventFrame(kv, e)))
      sub = kv.subscribe(Api.ChannelToEvent.keys.toSeq) { (ch, _) =>
        Api.ChannelToEvent.get(ch).foreach { e =>
          try queue.put(eventFrame(kv, e)) catch { case _: Exception => () }
        }
      }
      val writer = new Thread(() => {
        try {
          while (!sock.isClosed) {
            val text = queue.take()
            out.write(encodeTextFrame(text)); out.flush()
          }
        } catch { case _: Exception =>
          try sock.close() catch { case _: Exception => () }
        }
      }, "graft-ws-writer")
      writer.setDaemon(true)
      writer.start()
      // ---- read loop: honor client CLOSE (opcode 8); drop the rest ----
      var open = true
      while (open) {
        val b0 = in.read()
        if (b0 < 0) open = false
        else {
          val opcode = b0 & 0x0f
          val b1 = in.read()
          if (b1 < 0) open = false
          else {
            val masked = (b1 & 0x80) != 0
            // Every extended-length byte is EOF-checked: folding read()'s -1
            // into the length (or treating a stalled skip as progress) would
            // desynchronize the frame parser on a truncated client frame.
            def readByte(): Int = {
              val c = in.read()
              if (c < 0) throw new java.io.EOFException("ws: truncated frame")
              c
            }
            try {
              var len = (b1 & 0x7f).toLong
              if (len == 126) len = (readByte() << 8) | readByte()
              else if (len == 127) {
                len = 0
                (0 until 8).foreach(_ => len = (len << 8) | readByte())
              }
              var left = len + (if (masked) 4 else 0)
              while (left > 0) {
                val r = in.skip(left)
                if (r > 0) left -= r
                else if (readByte() >= 0) left -= 1 // skip stalled: read one byte
              }
            } catch { case _: java.io.EOFException => open = false }
            if (opcode == 8) open = false // close frame
          }
        }
      }
    } catch { case _: Exception => () }
    finally {
      if (sub != null) sub.close()
      try sock.close() catch { case _: Exception => () }
    }
  }
}
