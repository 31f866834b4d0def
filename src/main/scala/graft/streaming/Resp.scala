package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, Closeable, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal RESP2 (Redis serialization protocol) client — the real wire
  * protocol of the reference's sink/serving store, implemented directly
  * over a socket so the engine needs NO Redis client dependency
  * (reference: src/streaming/redis_client.py:52-104 uses redis-py; the
  * commands below are its exact HSET/EXPIRE/SET/LPUSH/LTRIM/PUBLISH/
  * HGETALL/SUBSCRIBE surface).
  *
  * RESP2 is five frame types: `+simple`, `-error`, `:integer`,
  * `$<len>\r\n<bytes>` bulk, `*<n>` array. Requests are always arrays of
  * bulk strings. That is the whole protocol this client speaks, and the
  * whole protocol [[RespKvStore]] needs.
  *
  * Scale/deploy note: one client instance serves one driver-side
  * `foreachBatch` writer (the reference's topology exactly); commands are
  * synchronized, and a torn connection reconnects lazily on the next
  * command — micro-batch writers retry whole batches, so at-least-once
  * delivery is preserved end to end.
  */
final class RespClient(host: String, port: Int) extends Closeable {

  private var socket: Socket = _
  private var in: InputStream = _
  private var out: OutputStream = _

  private def ensureConnected(): Unit =
    if (socket == null || socket.isClosed) {
      socket = new Socket(host, port)
      socket.setTcpNoDelay(true)
      in = new BufferedInputStream(socket.getInputStream)
      out = new BufferedOutputStream(socket.getOutputStream)
    }

  /** RESP value: String (simple/bulk), Long, null (nil bulk), or
    * Seq[Any] (array). Errors surface as thrown [[RespError]]. */
  def command(args: String*): Any = synchronized {
    try {
      ensureConnected()
      writeCommand(args)
      out.flush()
      readValue()
    } catch {
      case e: java.io.IOException => close(); throw e
    }
  }

  private def writeCommand(args: Seq[String]): Unit = {
    out.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      out.write(b)
      out.write('\r'); out.write('\n')
    }
  }

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("resp: connection closed")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new java.io.IOException("resp: bad line end")
    sb.toString
  }

  /** Blocking read of one RESP value — also used by the subscriber loop
    * to consume pushed pub/sub messages. */
  def readValue(): Any = {
    val t = in.read()
    if (t < 0) throw new EOFException("resp: connection closed")
    t.toChar match {
      case '+' => readLine()
      case '-' => throw new RespError(readLine())
      case ':' => readLine().toLong
      case '$' =>
        val n = readLine().toInt
        if (n < 0) null
        else {
          val b = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(b, off, n - off)
            if (r < 0) throw new EOFException("resp: connection closed")
            off += r
          }
          if (in.read() != '\r' || in.read() != '\n')
            throw new java.io.IOException("resp: bad bulk end")
          new String(b, UTF_8)
        }
      case '*' =>
        val n = readLine().toInt
        if (n < 0) null else (0 until n).map(_ => readValue())
      case other => throw new java.io.IOException(s"resp: unknown type '$other'")
    }
  }

  override def close(): Unit = synchronized {
    if (socket != null) { try socket.close() catch { case _: Exception => () } }
    socket = null
  }
}

final class RespError(msg: String) extends RuntimeException(msg)

/** [[KvStore]] over the RESP wire — the production sink the in-memory
  * store stands in for in tests. Write paths mirror the reference's
  * pipelined command groups verbatim (redis_client.py:52-104): hash =
  * HSET + optional EXPIRE + optional PUBLISH; json = SET + PUBLISH;
  * list = LPUSH + LTRIM(0, maxLen-1) + PUBLISH.
  */
final class RespKvStore(host: String, port: Int) extends KvStore with Closeable {

  @transient private lazy val client = new RespClient(host, port)

  def ping(): Boolean = client.command("PING") == "PONG"

  def writeHash(key: String, value: Map[String, String], ttlSeconds: Option[Int],
      channel: Option[String]): Unit = {
    val kv = value.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(k, v) }
    client.command(("HSET" +: key +: kv): _*)
    ttlSeconds.foreach(t => client.command("EXPIRE", key, t.toString))
    channel.foreach(c => client.command("PUBLISH", c,
      value.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")))
  }

  def writeJson(key: String, json: String, channel: Option[String]): Unit = {
    client.command("SET", key, json)
    channel.foreach(c => client.command("PUBLISH", c, json))
  }

  def pushToList(key: String, json: String, maxLen: Int,
      channel: Option[String]): Unit = {
    client.command("LPUSH", key, json)
    client.command("LTRIM", key, "0", (maxLen - 1).toString)
    channel.foreach(c => client.command("PUBLISH", c, json))
  }

  def readHash(key: String): Map[String, String] =
    client.command("HGETALL", key) match {
      case flat: Seq[_] =>
        flat.map(_.asInstanceOf[String]).grouped(2)
          .collect { case Seq(k, v) => k -> v }.toMap
      case _ => Map.empty
    }

  override def readJson(key: String): Option[String] =
    Option(client.command("GET", key)).map(_.asInstanceOf[String])

  override def readList(key: String, n: Int): List[String] =
    client.command("LRANGE", key, "0", (n - 1).toString) match {
      case items: Seq[_] => items.map(_.asInstanceOf[String]).toList
      case _ => Nil
    }

  /** Dedicated pub/sub connection (RESP moves a subscribed connection
    * into push mode, so it cannot serve commands): delivers each
    * published (channel, payload) to `handler` on a daemon thread until
    * the returned handle closes. */
  override def subscribe(channels: Seq[String])(
      handler: (String, String) => Unit): Closeable = {
    val sub = new RespClient(host, port)
    sub.command(("SUBSCRIBE" +: channels): _*) // first confirmation frame
    @volatile var open = true
    val t = new Thread(() => {
      try {
        while (open) sub.readValue() match {
          case Seq("message", ch: String, payload: String) =>
            handler(ch, payload)
          case _ => () // subscribe confirmations and keepalives
        }
      } catch { case _: Exception if !open => () case _: Exception => () }
    }, s"resp-subscriber-$host:$port")
    t.setDaemon(true)
    t.start()
    () => { open = false; sub.close() }
  }

  override def close(): Unit = client.close()
}
