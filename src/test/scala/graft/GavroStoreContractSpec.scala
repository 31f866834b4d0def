package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GavroStore, LocalFsStore}

/** The [[GavroStore]] CONTRACT, as a reusable base: every property here
  * is one the gavro coordination protocol's safety arguments cite
  * (put-if-absent losers err loudly, atomic replace has no missing
  * window, touch moves the staleness/grace clock, read-after-write).
  * An object-store port is a new `GavroStore` implementation plus a
  * subclass of this base pointing at it — if the contract passes, the
  * protocol above it needs no re-verification. */
abstract class GavroStoreContract extends AnyFunSuite {

  def store: GavroStore
  def freshDir(): java.io.File
  /** Backdate an object's clock (the local-FS impl uses file mtime; an
    * object-store impl adjusts its metadata record). */
  def backdate(f: java.io.File, t: Long): Unit

  private def f(dir: java.io.File, name: String) = new java.io.File(dir, name)

  test("putIfAbsent publishes atomically and is read-after-write visible") {
    val d = freshDir()
    val obj = f(d, "a.commit")
    store.putIfAbsent(obj, "one\ntwo")
    assert(store.exists(obj))
    assert(store.read(obj) == Seq("one", "two"))
    assert(store.list(d).map(_.getName).contains("a.commit"))
  }

  test("putIfAbsent loser errs loudly and never clobbers the winner") {
    val d = freshDir()
    val obj = f(d, "b.commit")
    store.putIfAbsent(obj, "winner")
    intercept[java.nio.file.FileAlreadyExistsException] {
      store.putIfAbsent(obj, "loser")
    }
    assert(store.read(obj) == Seq("winner"))
  }

  test("concurrent putIfAbsent: exactly one winner, content intact") {
    val d = freshDir()
    val obj = f(d, "race.commit")
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() =>
        try { store.putIfAbsent(obj, s"writer-$i"); winners.incrementAndGet() }
        catch { case _: java.nio.file.FileAlreadyExistsException => () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(winners.get() == 1)
    val content = store.read(obj)
    assert(content.length == 1 && content.head.startsWith("writer-"))
  }

  test("atomicReplace: readers see old or new content, never absence or a torn object") {
    val d = freshDir()
    val obj = f(d, "cp.checkpoint")
    store.atomicReplace(obj, "v-0\nv-0") // create-when-absent works too
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() =>
      while (!stop.get()) {
        if (!store.exists(obj)) bad.compareAndSet(null, "object vanished")
        else {
          val lines = store.read(obj)
          if (lines.distinct.length != 1)
            bad.compareAndSet(null, s"torn read: $lines")
        }
      })
    reader.start()
    (1 to 200).foreach(i => store.atomicReplace(obj, s"v-$i\nv-$i"))
    stop.set(true); reader.join()
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(store.read(obj) == Seq("v-200", "v-200"))
  }

  test("publishIfAbsent lands a staged blob once; a taken name returns false untouched") {
    val d = freshDir()
    val staged = f(d, ".staged.tmp")
    java.nio.file.Files.writeString(staged.toPath, "blob-bytes")
    val dst = f(d, "part-00000.gavro")
    assert(store.publishIfAbsent(staged, dst))
    assert(store.read(dst) == Seq("blob-bytes"))
    val staged2 = f(d, ".staged2.tmp")
    java.nio.file.Files.writeString(staged2.toPath, "other-bytes")
    assert(!store.publishIfAbsent(staged2, dst)) // name taken: no clobber
    assert(store.read(dst) == Seq("blob-bytes"))
    // the staged blob is a LOCAL file awaiting upload, not a store
    // object — a failed publish must leave it in place for the caller
    assert(staged2.exists())
  }

  test("createMarkerIfAbsent is an exclusive lock primitive") {
    val d = freshDir()
    val lock = f(d, "_optimize.lock")
    store.createMarkerIfAbsent(lock)
    intercept[java.nio.file.FileAlreadyExistsException] {
      store.createMarkerIfAbsent(lock)
    }
    assert(store.delete(lock))
    store.createMarkerIfAbsent(lock) // released → takeable again
  }

  test("touch moves the staleness/grace clock forward") {
    val d = freshDir()
    val obj = f(d, "part-00001.gavro")
    store.putIfAbsent(obj, "x")
    val past = System.currentTimeMillis() - 60 * 60 * 1000
    backdate(obj, past) // simulate an hour-old object
    assert(store.mtime(obj) <= past + 1000)
    val before = System.currentTimeMillis()
    store.touch(obj)
    assert(store.mtime(obj) >= before - 1000,
      s"touch did not advance mtime: ${store.mtime(obj)} < $before")
  }

  test("delete is tolerant of absence; list tracks puts and deletes") {
    val d = freshDir()
    val obj = f(d, "c.commit")
    store.putIfAbsent(obj, "x")
    assert(store.delete(obj))
    assert(!store.exists(obj))
    assert(!store.delete(obj)) // idempotent-ish: absence is not an error
    assert(!store.list(d).map(_.getName).contains("c.commit"))
    assert(store.list(f(d, "missing-subdir")).isEmpty)
  }
}

/** The bare-filesystem implementation against the contract — the
  * realization the sandbox (and any single-node deployment) runs on. */
class LocalFsStoreContractSpec extends GavroStoreContract {
  override def store: GavroStore = LocalFsStore
  override def freshDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("gavro-store").toFile
    d.deleteOnExit(); d
  }
  override def backdate(f: java.io.File, t: Long): Unit =
    assert(f.setLastModified(t))
}

/** The [[graft.sources.GavroDataStore]] CONTRACT — the byte-stream
  * properties the scan/writer/optimize paths cite: close is the
  * visibility point, positioned reads return the exact bytes written,
  * truncated range reads fail loudly (the footer parser's torn-write
  * defense), and a missing object throws rather than reading empty. */
abstract class GavroDataStoreContract extends AnyFunSuite {

  def data: graft.sources.GavroDataStore
  def freshDir(): java.io.File

  // binary-unfriendly payload: negative bytes, zeros, a fake length prefix
  private val payload: Array[Byte] =
    Array[Byte](0, 0, 0, 5) ++ Array.tabulate(4096)(i => (i * 31 - 128).toByte)

  private def f(dir: java.io.File, name: String) = new java.io.File(dir, name)

  test("create: close is the visibility point; bytes round-trip exactly") {
    val d = freshDir()
    val obj = f(d, "part-00000.gavro")
    val out = data.create(obj)
    out.write(payload)
    out.close()
    assert(data.length(obj) == payload.length.toLong)
    assert(java.util.Arrays.equals(
      data.readRange(obj, 0, payload.length), payload))
    assert(data.list(d).map(_.getName).contains("part-00000.gavro"))
  }

  test("openAt returns the exact positioned suffix") {
    val d = freshDir()
    val obj = f(d, "pos.gavro")
    val out = data.create(obj); out.write(payload); out.close()
    val suffix = data.readRange(obj, 1000, payload.length - 1000)
    assert(java.util.Arrays.equals(suffix,
      java.util.Arrays.copyOfRange(payload, 1000, payload.length)))
    // stream form reads to EOF
    val in = data.openAt(obj, payload.length.toLong - 12)
    val tail = try in.readAllBytes() finally in.close()
    assert(tail.length == 12)
  }

  test("readRange past EOF is loud, never silently short") {
    val d = freshDir()
    val obj = f(d, "short.gavro")
    val out = data.create(obj); out.write(payload, 0, 100); out.close()
    intercept[Exception] { data.readRange(obj, 50, 100) }
  }

  test("opening a missing object throws; length of absence is 0") {
    val d = freshDir()
    intercept[Exception] { data.openAt(f(d, "missing.gavro"), 0).read() }
    assert(data.length(f(d, "missing.gavro")) == 0L)
  }

  test("delete removes from list; absence tolerated") {
    val d = freshDir()
    val obj = f(d, "del.gavro")
    val out = data.create(obj); out.write(payload, 0, 10); out.close()
    assert(data.delete(obj))
    assert(!data.list(d).map(_.getName).contains("del.gavro"))
    assert(!data.delete(obj))
    assert(data.list(f(d, "no-such-dir")).isEmpty)
  }

  test("touch advances the data plane's grace clock") {
    val d = freshDir()
    val obj = f(d, "clock.gavro")
    val out = data.create(obj); out.write(payload, 0, 10); out.close()
    val before = System.currentTimeMillis()
    data.touch(obj)
    assert(data.mtime(obj) >= before - 1000,
      s"touch did not advance: ${data.mtime(obj)} < $before")
  }
}

class LocalFsDataStoreContractSpec extends GavroDataStoreContract {
  override def data: graft.sources.GavroDataStore =
    graft.sources.LocalFsDataStore
  override def freshDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("gavro-datastore").toFile
    d.deleteOnExit(); d
  }
}

class InMemoryDataStoreContractSpec extends GavroDataStoreContract {
  private val mem = new InMemoryStore
  override def data: graft.sources.GavroDataStore = mem
  override def freshDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("gavro-memdata").toFile
    d.deleteOnExit(); d
  }
}

/** PROOF the seam is real: a second, filesystem-free implementation —
  * an in-memory object map with conditional-PUT semantics, the shape an
  * S3/GCS port takes (put-if-absent = `putIfAbsent` on the map ≙
  * `If-None-Match: *`; atomic replace = `put` ≙ unconditional PUT;
  * timestamps = store-side metadata, not POSIX mtime) — passing the
  * SAME contract spec with zero changes to it. Porting gavro to an
  * object store is this exercise against the store's real API. */
class InMemoryStoreContractSpec extends GavroStoreContract {
  private val mem = new InMemoryStore
  override def store: GavroStore = mem
  // real temp dirs so the spec's STAGED blobs (local files awaiting
  // publish, as a real object-store upload path stages them) exist on
  // disk, while every store object lives only in the map
  override def freshDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("gavro-memstore").toFile
    d.deleteOnExit(); d
  }
  override def backdate(f: java.io.File, t: Long): Unit = mem.setMtime(f, t)
}

/** Keys are the File paths as opaque strings; objects are (bytes,
  * mtime) pairs in one concurrent map. `staged` blobs for
  * publishIfAbsent are read from the local temp the caller wrote — or
  * from the map itself when the data plane staged them there — exactly
  * how an object-store impl uploads a staged merge output.
  *
  * Implements BOTH seams over the one map: coordination
  * ([[graft.sources.GavroStore]]) and data
  * ([[graft.sources.GavroDataStore]]) — `create` buffers and registers
  * the whole object at close (multipart-upload semantics: nothing
  * visible before close, never a byte prefix), `openAt` is a ranged GET.
  * One instance serving both planes is what lets the full-format
  * round-trip (GavroInMemoryRoundTripSpec) run with zero filesystem
  * objects. */
class InMemoryStore extends graft.sources.GavroStore
    with graft.sources.GavroDataStore {

  override def create(f: java.io.File): java.io.OutputStream =
    new java.io.ByteArrayOutputStream() {
      override def close(): Unit =
        objects.put(key(f), Obj(toByteArray, System.currentTimeMillis()))
    }

  override def openAt(f: java.io.File,
      offset: Long): java.io.InputStream = {
    val o = objects.get(key(f))
    if (o == null) throw new java.io.FileNotFoundException(f.getPath)
    // the Int cast below would silently misposition a >2 GiB read
    require(offset <= Int.MaxValue && offset <= o.bytes.length,
      s"openAt(${f.getPath}, $offset): object has ${o.bytes.length} bytes")
    new java.io.ByteArrayInputStream(o.bytes, offset.toInt,
      math.max(0, o.bytes.length - offset.toInt))
  }

  override def length(f: java.io.File): Long =
    Option(objects.get(key(f))).map(_.bytes.length.toLong).getOrElse(0L)

  private case class Obj(bytes: Array[Byte], var mtime: Long)
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Obj]()
  private def key(f: java.io.File): String = f.getPath

  override def putIfAbsent(dst: java.io.File, content: String): Unit =
    if (objects.putIfAbsent(key(dst),
        Obj(content.getBytes("UTF-8"), System.currentTimeMillis())) != null)
      throw new java.nio.file.FileAlreadyExistsException(dst.getPath)

  override def atomicReplace(dst: java.io.File, content: String): Unit =
    objects.put(key(dst),
      Obj(content.getBytes("UTF-8"), System.currentTimeMillis()))

  override def publishIfAbsent(staged: java.io.File,
      dst: java.io.File): Boolean = {
    val bytes =
      if (staged.exists()) java.nio.file.Files.readAllBytes(staged.toPath)
      else {
        val o = objects.get(key(staged))
        if (o == null) // loud, like every other missing-object path
          throw new java.io.FileNotFoundException(
            s"staged blob ${staged.getPath} exists in neither plane")
        o.bytes
      }
    objects.putIfAbsent(key(dst), Obj(bytes, System.currentTimeMillis())) == null
  }

  override def createMarkerIfAbsent(dst: java.io.File): Unit =
    putIfAbsent(dst, "")

  override def touch(f: java.io.File): Unit = setMtime(f, System.currentTimeMillis())

  private[graft] def setMtime(f: java.io.File, t: Long): Unit = {
    val o = objects.get(key(f))
    if (o != null) o.mtime = t
  }

  override def mtime(f: java.io.File): Long =
    Option(objects.get(key(f))).map(_.mtime).getOrElse(0L)

  override def list(dir: java.io.File): Seq[java.io.File] = {
    import scala.jdk.CollectionConverters._
    val prefix = key(dir) + "/"
    objects.keySet().asScala.toSeq
      .filter(k => k.startsWith(prefix) && !k.stripPrefix(prefix).contains("/"))
      .sorted.map(new java.io.File(_))
  }

  override def delete(f: java.io.File): Boolean =
    objects.remove(key(f)) != null

  override def exists(f: java.io.File): Boolean =
    objects.containsKey(key(f))

  override def read(f: java.io.File): Seq[String] = {
    val o = objects.get(key(f))
    if (o == null) throw new java.io.FileNotFoundException(f.getPath)
    new String(o.bytes, "UTF-8").split("\n", -1).toSeq.filter(_.nonEmpty)
  }
}
