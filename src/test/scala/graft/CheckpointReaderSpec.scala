package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{AvroCodec, CheckpointReader, Gavro}

/** In-memory realization of the checkpoint-reader seam — the proof that
  * [[Gavro.maintain]]'s consumer-position reads have no hidden local-
  * filesystem dependency (a real cluster's checkpoints live on
  * HDFS/object store where plain java.io cannot reach). Paths are plain
  * keys; directories are whatever has been declared or implied. */
final class InMemoryCheckpointReader extends CheckpointReader {
  private val dirs = scala.collection.concurrent.TrieMap[String, Unit]()
  private val files = scala.collection.concurrent.TrieMap[String, Seq[String]]()

  private def norm(p: String): String =
    p.replaceAll("/+", "/").stripSuffix("/")

  def mkdirs(path: String): Unit = {
    var p = norm(path)
    while (p.nonEmpty && p != "/") {
      dirs.put(p, ())
      p = p.substring(0, math.max(p.lastIndexOf('/'), 0))
    }
  }

  def write(path: String, lines: Seq[String]): Unit = {
    val p = norm(path)
    mkdirs(p.substring(0, p.lastIndexOf('/')))
    files.put(p, lines)
    ()
  }

  def delete(path: String): Unit = { files.remove(norm(path)); () }

  override def list(dir: String): Option[Seq[String]] = {
    val d = norm(dir)
    if (!dirs.contains(d)) None
    else Some((dirs.keysIterator ++ files.keysIterator)
      .filter(p => p != d && p.startsWith(d + "/") &&
        !p.substring(d.length + 1).contains('/'))
      .map(_.substring(d.length + 1)).toSeq.distinct)
  }

  override def readLines(file: String): Option[Seq[String]] =
    files.get(norm(file))
}

/** [[Gavro.maintain]] lifecycle driven ENTIRELY through the swappable
  * checkpoint-reader seam: consumer positions come from an in-memory
  * "checkpoint filesystem" while the gavro table lives on disk — the
  * composition a cluster deployment runs with HDFS checkpoints. The
  * loud/lenient boundary must behave exactly as with local reads. */
class CheckpointReaderSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, ids: Seq[Long]): Unit = {
    val os = new java.io.FileOutputStream(new java.io.File(dir, name))
    try {
      ids.foreach { id =>
        val vals: Array[Any] = Array(id, UTF8String.fromString(s"ep$id"),
          UTF8String.fromString("GET"), id.toDouble, 1000000L * id)
        val b = AvroCodec.encode(AvroCodec.SystemMetrics, vals(_), _ => false)
        os.write(Array[Byte]((b.length >>> 24).toByte, (b.length >>> 16).toByte,
          (b.length >>> 8).toByte, b.length.toByte))
        os.write(b)
      }
      graft.sources.GavroFooter.write(os, Seq(0L), Seq.empty)
    } finally os.close()
  }

  private def checkpoint(r: InMemoryCheckpointReader, ckpt: String,
      batchId: Long, last: String, thru: String = ""): Unit = {
    r.write(s"$ckpt/offsets/$batchId",
      Seq("v1", "{}", s"""{"last":"$last","thru":"$thru"}"""))
    r.write(s"$ckpt/commits/$batchId", Seq("v1", "{}"))
  }

  test("maintain reads in-memory checkpoints: protection, floor, loud/lenient boundary") {
    val dir = java.nio.file.Files.createTempDirectory("ckr-maint").toString
    (0 until 4).foreach(i => writeFile(dir, f"part-$i%05d.gavro", Seq(i.toLong)))
    writeFile(dir, "part-00004.gavro", 100L until 600L)
    Gavro.commitBatch(dir, (0 to 4).map(i => f"part-$i%05d.gavro"))

    val mem = new InMemoryCheckpointReader
    val ckA = "/hdfs/checkpoints/a"
    val ckB = "/hdfs/checkpoints/b"
    checkpoint(mem, ckA, 0L, "part-00001.gavro") // mid-prefix consumer
    checkpoint(mem, ckB, 0L, "part-00004.gavro") // current consumer

    Gavro.withCheckpointReader(mem) {
      // positions resolve through the seam
      assert(Gavro.checkpointPosition(ckA, dir)
        .exists(_.last == "part-00001.gavro"))
      assert(Gavro.checkpointPosition(ckB, dir)
        .exists(_.last == "part-00004.gavro"))

      // B's watermark (the big file) SURVIVES a 4 KiB-target pass, so
      // with A mid-prefix NOTHING below it may merge — the same blocked
      // state the local-reader lifecycle spec pins
      val r1 = Gavro.maintain(dir, Seq(ckA, ckB), targetBytes = 4096L)
      assert(r1.merged.isEmpty, r1.toString)
      assert(r1.protectedWatermarks ==
        Seq("part-00001.gavro", "part-00004.gavro"))
      assert(r1.thruFloor.isEmpty)

      // both consumers reach the tail; a 1 MiB target absorbs every file
      // INCLUDING the watermark → the exact vanished-watermark
      // translation applies and the merge fires
      checkpoint(mem, ckA, 1L, "part-00004.gavro")
      val r2 = Gavro.maintain(dir, Seq(ckA, ckB), targetBytes = 1L << 20)
      assert(r2.merged.nonEmpty, r2.toString)

      // consumers whose committed `thru` crossed the swap contribute the
      // retention floor
      val cp = new java.io.File(dir, Gavro.CommitsDir).listFiles()
        .map(_.getName).filter(_.endsWith(".checkpoint"))
        .sorted.lastOption.map(_.stripSuffix(".checkpoint"))
      assert(cp.isDefined, "optimize swap must leave a checkpoint record")
      checkpoint(mem, ckA, 2L, r2.merged.head, thru = cp.get)
      checkpoint(mem, ckB, 1L, r2.merged.head, thru = cp.get)
      val r3 = Gavro.maintain(dir, Seq(ckA, ckB), graceMs = 0L)
      assert(r3.thruFloor.contains(cp.get), r3.toString)

      // LOUD: missing checkpoint dir
      intercept[IllegalArgumentException] {
        Gavro.maintain(dir, Seq("/hdfs/checkpoints/nope"))
      }
      // LOUD: exists but not a streaming checkpoint (no offsets/)
      mem.mkdirs("/hdfs/checkpoints/parent/queryA")
      intercept[IllegalArgumentException] {
        Gavro.maintain(dir, Seq("/hdfs/checkpoints/parent"))
      }
      // LENIENT: configured-but-unstarted consumer (empty dir) — blocks
      // the floor, never aborts the job
      mem.mkdirs("/hdfs/checkpoints/unstarted")
      val r4 = Gavro.maintain(dir,
        Seq(ckA, ckB, "/hdfs/checkpoints/unstarted"))
      assert(r4.thruFloor.isEmpty, r4.toString)
      // LOUD: torn checkpoint — a committed batch with no offsets file
      val torn = "/hdfs/checkpoints/torn"
      checkpoint(mem, torn, 0L, "part-00000.gavro")
      mem.delete(s"$torn/offsets/0")
      val e = intercept[IllegalStateException] {
        Gavro.maintain(dir, Seq(torn))
      }
      assert(e.getMessage.contains("torn"), e.getMessage)
    }
    // the swap restored the local reader
    intercept[IllegalArgumentException] {
      Gavro.maintain(dir, Seq("/hdfs/checkpoints/a"))
    }
  }
}
