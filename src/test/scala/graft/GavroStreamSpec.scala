package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.AvroCodec

/** The `gavro` connector's MICRO_BATCH_READ path: an append-only landing
  * zone tailed as a stream — new files become the next micro-batch, the
  * offset is the consumed-file count, and a checkpointed restart resumes
  * without re-reading. Backfill (batch scan) and tail (this stream) run
  * the identical decode/filter reader stack over identical files. */
class GavroStreamSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, ids: Seq[Long]): Unit = {
    val f = new java.io.File(dir, name)
    val os = new java.io.FileOutputStream(f)
    try ids.foreach { id =>
      val vals: Array[Any] = Array(id, UTF8String.fromString(s"ep$id"),
        UTF8String.fromString("GET"), id.toDouble, 1000000L * id)
      val b = AvroCodec.encode(AvroCodec.SystemMetrics, vals(_), _ => false)
      os.write(Array[Byte]((b.length >>> 24).toByte, (b.length >>> 16).toByte,
        (b.length >>> 8).toByte, b.length.toByte))
      os.write(b)
    } finally os.close()
  }

  test("new files arrive as micro-batches; restart resumes past the offset") {
    val dir = java.nio.file.Files.createTempDirectory("gavro-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-stream-ck").toString
    writeFile(dir, "part-00000.gavro", Seq(1L, 2L))

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.select(col("id")).collect()
          .foreach(r => seen.add(batchId -> r.getLong(0)))
        ()
      }
      .start()

    val q = start()
    q.processAllAvailable()
    assert(seen.size == 2, seen.toString)

    // A new file lands: it alone forms the next batch.
    writeFile(dir, "part-00001.gavro", Seq(3L, 4L, 5L))
    q.processAllAvailable()
    assert(seen.size == 5, seen.toString)
    q.stop()

    // Restart from the checkpoint: only the file that landed while the
    // query was down is read — nothing before the committed offset.
    seen.clear()
    writeFile(dir, "part-00002.gavro", Seq(6L))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.map(_._2).toSet == Set(6L), seen.toString)
  }

  test("pruning and pushed filters ride the streaming reader too") {
    val dir = java.nio.file.Files.createTempDirectory("gavro-stream-f").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gavro-stream-fck").toString
    writeFile(dir, "part-00000.gavro", 1L to 10L)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("gavro")
      .option("schema", "system_metrics").load(dir)
      .filter(col("id") > 7L)
      .select(col("id"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set(8L, 9L, 10L), seen.toString)
  }
}
