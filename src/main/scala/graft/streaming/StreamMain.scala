package graft.streaming

/** Streaming entry point mirroring the reference's job mains (§2.9): wire
  * every query of the three jobs over a parquet drop-dir source and block on
  * `awaitAnyTermination` (reference: jobs/transaction_analytics.py:41).
  *
  * Usage: sbt "runMain graft.streaming.StreamMain <inputDir> [checkpointBase]"
  * Feed it by dropping parquet files with the events schema into inputDir;
  * outputs land in an in-memory KV (swap a Redis-backed KvStore in deploy).
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    val inputDir = args.headOption.getOrElse(sys.error("usage: StreamMain <inputDir> [ckptBase]"))
    val ckpt = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-checkpoints").toString)
    val spark = graft.Session.local("graft-streaming")
    val kv = new InMemoryKvStore
    val source = () => Jobs.fileEventStream(spark, inputDir)
    val queries =
      Jobs.transactionsJob(source, kv, ckpt) ++
      Jobs.infrastructureJob(source, kv, ckpt) ++
      Jobs.derivedJob(source, kv, ckpt)
    sys.addShutdownHook(queries.foreach(q => if (q.isActive) q.stop()))
    spark.streams.awaitAnyTermination()
  }
}
