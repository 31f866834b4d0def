package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage profiler for registered queries — the measurement tool the
  * optimization guide's §1 empirical loop needs with the UI disabled: runs
  * each named query once (noop sink, same methodology as [[Bench]]) with a
  * listener capturing every stage's wall time, task count, input bytes and
  * shuffle read/write bytes, then prints stages sorted by duration so the
  * expensive exchange / scan / agg inside a multi-job query is visible.
  *
  * Usage: sbt "runMain graft.Profile [query ...]" (env like Bench).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = Session.builder("graft-profile", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(name: String, ms: Long, tasks: Int, input: Long,
        sr: Long, sw: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long)] // jobId, ms
    val jobStart = mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
          .getOrElse(0L)
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.name, ms, i.numTasks, m.inputMetrics.bytesRead,
            m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.synchronized { jobStart(e.jobId) = e.time }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobStart.get(e.jobId).foreach(t0 => jobs += e.jobId -> (e.time - t0))
        }
    })

    // Warm-up, as in Bench: absorb JVM/codegen startup before the first run.
    try SparkEntry.queries.get("pricing_summary")
      .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        spark.catalog.clearCache()
        Thread.sleep(200)
        stages.synchronized(stages.clear()); jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let stage events drain
        println(f"\n===== $name%s  wall=$wall%.2f s  jobs=${jobs.size}%d " +
          f"jobWallSum=${jobs.map(_._2).sum / 1e3}%.2f s =====")
        val top = stages.synchronized(stages.sortBy(-_.ms).take(30))
        top.foreach { s =>
          println(f"  ${s.ms}%6d ms  tasks=${s.tasks}%4d  in=${s.input / 1024}%8d KiB  " +
            f"sr=${s.sr / 1024}%7d KiB  sw=${s.sw / 1024}%7d KiB  ${s.name.take(110)}%s")
        }
      }
    }
    spark.stop()
  }
}
