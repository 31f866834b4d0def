package graft

import org.apache.spark.sql.functions._

import graft.sources.{AvroCodec, Gavro, Tables}

/** The WHOLE gavro format running against a filesystem-free store: both
  * seams ([[graft.sources.GavroStore]] coordination +
  * [[graft.sources.GavroDataStore]] data) swapped to one [[InMemoryStore]]
  * instance, then the full life of a table exercised — DSv2 write (task
  * streams + commit publish), snapshot-isolated scan with predicate
  * pushdown and footer-stat skipping, append continuing the part
  * sequence, and an OPTIMIZE rewrite (raw section copy, manifest,
  * checkpoint swap) — with ZERO `.gavro` bytes or log entries touching
  * the real filesystem. This is the claim the seams exist to make: an
  * object-store port is two trait implementations, not a rewrite — and
  * here is the whole protocol running on a second pair. */
class GavroInMemoryRoundTripSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("full format round-trip on the in-memory store pair") {
    val mem = new InMemoryStore
    val out = java.nio.file.Files.createTempDirectory("gavro-mem-rt").toFile
    out.deleteOnExit()
    val events = Tables.events(spark, dir)
    val recs = events.select(AvroCodec.requestLogRec.as("rec"))
      .select(col("rec.*"))
    Gavro.withStores(mem, mem) {
      // ---- DSv2 write: task-side streams + commit all in memory
      recs.repartition(3).write.format("gavro")
        .option("schema", "request_log").mode("append")
        .save(out.getAbsolutePath)
      // ---- scan: counts and sums round-trip exactly
      def back = spark.read.format("gavro")
        .option("schema", "request_log").load(out.getAbsolutePath)
      assert(back.count() == events.count())
      assert(back.agg(sum(col("id"))).head.getLong(0) ==
        events.agg(sum(col("event_id"))).head.getLong(0))
      // ---- pushdown: filter fully absorbed by the scan, values right
      val filtered = back.filter(col("status_code") === 200)
      assert(filtered.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f }.isEmpty)
      val nOk = filtered.count()
      assert(nOk > 0)
      assert(nOk == back.collect().count(_.getAs[Int]("status_code") == 200))
      // ---- append continues the part sequence under the same log
      recs.limit(10).coalesce(1).write.format("gavro")
        .option("schema", "request_log").mode("append")
        .save(out.getAbsolutePath)
      assert(back.count() == events.count() + 10)
      // ---- OPTIMIZE: raw section merge + checkpoint swap, all in memory
      val merged = Gavro.optimize(out.getAbsolutePath)
      assert(merged.nonEmpty, "optimize found nothing to merge")
      assert(back.count() == events.count() + 10)
      assert(back.agg(sum(col("id"))).head.getLong(0) ==
        events.agg(sum(col("event_id"))).head.getLong(0) +
          recs.limit(10).agg(sum(col("id"))).head.getLong(0))
    }
    // ---- the real filesystem never saw a byte of the table (directory
    // scaffolding from mkdirs is allowed — it holds nothing)
    def filesUnder(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(filesUnder)
      else Seq(f)
    val leaked = filesUnder(out)
    assert(leaked.isEmpty,
      s"format leaked onto the real FS: ${leaked.map(_.getName)}")
    // and the default stores are restored for the suites that follow
    assert(Gavro.store eq graft.sources.LocalFsStore)
    assert(Gavro.dataStore eq graft.sources.LocalFsDataStore)
  }
}
