package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed-table helpers — the co-located-join technique for repeated
  * large-scale joins on a stable key: both sides pre-hashed into the same
  * bucket layout at write time, so joins on the bucket key plan with NO
  * shuffle exchange (verified by plan assertion in BucketingSpec).
  *
  * At 100 TB this is how the fact tables would be laid out for the
  * recurring user_id / order_id joins; the shuffle happens once at ingest
  * instead of once per query.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Hive-partitioned + sorted parquet layout — the read-path complement of
    * bucketing: directory partitioning gives PARTITION PRUNING (a filter on
    * the partition column never opens non-matching directories), and sorting
    * within files clusters the sort key per row group so min/max statistics
    * skip pages on range predicates.
    *
    * The `repartition(partitionCols)` ahead of the write is load-bearing at
    * scale: without it every one of the N upstream tasks writes a file into
    * every partition directory (N × P small files — the classic small-files
    * failure); with it each partition value is produced by one task, giving
    * one well-sized file per directory per shuffle partition.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Small-file compaction over a partitioned parquet layout — the
    * maintenance pass every append-mode landing zone needs: incremental
    * writes leave each partition directory with one file per micro-batch,
    * and a 100 TB table read through thousands of tiny files pays
    * open/footer overhead per file plus a task per split. Only partition
    * directories holding MORE than `maxFilesPerPartition` files are
    * rewritten: the affected partitions are re-read in one job,
    * repartitioned to one file each, and swapped in via DYNAMIC partition
    * overwrite — untouched partitions keep their files byte-identical, so
    * the rewrite cost tracks the dirty set, not the table. Returns the
    * per-partition (files_before, files_after) report the maintenance
    * scheduler logs.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      partitionCol: String, maxFilesPerPartition: Int = 1): Seq[(String, Int, Int)] = {
    def partFiles(): Map[String, Int] =
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith(s"$partitionCol="))
        .map(d => d.getName.stripPrefix(s"$partitionCol=") ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = partFiles()
    val dirty = before.filter(_._2 > maxFilesPerPartition).keys.toSeq.sorted
    if (dirty.nonEmpty) {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        spark.read.parquet(path)
          .filter(col(partitionCol).isin(dirty: _*))
          .repartition(col(partitionCol))
          .write.partitionBy(partitionCol).mode("overwrite").parquet(path)
      } finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    val after = partFiles()
    before.keys.toSeq.sorted.map(p => (p, before(p), after.getOrElse(p, 0)))
  }

  /** 32-bit Morton (Z-order) key: the low 16 bits of `x` and `y`
    * bit-interleaved (x in even positions, y in odd). Built from plain
    * shift/and/add column arithmetic, so the whole key stays inside
    * whole-stage codegen — no UDF, no custom expression needed.
    */
  def zorderKey(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _).cast("long")

  /** Z-ordered parquet layout: range-partition + sort by the interleaved
    * key, so EVERY file covers a small rectangle in (x, y) space and
    * parquet min/max statistics prune reads filtered on EITHER dimension —
    * where a linear sort clusters only its leading column and leaves the
    * second dimension spread across the full range in every file
    * (quantified in BucketingSpec).
    *
    * This is the standard multi-dimensional layout for 100 TB fact tables
    * queried by more than one selective column (Delta/Iceberg expose the
    * same thing as OPTIMIZE ZORDER BY / sort-order transforms); the
    * `repartitionByRange` gives one contiguous key range per output file,
    * which is exactly the property the pruning relies on.
    *
    * The gavro table format gets the same layout via
    * [[Gavro.clusterTable]], whose key ([[graft.functions.ZOrder]])
    * generalizes this one to n ≤ 4 dimensions and timestamp/date
    * canonicalization, and whose write is a transactional in-place
    * rewrite instead of a fresh directory.
    */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
      numFiles: Int): Unit = {
    // Interleaving only works when both dimensions use comparable bit
    // widths — a 13-bit x next to an 8-bit y leaves the key ordered almost
    // purely by x. Normalize each dimension onto the full 16-bit grid over
    // its own [min, max] first (one cheap stats pass; at warehouse scale
    // these bounds come from table statistics). Equal-width grid cells —
    // Delta's OPTIMIZE ZORDER uses equal-height range ids instead, which
    // additionally resists skew; same layout contract.
    val r = df.agg(min(col(x)).cast("double"), max(col(x)).cast("double"),
      min(col(y)).cast("double"), max(col(y)).cast("double")).collect().head
    def grid(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(65536)) - 1, lit(65535L))
    df.withColumn("zkey", zorderKey(
        grid(col(x), r.getDouble(0), r.getDouble(1)),
        grid(col(y), r.getDouble(2), r.getDouble(3))))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(path)
  }
}
