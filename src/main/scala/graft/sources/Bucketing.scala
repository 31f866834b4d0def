package graft.sources

import org.apache.spark.sql.DataFrame

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
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
