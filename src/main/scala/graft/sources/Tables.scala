package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * Each loader is a thin `spark.read.parquet` so Catalyst sees the scan
  * directly: filters and projections composed on top of these DataFrames are
  * pushed into the parquet reader (PushedFilters / ReadSchema), which is the
  * scale story — at 100 TB the scan must only materialize the columns and
  * row groups a query touches.
  *
  * Mirrors the reference's source layer (reference: src/streaming/
  * kafka_sources.py:171-180 JDBC snapshot, src/batch/batch_etl.py:13-20
  * planned file sources) re-expressed as Spark batch sources.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** `events.parquet` has shipped `ts` in different physical forms across
    * driver regenerations: TIMESTAMP(NANOS) (loads as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in the Verify/Bench/
    * test sessions) and naive TIMESTAMP(MICROS) (loads as TIMESTAMP_NTZ in
    * Spark 4). Both are normalized here to session-tz (UTC) TimestampType —
    * the NTZ wall clock reinterpreted in UTC is exactly the instant DuckDB's
    * naive micro-resolution TIMESTAMP computes on the oracle side, so epoch
    * math (`unix_micros`, window binning) agrees between the engines.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** S11: CSV batch source with explicit schema — no inference in the hot
    * path (schema inference re-reads the data; at 100 TB that is a second
    * full scan). Reference plans these in src/batch/batch_etl.py:13-20.
    */
  def csv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** S11: JSON-lines batch source with explicit schema. */
  def json(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Multimodal ingest: raw media files as rows — (path, modificationTime,
    * length, content binary), the entry point of the decode pipeline in
    * [[graft.ops.Multimodal]]. `pathGlobFilter` prunes by extension at
    * LISTING time (skipped files are never opened), and
    * `maxFilesPerPartition`-style balance comes free from the source's
    * bin-packing; at 100 TB pair this with an object-store listing
    * manifest rather than a directory walk.
    */
  def binaryFiles(spark: SparkSession, path: String,
      globFilter: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    globFilter.fold(base)(g => base.option("pathGlobFilter", g)).load(path)
  }

  /** Schema-evolution read: parquet written by successive pipeline
    * versions (columns added over time) unified under one schema —
    * `mergeSchema` unions footer schemas at LISTING time; rows from files
    * lacking a column read as null there. Opt-in per read because footer
    * merging scales with file count (at 100 TB keep schemas in a catalog
    * instead).
    */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** S8: one-shot JDBC snapshot of a relational table (reference:
    * src/streaming/kafka_sources.py:171-180). Exercised against embedded
    * Derby in JdbcSpec; the partitioning options are what make it usable
    * at scale — without partitionColumn a JDBC read is one task.
    */
  def jdbcSnapshot(s: SparkSession, url: String, table: String,
      user: String, password: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    val base = s.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    val partitioned = (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", numPartitions)
      case _ => base
    }
    partitioned.load()
  }
}
