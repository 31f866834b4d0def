package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `gavro` — a DataSource V2 connector for length-prefixed Avro-binary
  * record files, read through the hand-rolled [[AvroCodec]] (the same
  * writer schemas the reference's direct-topic readers use:
  * src/streaming/schemas.py:181-189; src/streaming/kafka_sources.py:66-86
  * is the stream-side decode this file-source complements as the batch
  * landing-zone path — raw wire payloads archived to files, re-read for
  * backfill without a Kafka broker).
  *
  * File format: each record is a 4-byte big-endian length followed by the
  * Avro binary body. Framing is trusted (the archiver wrote it); the BODY
  * is the PERMISSIVE channel — an undecodable body yields an all-null row,
  * preserving record counts exactly like the reference's `from_avro`
  * PERMISSIVE contract on corrupt payloads.
  *
  * DSv2 integration, the part Spark actually optimizes through:
  *   - one [[InputPartition]] per file → parallelism tracks the layout, no
  *     driver-side data movement;
  *   - [[SupportsPushDownRequiredColumns]]: Catalyst's pruned schema is
  *     pushed INTO [[AvroCodec.decodeProjected]] — Avro has no field
  *     offsets so skipped fields are still walked on the wire, but never
  *     materialized (no string allocation, no boxing). `.explain` shows
  *     the pruned `ReadSchema` on the `BatchScan` node, same as parquet.
  *
  * Local-FS listing/IO keeps the sandbox honest; at scale the listing and
  * `readAllBytes` swap for the Hadoop FileSystem API with the same
  * partition-per-file planning (or split-per-block once files carry sync
  * markers), and everything above the byte source is unchanged.
  */
class GavroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gavro"

  // Every column nullable regardless of the Avro schema: the PERMISSIVE
  // corrupt channel emits all-null rows, so a non-nullable column here
  // would let downstream codegen elide null checks and NPE (spark-avro's
  // PERMISSIVE mode makes the same relaxation).
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(AvroCodec.sqlType(AvroCodec.schemaByName(options.get("schema")))
      .fields.map(_.copy(nullable = true)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GavroTable(schema, opts.get("path"), opts.get("schema"))
  }
}

class GavroTable(tableSchema: StructType, path: String, schemaName: String)
    extends Table with SupportsRead {
  require(path != null, "gavro: 'path' option is required")
  override def name(): String = s"gavro(`$path`, $schemaName)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GavroScanBuilder(tableSchema, path, schemaName)
}

class GavroScanBuilder(full: StructType, path: String, schemaName: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GavroScan(path, schemaName, required)
}

class GavroScan(path: String, schemaName: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"gavro $path, schema=$schemaName, ReadSchema: ${required.catalogString}"
  override def planInputPartitions(): Array[InputPartition] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".gavro")).sortBy(_.getName)
      .map(f => GavroInputPartition(f.getAbsolutePath): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    GavroReaderFactory(schemaName, required.fieldNames)
}

case class GavroInputPartition(file: String) extends InputPartition

/** Serializable recipe shipped to executors: record shape and required
  * columns travel as names; the schema ADT is rebuilt per reader. */
case class GavroReaderFactory(schemaName: String, requiredNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GavroPartitionReader(partition.asInstanceOf[GavroInputPartition].file,
      schemaName, requiredNames)
}

class GavroPartitionReader(file: String, schemaName: String,
    requiredNames: Array[String]) extends PartitionReader[InternalRow] {
  private val record = AvroCodec.schemaByName(schemaName)
  private val target: Array[Int] =
    record.fields.map(f => requiredNames.indexOf(f.name)).toArray
  private val bytes =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
  private var pos = 0
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (pos + 4 > bytes.length) return false
    val n = ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
      ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
    pos += 4
    if (n < 0 || pos + n > bytes.length) return false // truncated tail: stop
    val body = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
    pos += n
    val decoded = AvroCodec.decodeProjected(record, body, target,
      requiredNames.length)
    // PERMISSIVE: undecodable body → all-null row, count preserved.
    row = if (decoded != null) decoded
      else new GenericInternalRow(requiredNames.length)
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Write path + registered query for the `gavro` source. */
object Gavro {

  /** Write one `.gavro` file per partition of a single-binary-column frame
    * into `dir` — the archiver side of the landing zone. Local FS here;
    * the Hadoop FS API is a drop-in at scale (one stream per task, no
    * driver involvement). */
  def write(bins: DataFrame, dir: String): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    d.listFiles().filter(_.getName.endsWith(".gavro")).foreach(_.delete())
    bins.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val f = new java.io.File(dir, f"part-$pid%05d.gavro")
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f))
        try it.foreach { r =>
          val b = r.getAs[Array[Byte]](0)
          out.write(Array[Byte]((b.length >>> 24).toByte, (b.length >>> 16).toByte,
            (b.length >>> 8).toByte, b.length.toByte))
          out.write(b)
        } finally out.close()
      }
    }
  }

  /** Archive the request_log synthesis to `.gavro` files, then read them
    * back through the connector and aggregate TWO of the record's eleven
    * fields — the pruned `ReadSchema` (pinned in GavroSourceSpec) reaches
    * the decoder, which walks but never materializes the other nine. The
    * oracle recomputes the aggregate straight from `events`, so a hash
    * match proves encode → file → scan → decode is lossless end-to-end. */
  def gavroScan(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_gavro_" + Integer.toHexString(sfDir.hashCode)).getAbsolutePath
    write(events.select(AvroCodec.requestLogRec.as("rec"))
      .select(expr("to_avro_graft(rec, 'request_log')").as("bin")), dir)
    spark.read.format("gavro").option("schema", "request_log").load(dir)
      .select(col("endpoint"), col("status_code"))
      .groupBy(col("endpoint"))
      .agg(count(lit(1)).as("n"),
        sum(col("status_code").cast("long")).as("sum_status"))
      .orderBy(col("endpoint"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gavro_scan" -> ((s, d) => gavroScan(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "gavro_scan" ->
      """SELECT '/api/' || event_type AS endpoint,
        |  count(*) AS n,
        |  sum(CASE WHEN event_id % 7 = 0 THEN 500 ELSE 200 END)::BIGINT AS sum_status
        |FROM events GROUP BY 1 ORDER BY endpoint""".stripMargin,
  )
}
