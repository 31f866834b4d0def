package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
  *   - [[SupportsPushDownFilters]]: eq/lt/gt/null-test conjuncts on scalar
  *     fields are accepted at the builder and evaluated INSIDE the reader
  *     loop right after decode — a non-matching record never becomes a row
  *     the engine has to carry. Accepted conjuncts are removed from the
  *     post-scan `Filter` (the reader's evaluation is exact, including the
  *     SQL null-comparison contract), so a fully-pushed predicate leaves
  *     no `FilterExec` above the scan at all; anything unsupported
  *     (timestamps, In, Or-trees) is handed back to Spark untouched.
  *     Filter-only columns are added to the decode target and dropped
  *     before emit, so pruning and filtering compose.
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private val record = AvroCodec.schemaByName(schemaName)
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Limit lands AFTER the pushed filters in the reader loop, so each
    * partition decodes at most `limit` MATCHING records and stops walking
    * the wire — Spark's global limit over partitions still applies above. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  // Scalar fields only: timestamp literals arrive from Catalyst in several
  // JVM shapes (Timestamp/Instant/Long) — not worth the ambiguity at the
  // reader, so timestamp conjuncts stay with Spark.
  private def scalarField(name: String): Boolean =
    record.fields.exists(f => f.name == name && (AvroCodec.unwrapNull(f.tpe) match {
      case AvroCodec.AInt | AvroCodec.ALong | AvroCodec.ADouble |
           AvroCodec.ABoolean | AvroCodec.AString => true
      case _ => false
    }))
  private def litOk(v: Any): Boolean = v match {
    case _: Int | _: Long | _: Double | _: Boolean | _: String => true
    case _ => false
  }
  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v) => scalarField(a) && litOk(v)
    case GreaterThan(a, v) => scalarField(a) && litOk(v)
    case GreaterThanOrEqual(a, v) => scalarField(a) && litOk(v)
    case LessThan(a, v) => scalarField(a) && litOk(v)
    case LessThanOrEqual(a, v) => scalarField(a) && litOk(v)
    case IsNotNull(a) => scalarField(a)
    case IsNull(a) => scalarField(a)
    case _ => false
  }

  /** Contract: the RETURNED filters are the ones Spark must still apply
    * post-scan; everything accepted here is fully enforced by the reader
    * and vanishes from the plan above the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(supported)
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new GavroScan(path, schemaName, required, pushed, limit)
}

class GavroScan(path: String, schemaName: String, required: StructType,
    pushed: Array[Filter], limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"gavro $path, schema=$schemaName, ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}" +
      (if (limit >= 0) s", PushedLimit: $limit" else "")
  override def planInputPartitions(): Array[InputPartition] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".gavro")).sortBy(_.getName)
      .map(f => GavroInputPartition(f.getAbsolutePath): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    GavroReaderFactory(schemaName, required.fieldNames,
      pushed.map(GavroPred.from), limit)
}

/** Serializable reader-side form of one pushed conjunct. `value` is one of
  * Int/Long/Double/Boolean/String (the builder admitted nothing else). */
case class GavroPred(name: String, op: String, value: Any) extends Serializable

object GavroPred {
  def from(f: Filter): GavroPred = f match {
    case EqualTo(a, v) => GavroPred(a, "=", v)
    case GreaterThan(a, v) => GavroPred(a, ">", v)
    case GreaterThanOrEqual(a, v) => GavroPred(a, ">=", v)
    case LessThan(a, v) => GavroPred(a, "<", v)
    case LessThanOrEqual(a, v) => GavroPred(a, "<=", v)
    case IsNotNull(a) => GavroPred(a, "notnull", null)
    case IsNull(a) => GavroPred(a, "isnull", null)
    case other => throw new IllegalArgumentException(s"unpushable: $other")
  }
}

case class GavroInputPartition(file: String) extends InputPartition

/** Serializable recipe shipped to executors: record shape, required
  * columns, and pushed conjuncts travel as names/values; the schema ADT is
  * rebuilt per reader. */
case class GavroReaderFactory(schemaName: String, requiredNames: Array[String],
    preds: Array[GavroPred], limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GavroPartitionReader(partition.asInstanceOf[GavroInputPartition].file,
      schemaName, requiredNames, preds, limit)
}

class GavroPartitionReader(file: String, schemaName: String,
    requiredNames: Array[String], preds: Array[GavroPred], limit: Int)
    extends PartitionReader[InternalRow] {
  private var emitted = 0
  private val record = AvroCodec.schemaByName(schemaName)
  // Decode target = required columns, then any filter-only columns appended
  // after them — evaluated, never emitted.
  private val extNames: Array[String] =
    requiredNames ++ preds.map(_.name).distinct.filterNot(requiredNames.contains)
  private val target: Array[Int] =
    record.fields.map(f => extNames.indexOf(f.name)).toArray
  // Pre-resolve each conjunct to (slot, op, comparison value); string
  // literals become UTF8String ONCE so the per-row compare is binary
  // UTF-8 order (Spark's string ordering) with zero allocation.
  private val compiled: Array[(Int, String, Any)] = preds.map { p =>
    val v = p.value match {
      case s: String => UTF8String.fromString(s)
      case other => other
    }
    (extNames.indexOf(p.name), p.op, v)
  }
  private val bytes =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
  private var pos = 0
  private var row: InternalRow = _

  // SQL comparison semantics: NULL compared to anything is not-true, so a
  // comparison conjunct drops the row (this is exactly what the FilterExec
  // this pushdown replaced would have done — PERMISSIVE all-null rows
  // survive only null-tests, same as with spark-avro + a WHERE clause).
  private def pass(r: InternalRow): Boolean = {
    var i = 0
    while (i < compiled.length) {
      val (slot, op, w) = compiled(i)
      val v = if (r.isNullAt(slot)) null
        else r.get(slot, null) // GenericInternalRow ignores the type arg
      val ok = op match {
        case "isnull" => v == null
        case "notnull" => v != null
        case _ if v == null => false
        case _ =>
          val c = (v, w) match {
            case (a: Int, b: Number) => java.lang.Long.compare(a.toLong, b.longValue)
            case (a: Long, b: Number) => java.lang.Long.compare(a, b.longValue)
            case (a: Double, b: Number) => java.lang.Double.compare(a, b.doubleValue)
            case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
            case (a: UTF8String, b: UTF8String) => a.compareTo(b)
            case _ => return false // type drift: drop rather than mis-match
          }
          op match {
            case "=" => c == 0
            case ">" => c > 0
            case ">=" => c >= 0
            case "<" => c < 0
            case "<=" => c <= 0
          }
      }
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Project the extended decode row down to the required prefix. */
  private def emit(r: InternalRow): InternalRow =
    if (extNames.length == requiredNames.length) r
    else {
      val out = new Array[Any](requiredNames.length)
      var i = 0
      while (i < out.length) { out(i) = r.get(i, null); i += 1 }
      new GenericInternalRow(out)
    }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (pos + 4 <= bytes.length) {
      val n = ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      pos += 4
      if (n < 0 || pos + n > bytes.length) return false // truncated tail: stop
      val body = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      val decoded = AvroCodec.decodeProjected(record, body, target,
        extNames.length)
      // PERMISSIVE: undecodable body → all-null row, count preserved
      // (modulo pushed filters, which see the nulls like any WHERE would).
      val ext = if (decoded != null) decoded
        else new GenericInternalRow(extNames.length)
      if (pass(ext)) { row = emit(ext); emitted += 1; return true }
    }
    false
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
    val dir = archive(spark, sfDir)
    spark.read.format("gavro").option("schema", "request_log").load(dir)
      .select(col("endpoint"), col("status_code"))
      .groupBy(col("endpoint"))
      .agg(count(lit(1)).as("n"),
        sum(col("status_code").cast("long")).as("sum_status"))
      .orderBy(col("endpoint"))
  }

  /** Archive the request_log synthesis once per sf-dir (idempotent: the
    * writer clears prior `.gavro` files first). */
  private def archive(spark: SparkSession, sfDir: String): String = {
    val events = Tables.events(spark, sfDir)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_gavro_" + Integer.toHexString(sfDir.hashCode)).getAbsolutePath
    write(events.select(AvroCodec.requestLogRec.as("rec"))
      .select(expr("to_avro_graft(rec, 'request_log')").as("bin")), dir)
    dir
  }

  /** Same archive, scanned through PUSHED filters: the error-status and
    * endpoint-range conjuncts are enforced inside the wire-decode loop
    * (GavroSourceSpec pins that no `FilterExec` survives above the scan),
    * so non-matching records never become rows. The oracle recomputes the
    * same predicate from the `events` synthesis — a hash match proves the
    * reader-side evaluation is exactly the WHERE it replaced. */
  def gavroScanPushdown(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = archive(spark, sfDir)
    spark.read.format("gavro").option("schema", "request_log").load(dir)
      .filter(col("status_code") === 500 && col("endpoint") >= "/api/p")
      .groupBy(col("endpoint"))
      .agg(count(lit(1)).as("n"), sum(col("latency_ms")).as("sum_latency"))
      .orderBy(col("endpoint"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gavro_scan" -> ((s, d) => gavroScan(s, d)),
    "gavro_scan_pushdown" -> ((s, d) => gavroScanPushdown(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "gavro_scan" ->
      """SELECT '/api/' || event_type AS endpoint,
        |  count(*) AS n,
        |  sum(CASE WHEN event_id % 7 = 0 THEN 500 ELSE 200 END)::BIGINT AS sum_status
        |FROM events GROUP BY 1 ORDER BY endpoint""".stripMargin,
    "gavro_scan_pushdown" ->
      """SELECT '/api/' || event_type AS endpoint, count(*) AS n,
        |  sum(event_id % 500)::BIGINT AS sum_latency
        |FROM events
        |WHERE event_id % 7 = 0 AND '/api/' || event_type >= '/api/p'
        |GROUP BY 1 ORDER BY endpoint""".stripMargin,
  )
}
