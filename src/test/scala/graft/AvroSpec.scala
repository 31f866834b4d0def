package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{AvroCodec, Tables}
import graft.sources.AvroCodec._

/** The hand-rolled Avro binary codec (S3 transport without the spark-avro
  * jar): golden bytes computed by hand from the Avro 1.11 spec, PERMISSIVE
  * null-out on corruption, round-trip properties, and the in-plan
  * expressions.
  */
class AvroSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("system_metrics encoding matches hand-computed Avro spec bytes") {
    // Record: id=3, node_name="ab", metric_name="c", metric_value=1.5,
    // recorded_at=1000ms (passed as 1_000_000 micros).
    //   id:       zigzag(3)=6                  -> 06
    //   node_name: len zigzag(2)=4, 'a' 'b'    -> 04 61 62
    //   metric_name: len zigzag(1)=2, 'c'      -> 02 63
    //   metric_value: 1.5 = 0x3FF8000000000000 little-endian
    //                                          -> 00 00 00 00 00 00 F8 3F
    //   recorded_at: zigzag(1000)=2000 varint  -> D0 0F
    val vals: Array[Any] = Array(3L, UTF8String.fromString("ab"),
      UTF8String.fromString("c"), 1.5, 1000000L)
    val bytes = AvroCodec.encode(SystemMetrics, vals(_), _ => false)
    val expected = Array(0x06, 0x04, 0x61, 0x62, 0x02, 0x63,
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xF8, 0x3F, 0xD0, 0x0F).map(_.toByte)
    assert(bytes.toSeq == expected.toSeq,
      bytes.map(b => f"${b & 0xFF}%02X").mkString(" "))
    // and the decoder reads the golden bytes back to the same values
    val row = AvroCodec.decode(SystemMetrics, expected)
    assert(row.getLong(0) == 3L && row.getUTF8String(1).toString == "ab")
    assert(row.getUTF8String(2).toString == "c" && row.getDouble(3) == 1.5)
    assert(row.getLong(4) == 1000000L) // millis back to micros
  }

  test("null-first union branches encode index 0 / index 1 per the spec") {
    // request_log with every union field null vs populated: union index is
    // an Avro long — zigzag(0)=0x00 for null, zigzag(1)=0x02 for branch 1.
    def enc(endpoint: Option[String]): Array[Byte] = {
      val vals: Array[Any] = Array(1L, endpoint.map(UTF8String.fromString).orNull,
        null, 200, 5, null, null, null, null, null, 0L)
      AvroCodec.encode(RequestLog, vals(_), i => vals(i) == null)
    }
    val withNull = enc(None)
    val withVal = enc(Some("x"))
    // field 0: id zigzag(1) = 02; field 1 union index follows
    assert(withNull(1) == 0x00.toByte, withNull.map(b => f"$b%02X").mkString(" "))
    assert(withVal(1) == 0x02.toByte, withVal.map(b => f"$b%02X").mkString(" "))
    // branch payload: len zigzag(1)=02 then 'x'
    assert(withVal(2) == 0x02.toByte && withVal(3) == 'x'.toByte)
    // both decode back
    val r0 = AvroCodec.decode(RequestLog, withNull)
    assert(r0.isNullAt(1) && r0.getInt(3) == 200)
    val r1 = AvroCodec.decode(RequestLog, withVal)
    assert(r1.getUTF8String(1).toString == "x")
  }

  test("PERMISSIVE: truncation, bad union index, and bad length null out the record") {
    val vals: Array[Any] = Array(3L, UTF8String.fromString("ab"),
      UTF8String.fromString("c"), 1.5, 1000000L)
    val good = AvroCodec.encode(SystemMetrics, vals(_), _ => false)
    assert(AvroCodec.decode(SystemMetrics, good) != null)
    // every strict prefix of a valid record is malformed
    for (n <- 0 until good.length) {
      assert(AvroCodec.decode(SystemMetrics, good.take(n)) == null, s"prefix $n")
    }
    // bad union index (9 -> zigzag 18 = 0x12) on request_log field 1
    val badUnion = Array[Byte](0x02, 0x12)
    assert(AvroCodec.decode(RequestLog, badUnion) == null)
    // negative string length
    val badLen = Array[Byte](0x06, 0x01) // id=3, node_name len zigzag -> -1
    assert(AvroCodec.decode(SystemMetrics, badLen) == null)
  }

  test("round-trip is the identity across randomized values and null branches") {
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 200) {
      def mbStr(): Any =
        if (rng.nextBoolean()) null
        else UTF8String.fromString(rng.alphanumeric.take(rng.nextInt(20)).mkString)
      val vals: Array[Any] = Array(
        rng.nextLong(), mbStr(), mbStr(), rng.nextInt(), rng.nextInt(),
        if (rng.nextBoolean()) null else rng.nextLong(),
        mbStr(), mbStr(), mbStr(), mbStr(),
        // micros at exact-millis grain: the wire carries millis
        Math.floorDiv(rng.nextLong(), 1000L) * 1000L)
      val bytes = AvroCodec.encode(RequestLog, vals(_), i => vals(i) == null)
      val row = AvroCodec.decode(RequestLog, bytes)
      assert(row != null)
      for (i <- vals.indices) {
        if (vals(i) == null) assert(row.isNullAt(i), s"field $i")
        else assert(row.get(i, sqlType(RequestLog).fields(i).dataType) == vals(i),
          s"field $i: ${vals(i)}")
      }
    }
  }

  test("in-plan expressions round-trip and the corrupt channel filters like the reference") {
    val out = AvroCodec.avroRoundtrip(Tables.events(spark, dir))
    val rows = out.collect()
    assert(rows.length > 0)
    val (corrupt, good) = rows.partition(_.getAs[Boolean]("is_corrupt"))
    assert(corrupt.nonEmpty && good.nonEmpty)
    // corrupt rows: whole-record null-out (every decoded field null)
    corrupt.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("endpoint")) && r.isNullAt(r.fieldIndex("created_ms")))
    }
    // good rows: spot-check the derivations the oracle recomputes
    good.take(50).foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.getAs[String]("endpoint").startsWith("/api/"))
      assert(r.getAs[Long]("status_code") == (if (id % 7 == 0) 500L else 200L))
    }
    // the reference's `data IS NOT NULL` filter drops exactly the corrupt rows
    val kept = out.filter(not(col("is_corrupt"))).count()
    assert(kept == good.length.toLong)
  }

  // ---- schema evolution, cross-validated against the REAL Avro library ----

  test("schema JSON parses to the hand-built ADT") {
    assert(AvroCodec.parseSchema(AvroCodec.RequestLogJson) == RequestLog)
  }

  test("wire format agrees with org.apache.avro byte-for-byte") {
    // Encode with the codec, decode with the reference implementation (and
    // the reverse) — independent validation that the hand-rolled binary
    // format IS Avro, not merely self-consistent.
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter}
    import org.apache.avro.io.{DecoderFactory, EncoderFactory}
    val schema = new org.apache.avro.Schema.Parser().parse(AvroCodec.RequestLogJson)
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      def mbStr(): Any =
        if (rng.nextBoolean()) null
        else UTF8String.fromString(rng.alphanumeric.take(rng.nextInt(16)).mkString)
      val vals: Array[Any] = Array(
        rng.nextLong(), mbStr(), mbStr(), rng.nextInt(), rng.nextInt(),
        if (rng.nextBoolean()) null else rng.nextLong(),
        mbStr(), mbStr(), mbStr(), mbStr(),
        Math.floorDiv(rng.nextLong(), 1000L) * 1000L)
      val ours = AvroCodec.encode(RequestLog, vals(_), i => vals(i) == null)
      // reference implementation decodes our bytes to the same values
      val reader = new GenericDatumReader[GenericData.Record](schema)
      val rec = reader.read(null,
        DecoderFactory.get().binaryDecoder(ours, null))
      for (i <- vals.indices) {
        val got = rec.get(i)
        vals(i) match {
          case null => assert(got == null, s"field $i")
          case s: UTF8String => assert(got.toString == s.toString, s"field $i")
          case l: Long if i == 10 => // timestamp-millis: wire millis
            assert(got.asInstanceOf[Long] == Math.floorDiv(l, 1000L), s"field $i")
          case v => assert(got == v, s"field $i: $got vs $v")
        }
      }
      // reference implementation re-encodes to the identical byte string
      val writer = new GenericDatumWriter[GenericData.Record](schema)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      writer.write(rec, enc); enc.flush()
      assert(java.util.Arrays.equals(bos.toByteArray, ours))
    }
  }

  test("evolved decode equals org.apache.avro schema resolution") {
    import org.apache.avro.generic.{GenericData, GenericDatumReader}
    import org.apache.avro.io.DecoderFactory
    val wSchema = new org.apache.avro.Schema.Parser().parse(AvroCodec.RequestLogJson)
    val rSchema = new org.apache.avro.Schema.Parser().parse(AvroCodec.RequestLogV2Json)
    val readerRec = AvroCodec.parseSchema(AvroCodec.RequestLogV2Json)
    val plan = AvroCodec.resolvePlan(RequestLog, readerRec)
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      def mbStr(): Any =
        if (rng.nextBoolean()) null
        else UTF8String.fromString(rng.alphanumeric.take(rng.nextInt(16)).mkString)
      val vals: Array[Any] = Array(
        rng.nextLong(), mbStr(), mbStr(), rng.nextInt(), rng.nextInt(),
        if (rng.nextBoolean()) null else rng.nextLong(),
        mbStr(), mbStr(), mbStr(), mbStr(),
        Math.floorDiv(rng.nextLong(), 1000L) * 1000L)
      val bytes = AvroCodec.encode(RequestLog, vals(_), i => vals(i) == null)
      val ours = AvroCodec.decodeResolved(plan, readerRec, bytes)
      assert(ours != null)
      val ref = new GenericDatumReader[GenericData.Record](wSchema, rSchema)
        .read(null, DecoderFactory.get().binaryDecoder(bytes, null))
      // field-by-field: promotions applied, trace_id defaulted null
      val rt = sqlType(readerRec)
      for (i <- readerRec.fields.indices) {
        val name = readerRec.fields(i).name
        val refV = ref.get(name)
        if (ours.isNullAt(i)) assert(refV == null, s"$name: ref $refV")
        else {
          val ourV = ours.get(i, rt.fields(i).dataType)
          refV match {
            case u: org.apache.avro.util.Utf8 => assert(ourV.toString == u.toString, name)
            case l: java.lang.Long if name == "created_at" =>
              assert(ourV.asInstanceOf[Long] == l * 1000L, name) // micros internal
            case v => assert(ourV == v, s"$name: $ourV vs $v")
          }
        }
      }
      assert(ours.isNullAt(readerRec.fields.indexWhere(_.name == "trace_id")))
    }
    // PERMISSIVE survives the resolved path
    val plain: Array[Any] =
      Array(1L, null, null, 200, 5, null, null, null, null, null, 0L)
    val bytes = AvroCodec.encode(RequestLog, i => plain(i),
      i => Set(1, 2, 5, 6, 7, 8, 9).contains(i))
    assert(AvroCodec.decodeResolved(plan, readerRec,
      java.util.Arrays.copyOf(bytes, 2)) == null)
  }

  test("incompatible evolutions are rejected at resolution time") {
    // long → int is a demotion; a non-nullable reader-only field has no default
    val demote = AvroCodec.parseSchema(
      """{"type":"record","name":"R","fields":[{"name":"id","type":"int"}]}""")
    val base = AvroCodec.parseSchema(
      """{"type":"record","name":"R","fields":[{"name":"id","type":"long"}]}""")
    intercept[IllegalArgumentException] { AvroCodec.resolvePlan(base, demote) }
    val orphan = AvroCodec.parseSchema(
      """{"type":"record","name":"R","fields":[
        |{"name":"id","type":"long"},{"name":"must","type":"string"}]}"""
        .stripMargin.replace("\n", ""))
    intercept[IllegalArgumentException] { AvroCodec.resolvePlan(base, orphan) }
  }

  test("orders Debezium envelope parses with string-first union order intact") {
    val r = AvroCodec.OrdersCdc
    assert(r.name == "OrdersCdc" && r.fields.length == 14)
    // The union-order trap (reference schemas.py:173-179): currency and the
    // ZonedTimestamp fields put the VALUE branch first, null second — a
    // null-first assumption would mis-index every non-null value.
    assert(r.fields(3) == AField("currency", AUnion(Vector(AString, ANull))))
    assert(r.fields(8) == AField("created_at", AUnion(Vector(AString, ANull))))
    assert(r.fields(9) == AField("updated_at", AUnion(Vector(AString, ANull))))
    // Null-first metadata tail unchanged.
    assert(r.fields(10) == AField("__op", AUnion(Vector(ANull, AString))))
    assert(r.fields(12) == AField("__source_ts_ms", AUnion(Vector(ANull, ALong))))
  }

  test("orders envelope wire format agrees with org.apache.avro byte-for-byte") {
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter}
    import org.apache.avro.io.{DecoderFactory, EncoderFactory}
    val schema = new org.apache.avro.Schema.Parser().parse(AvroCodec.OrdersCdcJson)
    val rec = AvroCodec.OrdersCdc
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      def mbStr(): Any =
        if (rng.nextBoolean()) null
        else UTF8String.fromString(rng.alphanumeric.take(rng.nextInt(16)).mkString)
      def str(): Any = UTF8String.fromString(
        rng.alphanumeric.take(1 + rng.nextInt(12)).mkString)
      val vals: Array[Any] = Array(
        rng.nextLong(),                                  // id
        if (rng.nextBoolean()) null else rng.nextLong(), // user_id
        rng.nextDouble() * 1e4,                          // total_amount
        mbStr(),                                         // currency (string-first)
        str(),                                           // status
        mbStr(), mbStr(), mbStr(),                       // region/display/platform
        mbStr(), mbStr(),                                // created_at/updated_at
        mbStr(), mbStr(),                                // __op/__table
        if (rng.nextBoolean()) null else rng.nextLong(), // __source_ts_ms
        mbStr())                                         // __deleted
      val ours = AvroCodec.encode(rec, vals(_), i => vals(i) == null)
      val reader = new GenericDatumReader[GenericData.Record](schema)
      val got = reader.read(null, DecoderFactory.get().binaryDecoder(ours, null))
      for (i <- vals.indices) vals(i) match {
        case null => assert(got.get(i) == null, s"field $i")
        case s: UTF8String => assert(got.get(i).toString == s.toString, s"field $i")
        case v => assert(got.get(i) == v, s"field $i: ${got.get(i)} vs $v")
      }
      val writer = new GenericDatumWriter[GenericData.Record](schema)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      writer.write(got, enc); enc.flush()
      assert(java.util.Arrays.equals(bos.toByteArray, ours),
        "re-encode through org.apache.avro must be byte-identical")
    }
  }

  test("sessions envelope: boolean-first union + non-nullable ZonedTimestamp") {
    val r = AvroCodec.SessionsCdc
    assert(r.name == "SessionsCdc" && r.fields.length == 14)
    // The OTHER documented union-order trap: is_active puts boolean first.
    assert(r.fields(8) == AField("is_active", AUnion(Vector(ABoolean, ANull))))
    // started_at is a BARE string (UUID/ZonedTimestamp annotations melt to
    // string) — no union, so a null there must fail encode, not wire-null.
    assert(r.fields(2) == AField("started_at", AString))
    assert(r.fields(0) == AField("id", AString))
  }

  test("sessions envelope wire format agrees with org.apache.avro byte-for-byte") {
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter}
    import org.apache.avro.io.{DecoderFactory, EncoderFactory}
    val schema = new org.apache.avro.Schema.Parser().parse(AvroCodec.SessionsCdcJson)
    val rec = AvroCodec.SessionsCdc
    val rng = new scala.util.Random(17)
    for (_ <- 1 to 50) {
      def mbStr(): Any =
        if (rng.nextBoolean()) null
        else UTF8String.fromString(rng.alphanumeric.take(rng.nextInt(16)).mkString)
      def str(): Any = UTF8String.fromString(
        rng.alphanumeric.take(1 + rng.nextInt(12)).mkString)
      val vals: Array[Any] = Array(
        str(),                                           // id (required)
        if (rng.nextBoolean()) null else rng.nextLong(), // user_id
        str(),                                           // started_at (required)
        mbStr(),                                         // ended_at
        mbStr(), mbStr(), mbStr(), mbStr(),              // platform..region
        if (rng.nextBoolean()) null else rng.nextBoolean(), // is_active (bool-first)
        mbStr(),                                         // created_at
        mbStr(), mbStr(),                                // __op/__table
        if (rng.nextBoolean()) null else rng.nextLong(), // __source_ts_ms
        mbStr())                                         // __deleted
      val ours = AvroCodec.encode(rec, vals(_), i => vals(i) == null)
      val reader = new GenericDatumReader[GenericData.Record](schema)
      val got = reader.read(null, DecoderFactory.get().binaryDecoder(ours, null))
      for (i <- vals.indices) vals(i) match {
        case null => assert(got.get(i) == null, s"field $i")
        case s: UTF8String => assert(got.get(i).toString == s.toString, s"field $i")
        case v => assert(got.get(i) == v, s"field $i: ${got.get(i)} vs $v")
      }
      val writer = new GenericDatumWriter[GenericData.Record](schema)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      writer.write(got, enc); enc.flush()
      assert(java.util.Arrays.equals(bos.toByteArray, ours))
    }
  }

  test("orders envelope PERMISSIVE: truncation and bad union index null out") {
    val rec = AvroCodec.OrdersCdc
    val vals: Array[Any] = Array(7L, 3L, 1.5, UTF8String.fromString("USD"),
      UTF8String.fromString("O"), null, null, null,
      UTF8String.fromString("2024-01-01T00:00:00.000000Z"), null,
      UTF8String.fromString("c"), UTF8String.fromString("orders"), 123L,
      UTF8String.fromString("false"))
    val good = AvroCodec.encode(rec, vals(_), i => vals(i) == null)
    assert(AvroCodec.decode(rec, good) != null)
    assert(AvroCodec.decode(rec, good.take(4)) == null, "truncated body")
    // id=7 encodes as one zigzag byte, so byte 1 is user_id's union index;
    // 0x09 zigzag-decodes to -5 — out of range for a 2-branch union.
    val bad = good.clone()
    bad(1) = 0x09
    assert(AvroCodec.decode(rec, bad) == null, "bad union index")
  }
}
