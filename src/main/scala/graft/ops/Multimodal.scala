package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media treated as opaque `binary` columns with
  * typed metadata, plus frame-sampling and a clearly-stubbed decode stage.
  *
  * The container has no image/audio codecs, so `decodeStub` derives
  * deterministic fake features (dimensions/brightness) from the bytes — the
  * Spark-side contract that matters is real and tested: binary column in
  * parquet, per-row metadata extraction, strided byte sampling (the
  * frame-sample pattern), and batched per-partition processing. A real
  * decoder drops into [[decodeStub]]'s slot as a `mapPartitions` batch
  * (JNI/FFI) or an Arrow-batched Python worker without touching the
  * surrounding plan.
  */
object Multimodal {

  /** `documents.text` re-cast as the opaque media `binary` column. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("media"))

  /** Typed metadata over an opaque binary column: byte length, content hash,
    * magic-bytes prefix — the schema a media lake actually carries.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("media")).cast("long").as("n_bytes"),
      sha2(col("media"), 256).as("content_sha"),
      hex(substring(col("media"), 1, 8)).as("magic_hex"))
      .orderBy(col("doc_id"))

  /** Frame sampling: fixed-stride byte windows out of the payload (the
    * video-frame / audio-chunk access pattern), hex-encoded.
    */
  def frameSample(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      expr("concat_ws(':', transform(sequence(0, 3), i -> hex(substring(media, 1 + 16 * i, 2))))")
        .as("frames"))
      .orderBy(col("doc_id"))

  /** STUB decode: deterministic fake features from the content hash — stands
    * in for image decode / resize / feature extraction. Registered without
    * an oracle on purpose (rows-only check): the real implementation would
    * be a batched native decoder, not SQL.
    */
  def decodeStub(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      (expr("cast(conv(substring(md5(media), 1, 8), 16, 10) as bigint)") % 1920)
        .as("fake_width"),
      (expr("cast(conv(substring(md5(media), 9, 8), 16, 10) as bigint)") % 1080)
        .as("fake_height"),
      (expr("cast(conv(substring(md5(media), 17, 8), 16, 10) as bigint)") % 256)
        .as("fake_brightness"))
      .orderBy(col("doc_id"))

  /** Output row of the batched decode stage. */
  final case class DecodedMedia(doc_id: Long, n_bytes: Int, codec: String,
      fake_luma: Double)

  /** STUB batched decode via `mapPartitions`: the pattern a real media
    * decoder needs — one expensive codec handle per PARTITION (not per
    * row), then an iterator-to-iterator pass over the binary payloads.
    * This is the Scala analog of the reference-free `mapInPandas` batch
    * UDF pattern: the decode body below is a deterministic fake (byte sum),
    * clearly marked; a JNI/FFI image or audio codec drops into
    * `FakeCodec.decode` without touching the plan. Registered rows-only
    * (no oracle — not SQL, by design).
    */
  def decodeBatched(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // One codec init per partition — the whole point of the batch shape.
        val codec = new FakeCodec()
        rows.map { case (id, bytes) =>
          DecodedMedia(id, bytes.length, codec.name, codec.decode(bytes))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** STUB stand-in for a native decoder handle (expensive to construct,
    * reused across a partition). Deterministic: mean byte value as "luma".
    */
  private final class FakeCodec {
    val name = "stub-codec-v0"
    def decode(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> ((s, d) => mediaMeta(mediaTable(Tables.documents(s, d)))),
    "media_frame_sample" -> ((s, d) => frameSample(mediaTable(Tables.documents(s, d)))),
    "media_decode_stub" -> ((s, d) => decodeStub(mediaTable(Tables.documents(s, d)))),
    "media_decode_batched" -> ((s, d) => decodeBatched(mediaTable(Tables.documents(s, d)))),
  )

  def oracleSql: Map[String, String] = Map(
    // The corpus is ASCII, so byte offsets == char offsets and DuckDB's
    // string functions mirror Spark's binary ones exactly.
    "media_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  sha256(text) AS content_sha,
        |  hex(encode(substr(text, 1, 8))) AS magic_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_frame_sample" ->
      """SELECT doc_id,
        |  concat_ws(':',
        |    hex(encode(substr(text, 1, 2))), hex(encode(substr(text, 17, 2))),
        |    hex(encode(substr(text, 33, 2))), hex(encode(substr(text, 49, 2)))) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // media_decode_stub: no oracle — stubbed decode, rows-only check.
  )
}
