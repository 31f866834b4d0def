package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantize
import graft.sources.Tables

/** Streaming composition of the frozen-codebook index-maintenance story:
  * the PQ quantizer trains ONCE on the base corpus; newly-arriving
  * vectors land as files and are encoded per micro-batch against the
  * frozen (broadcast) codebooks — no retraining, no rebuild, and a
  * checkpointed restart resumes mid-backlog without re-encoding. The
  * streamed codes must be IDENTICAL to a batch encode of the same
  * vectors: encoding is a pure per-row function of (vector, codebooks),
  * which is exactly why the fold-in needs no coordination at 100 TB.
  */
class IncrementalIndexSpec extends SparkSpec {

  test("per-micro-batch encode against frozen codebooks equals the batch encode across a restart") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").as("v"))
    // Train once; freeze. (The driver-side codebook table is tiny —
    // M·K rows — and broadcasts into every batch's encode.)
    val books = Quantize.pqCodebooks(emb).collect().toSeq
      .sortBy(r => (r.getAs[Int]("sub_idx"), r.getAs[Int]("c_id")))
    val frozen = spark.createDataFrame(
      spark.sparkContext.parallelize(books.map(r => (r.getAs[Int]("sub_idx"),
        r.getAs[Int]("c_id"), r.getSeq[Double](r.fieldIndex("cv"))))))
      .toDF("sub_idx", "c_id", "cv")

    // "Tonight's crawl" lands as parquet files in a drop dir: two batches
    // of perturbed twins with fresh ids.
    val drop = java.nio.file.Files.createTempDirectory("inc-index-drop").toString
    val ckpt = java.nio.file.Files.createTempDirectory("inc-index-ck").toString
    def deltaBatch(lo: Long, hi: Long) = emb
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select((col("vec_id") + Quantize.DeltaBase).as("vec_id"),
        expr("transform(cast(v as array<double>), (x, i) -> x + ((i % 7) - 3) / 1000d)")
          .as("v"))
    deltaBatch(0, 10).write.mode("append").parquet(drop)

    val streamed = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Int]]()
    def start() = spark.readStream
      .schema("vec_id LONG, v ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", 1)
      .parquet(drop)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // the per-batch fold-in: pure encode, frozen books broadcast
        Quantize.pqEncode(df, frozen).collect().foreach { r =>
          streamed.put(r.getAs[Long]("vec_id"),
            r.getSeq[Int](r.fieldIndex("codes")))
        }
        ()
      }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(streamed.size() == emb.filter(col("vec_id") < 10).count())

    // second delta lands while the query is DOWN; restart resumes and
    // encodes only the new files
    deltaBatch(10, 25).write.mode("append").parquet(drop)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(streamed.size() == emb.filter(col("vec_id") < 25).count())

    // the streamed codes are identical to a one-shot batch encode of the
    // same vectors — encoding is pure, so streaming vs batch cannot drift
    val batch = Quantize.pqEncode(deltaBatch(0, 25), frozen).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Int](r.fieldIndex("codes"))).toMap
    import scala.jdk.CollectionConverters._
    assert(streamed.asScala.toMap == batch)
    // every code well-formed: M codes in [0, K)
    streamed.asScala.values.foreach { codes =>
      assert(codes.length == Quantize.M &&
        codes.forall(c => c >= 0 && c < Quantize.K))
    }
  }
}
