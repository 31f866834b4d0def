package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, LshIndex}
import graft.sources.Tables

/** The materialized MinHash-LSH dedup index: persisted round-trip of
  * signatures and band rows, build-once reuse under the pointer
  * protocol, probe ≡ the in-query incremental rebuild, and band-sliced
  * file pruning on the bands table. */
class LshIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  test("persisted sigs and bands round-trip exactly") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_rt").toString
    LshIndex.buildAndWrite(docs, dir)
    val inMem = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("sig")).toVector).toMap
    val onDisk = LshIndex.loadSigs(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("sig")).toVector).toMap
    assert(onDisk == inMem)
    assert(inMem.valuesIterator.forall(_.length == 12))
    val bandsMem = Dedup.bands(Dedup.minhashSignatures(docs)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band_idx"),
        r.getAs[String]("band_key"))).toSet
    val bandsDisk = LshIndex.loadBands(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band_idx"),
        r.getAs[String]("band_key"))).toSet
    assert(bandsDisk == bandsMem)
    assert(bandsMem.size == inMem.size * 6)
  }

  test("ensure builds once; probe equals the in-query incremental rebuild") {
    val dir = LshIndex.ensure(spark, sfDir)
    val marker = new java.io.File(dir, "bands")
      .listFiles().filter(_.getName.endsWith(".gavro")).head
    val mtime = marker.lastModified()
    assert(LshIndex.ensure(spark, sfDir) == dir)
    assert(marker.lastModified() == mtime)
    val probed = LshIndex.probeNewBatch(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard")))
    val rebuilt = Dedup.minhashIncremental(Dedup.nearCorpus(
        Tables.documents(spark, sfDir))).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard")))
    assert(probed.nonEmpty)
    assert(probed.sorted.sameElements(rebuilt.sorted))
    // every emitted pair touches the new batch — old×old never re-derived
    assert(probed.forall(_._2 >= LshIndex.NewFrom))
  }

  test("band_idx footer stats slice the bands table by band") {
    val dir = LshIndex.ensure(spark, sfDir)
    val files = new java.io.File(dir, "bands").listFiles()
      .filter(_.getName.endsWith(".gavro")).sortBy(_.getName)
    assert(files.length > 1, "bands not range-partitioned")
    val preds = Seq(graft.sources.GavroPred("band_idx", "=", 0))
    val planned = files.flatMap(f => graft.sources.GavroSkip.planFile(f, preds))
    val all = files.flatMap(f => graft.sources.GavroSkip.planFile(f, Seq.empty))
    assert(planned.length < all.length,
      s"band slice planned ${planned.length}/${all.length}")
    assert(planned.nonEmpty)
  }
}
