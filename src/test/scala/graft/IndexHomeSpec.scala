package graft

import graft.ops.IndexHome

/** The shared index-publication machinery's key-resolution cost contract:
  * a parquet source is byte-digested ONCE per source generation — every
  * later resolution revalidates with a name+length listing only (zero
  * byte reads) — while any regeneration that changes the listing re-keys
  * exactly as the always-digest design did. */
class IndexHomeSpec extends SparkSpec {

  private def writeSrc(dir: java.io.File, n: Long): Unit = {
    spark.range(n).toDF("id").repartition(3)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
  }

  private def partCount(dir: java.io.File): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        f.listFiles().toSeq.filterNot(_.getName.startsWith(".")).flatMap(walk)
      else Seq(f)
    walk(dir).size
  }

  test("parquet key resolution digests once, then costs zero byte reads") {
    val src = java.nio.file.Files.createTempDirectory("idxhome-src").toFile
    writeSrc(src, 100)
    IndexHome.resetFingerprintMemo()
    val parts = partCount(src)
    assert(parts >= 3)

    val before = IndexHome.digestedParts.get()
    val key1 = IndexHome.keyDir(spark, src, "spec_")
    assert(IndexHome.digestedParts.get() - before == parts,
      "cold resolution must digest every part exactly once")

    // N consecutive resolutions: same key, ZERO further byte digests —
    // the steady-state serve path's cost is the listing walk alone.
    (1 to 10).foreach { _ =>
      assert(IndexHome.keyDir(spark, src, "spec_") == key1)
    }
    assert(IndexHome.digestedParts.get() - before == parts,
      "steady-state resolutions must not re-digest")
  }

  test("a regenerated source misses the cheap check and re-keys") {
    val src = java.nio.file.Files.createTempDirectory("idxhome-regen").toFile
    writeSrc(src, 100)
    IndexHome.resetFingerprintMemo()
    val key1 = IndexHome.keyDir(spark, src, "spec_")
    val warm = IndexHome.digestedParts.get()
    // regenerate IN PLACE under the same path — the continuously-
    // maintained operating mode the r12 design paid a full digest per
    // resolution to catch; the listing signature (names/lengths) changes,
    // so the memo misses, the digest reruns, and the key moves.
    writeSrc(src, 150)
    val key2 = IndexHome.keyDir(spark, src, "spec_")
    assert(key2 != key1, "regenerated source must re-key")
    assert(IndexHome.digestedParts.get() > warm,
      "regeneration must trigger a fresh digest")
    // and the new generation amortizes again
    val after = IndexHome.digestedParts.get()
    assert(IndexHome.keyDir(spark, src, "spec_") == key2)
    assert(IndexHome.digestedParts.get() == after)
  }

  test("the digest is a pure content function — memo on/off agree") {
    val src = java.nio.file.Files.createTempDirectory("idxhome-det").toFile
    writeSrc(src, 64)
    IndexHome.resetFingerprintMemo()
    val cold = IndexHome.sourceFingerprint(src)
    val warm = IndexHome.sourceFingerprint(src)
    IndexHome.resetFingerprintMemo()
    val recold = IndexHome.sourceFingerprint(src)
    assert(cold == warm && warm == recold)
  }
}
