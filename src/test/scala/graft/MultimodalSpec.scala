package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Perceptual-hash near-dup over the media path: catches what exact
  * content hashing cannot, and stays safe on degenerate corpora. */
class MultimodalSpec extends SparkSpec {

  private def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)

  test("tail-mutated re-encode pairs at Hamming 0 while content hashes differ") {
    import spark.implicits._
    // doc 25 (doc_id % 25 == 0) gets a planted twin with the tail rewritten
    // beyond the 256-char signature window; fillers are sig-distinct.
    val base = "ab" * 150 // 300 chars, first 256 identical in the plant
    val docs = Seq(
      doc(25, base),
      doc(1, "z" * 300),
      doc(2, ("xy" * 64) + ("q" * 172)),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    assert(pairs.contains((25L, 10025L, 0L)), pairs.mkString(", "))
    // Exact content hashing misses the same twin: the shas differ.
    val shas = Multimodal.mediaMeta(Multimodal.mediaTable(
        Multimodal.phashCorpus(docs).withColumn("lang", lit("en"))
          .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("content_sha")).toMap
    assert(shas(25L) != shas(10025L))
  }

  test("monochrome corpus collapses to one signature and the cap stops the join") {
    import spark.implicits._
    // Every payload identical → every signature identical → one mega-bucket.
    // With more docs than the cap, the bucket is dropped entirely: zero
    // pairs instead of a quadratic self-join.
    val n = Multimodal.PhashMaxBucket + 50
    val docs = (1 to n).map(i => doc(i.toLong, "m" * 300))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Multimodal.phashPairs(docs).collect().isEmpty)
  }

  test("native char_block_sums is bit-equal to the nested-lambda formulation") {
    import spark.implicits._
    // Mixed ASCII / CJK / short / exact-length payloads: code-point
    // indexing must agree with substring-by-codepoint + ascii semantics.
    val docs = Seq(
      (1L, "plain ascii text " * 20),
      (2L, "的是了在我" * 60),
      (3L, ("mix 的 and ascii " * 20)),
      (4L, "x" * 256),
      (5L, "short"),
      (6L, ""),
    ).toDF("doc_id", "text")
    val b = Multimodal.PhashBlocks
    val l = Multimodal.PhashBlockLen
    val native = docs.selectExpr("doc_id", s"char_block_sums(text, $b, $l) AS s")
    val lambda = docs.selectExpr("doc_id",
      s"""transform(sequence(0, ${b - 1}, 1), b ->
         |  aggregate(transform(sequence($l * b + 1, $l * (b + 1), 1),
         |    i -> ascii(substring(text, i, 1))),
         |    0L, (a, x) -> a + x)) AS s""".stripMargin)
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val m = lambda.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n.keySet == m.keySet)
    n.keySet.foreach(k => assert(n(k) == m(k), s"doc $k: ${n(k)} vs ${m(k)}"))
  }

  test("decodeBatched decodes real PNG bytes back to the planted pixels") {
    import spark.implicits._
    val docs = Seq(doc(0, "a"), doc(7, "b"), doc(123, "c"), doc(10000, "d"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = Multimodal.pngCorpus(docs).cache()
    // the payloads are REAL PNGs: RFC 2083 magic, and ImageIO-readable
    val blobs = corpus.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media")).toMap
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    blobs.values.foreach(b => assert(b.take(8).sameElements(magic)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blobs(123L)))
    assert(img.getWidth == Multimodal.pngWidth(123L) &&
      img.getHeight == Multimodal.pngHeight(123L))
    // decoded features equal the closed-form definition, per doc
    val got = Multimodal.decodeBatched(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("luma_sum"), r.getAs[Long]("mean_luma_milli"))).toMap
    blobs.keys.foreach { id =>
      val w = Multimodal.pngWidth(id); val h = Multimodal.pngHeight(id)
      val s = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pngPixel(id, x, y).toLong).sum
      assert(got(id) == (w.toLong, h.toLong, s, s * 1000L / (w * h)),
        s"doc $id: ${got(id)}")
    }
    corpus.unpersist()
  }

  test("corrupt payloads never fail the partition: null features, flag set, neighbors decode") {
    import spark.implicits._
    // One partition on purpose: the corrupt payloads and the good ones
    // share a task AND a reader instance — the PERMISSIVE contract is
    // that the bad record is flagged and the task (and the reader state
    // for subsequent records) survives.
    val docs = Seq(doc(13, "a"), doc(26, "b"), doc(14, "c"), doc(40, "d"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = Multimodal.pngCorpusWithCorrupt(docs).coalesce(1).cache()
    // the two planted corrupt shapes are REALLY corrupt in distinct ways:
    // 26 is a TRUNCATED PNG (valid magic, cut mid-IHDR), 13 is not a PNG
    val blobs = corpus.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media")).toMap
    val magic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    assert(blobs(26L).length == 24 && blobs(26L).take(4).sameElements(magic))
    assert(!blobs(13L).take(4).sameElements(magic))
    val got = Multimodal.decodeBatched(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.size == 4, "a corrupt payload dropped or failed rows")
    Seq(13L, 26L).foreach { id =>
      assert(got(id).getAs[Boolean]("is_corrupt"), s"doc $id not flagged")
      Seq("width", "height", "luma_sum", "mean_luma_milli")
        .foreach(c => assert(got(id).isNullAt(got(id).fieldIndex(c)),
          s"doc $id: $c not null"))
    }
    Seq(14L, 40L).foreach { id =>
      assert(!got(id).getAs[Boolean]("is_corrupt"))
      assert(got(id).getAs[Long]("width") == Multimodal.pngWidth(id))
      val w = Multimodal.pngWidth(id); val h = Multimodal.pngHeight(id)
      val s = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pngPixel(id, x, y).toLong).sum
      assert(got(id).getAs[Long]("luma_sum") == s)
    }
    corpus.unpersist()
  }

  test("decode under limit/take disposes the reader via the task listener") {
    import spark.implicits._
    // A take(1) abandons the row iterator mid-partition: with dispose tied
    // to iterator exhaustion this leaked the codec handle; the completion
    // listener makes early abort safe. Functional pin: the limited read
    // returns a decoded row and the session stays healthy for a second
    // full pass over the same corpus.
    val docs = Seq(doc(1, "a"), doc(2, "b"), doc(3, "c"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = Multimodal.pngCorpus(docs).coalesce(1).cache()
    val one = Multimodal.decodeBatched(corpus).limit(1).collect()
    assert(one.length == 1 && !one.head.getAs[Boolean]("is_corrupt"))
    assert(Multimodal.decodeBatched(corpus).collect().length == 3)
    corpus.unpersist()
  }

  test("short media are excluded by the metadata gate") {
    import spark.implicits._
    val docs = Seq(doc(1, "tiny"), doc(2, "n" * 300))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sigs = Multimodal.phashSignatures(Multimodal.phashCorpus(docs)).collect()
    assert(sigs.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
  }
}
