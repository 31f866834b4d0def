package graft

import graft.ops.Mixing

/** Mixture sampling and CMS heavy-hitter guarantees over crafted corpora. */
class MixingSpec extends SparkSpec {

  test("domain mix targets the parts ratio and binds to the scarcest language") {
    import spark.implicits._
    // fr is the scarcest per part (1 part, 3 docs → K = 3): en target 12,
    // de 6, fr 3. en has 30 docs so only 12/30 should pass the threshold.
    val docs = ((1 to 30).map(i => (i.toLong, s"en doc $i", "en")) ++
      (31 to 40).map(i => (i.toLong, s"de doc $i", "de")) ++
      (41 to 43).map(i => (i.toLong, s"fr doc $i", "fr")))
      .toDF("doc_id", "text", "lang")
    val out = Mixing.domainMix(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("target_n"), r.getAs[Long]("kept_n")))
      .toMap
    assert(out("en")._1 == 30 && out("en")._2 == 12)
    assert(out("de") == ((10L, 6L, out("de")._3)))
    assert(out("fr")._2 == 3)
    // md5 thresholding is approximate per language but can never exceed
    // the population, and the scarcest language keeps a positive share.
    out.values.foreach { case (n, _, kept) => assert(kept >= 0 && kept <= n) }
    // Deterministic: same input → identical audit rows.
    assert(Mixing.domainMix(docs).collect().toSeq ==
      Mixing.domainMix(docs).collect().toSeq)
  }

  test("cms estimates are overcount-only and within eps of exact counts") {
    import spark.implicits._
    val docs = (1 to 50).map { i =>
      val body = Seq.fill(20)("common").mkString(" ") + s" rare$i unique$i tail"
      (i.toLong, body, s"src${i % 4}")
    }.toDF("doc_id", "text", "source")
    val rows = Mixing.cmsHeavyHitters(docs, topN = 5).collect()
    assert(rows.nonEmpty)
    val total = 50L * 23 // tokens per doc × docs
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS undercounted ${r.getAs[String]("tok")}")
      assert(est <= exact + (Mixing.CmsEps * total).toLong + 1,
        s"CMS overcount beyond eps*N: $est vs $exact")
    }
    // The planted heavy hitter dominates and is estimated exactly-ish.
    val common = rows.find(_.getAs[String]("tok") == "common").get
    assert(common.getAs[Long]("exact_n") == 1000L)
  }
  test("weighted sample keeps exactly the docs whose u32 clears the weight threshold") {
    import spark.implicits._
    val docs = (1 to 100).map(i =>
      (i.toLong, (1 to i).map(_ => "w").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def u32(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
    val expect = (1 to 100).filter { i =>
      u32(i) * 256L < math.min(i.toLong, 192L) * 4294967296L
    }.map(_.toLong).toSet
    val got = Mixing.weightedSample(docs).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == expect && expect.nonEmpty && expect.size < 100)
    // short docs are kept with probability ~ i/256: doc 1 almost surely out
    assert(!got.contains(1L) || u32(1L) < 4294967296L / 256L)
  }

  test("dsir weights rank target-vocabulary docs above off-target docs") {
    import spark.implicits._
    // Planted signal: target (en) docs speak pure "alpha..." vocabulary,
    // off-target docs pure "omega..."; mixed docs sit in between. DSIR
    // weights fit on the en slice must rank alpha-docs first, omega last.
    val alpha = (1 to 20).map(i =>
      (i.toLong, Seq.fill(30)(s"alpha${i % 5}").mkString(" "), "en"))
    val omega = (21 to 40).map(i =>
      (i.toLong, Seq.fill(30)(s"omega${i % 5}").mkString(" "), "de"))
    val mixed = (41 to 50).map(i =>
      (i.toLong, (Seq.fill(15)(s"alpha${i % 5}") ++
        Seq.fill(15)(s"omega${i % 5}")).mkString(" "), "fr"))
    val docs = (alpha ++ omega ++ mixed).toDF("doc_id", "text", "lang")
    val rows = Mixing.dsirWeights(docs, topN = 50).collect()
    val score = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("spt_milli")).toMap
    val aMin = (1 to 20).map(i => score(i.toLong)).min
    val mMax = (41 to 50).map(i => score(i.toLong)).max
    val oMax = (21 to 40).map(i => score(i.toLong)).max
    assert(aMin > mMax, s"alpha docs must outrank mixed: $aMin <= $mMax")
    assert(mMax > oMax, s"mixed docs must outrank omega: $mMax <= $oMax")
    // Deterministic ordering incl. the doc_id tiebreak.
    assert(Mixing.dsirWeights(docs, topN = 50).collect().toSeq == rows.toSeq)
  }
}
