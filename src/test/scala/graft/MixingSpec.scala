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
}
