package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Curation operators over crafted corpora with known PII, boilerplate,
  * repetition, and contamination. */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pii scrub redacts every planted email and phone") {
    // doc 0 gets both plants (0 % 7 = 0 % 11 = 0), doc 7 the email,
    // doc 11 the phone, doc 1 neither.
    val out = Curation.piiScrub(docs(
      0L -> "alpha beta", 1L -> "gamma delta",
      7L -> "epsilon zeta", 11L -> "eta theta")).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[Long]("n_emails") == 1 && byId(0L).getAs[Long]("n_phones") == 1)
    assert(byId(7L).getAs[Long]("n_emails") == 1 && byId(7L).getAs[Long]("n_phones") == 0)
    assert(byId(11L).getAs[Long]("n_phones") == 1)
    assert(byId(1L).getAs[Long]("n_emails") == 0 && byId(1L).getAs[Long]("n_phones") == 0)
    // No PII shape survives scrubbing, and the tags land where planted.
    out.foreach { r =>
      val t = r.getAs[String]("scrubbed")
      assert(!t.matches(".*[a-z0-9]+@[a-z0-9]+\\.[a-z]+.*"), t)
      assert(!t.matches(".*[0-9]{3}-[0-9]{4}.*"), t)
    }
    assert(byId(0L).getAs[String]("scrubbed") == "alpha beta contact <EMAIL> call <PHONE>")
  }

  test("secret scan redacts planted keys and hex tokens, counts them per doc") {
    // doc 0 gets both plants (0 % 13 = 0 % 17 = 0), doc 13 the AWS key,
    // doc 17 the hex token, doc 1 neither.
    val out = Curation.secretScan(docs(
      0L -> "alpha beta", 1L -> "gamma delta",
      13L -> "epsilon zeta", 17L -> "eta theta")).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[Long]("n_aws_keys") == 1 &&
      byId(0L).getAs[Long]("n_hex_tokens") == 1)
    assert(byId(13L).getAs[Long]("n_aws_keys") == 1 &&
      byId(13L).getAs[Long]("n_hex_tokens") == 0)
    assert(byId(17L).getAs[Long]("n_aws_keys") == 0 &&
      byId(17L).getAs[Long]("n_hex_tokens") == 1)
    assert(byId(1L).getAs[Long]("n_aws_keys") == 0 &&
      byId(1L).getAs[Long]("n_hex_tokens") == 0)
    // No credential shape survives scrubbing; tags land where planted.
    out.foreach { r =>
      val t = r.getAs[String]("scrubbed")
      assert(!t.matches(".*AKIA[0-9A-Z]{16}.*"), t)
      assert(!t.matches(".*[0-9a-f]{40}.*"), t)
    }
    assert(byId(0L).getAs[String]("scrubbed") ==
      "alpha beta key <AWSKEY> tok <HEXTOKEN>")
    assert(byId(13L).getAs[String]("scrubbed") == "epsilon zeta key <AWSKEY>")
  }

  test("repetition stats flag a degenerate doc and keep clean prose") {
    val clean = (1 to 40).map(i => s"w$i").mkString(" ")
    val loop = Seq.fill(20)("spam ham").mkString(" ")
    val out = Curation.repetitionStats(docs(1L -> clean, 2L -> loop)).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(byId(1L).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(!byId(2L).getAs[Boolean]("keep"))
    // "ham spam" repeats 19×, "spam ham" 20× of 39 bigrams.
    assert(byId(2L).getAs[Double]("top_bigram_frac") > 0.5)
  }

  test("line dedup removes a 3-doc boilerplate line but keeps unique lines") {
    val boiler = (1 to 10).map(i => s"footer$i").mkString(" ")
    val out = Curation.lineDedup(docs(
      1L -> (((1 to 10).map(i => s"a$i").mkString(" ")) + " " + boiler),
      2L -> (((1 to 10).map(i => s"b$i").mkString(" ")) + " " + boiler),
      3L -> (((1 to 10).map(i => s"c$i").mkString(" ")) + " " + boiler),
      4L -> ((1 to 10).map(i => s"d$i").mkString(" "))))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))).toMap
    // Each of docs 1-3 loses exactly the shared footer line.
    assert(out(1L) == (1L, (1 to 10).map(i => s"a$i").mkString(" ")))
    assert(out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(out(4L) == (1L, (1 to 10).map(i => s"d$i").mkString(" ")))
  }

  test("contamination check flags only docs sharing an eval 5-gram") {
    val evalText = "held out benchmark question about spark joins here"
    val out = Curation.contaminationCheck(docs(
      0L -> evalText, // 0 % 97 == 0 → the eval doc (excluded from output)
      1L -> ("prefix words " + evalText), // contains every eval 5-gram
      2L -> "totally unrelated training document with distinct tokens")).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!byId.contains(0L))
    assert(byId(1L).getAs[Boolean]("contaminated"))
    assert(byId(1L).getAs[Long]("n_contaminated") >= 4)
    assert(!byId(2L).getAs[Boolean]("contaminated"))
  }

  test("bloom-prefiltered contamination equals the exact check row for row") {
    // A corpus big enough that the sketch is non-trivially populated:
    // every 97th doc is eval; every doc ending in 3 shares its eval
    // neighbor's 5-gram tail.
    val rows = (0L until 400L).map { i =>
      val base = (0 until 8).map(j => s"w${i}_$j").mkString(" ")
      val tail = if (i % 10 == 3) "shared eval tail gram five" else s"t${i}a b c d e"
      i -> (base + " " + tail)
    } :+ (97L -> "shared eval tail gram five plus context")
    val corpus = docs(rows.toSeq: _*)
    val exact = Curation.contaminationCheck(corpus).collect()
    val bloom = Curation.contaminationBloom(corpus).collect()
    assert(exact.nonEmpty && exact.exists(_.getAs[Boolean]("contaminated")))
    assert(bloom.map(_.toString).toSeq == exact.map(_.toString).toSeq)
  }

  test("paragraph dedup keeps only the first occurrence of a repeated paragraph") {
    // 30-token paragraphs; doc 25 triggers the plant (25 % 25 == 0): doc
    // 20025's paragraph 0 duplicates doc 25's paragraph 0.
    val para = (1 to 30).map(i => s"p$i").mkString(" ")
    val other = (1 to 30).map(i => s"q$i").mkString(" ")
    val out = Curation.paragraphDedup(docs(
      25L -> (para + " " + other), // paras: [para, other]
      26L -> (para + " unique tail here"))) // para 0 duplicates doc 25's
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))))
      .toMap
    assert(out(25L) == ((2L, 2L, para + " " + other))) // first occurrence keeps all
    // Doc 26 loses its duplicated first paragraph, keeps the 3-token stub.
    assert(out(26L) == ((2L, 1L, "unique tail here")))
    // The plant: doc 20025 = doc 25's first 30 tokens + " tail20025".
    assert(out(20025L) == ((2L, 1L, "tail20025")))
    assert(out.keySet == Set(25L, 26L, 20025L))
  }

  test("incremental dedup admits only content new vs the prior snapshot") {
    val out = Curation.incrementalDedup(docs(
      2L -> "already ingested content", // prior snapshot
      3L -> "genuinely new content", // new arrival → admitted
      5L -> "already ingested content", // odd doc duplicating prior → dropped
      20L -> "snapshot doc that re-arrives")) // also planted as arrival 40020
      .collect().map(_.getAs[Long]("doc_id"))
    assert(out.sameElements(Array(3L)))
  }

  test("gopher quality gates each rule on exact integer arithmetic") {
    // Base corpus: 19×"alpha" + "the" (n=20, Σlen=98 → mean in [4,5]).
    val base = (Seq.fill(19)("alpha") :+ "the").mkString(" ")
    val out = Curation.gopherQuality(docs(
      1L -> base, // no plants: every gate passes
      2L -> "beta gamma the", // too short: words_ok false
      13L -> base, // symbol plant: 2×'#' + '...' appended
      5L -> base)) // numeric plant: '25 42' appended, survives alpha 90%
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_words") == 20 &&
      out(1L).getAs[Long]("sum_word_len") == 98 &&
      out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("words_ok") && !out(2L).getAs[Boolean]("keep"))
    // 13 % 3 = 1 → two '#' tokens plus one '...': 3 symbols over 23 words.
    assert(out(13L).getAs[Long]("n_words") == 23 &&
      out(13L).getAs[Long]("n_symbols") == 3 &&
      !out(13L).getAs[Boolean]("symbol_ok") &&
      !out(13L).getAs[Boolean]("alpha_ok") && !out(13L).getAs[Boolean]("keep"))
    // Two numeric tokens over 22 words: 10·20 ≥ 9·22 keeps alpha_ok true.
    assert(out(5L).getAs[Long]("n_alpha") == 20 &&
      out(5L).getAs[Boolean]("alpha_ok") && out(5L).getAs[Boolean]("keep"))
  }

  test("html strip removes planted tags and unescapes entities after stripping") {
    val out = Curation.htmlStrip(docs(
      1L -> "plain prose here",
      3L -> "hello world",
      9L -> "nine doc")) // wrapped (9 % 3 = 0) AND entity-suffixed
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tags") == 0 &&
      out(1L).getAs[String]("clean_text") == "plain prose here" &&
      !out(1L).getAs[Boolean]("is_markup"))
    assert(out(3L).getAs[Long]("n_tags") == 10 &&
      out(3L).getAs[String]("clean_text") ==
        "Doc 3 hello world Home | About | Contact")
    // &lt;tbd&gt; unescapes to <tbd> AFTER tag-strip, so it survives as text
    assert(out(9L).getAs[String]("clean_text") ==
      "Doc 9 nine doc Home | About | Contact Terms & Conditions <tbd>")
  }

  test("encoding qa counts planted replacement and control chars exactly") {
    val out = Curation.encodingQa(docs(
      1L -> "clean text",
      17L -> "mojibake doc", // 17 % 3 + 1 = 3 replacement chars
      23L -> "bell doc", // 2 C0 control chars
      0L -> "both doc")) // 1 replacement + 2 control
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_replacement") == 0 &&
      out(1L).getAs[Long]("n_ctrl") == 0 && out(1L).getAs[Boolean]("utf_ok"))
    assert(out(17L).getAs[Long]("n_replacement") == 3 && !out(17L).getAs[Boolean]("utf_ok"))
    assert(out(23L).getAs[Long]("n_ctrl") == 2 && !out(23L).getAs[Boolean]("utf_ok"))
    assert(out(0L).getAs[Long]("n_replacement") == 1 && out(0L).getAs[Long]("n_ctrl") == 2)
  }

  test("script mix counts codepoint blocks and flags mixed-script docs") {
    // doc 7: %7==0 → no plant, pure Latin+digit. doc 8: %7==1 → Cyrillic
    // plant (14 Cyrillic letters). doc 9: %7==2 → 6 CJK chars. doc 11:
    // %7==4 → mixed plant "мир 世界 data": 3 Cyrillic + 2 CJK + 4 Latin.
    val out = Curation.scriptMix(docs(
      7L -> "plain ascii 42",
      8L -> "host doc",
      9L -> "host doc",
      11L -> "x"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(7L).getAs[Long]("n_latin") == 10 &&
      out(7L).getAs[Long]("n_digit") == 2 &&
      out(7L).getAs[Long]("n_cyrillic") == 0 &&
      !out(7L).getAs[Boolean]("mixed_script"))
    assert(out(8L).getAs[Long]("n_cyrillic") == 14)
    // "host doc" = 7 Latin chars; 14 Cyrillic vs 7 Latin → mixed.
    assert(out(8L).getAs[Boolean]("mixed_script"))
    assert(out(9L).getAs[Long]("n_cjk") == 6)
    // doc 11: 1 host Latin + 4 plant Latin, 3 Cyrillic, 2 CJK of 10
    // script chars → dominant 5/10 → mixed.
    assert(out(11L).getAs[Long]("n_latin") == 5 &&
      out(11L).getAs[Long]("n_cyrillic") == 3 &&
      out(11L).getAs[Long]("n_cjk") == 2 &&
      out(11L).getAs[Boolean]("mixed_script"))
  }

  test("length histogram bins by 16-token widths per source") {
    import spark.implicits._
    val df = Seq(("web", (1 to 5).map(_ => "t").mkString(" ")),
      ("web", (1 to 20).map(_ => "t").mkString(" ")),
      ("books", (1 to 20).map(_ => "t").mkString(" ")))
      .toDF("source", "text")
    val out = Curation.lengthHistogram(df).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin_lo")) -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map(("books", 16L) -> 1L, ("web", 0L) -> 1L, ("web", 16L) -> 1L))
  }
}
