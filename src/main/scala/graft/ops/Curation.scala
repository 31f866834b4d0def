package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-curation operators for an LLM training-data pipeline over the
  * `documents` fixture: PII scrubbing, repetition-based quality signals,
  * cross-document line dedup, benchmark-contamination checks, length
  * profiling, and incremental (snapshot-delta) dedup.
  *
  * Everything is built-in expressions over narrow projections — no UDFs, so
  * the per-document work stays inside whole-stage codegen, and the only
  * shuffles are the stated aggregations (line/shingle groupBys on
  * high-cardinality hashed keys). The fixture corpus has no real PII or
  * shared boilerplate, so where an operator needs positives the corpus is
  * first augmented with DETERMINISTIC plants (arithmetic both engines
  * compute identically), mirroring the planted-dup pattern in
  * [[Dedup]]/[[Similarity]]: the operator then provably finds exactly the
  * planted rows.
  */
object Curation {

  private def toks(c: String = "text") = split(col(c), " ")

  // ------------------------------------------------------------- PII scrub

  /** Deterministically planted PII: every 7th doc gains an email, every
    * 11th a phone number (some docs get both). Plain string arithmetic —
    * identical in DuckDB.
    */
  private def piiCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" contact u"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))

  private val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** PII redaction: count and replace email/phone shapes with typed tags.
    * Pure map-side regex work — at 100 TB this runs at scan throughput with
    * zero shuffle; the audit counts make the redaction rate reportable
    * per-source without a second pass.
    */
  def piiScrub(documents: DataFrame): DataFrame =
    piiCorpus(documents)
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(text, '$EmailRe', 0)")).cast("long")
          .as("n_emails"),
        size(expr(s"regexp_extract_all(text, '$PhoneRe', 0)")).cast("long")
          .as("n_phones"),
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("scrubbed"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------ secret scan

  /** Deterministically planted credentials: every 13th doc gains an
    * AWS-style access-key id (AKIA + 16 upper-hex from md5), every 17th a
    * 40-hex token (md5 + 8 more hex chars). Plain string arithmetic,
    * identical in DuckDB. */
  private def secretCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(lit(" key AKIA"),
            upper(substring(md5(col("doc_id").cast("string")), 1, 16))))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(17)) === 0,
          concat(lit(" tok "), md5(col("doc_id").cast("string")),
            substring(md5((col("doc_id") + 1).cast("string")), 1, 8)))
          .otherwise(lit(""))).as("text"))

  private val AwsKeyRe = "AKIA[0-9A-Z]{16}"
  private val HexTokenRe = "[0-9a-f]{40}"

  /** Credential scrubbing — the code-corpus counterpart of [[piiScrub]]:
    * leaked access keys and long hex secrets are counted and replaced with
    * typed tags before anything reaches a training shard. Same contract as
    * the PII pass: pure map-side regex work at scan throughput, zero
    * shuffle, audit counts per doc so the leak rate is reportable without
    * a second pass. Both regexes are RE2-safe (no backrefs/lookaround), so
    * Spark's Java engine and any RE2-based scanner agree on every match;
    * scrub order (keys before hex) cannot interact because the key tail is
    * upper-case and the hex pattern lower-case. */
  def secretScan(documents: DataFrame): DataFrame =
    secretCorpus(documents)
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(text, '$AwsKeyRe', 0)")).cast("long")
          .as("n_aws_keys"),
        size(expr(s"regexp_extract_all(text, '$HexTokenRe', 0)")).cast("long")
          .as("n_hex_tokens"),
        regexp_replace(regexp_replace(col("text"), AwsKeyRe, "<AWSKEY>"),
          HexTokenRe, "<HEXTOKEN>").as("scrubbed"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------- repetition quality signals

  /** Gopher-style repetition signals per document: duplicate-bigram
    * fraction and most-common-bigram share, with a keep/drop gate. The
    * bigram mode is computed by explode → two-level agg (map-side partial
    * combine on (doc_id, bigram) — never a per-doc collect), and only
    * counts are compared, so there is no tie-break on WHICH bigram is top.
    */
  def repetitionStats(documents: DataFrame, maxTopFrac: Double = 0.2): DataFrame = {
    // Tokenize ONCE per doc before the positional transform — `split`
    // inside the lambda would re-tokenize per position (O(n²) chars/doc).
    val bigrams = documents
      .filter(size(toks()) >= 2)
      .select(col("doc_id"), toks().as("tk"))
      .select(col("doc_id"),
        explode(expr("""transform(sequence(1, size(tk) - 1),
          i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))""")).as("bg"))
    bigrams
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("c")).cast("long").as("top_bigram_n"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        round(lit(1) - col("n_distinct_bigrams") / col("n_bigrams").cast("double"), 4)
          .as("dup_bigram_frac"),
        round(col("top_bigram_n") / col("n_bigrams").cast("double"), 4)
          .as("top_bigram_frac"))
      .withColumn("keep", col("top_bigram_frac") <= maxTopFrac)
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ cross-doc line dedup

  /** Number of tokens per pseudo-line (the fixture corpus has no newlines,
    * so lines are fixed-width token chunks; with real documents this is
    * `split(text, '\n')` and the rest of the operator is unchanged). */
  private val LineTokens = 10

  /** A line is boilerplate once it appears in this many distinct docs. */
  private val MaxLineDocs = 2

  /** CCNet-style cross-document line dedup: hash every line, count DISTINCT
    * docs per line hash, drop lines above the boilerplate threshold, and
    * reassemble documents in original line order. Scale shape: one shuffle
    * on the 60-bit line hash (high cardinality, Zipf head is exactly the
    * boilerplate being removed — the cap keeps its groups small), then one
    * shuffle back on doc_id; reassembly sorts WITHIN each doc's collected
    * struct list, never globally.
    */
  def lineDedup(documents: DataFrame): DataFrame = {
    val lines = documents
      .select(col("doc_id"), toks().as("tk"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(size(tk) / ${LineTokens}.0) as int) - 1),
           |  i -> array_join(slice(tk, i * $LineTokens + 1, $LineTokens), ' '))"""
          .stripMargin)))
      .toDF("doc_id", "pos", "line")
      .withColumn("line_h",
        expr("cast(conv(substring(md5(line), 1, 15), 16, 10) as bigint)"))
    val boilerplate = lines
      .groupBy(col("line_h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > MaxLineDocs)
      .select(col("line_h"))
    lines.join(broadcast(boilerplate), Seq("line_h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, line))), s -> s.line), ' ')")
          .as("kept_text"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ paragraph dedup

  private val ParaTokens = 30
  private val ParaPlantMod = 25
  private val ParaPlantOffset = 20000

  /** Corpus augmented with planted cross-document duplicate paragraphs:
    * every [[ParaPlantMod]]th doc spawns a new doc whose first paragraph is
    * the original's first [[ParaTokens]] tokens verbatim plus a unique tail
    * token — so the plant's paragraph 0 hashes identically to the
    * original's and must lose to it on (doc_id, pos) order.
    */
  private def paraCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text"))
      .unionByName(documents
        .filter(pmod(col("doc_id"), lit(ParaPlantMod)) === 0)
        .select((col("doc_id") + ParaPlantOffset).as("doc_id"),
          concat(
            expr(s"array_join(slice(split(text, ' '), 1, $ParaTokens), ' ')"),
            lit(" tail"), col("doc_id") + ParaPlantOffset).as("text")))

  /** Global paragraph-level exact dedup, keep-first (the RefinedWeb /
    * FineWeb curation step: Penedo et al., arXiv:2306.01116 §4.2 — each
    * repeated paragraph survives only at its first occurrence, unlike
    * [[lineDedup]] which removes high-document-frequency boilerplate
    * everywhere). "First" is the least (doc_id, pos) over the whole corpus,
    * so the result is deterministic under any partitioning.
    *
    * Scale shape: the keeper per hash is a map-side-combined
    * `min(struct(doc_id, pos))` groupBy — a hot paragraph (millions of
    * copies) reduces to one row per map partition BEFORE the shuffle, so
    * key skew never materializes. The survivor selection is a semi-join on
    * the full (para_h, doc_id, pos) tuple — both sides high-cardinality,
    * nothing fans out — and reassembly shuffles each doc's kept paragraphs
    * once on doc_id. Nothing here is ever quadratic in duplicates.
    */
  def paragraphDedup(documents: DataFrame): DataFrame = {
    // The paragraph table feeds three plan arms (keeper groupBy, survivor
    // semi-join, per-doc totals) — persist it so the tokenize+explode+md5
    // pass runs once, same contract as the prefix join's token table.
    val paras = paraCorpus(documents)
      .select(col("doc_id"), toks().as("tk"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(size(tk) / ${ParaTokens}.0) as int) - 1),
           |  i -> array_join(slice(tk, i * $ParaTokens + 1, $ParaTokens), ' '))"""
          .stripMargin)))
      .toDF("doc_id", "pos", "para")
      .withColumn("para_h",
        expr("cast(conv(substring(md5(para), 1, 15), 16, 10) as bigint)"))
      .persist()
    val keepers = paras
      .groupBy(col("para_h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
      .select(col("para_h"), col("k.doc_id").as("doc_id"), col("k.pos").as("pos"))
    val kept = paras.join(keepers, Seq("para_h", "doc_id", "pos"), "left_semi")
    val totals = paras.groupBy(col("doc_id")).agg(count(lit(1)).as("n_paras"))
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, para))), s -> s.para), ' ')")
          .as("kept_text"))
    totals.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------- benchmark contamination

  /** Eval-set membership: every 97th doc plays the held-out benchmark. */
  private val EvalMod = 97
  private val ShingleTokens = 5

  /** Contamination check: flag training documents sharing any
    * [[ShingleTokens]]-gram with the (broadcast) eval set — the standard
    * n-gram-overlap decontamination pass before training. Shingles are
    * 60-bit md5 hashes, so the probe side shuffles 8-byte keys, and the
    * eval side is distinct-reduced then broadcast: at 100 TB the corpus is
    * never shuffled at all, just one map-side hash-join pass per doc.
    */
  /** (doc_id, sh) pairs: one 60-bit hashed [[ShingleTokens]]-gram per row. */
  private def docShingles(documents: DataFrame): DataFrame =
    documents
      .filter(size(toks()) >= ShingleTokens)
      .select(col("doc_id"), toks().as("tk"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(tk) - $ShingleTokens + 1),
           |  i -> cast(conv(substring(md5(
           |    array_join(slice(tk, i, $ShingleTokens), ' ')), 1, 15), 16, 10) as bigint))"""
          .stripMargin)).as("sh"))

  def contaminationCheck(documents: DataFrame): DataFrame = {
    // Shingles feed both the eval and train arms — persist so the
    // tokenize+md5 explode runs once per corpus, not per arm.
    val shingled = docShingles(documents).persist()
    val eval_ = shingled.filter(pmod(col("doc_id"), lit(EvalMod)) === 0)
      .select(col("sh")).distinct()
    val train = shingled.filter(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
    train
      .join(broadcast(eval_.withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered decontamination — the SAME answer as
    * [[contaminationCheck]] (the oracle is literally the same SQL), built
    * for the regime where the eval shingle set is too large to broadcast as
    * an exact hash set but its Bloom sketch still fits: a 1B-shingle eval
    * set is a ~40 GB broadcast as distinct longs yet a ~1.2 GB sketch at 1%
    * fp. Three stages, none touching the full corpus twice:
    *
    *   1. the sketch is aggregated in-plan (`graft_bloom_agg`, capacity from
    *      a cheap `approx_count_distinct` pre-pass over the EVAL side only)
    *      and collected once — O(sketch bytes) driver traffic, the same
    *      contract as the IVF centroid collect;
    *   2. the probe (`graft_might_contain` on a foldable binary literal) is
    *      a codegen'd map-side filter at scan throughput — the corpus scan
    *      emits only true hits plus the fp fraction;
    *   3. the exact verify semi-join re-checks ONLY those survivors against
    *      the real eval set, so false positives are eliminated and the
    *      shuffled volume drops from |train shingles| to |hits| + fp·|train|.
    *
    * Per-doc totals (`n_shingles`) come from a separate map-side-combined
    * count that never joins anything.
    */
  def contaminationBloom(documents: DataFrame): DataFrame = {
    // Persisted on both tiers: `shingled` feeds eval + train arms, and
    // `eval_` is consumed by THREE actions (capacity pre-pass, sketch
    // collect, exact verify join) — without the persists the corpus would
    // be re-tokenized per action.
    val shingled = docShingles(documents).persist()
    val eval_ = shingled.filter(pmod(col("doc_id"), lit(EvalMod)) === 0)
      .select(col("sh")).distinct().persist()
    val train = shingled.filter(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
    val capacity = math.max(1024L,
      eval_.agg(approx_count_distinct(col("sh")).as("n")).head.getLong(0))
    val sketch = eval_
      .agg(call_function("graft_bloom_agg", col("sh"), lit(capacity)).as("bf"))
      .head.getAs[Array[Byte]](0)
    val candidates =
      if (sketch == null) train.limit(0) // empty eval side -> nothing to flag
      else train.filter(call_function("graft_might_contain", lit(sketch), col("sh")))
    val verified = candidates
      .join(eval_, Seq("sh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_contaminated"))
    train.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------- length histogram

  private val BinWidth = 16

  /** Token-length histogram per source (fixed-width bins) — the corpus
    * shape profile a curation run reports. One map-side-combined groupBy on
    * (source, bin): at any scale the result is O(sources × bins). */
  def lengthHistogram(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        (expr(s"size(split(text, ' ')) div $BinWidth") * BinWidth)
          .cast("long").as("bin_lo"))
      .groupBy(col("source"), col("bin_lo"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("bin_lo"))

  // ------------------------------------------------------ incremental dedup

  /** Incremental dedup of an incoming batch against a prior corpus
    * snapshot: even doc_ids play the already-ingested snapshot, odd ones
    * the incoming batch, augmented with planted copies of snapshot docs
    * (every 10th even doc re-arrives under a new id). An anti-join on the
    * normalized content hash admits only genuinely-new documents — the
    * planted re-arrivals provably vanish. At 100 TB the snapshot side is a
    * pre-computed hash index (bucketed by this very hash, so the anti-join
    * is co-located and shuffle-free); a Bloom-filter prefilter can drop the
    * obvious non-dups before the join without changing its result.
    */
  def incrementalDedup(documents: DataFrame): DataFrame = {
    def h(c: String) = sha2(lower(trim(col(c))), 256)
    val prior = documents.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(h("text").as("text_hash"))
      .distinct()
    val arrivals = documents.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("text"))
      .unionByName(documents
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .select((col("doc_id") + 40000).as("doc_id"), col("text")))
    arrivals
      .select(col("doc_id"), h("text").as("text_hash"))
      .join(prior, Seq("text_hash"), "left_anti")
      .select(col("doc_id"), col("text_hash"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ priority sampling

  private val SamplePerSource = 5

  /** Deterministic bounded sample: exactly N docs per source, chosen by
    * md5-hash priority — the distributed equivalent of per-stratum
    * reservoir sampling (hash priority ⇔ random priority, but
    * reproducible), executed on the custom top-k-per-group operator so
    * each map partition forwards at most N rows per source to the
    * exchange. Unlike the rate-based [[Pipeline.stratifiedSample]], the
    * output size is exact, not expected.
    */
  def prioritySample(documents: DataFrame): DataFrame = {
    val prioritized = documents
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("pri"))
    graft.plans.TopK.topKPerGroup(prioritized, Seq("source"),
        Seq("pri" -> true, "doc_id" -> true), SamplePerSource)
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  // ------------------------------------------------------- curation funnel

  /** The whole curation pass as ONE declarative plan — scrub → repetition
    * gate → cross-doc line dedup → decontamination → mixture sampling —
    * reported as a per-stage survivor funnel (the audit artifact a curation
    * run ships with its output corpus). Each stage consumes the previous
    * stage's survivors and, where text is rewritten (scrubbing, line
    * dedup), downstream stages see the rewritten text — order matters and
    * the oracle mirrors it stage for stage.
    *
    * The five counts are union branches of one plan; every frame consumed
    * by more than one branch (the stage outputs AND the expensive
    * intermediates: PII-scrubbed text, hashed lines, shingles) is
    * persisted, so each tokenize/regex/md5 pass runs once — the production
    * shape too, where stage outputs are the run's checkpoint artifacts (or
    * `observe()` metrics hang on a single pass instead).
    */
  def curationFunnel(documents: DataFrame): DataFrame = {
    // NO fan here, deliberately (measured): the funnel is JOB-CHAIN bound
    // — five dependent stage persists plus five count branches plan ~39
    // AQE stage-jobs whose per-job overhead, not map CPU, dominates
    // (profiled warm: 9.6 s wall ≈ 8.8 s jobWallSum, no stage over 1 s).
    // Fanning the corpus to defaultParallelism inflated every cached
    // stage to 32 tiny tasks and measured 1.18× AGAINST in the batch-1
    // same-session A/B. The heavier per-doc passes (regex, explodes) are
    // already amortized across the chain's persists.
    val docs = documents
    // Scrub feeds two arms (the repetition gate's bigram explode and the
    // survivor join) — persisted so the PII regex pass over full document
    // bodies runs once, not per arm.
    val scrub = piiCorpus(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"),
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("text"))
      .localCheckpoint(true)
    val repKeep = scrub.filter(size(toks()) >= 2)
      .select(col("doc_id"), toks().as("tk"))
      .select(col("doc_id"), explode(expr("""transform(sequence(1, size(tk) - 1),
        i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))""")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("n"), max(col("c")).as("m"))
      .filter(round(col("m") / col("n").cast("double"), 4) <= 0.2)
      .select(col("doc_id"))
    // Stage frames are EAGERLY checkpointed: each is both a funnel branch
    // and the next stage's input, and the five count branches materialize
    // as concurrent stage jobs — a lazy persist() raced its own cache and
    // re-computed stages per branch (the alert_rules pattern). Stage
    // outputs as materialized artifacts is the production shape too.
    val s2 = scrub.join(repKeep, "doc_id").localCheckpoint(true)
    val lines = s2
      .select(col("doc_id"), toks().as("tk"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(size(tk) / ${LineTokens}.0) as int) - 1),
           |  i -> array_join(slice(tk, i * $LineTokens + 1, $LineTokens), ' '))"""
          .stripMargin)))
      .toDF("doc_id", "pos", "line")
      .withColumn("line_h",
        expr("cast(conv(substring(md5(line), 1, 15), 16, 10) as bigint)"))
      .localCheckpoint(true) // feeds the boilerplate count AND the anti-join
    val boiler = lines.groupBy(col("line_h"))
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") > MaxLineDocs)
      .select(col("line_h"))
    val s3 = lines.join(broadcast(boiler), Seq("line_h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, line))), s -> s.line), ' ')")
        .as("text"))
      .join(s2.select(col("doc_id"), col("lang")), "doc_id")
      .localCheckpoint(true)
    val shingled = s3.filter(size(toks()) >= ShingleTokens)
      .select(col("doc_id"), toks().as("tk"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(tk) - $ShingleTokens + 1),
           |  i -> cast(conv(substring(md5(
           |    array_join(slice(tk, i, $ShingleTokens), ' ')), 1, 15), 16, 10) as bigint))"""
          .stripMargin)).as("sh"))
      .localCheckpoint(true) // eval arm + train arm
    val eval_ = shingled.filter(pmod(col("doc_id"), lit(EvalMod)) === 0)
      .select(col("sh")).distinct().withColumn("hit", lit(1))
    val cleanIds = shingled.filter(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
      .join(broadcast(eval_), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("nc"))
      .filter(col("nc") === 0).select(col("doc_id"))
    val s4 = s3.join(cleanIds, "doc_id").localCheckpoint(true)
    val counted = s4.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("p", when(col("lang") === "en", 4).when(col("lang") === "de", 2)
        .when(col("lang") === "es", 2).when(col("lang") === "fr", 1)
        .otherwise(3).cast("long"))
    val thr = counted.crossJoin(broadcast(counted.select(expr("min(n_docs div p)").as("k"))))
      .select(col("lang"), expr("(1000000 * (p * k)) div n_docs").as("thr_ppm"))
    val s5 = s4.join(broadcast(thr), "lang")
      .filter(expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 1000000")
        < col("thr_ppm"))
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(name).as("stage"), col("n_docs"))
    stage("1_input", documents)
      .unionByName(stage("2_rep_gate", s2))
      .unionByName(stage("3_line_dedup", s3))
      .unionByName(stage("4_decontam", s4))
      .unionByName(stage("5_mix_sample", s5))
      .orderBy(col("stage"))
  }

  // ------------------------------------------------- Gopher quality ruleset

  /** Stopword list for the presence rule (Rae et al. 2021 use an 8-word
    * English function-word list; same shape here). */
  private val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Plants for the two rules the raw fixture cannot discriminate (every
    * token is alphabetic): every 13th doc gains 1-3 `#` tokens plus a
    * `...`, every 5th two numeric tokens. Pure string arithmetic both
    * engines compute identically — the paraCorpus/typoCorpus pattern.
    */
  private def gopherCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(lit(" "),
            array_join(array_repeat(lit("#"),
              (pmod(col("doc_id"), lit(3)) + 1).cast("int")), " "),
            lit(" ..."))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" "), (col("doc_id") * col("doc_id")).cast("string"),
            lit(" 42"))).otherwise(lit(""))).as("text"))

  /** The Gopher quality ruleset (Rae et al. 2021, arXiv:2112.11446 §A1.1)
    * with thresholds scaled to the fixture corpus: word-count bounds,
    * mean-word-length bounds, symbol-to-word ratio, alphabetic-word
    * fraction, and stopword presence.
    *
    * Every rule is an integer cross-multiplied comparison (`4·n ≤ Σlen`
    * instead of `Σlen/n ≥ 4.0`), so both engines decide each gate on
    * exact integer arithmetic — no double division anywhere near the
    * oracle hash. Map-side only: the whole ruleset is one codegen'd
    * projection per document, zero shuffles except the presentation
    * sort — at 100 TB this runs at scan throughput and composes with
    * [[curationFunnel]] as another pushed-down gate.
    */
  def gopherQuality(documents: DataFrame): DataFrame =
    gopherCorpus(documents)
      .select(col("doc_id"), col("text"), toks().as("tk"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_words"),
        expr("aggregate(tk, 0L, (a, w) -> a + length(w))").as("sum_word_len"),
        (expr("length(text) - length(replace(text, '#', ''))") +
          expr("(length(text) - length(replace(text, '...', ''))) div 3"))
          .cast("long").as("n_symbols"),
        size(expr("filter(tk, w -> w rlike '[a-z]')")).cast("long").as("n_alpha"),
        size(array_intersect(col("tk"),
          array(GopherStops.map(lit): _*))).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_words"), col("sum_word_len"),
        col("n_symbols"), col("n_alpha"), col("n_stop"),
        (col("n_words") >= 20 && col("n_words") <= 90).as("words_ok"),
        (lit(4) * col("n_words") <= col("sum_word_len") &&
          col("sum_word_len") <= lit(5) * col("n_words")).as("mean_len_ok"),
        (lit(20) * col("n_symbols") <= col("n_words")).as("symbol_ok"),
        (lit(10) * col("n_alpha") >= lit(9) * col("n_words")).as("alpha_ok"),
        (col("n_stop") >= 1).as("stop_ok"))
      .withColumn("keep",
        col("words_ok") && col("mean_len_ok") && col("symbol_ok") &&
          col("alpha_ok") && col("stop_ok"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------ HTML/markup strip

  /** Markup plants: every 3rd doc is wrapped in HTML scaffolding (heading,
    * paragraph tags, a nav block), every 9th gains escaped entities — the
    * fixture is plain prose, so the markup the stripper must remove is
    * planted with string arithmetic both engines replay identically.
    */
  private def htmlCorpus(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("<html><body><h1>Doc "), col("doc_id").cast("string"),
            lit("</h1><p>"), col("text"),
            lit("</p><div class=\"nav\">Home | About | Contact</div></body></html>")))
          .otherwise(col("text")).as("raw"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(9)) === 0,
          concat(col("raw"), lit(" Terms &amp; Conditions &lt;tbd&gt;")))
          .otherwise(col("raw")).as("raw"))

  private val TagRe = "<[^>]+>"

  /** HTML/boilerplate strip (the Dolma/CCNet extraction step): remove tags,
    * unescape the common entities, collapse whitespace, and report the tag
    * count so markup density is filterable downstream. Tags are stripped
    * BEFORE entities are unescaped, so an escaped literal like `&lt;tbd&gt;`
    * correctly survives as text rather than being eaten as a tag.
    *
    * Pure map-side regex/replace work over a narrow projection — at 100 TB
    * this runs at scan throughput with zero shuffles (the presentation sort
    * is the only exchange, and only for the oracle's determinism).
    */
  def htmlStrip(documents: DataFrame): DataFrame =
    htmlCorpus(documents)
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(TagRe), lit(0))).cast("long")
          .as("n_tags"),
        // order matters: strip tags first, then unescape entities, so an
        // escaped literal like &lt;tbd&gt; survives as text
        trim(regexp_replace(
          replace(replace(replace(
            regexp_replace(col("raw"), TagRe, " "),
            lit("&amp;"), lit("&")), lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
          " {2,}", " ")).as("clean_text"))
      .withColumn("is_markup", col("n_tags") >= 1)
      .orderBy(col("doc_id"))

  // ------------------------------------------------------- encoding quality

  /** Encoding plants: every 17th doc gains 1-3 U+FFFD replacement chars
    * (the mojibake signature of a mis-decoded byte stream), every 23rd two
    * C0 control chars — both planted by arithmetic the oracle replays.
    */
  private def encCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(17)) === 0,
          concat(lit(" "),
            expr("repeat('�', cast(doc_id % 3 + 1 as int))")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(23)) === 0,
          concat(lit(" bell"), lit("\u0007"), lit("\u000e")))
          .otherwise(lit(""))).as("text"))

  /** Encoding QA (the UTF-8 sanity screen of Dolma/RefinedWeb): count
    * U+FFFD replacement characters and C0 control characters per document
    * and gate on exact integer counts. Replacement chars are counted by
    * length-difference (no regex needed); control chars by a hex-escape
    * character class passed as a literal column, so no SQL-string escaping
    * ambiguity on either engine. Map-side only — scan throughput at 100 TB.
    */
  def encodingQa(documents: DataFrame): DataFrame =
    encCorpus(documents)
      .select(col("doc_id"),
        (length(col("text")) -
          length(replace(col("text"), lit("�"), lit("")))).cast("long")
          .as("n_replacement"),
        size(regexp_extract_all(col("text"),
          lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"), lit(0))).cast("long")
          .as("n_ctrl"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("utf_ok", col("n_replacement") === 0 && col("n_ctrl") === 0)
      .orderBy(col("doc_id"))

  /** Multi-script plant: non-Latin segments appended by doc_id residue so
    * the oracle can replay the corpus (same pattern as [[encCorpus]]). */
  private def scriptCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(7)) === 1, lit(" привет мир добро"))
          .when(pmod(col("doc_id"), lit(7)) === 2, lit(" 你好世界数据"))
          .when(pmod(col("doc_id"), lit(7)) === 3, lit(" γειά σου κόσμε"))
          .when(pmod(col("doc_id"), lit(7)) === 4, lit(" мир 世界 data"))
          .otherwise(lit(""))).as("text"))

  /** Unicode-script profile (the script/language sanity screen next to the
    * n-gram lang-ID): per document, exact codepoint counts in the Latin,
    * Cyrillic, CJK-unified and Greek blocks plus digits, and a mixed-script
    * flag — dominant script under 80% of script characters — the classic
    * spam/encoding-mojibake tripwire that pure trigram lang-ID misses.
    * Codepoint classing is integer range tests over `ascii()` per char
    * (both engines return the first codepoint; all planted blocks are BMP,
    * so char==codepoint) — no regex Unicode-class dialect to disagree on.
    * Map-side only: scan throughput at 100 TB, nothing shuffles.
    */
  def scriptMix(documents: DataFrame): DataFrame =
    scriptCorpus(documents)
      .withColumn("cps", expr("transform(split(text, ''), c -> ascii(c))"))
      .select(col("doc_id"),
        expr("cast(size(filter(cps, x -> (x >= 65 and x <= 90) or (x >= 97 and x <= 122))) as long)").as("n_latin"),
        expr("cast(size(filter(cps, x -> x >= 1024 and x <= 1279)) as long)").as("n_cyrillic"),
        expr("cast(size(filter(cps, x -> x >= 19968 and x <= 40959)) as long)").as("n_cjk"),
        expr("cast(size(filter(cps, x -> x >= 880 and x <= 1023)) as long)").as("n_greek"),
        expr("cast(size(filter(cps, x -> x >= 48 and x <= 57)) as long)").as("n_digit"))
      .withColumn("n_script",
        col("n_latin") + col("n_cyrillic") + col("n_cjk") + col("n_greek"))
      .withColumn("mixed_script",
        col("n_script") > 0 &&
          (col("n_script") - greatest(col("n_latin"), col("n_cyrillic"),
            col("n_cjk"), col("n_greek"))) * 5 >= col("n_script"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_funnel" -> ((s, d) => curationFunnel(Tables.documents(s, d))),
    "priority_sample" -> ((s, d) => prioritySample(Tables.documents(s, d))),
    "pii_scrub" -> ((s, d) => piiScrub(Tables.documents(s, d))),
    "secret_scan" -> ((s, d) => secretScan(Tables.documents(s, d))),
    "repetition_stats" -> ((s, d) => repetitionStats(Tables.documents(s, d))),
    "line_dedup" -> ((s, d) => lineDedup(Tables.documents(s, d))),
    "paragraph_dedup" -> ((s, d) => paragraphDedup(Tables.documents(s, d))),
    "contamination_check" -> ((s, d) => contaminationCheck(Tables.documents(s, d))),
    "contamination_bloom" -> ((s, d) => contaminationBloom(Tables.documents(s, d))),
    "length_histogram" -> ((s, d) => lengthHistogram(Tables.documents(s, d))),
    "incremental_dedup" -> ((s, d) => incrementalDedup(Tables.documents(s, d))),
    "gopher_quality" -> ((s, d) => gopherQuality(Tables.documents(s, d))),
    "html_strip" -> ((s, d) => htmlStrip(Tables.documents(s, d))),
    "encoding_qa" -> ((s, d) => encodingQa(Tables.documents(s, d))),
    "script_mix" -> ((s, d) => scriptMix(Tables.documents(s, d))),
  )

  private val contaminationSql =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      generate_series(1, len(string_split(text, ' ')) - $ShingleTokens + 1),
       |      i -> ('0x' || substr(md5(
       |        array_to_string(string_split(text, ' ')[i:(i + $ShingleTokens - 1)], ' ')), 1, 15))::BIGINT)) AS sh
       |  FROM documents WHERE len(string_split(text, ' ')) >= $ShingleTokens
       |), ev AS (
       |  SELECT DISTINCT sh FROM sh WHERE doc_id % $EvalMod = 0
       |)
       |SELECT doc_id, count(*) AS n_shingles,
       |  sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
       |  sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
       |FROM sh LEFT JOIN ev ON sh.sh = ev.sh
       |WHERE doc_id % $EvalMod <> 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "priority_sample" ->
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS rnk
         |  FROM documents)
         |WHERE rnk <= $SamplePerSource
         |ORDER BY source, doc_id""".stripMargin,
    "curation_funnel" ->
      s"""WITH scrub AS (
         |  SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(text ||
         |      CASE WHEN doc_id % 7 = 0
         |        THEN ' contact u' || doc_id || '@example.com' ELSE '' END ||
         |      CASE WHEN doc_id % 11 = 0
         |        THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END,
         |      '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g') AS text
         |  FROM documents
         |), bg AS (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(string_split(text, ' ')) - 1),
         |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bg
         |  FROM scrub WHERE len(string_split(text, ' ')) >= 2
         |), repkeep AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, sum(c) AS n, max(c) AS m
         |    FROM (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
         |    GROUP BY doc_id)
         |  WHERE round(m / n::DOUBLE, 4) <= 0.2
         |), s2 AS (
         |  SELECT scrub.* FROM scrub JOIN repkeep USING (doc_id)
         |), lines AS (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, ceil(len(string_split(text, ' ')) / ${LineTokens}.0)::INT),
         |    i -> {'pos': i - 1, 'line': array_to_string(
         |      string_split(text, ' ')[((i - 1) * $LineTokens + 1):(i * $LineTokens)], ' ')})) AS l
         |  FROM s2
         |), hashed AS (
         |  SELECT doc_id, l.pos AS pos, l.line AS line,
         |    ('0x' || substr(md5(l.line), 1, 15))::BIGINT AS line_h
         |  FROM lines
         |), boiler AS (
         |  SELECT line_h FROM hashed GROUP BY line_h
         |  HAVING count(DISTINCT doc_id) > $MaxLineDocs
         |), s3 AS (
         |  SELECT doc_id, lang, string_agg(line, ' ' ORDER BY pos) AS text
         |  FROM hashed JOIN (SELECT doc_id, lang FROM s2) USING (doc_id)
         |  WHERE line_h NOT IN (SELECT line_h FROM boiler)
         |  GROUP BY doc_id, lang
         |), sh AS (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(string_split(text, ' ')) - $ShingleTokens + 1),
         |    i -> ('0x' || substr(md5(
         |      array_to_string(string_split(text, ' ')[i:(i + $ShingleTokens - 1)], ' ')), 1, 15))::BIGINT)) AS sh
         |  FROM s3 WHERE len(string_split(text, ' ')) >= $ShingleTokens
         |), ev AS (
         |  SELECT DISTINCT sh FROM sh WHERE doc_id % $EvalMod = 0
         |), cleanids AS (
         |  SELECT doc_id FROM sh LEFT JOIN ev ON sh.sh = ev.sh
         |  WHERE doc_id % $EvalMod <> 0
         |  GROUP BY doc_id
         |  HAVING sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) = 0
         |), s4 AS (
         |  SELECT s3.* FROM s3 JOIN cleanids USING (doc_id)
         |), counted AS (
         |  SELECT lang, count(*) AS n_docs,
         |    (CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 WHEN 'es' THEN 2
         |      WHEN 'fr' THEN 1 ELSE 3 END)::BIGINT AS p
         |  FROM s4 GROUP BY lang
         |), thr AS (
         |  SELECT lang, (1000000 * (p * k)) // n_docs AS thr_ppm
         |  FROM counted, (SELECT min(n_docs // p) AS k FROM counted)
         |), s5 AS (
         |  SELECT s4.doc_id FROM s4 JOIN thr USING (lang)
         |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 < thr_ppm
         |)
         |SELECT stage, n_docs FROM (
         |  SELECT '1_input' AS stage, count(*) AS n_docs FROM documents
         |  UNION ALL SELECT '2_rep_gate', count(*) FROM s2
         |  UNION ALL SELECT '3_line_dedup', count(*) FROM s3
         |  UNION ALL SELECT '4_decontam', count(*) FROM s4
         |  UNION ALL SELECT '5_mix_sample', count(*) FROM s5
         |) ORDER BY stage""".stripMargin,
    "pii_scrub" ->
      s"""WITH pii AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0
         |      THEN ' contact u' || doc_id || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
         |    AS text
         |  FROM documents
         |)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '$EmailRe'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(text, '$PhoneRe'))::BIGINT AS n_phones,
         |  regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |FROM pii ORDER BY doc_id""".stripMargin,
    "secret_scan" ->
      s"""WITH sec AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 13 = 0
         |      THEN ' key AKIA' || upper(substr(md5(doc_id::VARCHAR), 1, 16)) ELSE '' END ||
         |    CASE WHEN doc_id % 17 = 0
         |      THEN ' tok ' || md5(doc_id::VARCHAR) || substr(md5((doc_id + 1)::VARCHAR), 1, 8) ELSE '' END
         |    AS text
         |  FROM documents
         |)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '$AwsKeyRe'))::BIGINT AS n_aws_keys,
         |  len(regexp_extract_all(text, '$HexTokenRe'))::BIGINT AS n_hex_tokens,
         |  regexp_replace(regexp_replace(text, '$AwsKeyRe', '<AWSKEY>', 'g'),
         |    '$HexTokenRe', '<HEXTOKEN>', 'g') AS scrubbed
         |FROM sec ORDER BY doc_id""".stripMargin,
    "repetition_stats" ->
      """WITH bg AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bg
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2
        |), cnt AS (
        |  SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
        |)
        |SELECT doc_id,
        |  sum(c)::BIGINT AS n_bigrams,
        |  count(*) AS n_distinct_bigrams,
        |  round(1 - count(*) / sum(c)::DOUBLE, 4) AS dup_bigram_frac,
        |  round(max(c) / sum(c)::DOUBLE, 4) AS top_bigram_frac,
        |  round(max(c) / sum(c)::DOUBLE, 4) <= 0.2 AS keep
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "line_dedup" ->
      s"""WITH lines AS (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, ceil(len(string_split(text, ' ')) / ${LineTokens}.0)::INT),
         |    i -> {'pos': i - 1, 'line': array_to_string(
         |      string_split(text, ' ')[((i - 1) * $LineTokens + 1):(i * $LineTokens)], ' ')})) AS l
         |  FROM documents
         |), hashed AS (
         |  SELECT doc_id, l.pos AS pos, l.line AS line,
         |    ('0x' || substr(md5(l.line), 1, 15))::BIGINT AS line_h
         |  FROM lines
         |), boiler AS (
         |  SELECT line_h FROM hashed
         |  GROUP BY line_h HAVING count(DISTINCT doc_id) > $MaxLineDocs
         |)
         |SELECT doc_id, count(*) AS n_kept,
         |  string_agg(line, ' ' ORDER BY pos) AS kept_text
         |FROM hashed
         |WHERE line_h NOT IN (SELECT line_h FROM boiler)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "contamination_check" -> contaminationSql,
    // The Bloom prefilter is an exact-result optimization: its oracle is
    // LITERALLY the exact check's SQL — any fp leaking past the verify
    // semi-join would hash-mismatch here.
    "contamination_bloom" -> contaminationSql,
    "paragraph_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $ParaPlantOffset,
         |    array_to_string(string_split(text, ' ')[1:$ParaTokens], ' ')
         |      || ' tail' || (doc_id + $ParaPlantOffset)
         |  FROM documents WHERE doc_id % $ParaPlantMod = 0
         |), paras AS (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, ceil(len(string_split(text, ' ')) / ${ParaTokens}.0)::INT),
         |    i -> {'pos': i - 1, 'para': array_to_string(
         |      string_split(text, ' ')[((i - 1) * $ParaTokens + 1):(i * $ParaTokens)], ' ')})) AS p
         |  FROM corpus
         |), hashed AS (
         |  SELECT doc_id, p.pos AS pos, p.para AS para,
         |    ('0x' || substr(md5(p.para), 1, 15))::BIGINT AS para_h
         |  FROM paras
         |), kept AS (
         |  SELECT doc_id, pos, para FROM (
         |    SELECT doc_id, pos, para,
         |      row_number() OVER (PARTITION BY para_h ORDER BY doc_id, pos) AS rn
         |    FROM hashed)
         |  WHERE rn = 1
         |), totals AS (
         |  SELECT doc_id, count(*) AS n_paras FROM hashed GROUP BY doc_id
         |), keptagg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(para, ' ' ORDER BY pos) AS kept_text
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT t.doc_id, t.n_paras,
         |  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
         |  coalesce(k.kept_text, '') AS kept_text
         |FROM totals t LEFT JOIN keptagg k USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "length_histogram" ->
      s"""SELECT source,
         |  ((len(string_split(text, ' ')) // $BinWidth) * $BinWidth)::BIGINT AS bin_lo,
         |  count(*) AS n_docs
         |FROM documents GROUP BY source, bin_lo ORDER BY source, bin_lo""".stripMargin,
    "incremental_dedup" ->
      """WITH prior AS (
        |  SELECT DISTINCT sha256(lower(trim(text))) AS text_hash
        |  FROM documents WHERE doc_id % 2 = 0
        |), arrivals AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 40000, text FROM documents WHERE doc_id % 20 = 0
        |)
        |SELECT doc_id, sha256(lower(trim(text))) AS text_hash
        |FROM arrivals
        |WHERE sha256(lower(trim(text))) NOT IN (SELECT text_hash FROM prior)
        |ORDER BY doc_id""".stripMargin,
    "gopher_quality" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 13 = 0
         |      THEN ' ' || array_to_string(list_transform(
         |        generate_series(1, (doc_id % 3 + 1)::INT), i -> '#'), ' ') || ' ...'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0
         |      THEN ' ' || (doc_id * doc_id)::VARCHAR || ' 42' ELSE '' END AS text
         |  FROM documents
         |), m AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' '))::BIGINT AS n_words,
         |    list_sum(list_transform(string_split(text, ' '), w -> len(w)))::BIGINT
         |      AS sum_word_len,
         |    (len(text) - len(replace(text, '#', ''))
         |      + (len(text) - len(replace(text, '...', ''))) // 3)::BIGINT AS n_symbols,
         |    len(list_filter(string_split(text, ' '),
         |      w -> regexp_matches(w, '[a-z]')))::BIGINT AS n_alpha,
         |    len(list_intersect(string_split(text, ' '),
         |      ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))::BIGINT AS n_stop
         |  FROM g
         |)
         |SELECT doc_id, n_words, sum_word_len, n_symbols, n_alpha, n_stop,
         |  (n_words >= 20 AND n_words <= 90) AS words_ok,
         |  (4 * n_words <= sum_word_len AND sum_word_len <= 5 * n_words) AS mean_len_ok,
         |  (20 * n_symbols <= n_words) AS symbol_ok,
         |  (10 * n_alpha >= 9 * n_words) AS alpha_ok,
         |  (n_stop >= 1) AS stop_ok,
         |  ((n_words >= 20 AND n_words <= 90)
         |    AND (4 * n_words <= sum_word_len AND sum_word_len <= 5 * n_words)
         |    AND (20 * n_symbols <= n_words) AND (10 * n_alpha >= 9 * n_words)
         |    AND (n_stop >= 1)) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "html_strip" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      '<html><body><h1>Doc ' || doc_id::VARCHAR || '</h1><p>' || text ||
        |      '</p><div class="nav">Home | About | Contact</div></body></html>'
        |    ELSE text END ||
        |    CASE WHEN doc_id % 9 = 0
        |      THEN ' Terms &amp; Conditions &lt;tbd&gt;' ELSE '' END AS raw
        |  FROM documents
        |)
        |SELECT doc_id,
        |  len(regexp_extract_all(raw, '<[^>]+>'))::BIGINT AS n_tags,
        |  trim(regexp_replace(
        |    replace(replace(replace(regexp_replace(raw, '<[^>]+>', ' ', 'g'),
        |      '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
        |    ' {2,}', ' ', 'g')) AS clean_text,
        |  len(regexp_extract_all(raw, '<[^>]+>')) >= 1 AS is_markup
        |FROM raw ORDER BY doc_id""".stripMargin,
    "encoding_qa" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 17 = 0
        |      THEN ' ' || repeat(chr(65533), (doc_id % 3 + 1)::INT) ELSE '' END ||
        |    CASE WHEN doc_id % 23 = 0
        |      THEN ' bell' || chr(7) || chr(14) ELSE '' END AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  (len(text) - len(replace(text, chr(65533), '')))::BIGINT AS n_replacement,
        |  len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]'))::BIGINT AS n_ctrl,
        |  len(text)::BIGINT AS n_chars,
        |  ((len(text) - len(replace(text, chr(65533), ''))) = 0 AND
        |   len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]')) = 0) AS utf_ok
        |FROM t ORDER BY doc_id""".stripMargin,
    "script_mix" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    CASE doc_id % 7 WHEN 1 THEN ' привет мир добро'
        |      WHEN 2 THEN ' 你好世界数据'
        |      WHEN 3 THEN ' γειά σου κόσμε'
        |      WHEN 4 THEN ' мир 世界 data' ELSE '' END AS text
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), ch -> unicode(ch)) AS cps
        |  FROM t
        |), k AS (
        |  SELECT doc_id,
        |    len(list_filter(cps, x -> (x BETWEEN 65 AND 90) OR (x BETWEEN 97 AND 122)))::BIGINT AS n_latin,
        |    len(list_filter(cps, x -> x BETWEEN 1024 AND 1279))::BIGINT AS n_cyrillic,
        |    len(list_filter(cps, x -> x BETWEEN 19968 AND 40959))::BIGINT AS n_cjk,
        |    len(list_filter(cps, x -> x BETWEEN 880 AND 1023))::BIGINT AS n_greek,
        |    len(list_filter(cps, x -> x BETWEEN 48 AND 57))::BIGINT AS n_digit
        |  FROM c
        |)
        |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_greek, n_digit,
        |  (n_latin + n_cyrillic + n_cjk + n_greek) AS n_script,
        |  (n_latin + n_cyrillic + n_cjk + n_greek) > 0 AND
        |  ((n_latin + n_cyrillic + n_cjk + n_greek)
        |    - greatest(n_latin, n_cyrillic, n_cjk, n_greek)) * 5
        |    >= (n_latin + n_cyrillic + n_cjk + n_greek) AS mixed_script
        |FROM k ORDER BY doc_id""".stripMargin,
  )
}
