package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-mixing operators: deterministic sampling toward a target domain
  * mixture, and mergeable count-min-sketch heavy-hitter accounting — the
  * two knobs a training-data pipeline turns when composing a corpus from
  * unevenly-sized sources.
  */
object Mixing {

  /** Target mixture in integer parts (en-heavy, fr-light) — parts, not
    * floats, so every derived quantity below stays in exact BIGINT
    * arithmetic and the oracle matches bit-for-bit. */
  private def parts(lang: Column): Column =
    when(lang === "en", 4).when(lang === "de", 2).when(lang === "es", 2)
      .when(lang === "fr", 1).otherwise(3).cast("long")

  /** Deterministic mixture sampling: given per-language doc counts n_l and
    * target parts p_l, the largest feasible corpus preserving the mixture
    * has K = min_l floor(n_l / p_l) docs per part; each language keeps
    * target_l = p_l·K docs via an md5-threshold on doc_id (reproducible,
    * no RNG state, stable under reruns and partitioning). Output is the
    * per-language audit row (counts, targets, kept, rate).
    *
    * Scale shape: one count agg over the corpus, a one-row min, and a
    * broadcast threshold join back — the corpus itself is scanned twice,
    * shuffled never. The thresholds frame is O(languages).
    */
  def domainMix(documents: DataFrame): DataFrame = {
    val counted = documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("p", parts(col("lang")))
    val k = counted.select(expr("min(n_docs div p)").as("k"))
    val thr = counted.crossJoin(broadcast(k))
      .select(col("lang"), col("n_docs"), (col("p") * col("k")).as("target_n"),
        expr("(1000000 * (p * k)) div n_docs").as("thr_ppm"))
    val kept = documents
      .join(broadcast(thr.select(col("lang"), col("thr_ppm"))), "lang")
      .filter(expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 1000000")
        < col("thr_ppm"))
      .groupBy(col("lang")).agg(count(lit(1)).as("kept_n"))
    thr.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("target_n"),
        coalesce(col("kept_n"), lit(0L)).cast("long").as("kept_n"),
        round(col("target_n") / col("n_docs").cast("double"), 4).as("target_rate"))
      .orderBy(col("lang"))
  }

  /** CMS geometry: depth 4 hash rows × width 1024 cells. eps = e/width
    * (overcount ≤ eps·N with probability 1 − e^-depth); one md5 per token
    * supplies all four row hashes (8 hex chars each — md5's 32 hex chars
    * split exactly). */
  val CmsDepth = 4
  val CmsWidth = 1024
  /** Overcount bound used by MixingSpec: eps = e / width. */
  val CmsEps: Double = math.E / CmsWidth

  /** Heavy-hitter accounting via mergeable count-min sketches: each source
    * aggregates its token stream into one CMS (map-side combinable, fixed
    * depth×width cells regardless of input volume), the per-source
    * sketches merge by CELL-WISE ADDITION — visible in the plan as a
    * groupBy(row, cell) sum over the per-source sketch table — and the
    * merged sketch is probed for the corpus-wide exact top-N tokens as an
    * accuracy audit.
    *
    * This is the second mergeable-sketch pattern next to
    * [[Frames.hllRollup]] (distinct counts): per-partition sketches union
    * into coarser grains without rescanning facts — at 100 TB the sketch
    * table is per (source, day) and a month's heavy hitters cost a
    * depth×width-row merge, not a 30-day scan. Nothing reaches the driver
    * but the final topN rows.
    *
    * The row hashes are spec'd as md5 substrings (not a library's private
    * seeding), so the DuckDB oracle rebuilds the IDENTICAL sketch and the
    * estimates hash-match exactly; the CMS overcount-only/eps·N guarantee
    * is additionally pinned in MixingSpec on adversarial corpora.
    */
  def cmsHeavyHitters(documents: DataFrame, topN: Int = 10): DataFrame = {
    val toks = documents
      .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
    // Occurrences collapse to (source, tok, n) BEFORE any hashing: md5 and
    // the ×CmsDepth cell fan-out run once per DISTINCT token per source,
    // not once per occurrence — on a Zipf-shaped corpus that is ~20× fewer
    // rows through the expensive path, and the sketch is identical because
    // cell counts are weighted by n instead of counted per row. (This
    // halved-and-more the query's bench time after the r6 switch from the
    // native count_min_sketch blob to the oracle-replayable md5 sketch.)
    val tokCounts = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val rowHashes = expr(
      s"""transform(sequence(0, ${CmsDepth - 1}),
         |  i -> cast(conv(substring(md5(tok), 1 + 8 * i, 8), 16, 10) as bigint)
         |       % $CmsWidth)""".stripMargin)
    // Per-source sketch: one row per occupied (hash row, cell) — the
    // fixed-size CMS table a source would persist per day at scale.
    val perSource = tokCounts
      .select(col("source"), col("n"), posexplode(rowHashes).as(Seq("hrow", "cell")))
      .groupBy(col("source"), col("hrow"), col("cell"))
      .agg(sum(col("n")).as("n"))
    // Merge = cell-wise add across sources (the CMS merge algebra).
    val merged = perSource.groupBy(col("hrow"), col("cell"))
      .agg(sum(col("n")).as("cell_n"))
    val top = tokCounts.groupBy(col("tok")).agg(sum(col("n")).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc)
      .limit(topN)
    // Probe: estimate(tok) = min over hash rows of its cell counts.
    top
      .select(col("tok"), col("exact_n"), posexplode(rowHashes).as(Seq("hrow", "cell")))
      .join(merged, Seq("hrow", "cell"))
      .groupBy(col("tok"), col("exact_n"))
      .agg(min(col("cell_n")).as("cms_est"))
      .orderBy(col("tok"))
  }

  /** Token-budget mixture plan: given a total training-token budget and
    * the target parts, how many tokens each language must contribute and
    * how many EPOCHS (repeat passes, in parts-per-thousand) of its
    * available tokens that implies — the Chinchilla-style planning table a
    * data team produces before a run (epochs > 1000 ppt flag the sources
    * that will repeat; cf. the "how many epochs is too many" line of
    * Muennighoff et al. 2023). All arithmetic is exact BIGINT: budget and
    * shares in integer parts, epochs as (1000·need)//have.
    */
  val BudgetTokens = 1000000L

  def mixPlan(documents: DataFrame): DataFrame = {
    val avail = documents
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("have_tokens"))
      .withColumn("p", parts(col("lang")))
    val total = avail.select(sum(col("p")).as("p_total"))
    avail.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("have_tokens"), col("p"),
        expr(s"($BudgetTokens * p) div p_total").as("need_tokens"))
      .withColumn("epochs_ppt", expr("(1000 * need_tokens) div have_tokens"))
      .withColumn("repeats", col("epochs_ppt") > 1000L)
      .orderBy(col("lang"))
  }

  /** DSIR feature space: hashed-unigram buckets. 512 buckets keeps the
    * weight table broadcast-trivial while separating the fixture's ~40
    * distinct tokens; production corpora use 10k-100k buckets — the table
    * stays O(buckets) regardless of corpus size. */
  val DsirBuckets = 512

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): estimate hashed
    * n-gram bag-of-words distributions for a TARGET domain (here the
    * `lang = 'en'` slice) and the RAW corpus, weight each bucket by the
    * smoothed likelihood ratio p_target/p_raw, and score every raw
    * document by its tokens' ratios to select the most target-like docs.
    *
    * All arithmetic is exact BIGINT so the oracle hash-matches: the
    * per-bucket ratio is kept in milli-units via one cross-multiplied
    * integer division with add-one smoothing,
    * `w = (1000·(cnt_t+1)·(N_r+B)) div ((cnt_r+1)·(N_t+B))`, and the doc
    * score is the SUM of its token-bucket weights (an additive monotone
    * proxy for the paper's product-of-ratios — exact where a float
    * log-space product would diverge between engines at ulp level).
    * Products stay < 2^63 up to ~1e8 corpus tokens in one exact-mode
    * partition of the weight fit; past that, production fits the same
    * table in log-space doubles (selection only needs ranks).
    *
    * Scale shape: one token scan fits BOTH distributions (target is a
    * flagged sum inside the same groupBy — not a second pass), the
    * weight table is O(buckets) and broadcast to the scorer, and the
    * per-doc sum is one map-side-combinable shuffle keyed by doc_id.
    * Nothing driver-side; the corpus is scanned twice (fit + score),
    * exactly DSIR's two-pass structure.
    */
  def dsirWeights(documents: DataFrame, topN: Int = 100): DataFrame = {
    val toks = documents.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val bucket =
      expr(s"cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) % $DsirBuckets")
    val fit = toks
      .select(bucket.as("bucket"), (col("lang") === "en").cast("long").as("is_t"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_r"), sum(col("is_t")).as("cnt_t"))
    val totals = fit.select(sum(col("cnt_r")).as("n_r"), sum(col("cnt_t")).as("n_t"))
    val weights = fit.crossJoin(broadcast(totals))
      .select(col("bucket"),
        expr(s"(1000 * (cnt_t + 1) * (n_r + $DsirBuckets))" +
          s" div ((cnt_r + 1) * (n_t + $DsirBuckets))").as("w_milli"))
    toks.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .join(broadcast(weights), "bucket")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w_milli")).as("score_milli"))
      .withColumn("spt_milli", expr("score_milli div n_toks"))
      .orderBy(col("spt_milli").desc, col("doc_id").asc)
      .limit(topN)
  }

  // ---------------------------------------------------------------- registry

  /** Weight denominator for [[weightedSample]]: keep probability is
    * `min(n_tokens, cap) / 256`, so longer documents are proportionally
    * more likely to be kept (token-mass-preserving subsampling). */
  val WeightScale = 256L

  /** Weighted Bernoulli sampling, probability proportional to document
    * token count — the token-mass-preserving downsample used when a
    * mixture calls for "α of this domain's tokens" rather than "α of its
    * documents". Each doc draws a deterministic 32-bit uniform from
    * md5(doc_id) and keeps iff `u32 / 2^32 < w / 256`, decided as the
    * cross-multiplied integer comparison `u32 * 256 < w * 2^32` — exact
    * BIGINT arithmetic on both engines (max value < 2^41), no RNG state,
    * stable under reruns, re-partitioning, and speculative re-execution.
    *
    * Map-side only: one narrow projection + filter at scan throughput; the
    * per-source audit of kept token mass is a separate rollup if needed.
    */
  def weightedSample(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("source"),
        least(size(split(col("text"), " ")).cast("long"), lit(WeightScale - 64))
          .as("w"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
          .as("u32"))
      .filter(col("u32") * WeightScale < col("w") * lit(4294967296L))
      .orderBy(col("doc_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "weighted_sample" -> ((s, d) => weightedSample(Tables.documents(s, d))),
    "domain_mix" -> ((s, d) => domainMix(Tables.documents(s, d))),
    "cms_heavy_hitters" -> ((s, d) => cmsHeavyHitters(Tables.documents(s, d))),
    "mix_plan" -> ((s, d) => mixPlan(Tables.documents(s, d))),
    "dsir_weights" -> ((s, d) => dsirWeights(Tables.documents(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |    ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8))::BIGINT
         |      % $DsirBuckets AS bucket
         |  FROM documents
         |), fit AS (
         |  SELECT bucket, count(*) AS cnt_r,
         |    sum((lang = 'en')::BIGINT)::BIGINT AS cnt_t
         |  FROM toks GROUP BY bucket
         |), totals AS (
         |  SELECT sum(cnt_r)::BIGINT AS n_r, sum(cnt_t)::BIGINT AS n_t FROM fit
         |), weights AS (
         |  SELECT bucket,
         |    (1000 * (cnt_t + 1) * (n_r + $DsirBuckets))
         |      // ((cnt_r + 1) * (n_t + $DsirBuckets)) AS w_milli
         |  FROM fit, totals
         |)
         |SELECT doc_id, lang, n_toks, score_milli, score_milli // n_toks AS spt_milli
         |FROM (
         |  SELECT t.doc_id, t.lang, count(*) AS n_toks,
         |    sum(w.w_milli)::BIGINT AS score_milli
         |  FROM toks t JOIN weights w USING (bucket)
         |  GROUP BY t.doc_id, t.lang
         |)
         |ORDER BY spt_milli DESC, doc_id ASC LIMIT 100""".stripMargin,
    "weighted_sample" ->
      s"""SELECT doc_id, source, w, u32 FROM (
         |  SELECT doc_id, source,
         |    least(len(string_split(text, ' '))::BIGINT, ${WeightScale - 64}) AS w,
         |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS u32
         |  FROM documents)
         |WHERE u32 * $WeightScale < w * 4294967296
         |ORDER BY doc_id""".stripMargin,
    // The oracle rebuilds the IDENTICAL sketch (same md5 row hashes, same
    // depth×width, same cell-wise merge) and probes it — estimate equality
    // is exact, not a tolerance check.
    "cms_heavy_hitters" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split(lower(text), ' ')) AS tok FROM documents
         |), cells AS (
         |  SELECT source, i AS hrow,
         |    ('0x' || substr(md5(tok), 1 + 8 * i, 8))::BIGINT % $CmsWidth AS cell,
         |    count(*) AS n
         |  FROM toks, generate_series(0, ${CmsDepth - 1}) g(i)
         |  GROUP BY source, hrow, cell
         |), merged AS (
         |  SELECT hrow, cell, sum(n) AS cell_n FROM cells GROUP BY hrow, cell
         |), top AS (
         |  SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok
         |  ORDER BY exact_n DESC, tok ASC LIMIT 10
         |), probe AS (
         |  SELECT t.tok, t.exact_n, i AS hrow,
         |    ('0x' || substr(md5(t.tok), 1 + 8 * i, 8))::BIGINT % $CmsWidth AS cell
         |  FROM top t, generate_series(0, ${CmsDepth - 1}) g(i)
         |)
         |SELECT p.tok, p.exact_n, min(m.cell_n)::BIGINT AS cms_est
         |FROM probe p JOIN merged m USING (hrow, cell)
         |GROUP BY p.tok, p.exact_n
         |ORDER BY p.tok""".stripMargin,
    "domain_mix" ->
      """WITH counted AS (
        |  SELECT lang, count(*) AS n_docs,
        |    (CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 WHEN 'es' THEN 2
        |      WHEN 'fr' THEN 1 ELSE 3 END)::BIGINT AS p
        |  FROM documents GROUP BY lang
        |), k AS (
        |  SELECT min(n_docs // p) AS k FROM counted
        |), thr AS (
        |  SELECT lang, n_docs, p * k AS target_n,
        |    (1000000 * (p * k)) // n_docs AS thr_ppm
        |  FROM counted, k
        |), kept AS (
        |  SELECT d.lang, count(*) AS kept_n
        |  FROM documents d JOIN thr USING (lang)
        |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 < thr_ppm
        |  GROUP BY d.lang
        |)
        |SELECT lang, n_docs, target_n,
        |  coalesce(kept_n, 0)::BIGINT AS kept_n,
        |  round(target_n / n_docs::DOUBLE, 4) AS target_rate
        |FROM thr LEFT JOIN kept USING (lang)
        |ORDER BY lang""".stripMargin,
    "mix_plan" ->
      """WITH avail AS (
        |  SELECT lang, count(*) AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS have_tokens,
        |    (CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 WHEN 'es' THEN 2
        |      WHEN 'fr' THEN 1 ELSE 3 END)::BIGINT AS p
        |  FROM documents GROUP BY lang
        |), total AS (SELECT sum(p)::BIGINT AS p_total FROM avail)
        |SELECT lang, n_docs, have_tokens, p, need_tokens,
        |  (1000 * need_tokens) // have_tokens AS epochs_ppt,
        |  ((1000 * need_tokens) // have_tokens) > 1000 AS repeats
        |FROM (
        |  SELECT lang, n_docs, have_tokens, p,
        |    (1000000 * p) // p_total AS need_tokens
        |  FROM avail, total
        |) ORDER BY lang""".stripMargin,
  )
}
