package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Composed training-data pipeline stages over `documents`: the filter →
  * sample → pack chain a pretraining data pipeline runs ahead of
  * tokenization.
  *
  * Everything is deterministic (hash-based sampling, doc_id-ordered
  * packing) so the whole chain is oracle-checkable; every stage is a narrow
  * projection or a single window/agg pass.
  */
object Pipeline {

  /** Quality filter chain: keep documents passing ALL of length band, type
    * -token-ratio floor, and stopword-signal floor — the standard heuristic
    * gate. Emits keep/drop with the failing reasons for auditability
    * (a pipeline that silently drops is undebuggable at 100 TB).
    */
  def qualityFilter(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        (size(array_distinct(col("toks"))) / size(col("toks")).cast("double")).as("ttr"),
        (expr(s"size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))") /
          size(col("toks")).cast("double")).as("stop_ratio"))
      .select(
        col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        (col("n_tokens") >= 10 && col("n_tokens") <= 120).as("len_ok"),
        (col("ttr") >= 0.3).as("ttr_ok"),
        (col("stop_ratio") >= 0.01).as("stop_ok"))
      .withColumn("keep", col("len_ok") && col("ttr_ok") && col("stop_ok"))
      .orderBy(col("doc_id"))

  /** Model-based quality gate: a linear classifier over document features —
    * the inference shape the fastText-style quality models of DataComp /
    * CCNet / FineWeb distill to (featurize → w·f + b → threshold). Weights
    * here are fixed public literals standing in for trained ones; swapping
    * in a real model is a config change, the plan is identical.
    *
    * Every feature is a ratio of integer counts and the score a
    * fixed-order affine combination, so both engines compute bit-identical
    * doubles and the scorer stays on the exact-hash oracle gate (an
    * exp/ln sigmoid would not — libm differs across engines in the last
    * ulp; thresholding the logit is the same decision boundary).
    * The emitted score is floor(raw·10⁴) as an integer: `floor` of
    * bit-identical doubles is exact, where decimal `round` is not — Spark
    * rounds the SHORTEST decimal representation HALF_UP while DuckDB
    * rints the scaled double, and at corpus scale real scores do land on
    * .xxxx5 boundaries (4 docs at sf0.1 flipped between 0.6587/0.6588).
    * Map-side only: no shuffle except the presentation sort.
    */
  def modelQualityScore(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(array_distinct(col("toks"))) / size(col("toks")).cast("double")).as("ttr"),
        (expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))") /
          size(col("toks")).cast("double")).as("stop_ratio"),
        ((length(col("text")) - size(col("toks")) + 1) /
          size(col("toks")).cast("double")).as("avg_tok_len"))
      .withColumn("raw",
        lit(-1.5) + lit(2.0) * least(col("n_tokens") / lit(100.0), lit(1.0)) +
          lit(1.5) * col("ttr") + lit(3.0) * col("stop_ratio") +
          lit(0.5) * (col("avg_tok_len") / lit(10.0)))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("raw") * lit(10000.0)).cast("long").as("score_e4"),
        (col("raw") >= 0.5).as("keep"))
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling: per-source rates via a 60-bit md5
    * hash of doc_id mod 100 — reproducible across runs/engines, no RNG
    * state, and each stratum's rate is a pure config. Even sources keep
    * 50%, odd sources 10%.
    */
  def stratifiedSample(documents: DataFrame): DataFrame =
    documents
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 100"))
      .withColumn("rate",
        when(pmod(regexp_extract(col("source"), "([0-9]+)$", 1).cast("long"), lit(2)) === 0,
          lit(50)).otherwise(lit(10)))
      .filter(col("h") < col("rate"))
      .select(col("doc_id"), col("source"), col("h").as("hash_bucket"))
      .orderBy(col("doc_id"))

  /** Number of packing shards: the cumsum runs independently inside each
    * shard, so parallelism = Shards and no single task ever sees the whole
    * corpus. Per-shard bins are the production semantics — a global order
    * over 100 TB of docs is a sequential constraint nothing downstream needs.
    */
  val PackingShards = 16

  /** Token-budget packing: assign documents to ~2000-token bins via a
    * running-total window — the sequence-packing step before batching.
    * Sharded: documents are hashed into [[PackingShards]] deterministic
    * shards (md5-based so the oracle can reproduce it; Spark's `hash()` is
    * murmur3 and engine-private) and the cumsum/bin assignment runs
    * per-shard, so the window is partitioned and scales with cluster width
    * instead of funneling into one `WindowExec` task.
    */
  def tokenPacking(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("shard", expr(
        s"cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % $PackingShards"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin", ((col("cum_tokens") - col("n_tokens")) / 2000).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Shard manifest — the pipeline's final materialization contract: one
    * row per (shard, bin) output unit with document count, token count,
    * and an order-insensitive content checksum (bit_xor of the docs' md5
    * hashes — overflow-free and commutative, so it's stable under any
    * parallel execution order, unlike a sum). A training job consumes the
    * manifest to size its data loader and to verify shard integrity after
    * transfer; at 100 TB the manifest is the only thing small enough to
    * diff between pipeline runs.
    */
  def shardManifest(documents: DataFrame): DataFrame =
    tokenPacking(documents)
      .withColumn("doc_h", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        expr("bit_xor(doc_h)").as("checksum"))
      .orderBy(col("shard"), col("bin"))

  val OrderShards = 8
  val OrderSeed = "ord42"

  /** Deterministic training-order shuffle: a reproducible pseudorandom
    * permutation of the corpus with NO global sort. Each doc gets a seeded
    * md5 order key; the key's prefix assigns one of [[OrderShards]]
    * balanced shards (md5 is uniform, so shard sizes concentrate tightly);
    * position within a shard is a rank over the key. The training loader
    * reads shards in index order, rows in position order — a fixed global
    * order that is statistically shuffled, reproducible run-to-run from
    * the seed alone, and re-derivable for any single doc without touching
    * the rest (audit: "where did doc X land in epoch 3's order?").
    *
    * Scale shape: the rank window partitions on shard — at 100 TB widen
    * OrderShards to O(total/256 MB) so each window task sorts one
    * shard-sized run; there is never a single-task WindowExec. Changing
    * the seed re-shuffles every epoch (the standard epoch-reshuffle
    * contract) for the cost of one narrow projection + per-shard sort.
    */
  def trainingOrder(documents: DataFrame, seed: String = OrderSeed): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    documents
      .select(col("doc_id"),
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))).as("okey"))
      .withColumn("shard", expr(
        s"cast(conv(substring(okey, 1, 4), 16, 10) as bigint) % $OrderShards"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("okey"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** The composed pipeline: clean → quality gate → exact dedup → sample →
    * pack, as ONE query — what a user actually runs ahead of tokenization.
    * Each stage narrows the corpus before the next (the cheap narrow
    * filters run before the dedup shuffle; the packing window only ever
    * sees survivors), and the whole chain is a single Catalyst plan, so
    * column pruning and filter ordering apply across stage boundaries —
    * the advantage of composing DataFrames over materializing each stage.
    *
    * Stages (all deterministic, mirrored 1:1 in the oracle CTE chain):
    *   1. clean: case-fold, strip non-alphanumerics, collapse whitespace;
    *   2. gate: 10..120 cleaned tokens and type-token ratio ≥ 0.3;
    *   3. dedup: one doc per distinct cleaned text (min doc_id keeps);
    *   4. sample: md5(doc_id) mod 100 < 50;
    *   5. pack: per-shard running token total → 2000-token bins.
    */
  def endToEnd(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cleaned = documents
      .withColumn("clean_text",
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")))
      .withColumn("toks", split(col("clean_text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    val gated = cleaned
      .filter(col("n_tokens") >= 10 && col("n_tokens") <= 120)
      .filter(size(array_distinct(col("toks"))) / col("n_tokens").cast("double") >= 0.3)
    val deduped = gated
      .withColumn("rn", row_number().over(
        Window.partitionBy(sha2(col("clean_text"), 256)).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    val sampled = deduped.filter(expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 100") < 50)
    sampled
      .withColumn("shard", expr(
        s"cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % $PackingShards"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin", ((col("cum_tokens") - col("n_tokens")) / 2000).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("shard"), col("cum_tokens"), col("bin"))
      .orderBy(col("doc_id"))
  }

  /** Context-window chunk size/stride (tokens): 64-token chunks every 48
    * tokens, i.e. 16 tokens of overlap between consecutive chunks. */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** Sliding-window document chunking — the context-length split that turns
    * curated documents into fixed-size training sequences (overlap preserves
    * cross-boundary n-grams). A doc of n tokens yields
    * `1 + ceil(max(0, n - C) / S)` chunks; the last chunk is short rather
    * than padded, and no chunk is ever fully contained in its predecessor.
    *
    * Shape at 100 TB: one generator-explode per document (output rows ≈
    * n/S per doc) followed by map-side slicing/hashing — zero shuffles, no
    * window functions, chunk rows inherit the scan's partitioning. Emits
    * the chunk hash rather than the chunk text so the output stays narrow;
    * the text itself is `slice(tk, start, C)` away when a writer needs it.
    */
  def docChunks(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("n_chunks", expr(
        s"CASE WHEN n <= $ChunkTokens THEN 1L " +
          s"ELSE 1L + (n - $ChunkTokens + $ChunkStride - 1) div $ChunkStride END"))
      .select(col("doc_id"), col("tk"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("chunk",
        slice(col("tk"), (col("chunk_idx") * ChunkStride + 1).cast("int"),
          lit(ChunkTokens)))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  // ------------------------------------------------------ group-aware split

  /** Split percentages out of 100: [0,80) train, [80,90) val, rest test. */
  val SplitTrainPct = 80L
  val SplitValPct = 90L

  /** Leakage-free train/val/test split: the assignment unit is the GROUP
    * (here `source` — the crawl domain / provenance unit whose documents
    * share style and near-duplicate content), not the document. Splitting
    * i.i.d. by doc leaks near-duplicates of training pages into eval
    * (Lee et al. 2022 measure the resulting eval inflation); hashing the
    * group key sends every document of a source to the same side by
    * construction. The split is md5(source) mod 100 against fixed
    * percentage fences — deterministic, assignment travels with the key
    * (a new day's crawl of a known source lands in the same split with
    * no lookup table), and rebalancing means changing two literals.
    *
    * Output is the audit table: per split, group/doc/token counts, plus
    * `leaky_groups` — the count of groups observed in more than one
    * split, COMPUTED from the assignment (a distinct-splits-per-group
    * rollup, not an assertion), so a regression in the hash plumbing
    * shows up as a nonzero cell rather than a silent eval leak.
    *
    * Scale shape: one narrow scan computes per-doc (group, split,
    * n_tokens); both rollups are map-side-combinable aggs over ~groups
    * rows; the leak audit joins one O(groups) frame — broadcast — back
    * to the per-split rows. The corpus is never shuffled.
    */
  def groupSplit(documents: DataFrame): DataFrame = {
    val assigned = documents.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr("cast(conv(substring(md5(source), 1, 8), 16, 10) as bigint) % 100")
        .as("h"))
      .withColumn("split",
        when(col("h") < SplitTrainPct, "train")
          .when(col("h") < SplitValPct, "val").otherwise("test"))
    val perSplit = assigned.groupBy(col("split"))
      .agg(countDistinct(col("source")).as("n_groups"),
        count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val leak = assigned.groupBy(col("source"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .select(sum((col("n_splits") > 1).cast("long")).as("leaky_groups"))
    perSplit.crossJoin(broadcast(leak)).orderBy(col("split"))
  }

  // ---------------------------------------------------------- per-domain cap

  /** Max documents retained per source domain. */
  val DomainCapK = 10

  /** Per-domain document cap: keep at most [[DomainCapK]] documents per
    * source, preferring the longest (a crawl-curation standard — a few
    * mega-domains otherwise dominate the corpus; cf. the per-domain
    * page caps in C4/RefinedWeb-style cleaning). Ranking is
    * (n_chars desc, doc_id asc) — fully deterministic, no RNG.
    *
    * Deliberately expressed as a `row_number` window + rank filter THAT
    * KEEPS THE RANK COLUMN: the [[graft.plans.TopK]] rewrite re-plans it
    * as partial+final bounded heaps around the group exchange — at scale
    * each task ships at most K rows per domain instead of shuffling every
    * page of every domain — and the final stage numbers its in-order
    * survivors to reproduce `rnk`, so this query's oracle hash doubles as
    * the end-to-end check of the operator's rank emission.
    */
  def domainCap(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    documents
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rnk") <= DomainCapK)
      .orderBy(col("source"), col("rnk"))
  }

  // ------------------------------------------------------ reservoir sampling

  /** Reservoir size per group and the hash seed (fixed → reproducible). */
  val ReservoirK = 5
  val ReservoirSeed = "rsv1"

  /** Per-group uniform K-sample WITHOUT replacement, deterministically:
    * rank every doc by md5(seed:doc_id) — a uniform pseudo-random
    * permutation — and keep each source's K smallest. Equivalent in
    * distribution to reservoir sampling (Vitter's algorithm R) but
    * stateless, reproducible under reruns/repartitioning, and
    * parallelizable: the hash IS the reservoir's random order, so the
    * sample needs no sequential pass. A different seed draws a fresh
    * independent sample; a grown corpus re-draws consistently (docs keep
    * their hash, only the K-boundary moves).
    *
    * Planned through the TopK heap operator (rank kept → rank emission):
    * ≤K rows per group cross the shuffle, never the group's population.
    */
  def reservoirSample(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    documents
      .select(col("source"), col("doc_id"),
        md5(concat(lit(s"$ReservoirSeed:"), col("doc_id").cast("string"))).as("rkey"))
      .withColumn("draw", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("rkey").asc, col("doc_id").asc))
        .cast("long"))
      .filter(col("draw") <= ReservoirK)
      .select(col("source"), col("draw"), col("doc_id"))
      .orderBy(col("source"), col("draw"))
  }

  // ------------------------------------------------- histogram-grain deciles

  /** Per-source decile bucketing of documents by length — WITHOUT a
    * corpus-grain sort or window. The naive form (`ntile(10) OVER
    * (PARTITION BY source ORDER BY n_chars)`) funnels each source's full
    * document set through one sorted partition — billions of rows per
    * mega-domain at 100 TB. Instead the running count lives on the
    * VALUE-GRAIN histogram: per (source, n_chars) counts (a
    * map-side-combinable agg), a window over those O(distinct-values)
    * rows for the exclusive prefix sum, and a broadcast-join back to tag
    * each document. The corpus is scanned and joined but never sorted;
    * ties share a bucket by construction (value-based quantiles, the
    * same contract as SQL `cume_dist` flooring).
    *
    * decile = least(9, (10 · |docs strictly shorter|) div n_source).
    */
  def lengthDeciles(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = documents.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(
          Window.partitionBy(col("source")).orderBy(col("n_chars").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_source",
        sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("n_chars"),
        least(lit(9L), expr("(10 * cum_before) div n_source")).as("decile"))
    documents.select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(cum), Seq("source", "n_chars"))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"), col("decile"))
  }

  // ------------------------------------------------ sequence-length buckets

  /** Padding-waste audit for fixed-shape training batches: documents are
    * assigned to power-of-two token-length buckets (the standard
    * sequence-bucketing policy), and each (source, bucket) reports how
    * many pad tokens a batcher padding to the bucket ceiling would burn —
    * the number that decides whether bucketed batching is worth it before
    * anyone launches a training run. next_pow2 comes from the binary
    * digit-length of n−1 (the [[graft.ops.Profiling.skewProfile]] trick),
    * so the whole assignment is codegen'd integer arithmetic: no libm
    * log2, no float rounding at bucket boundaries. One map-side projection
    * plus one tiny groupBy — scan throughput at 100 TB, output rows
    * O(sources × log(max_len)).
    */
  def lengthBucketing(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        when(col("n_tokens") <= 1, lit(1L))
          .otherwise(expr(
            "shiftleft(1L, length(conv(n_tokens - 1, 10, 2)))")))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
      .withColumn("waste_ppm", expr(
        "((padded_tokens - sum_tokens) * 1000000) div padded_tokens"))
      .select(col("source"), col("bucket"), col("n_docs"), col("sum_tokens"),
        col("padded_tokens"), col("waste_ppm"))
      .orderBy(col("source"), col("bucket"))

  // ---------------------------------------------------------------- registry

  /** Token-length band counted as "typical" in [[sourceDatacard]]. */
  private val CardLenLo = 5L
  private val CardLenHi = 2000L

  /** Per-source dataset card — the datasheet rollup a curated corpus
    * ships with (what a reviewer reads before training on a source):
    * volume (docs / whitespace tokens / chars), language spread, the
    * exact-duplicate rate (docs whose md5(text) appears more than once —
    * the same hash grain as the exact-dedup pass, so the card's dup rate
    * IS the dedup operator's input), and the share of docs inside the
    * typical length band. Everything is an exact integer; rates are
    * integer permille.
    *
    * Scale shape: one hash-grain groupBy for duplicate counts (map-side
    * combinable), a shuffle join back on the hash (AQE decides; never a
    * driver collect), and a per-source rollup whose output is
    * O(sources). Distinct languages per source is an exact
    * count_distinct — bounded by the language inventory, not the corpus.
    */
  def sourceDatacard(documents: DataFrame): DataFrame = {
    val d = documents
      .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("h", md5(col("text")))
    val dupH = d.groupBy(col("h")).agg(count(lit(1)).as("h_cnt"))
    d.join(dupH, "h")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("h_cnt") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(when(col("toks").between(CardLenLo, CardLenHi), 1L)
          .otherwise(0L)).as("n_len_typical"))
      .withColumn("dup_permille", expr("(1000 * n_dup_docs) div n_docs"))
      .withColumn("len_typical_permille", expr("(1000 * n_len_typical) div n_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_dup_docs"), col("dup_permille"),
        col("len_typical_permille"))
      .orderBy(col("source"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_datacard" -> ((s, d) => sourceDatacard(Tables.documents(s, d))),
    "length_bucketing" -> ((s, d) => lengthBucketing(Tables.documents(s, d))),
    "group_split" -> ((s, d) => groupSplit(Tables.documents(s, d))),
    "domain_cap" -> ((s, d) => domainCap(Tables.documents(s, d))),
    "length_deciles" -> ((s, d) => lengthDeciles(Tables.documents(s, d))),
    "reservoir_sample" -> ((s, d) => reservoirSample(Tables.documents(s, d))),
    "doc_chunks" -> ((s, d) => docChunks(Tables.documents(s, d))),
    "quality_filter" -> ((s, d) => qualityFilter(Tables.documents(s, d))),
    "model_quality_score" -> ((s, d) => modelQualityScore(Tables.documents(s, d))),
    "stratified_sample" -> ((s, d) => stratifiedSample(Tables.documents(s, d))),
    "token_packing" -> ((s, d) => tokenPacking(Tables.documents(s, d))),
    "shard_manifest" -> ((s, d) => shardManifest(Tables.documents(s, d))),
    "training_order" -> ((s, d) => trainingOrder(Tables.documents(s, d))),
    "pipeline_e2e" -> ((s, d) => endToEnd(Tables.documents(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "source_datacard" ->
      s"""WITH d AS (
         |  SELECT source, lang, n_chars,
         |    len(string_split(text, ' '))::BIGINT AS toks,
         |    md5(text) AS h
         |  FROM documents
         |), dup AS (
         |  SELECT h, count(*) AS h_cnt FROM d GROUP BY h
         |)
         |SELECT source,
         |  count(*)::BIGINT AS n_docs,
         |  sum(toks)::BIGINT AS n_tokens,
         |  sum(n_chars)::BIGINT AS n_chars,
         |  count(DISTINCT lang)::BIGINT AS n_langs,
         |  sum(CASE WHEN h_cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
         |  ((1000 * sum(CASE WHEN h_cnt > 1 THEN 1 ELSE 0 END)) // count(*))::BIGINT
         |    AS dup_permille,
         |  ((1000 * sum(CASE WHEN toks BETWEEN $CardLenLo AND $CardLenHi
         |                    THEN 1 ELSE 0 END)) // count(*))::BIGINT
         |    AS len_typical_permille
         |FROM d JOIN dup USING (h)
         |GROUP BY source ORDER BY source""".stripMargin,
    "length_bucketing" ->
      """WITH t AS (
        |  SELECT source, len(string_split(text, ' '))::BIGINT AS n FROM documents
        |), b AS (
        |  SELECT source, n,
        |    CASE WHEN n <= 1 THEN 1
        |      ELSE (1::BIGINT << len(printf('%b', n - 1))) END AS bucket
        |  FROM t
        |), g AS (
        |  SELECT source, bucket, count(*)::BIGINT AS n_docs,
        |    sum(n)::BIGINT AS sum_tokens
        |  FROM b GROUP BY source, bucket
        |)
        |SELECT source, bucket, n_docs, sum_tokens,
        |  (n_docs * bucket)::BIGINT AS padded_tokens,
        |  (((n_docs * bucket) - sum_tokens) * 1000000 // (n_docs * bucket))::BIGINT AS waste_ppm
        |FROM g ORDER BY source, bucket""".stripMargin,
    "reservoir_sample" ->
      s"""SELECT source, draw, doc_id FROM (
         |  SELECT source, doc_id,
         |    (row_number() OVER (PARTITION BY source
         |       ORDER BY md5('$ReservoirSeed:' || doc_id::VARCHAR) ASC, doc_id ASC))::BIGINT
         |      AS draw
         |  FROM documents)
         |WHERE draw <= $ReservoirK
         |ORDER BY source, draw""".stripMargin,
    "length_deciles" ->
      """WITH hist AS (
        |  SELECT source, n_chars, count(*) AS cnt
        |  FROM documents GROUP BY source, n_chars
        |), cum AS (
        |  SELECT source, n_chars,
        |    least(9, (10 * coalesce(sum(cnt) OVER (PARTITION BY source
        |      ORDER BY n_chars ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      // sum(cnt) OVER (PARTITION BY source))::BIGINT AS decile
        |  FROM hist
        |)
        |SELECT d.source, c.decile, count(*)::BIGINT AS n_docs,
        |  min(d.n_chars)::BIGINT AS min_chars, max(d.n_chars)::BIGINT AS max_chars
        |FROM documents d JOIN cum c USING (source, n_chars)
        |GROUP BY d.source, c.decile
        |ORDER BY d.source, c.decile""".stripMargin,
    "domain_cap" ->
      s"""SELECT source, doc_id, n_chars, rnk FROM (
         |  SELECT source, doc_id, n_chars,
         |    (row_number() OVER (PARTITION BY source
         |       ORDER BY n_chars DESC, doc_id ASC))::BIGINT AS rnk
         |  FROM documents)
         |WHERE rnk <= $DomainCapK
         |ORDER BY source, rnk""".stripMargin,
    "group_split" ->
      s"""WITH assigned AS (
         |  SELECT source, len(string_split(text, ' '))::BIGINT AS n_tokens,
         |    CASE
         |      WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < $SplitTrainPct
         |        THEN 'train'
         |      WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < $SplitValPct
         |        THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM documents
         |), per_split AS (
         |  SELECT split, count(DISTINCT source)::BIGINT AS n_groups,
         |    count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
         |  FROM assigned GROUP BY split
         |), leak AS (
         |  SELECT sum((n_splits > 1)::BIGINT)::BIGINT AS leaky_groups FROM (
         |    SELECT source, count(DISTINCT split) AS n_splits
         |    FROM assigned GROUP BY source)
         |)
         |SELECT split, n_groups, n_docs, n_tokens, leaky_groups
         |FROM per_split, leak ORDER BY split""".stripMargin,
    "doc_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk,
         |    len(string_split(text, ' '))::BIGINT AS n
         |  FROM documents
         |), k AS (
         |  SELECT doc_id, tk, n,
         |    CASE WHEN n <= $ChunkTokens THEN 1
         |    ELSE 1 + (n - $ChunkTokens + $ChunkStride - 1) // $ChunkStride
         |    END AS n_chunks
         |  FROM t
         |), c AS (
         |  SELECT doc_id, tk, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
         |  FROM k
         |)
         |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
         |  len(tk[(chunk_idx * $ChunkStride + 1):least(chunk_idx * $ChunkStride + $ChunkTokens, n)])::BIGINT
         |    AS n_tokens,
         |  md5(array_to_string(
         |    tk[(chunk_idx * $ChunkStride + 1):least(chunk_idx * $ChunkStride + $ChunkTokens, n)], ' '))
         |    AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "training_order" ->
      s"""SELECT doc_id, shard, pos FROM (
         |  SELECT doc_id, shard,
         |    (row_number() OVER (PARTITION BY shard ORDER BY okey, doc_id))::BIGINT AS pos
         |  FROM (
         |    SELECT doc_id, okey,
         |      ('0x' || substr(okey, 1, 4))::BIGINT % $OrderShards AS shard
         |    FROM (
         |      SELECT doc_id, md5('$OrderSeed:' || doc_id::VARCHAR) AS okey
         |      FROM documents)))
         |ORDER BY shard, pos""".stripMargin,
    "model_quality_score" ->
      """SELECT doc_id, n_tokens,
        |  floor(raw * 10000.0)::BIGINT AS score_e4, raw >= 0.5 AS keep FROM (
        |  SELECT doc_id, n_tokens,
        |    -1.5 + 2.0 * least(n_tokens / 100.0, 1.0) + 1.5 * ttr +
        |      3.0 * stop_ratio + 0.5 * (avg_tok_len / 10.0) AS raw
        |  FROM (
        |    SELECT doc_id,
        |      len(toks)::BIGINT AS n_tokens,
        |      len(list_distinct(toks)) / len(toks)::DOUBLE AS ttr,
        |      len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and'))) /
        |        len(toks)::DOUBLE AS stop_ratio,
        |      (length(text) - len(toks) + 1) / len(toks)::DOUBLE AS avg_tok_len
        |    FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |  )
        |) ORDER BY doc_id""".stripMargin,
    "quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    len(list_distinct(string_split(text, ' '))) /
        |      len(string_split(text, ' '))::DOUBLE AS ttr,
        |    len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a', 'of', 'to', 'and'))) /
        |      len(string_split(text, ' '))::DOUBLE AS stop_ratio
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens::BIGINT AS n_tokens,
        |  (n_tokens >= 10 AND n_tokens <= 120) AS len_ok,
        |  (ttr >= 0.3) AS ttr_ok,
        |  (stop_ratio >= 0.01) AS stop_ok,
        |  ((n_tokens >= 10 AND n_tokens <= 120) AND ttr >= 0.3 AND stop_ratio >= 0.01) AS keep
        |FROM t ORDER BY doc_id""".stripMargin,
    "stratified_sample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS h,
        |    CASE WHEN regexp_extract(source, '([0-9]+)$', 1)::BIGINT % 2 = 0
        |      THEN 50 ELSE 10 END AS rate
        |  FROM documents
        |)
        |SELECT doc_id, source, h AS hash_bucket
        |FROM t WHERE h < rate ORDER BY doc_id""".stripMargin,
    "pipeline_e2e" ->
      s"""WITH cleaned AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |      ' +', ' ', 'g')) AS clean_text
         |  FROM documents
         |), toks AS (
         |  SELECT doc_id, clean_text,
         |    string_split(clean_text, ' ') AS toks,
         |    len(string_split(clean_text, ' '))::BIGINT AS n_tokens
         |  FROM cleaned
         |), gated AS (
         |  SELECT * FROM toks
         |  WHERE n_tokens BETWEEN 10 AND 120
         |    AND len(list_distinct(toks)) / n_tokens::DOUBLE >= 0.3
         |), deduped AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY sha256(clean_text)
         |      ORDER BY doc_id) AS rn
         |    FROM gated
         |  ) WHERE rn = 1
         |), sampled AS (
         |  SELECT doc_id, n_tokens,
         |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % $PackingShards AS shard
         |  FROM deduped
         |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 50
         |)
         |SELECT doc_id, n_tokens, shard,
         |  (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens,
         |  (((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT - n_tokens) // 2000) AS bin
         |FROM sampled ORDER BY doc_id""".stripMargin,
    // Window sum() is HUGEINT in DuckDB where Spark emits BIGINT — values
    // match but the driver's typed hash doesn't; cast every windowed sum.
    "token_packing" ->
      s"""WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % $PackingShards AS shard
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens, shard,
        |  (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens,
        |  (((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT - n_tokens) // 2000) AS bin
        |FROM t ORDER BY doc_id""".stripMargin,
    "shard_manifest" ->
      s"""WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % $PackingShards AS shard,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS doc_h
        |  FROM documents
        |), packed AS (
        |  SELECT doc_id, n_tokens, shard, doc_h,
        |    (((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT - n_tokens) // 2000) AS bin
        |  FROM t
        |)
        |SELECT shard, bin, count(*) AS n_docs,
        |  (sum(n_tokens))::BIGINT AS bin_tokens,
        |  bit_xor(doc_h) AS checksum
        |FROM packed GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
  )
}
