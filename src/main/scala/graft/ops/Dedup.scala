package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators for an LLM training-data pipeline: exact
  * (normalize→hash→group), MinHash-LSH near-dup (shingle→minhash→band→
  * bucket-join), n-gram Jaccard verification, and SimHash near-dup.
  *
  * Scale design (the part that matters at 100 TB): near-dup candidate
  * generation NEVER does an all-pairs comparison — documents are exploded
  * into (band, band_key) rows and joined within band buckets only, so the
  * shuffle is O(docs × bands) and comparisons are confined to colliding
  * buckets. The DuckDB oracles recompute the identical md5-derived sketches
  * (60-bit hex-prefix hashes), so results hash-match exactly.
  *
  * The fixture corpus is 100% distinct, so both near-dup queries first adjoin
  * deterministic planted duplicates (exact copies upper-cased; near copies
  * with the first token dropped) — both sides construct the same corpus, and
  * the operators provably find exactly the planted pairs.
  */
object Dedup {

  /** 60-bit integer from an md5 hex prefix — the shared hash family. */
  private[ops] val md5i = "cast(conv(substring(md5(%s), 1, 15), 16, 10) as bigint)"

  /** Fan a corpus over the session's cores before a CPU-heavy
    * tokenize/explode pass. The fixture parquet is a single small file,
    * so the scan plans 1-2 tasks and the md5/shingle map work — the
    * dominant per-document cost — serializes on a couple of cores
    * (profiled at sf0.1). Cores-adaptive, not a constant; at 100 TB the
    * scan fans out on its own and this extra exchange of raw rows is one
    * narrow pass (it can then be dropped, or kept — a round-robin of
    * (id, text) rows is noise next to the sketch shuffle). Batch entry
    * points only: the streaming micro-batch sketch path keeps its
    * arrival partitioning. */
  private def fan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact-dup corpus: planted exact duplicates (case-folded) 1-in-20. */
  def exactCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text"))
      .unionByName(documents.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select((col("doc_id") + 20000).as("doc_id"), upper(col("text")).as("text")))

  /** Near-dup corpus: planted near duplicates (first token dropped) 1-in-25. */
  def nearCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text"))
      .unionByName(documents.filter(pmod(col("doc_id"), lit(25)) === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))

  /** Exact dedup: sha256 over normalized text, one shuffle on the hash.
    * Output keeps every group with its size and canonical keeper (min id).
    */
  def exactDedup(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(sha2(lower(trim(col("text"))), 256).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
      .orderBy(col("text_hash"))

  /** One row per (doc_id, 3-shingle). Generated with posexplode +
    * element_at — all codegen — rather than a `transform` lambda building
    * per-doc arrays, which Catalyst interprets (measured ~3× slower on this
    * corpus). Duplicate shingles are kept (harmless for min-sketches;
    * Jaccard consumers dedup via collect_set).
    */
  def shingleRows(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("toks"), posexplode(col("toks")))
      .filter(col("pos") <= size(col("toks")) - 3)
      .select(col("doc_id"), concat_ws(" ", col("col"),
        element_at(col("toks"), col("pos") + 2),
        element_at(col("toks"), col("pos") + 3)).as("sh"))

  /** doc_id + distinct HASHED 3-shingle set (for exact Jaccard
    * verification). Shingles are hashed to 60-bit longs BEFORE the
    * collect_set shuffle: Jaccard over hashed shingles equals Jaccard over
    * the strings (modulo md5 collisions, negligible at 2^60) and the
    * shuffle moves 8-byte longs instead of ~40-byte strings — at corpus
    * scale the sketch build is shuffle-bound, so this is the cost.
    */
  def shingleSets(corpus: DataFrame): DataFrame =
    shingleRows(corpus)
      .select(col("doc_id"), expr(s"${md5i.format("sh")} % 999999937").as("h"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("shingles"))

  /** doc_id + 12-element MinHash signature over word 3-shingles.
    *
    * Two cost decisions that matter at scale: ONE md5 per shingle with the
    * 12 hash functions derived as cheap linear transforms mod p (O(shingles)
    * hashing, not O(shingles × signatures)); and the min-reduction done as
    * explode → groupBy with 12 plain `min` aggregates — whole-stage-codegen
    * map-side partial aggregation — instead of nested higher-order lambdas,
    * which Catalyst interprets row-by-row (~10× slower on this shape).
    */
  def minhashSignatures(corpus: DataFrame): DataFrame = {
    // Observability: the ingest loop's "sketch exactly once per batch"
    // contract is pinned by counting constructions of this plan (each
    // caller materializes it eagerly, so construction count == executed
    // sketch passes there). Driver-side only; costs one increment.
    sketchPlans.incrementAndGet()
    val hashed = shingleRows(corpus)
      .select(col("doc_id"), expr(s"${md5i.format("sh")} % 999999937").as("h"))
    val minCols = (0 until 12).map(i =>
      min((col("h") * (2 * i + 3) + i * 7919) % 999999937).as(s"m$i"))
    hashed.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 12).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Counts [[minhashSignatures]] plan constructions (see the note
    * inside it) — read-and-diff by specs that pin sketch-pass budgets. */
  private[graft] val sketchPlans =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Banded LSH: 6 bands × 2 rows; (band_idx, band_key) explode. */
  def bands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), posexplode(expr(
      """transform(sequence(0, 5),
        |  b -> md5(concat(cast(element_at(sig, 2 * b + 1) as string), ',',
        |                  cast(element_at(sig, 2 * b + 2) as string))))""".stripMargin)))
      .toDF("doc_id", "band_idx", "band_key")

  /** Candidate pairs = distinct (a, b) sharing ≥1 band bucket; est jaccard =
    * matching signature fraction. No all-pairs anywhere.
    */
  /** Skew guard: LSH buckets larger than this are dropped before the
    * self-join. A degenerate key (empty/boilerplate text) otherwise creates
    * one mega-bucket whose pair fan-out is quadratic — the classic skew
    * failure of LSH joins at scale. Applied identically in the oracle, so
    * outputs still hash-match.
    */
  val MaxBucketSize = 1000

  def minhashCandidates(corpus: DataFrame): DataFrame = {
    // The signature table appears four times in this plan (both sides of the
    // band self-join, both sides of the est-jaccard join); persist it so the
    // md5 sketch pipeline runs once. At cluster scale this is the sketch
    // table you would checkpoint/bucket to storage between stages.
    // Eager (localCheckpoint), not lazy persist: the est-jaccard arms
    // materialize as concurrent stage jobs and raced the cache population,
    // re-running the sketch pipeline per arm (the alert_rules pattern).
    val sigs = minhashSignatures(fan(corpus)).select("doc_id", "sig")
      .localCheckpoint(true)
    val allBands = bands(sigs)
    val b = allBands
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_key"))))
      .filter(col("bucket_n") <= MaxBucketSize)
      .drop("bucket_n")
    val pairs = b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(expr("size(filter(sequence(1, 12), i -> element_at(sig_a, i) = element_at(sig_b, i)))") / lit(12.0), 4)
          .as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Matching signature positions (of 12) for a cross-split pair to count
    * as leakage (≈ Jaccard ≥ 0.83 — the review band). */
  val LeakMatchMin = 10

  /** Cross-split near-dup leakage audit — the train/heldout contamination
    * check an LLM data pipeline runs before trusting its eval numbers
    * (near-duplicates of heldout documents inside the training split
    * inflate every benchmark; cf. the C4/Pile dedup analyses): assign
    * every document to train or heldout by a deterministic md5 threshold
    * (~1/`heldoutMod` heldout), generate the SAME banded MinHash
    * candidates as [[minhashCandidates]], and keep only pairs that CROSS
    * the split with ≥ [[LeakMatchMin]]/12 matching signature positions.
    * One row per leak: the heldout doc, the training doc that leaks it,
    * and the match strength — exact integers, hash-verified.
    *
    * Scale shape: identical to [[minhashCandidates]] (banded candidates,
    * bucket cap, never all-pairs); the split flag is a pure function of
    * doc_id so it rides the signature table without a join.
    */
  def splitLeakage(corpus: DataFrame, heldoutMod: Int = 10): DataFrame = {
    val sigs = minhashSignatures(fan(corpus))
      .withColumn("ho", expr(
        s"cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % $heldoutMod = 0"))
      .persist() // lazy on purpose: eager measured 1.09 -> 1.81 s here
    val b = bands(sigs)
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_key"))))
      .filter(col("bucket_n") <= MaxBucketSize)
      .drop("bucket_n")
    val pairs = b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
        col("ho").as("ho_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        col("ho").as("ho_b")), "doc_b")
      .filter(col("ho_a") =!= col("ho_b"))
      .withColumn("matching", expr(
        "size(filter(sequence(1, 12), i -> element_at(sig_a, i) = element_at(sig_b, i)))")
        .cast("long"))
      .filter(col("matching") >= LeakMatchMin)
      .select(
        when(col("ho_a"), col("doc_a")).otherwise(col("doc_b")).as("heldout_id"),
        when(col("ho_a"), col("doc_b")).otherwise(col("doc_a")).as("train_id"),
        col("matching"))
      .orderBy(col("heldout_id"), col("train_id"))
  }

  /** Incremental MinHash-LSH: near-dup candidates for a NEW batch against
    * an already-indexed corpus — the ingest-time form of
    * [[minhashCandidates]]. Band rows of the full corpus sit on one side
    * (at 100 TB these are READ BACK from the persisted sketch/band table,
    * not recomputed — cf. the persist note in [[minhashCandidates]]); only
    * the delta's bands drive the probe side, so each increment shuffles
    * O(Δdocs × bands) and old×old pairs are never re-derived. Every
    * emitted pair involves a new document (new×old or new×new).
    *
    * The fixture's planted near-dups carry ids ≥ 10000, so they ARE the
    * "new batch": the query provably finds exactly the arriving
    * duplicates against the standing corpus.
    */
  def minhashIncremental(corpus: DataFrame, newFrom: Long = 10000L): DataFrame = {
    val sigs = minhashSignatures(fan(corpus)).select("doc_id", "sig")
      .persist() // lazy on purpose: eager measured 1.21 -> 1.89 s here
    bandProbe(sigs, bands(sigs), newFrom)
  }

  /** The REFERENCE batch-probe tail (in-query form): probe-time
    * mega-bucket cap over the combined band rows, banded pair join
    * restricted to docs at-or-above `newFrom`, 12-way signature-agreement
    * Jaccard rounded to 4 places. [[minhashIncremental]] runs it
    * directly; the persisted index's probes ([[LshIndex.probeBatch]] /
    * [[LshIndex.probeAppended]]) re-plan the SAME semantics against the
    * materialized bucket-occupancy table so their exchanges carry O(Δ)
    * instead of the corpus — the shared oracle SQL and
    * [[LshIndexSpec]]'s cross-path equality checks pin the three
    * execution paths to one answer. Semantics changes here must land in
    * `LshIndex.probeIndexed` too. */
  private[ops] def bandProbe(sigs: DataFrame, allBands: DataFrame,
      newFrom: Long): DataFrame = {
    val b = allBands
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_key"))))
      .filter(col("bucket_n") <= MaxBucketSize)
      .drop("bucket_n")
    val newBands = b.filter(col("doc_id") >= newFrom)
    val pairs = b.as("x").join(newBands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(expr("size(filter(sequence(1, 12), i -> element_at(sig_a, i) = element_at(sig_b, i)))") / lit(12.0), 4)
          .as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** True n-gram Jaccard over the LSH candidates (verify stage of the
    * near-dup pipeline): |A∩B| / |A∪B| on distinct shingle sets.
    */
  def ngramJaccard(corpus: DataFrame): DataFrame = {
    val sh = shingleSets(fan(corpus))
      .select(col("doc_id"), col("shingles").as("sh"))
      .persist() // lazy on purpose: eager measured 2.49 -> 2.78 s here
    val cands = minhashCandidates(corpus).select("doc_a", "doc_b")
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4)
          .as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 48-bit SimHash per document over distinct word BIGRAMS, with near-dup
    * pairs found by 3×16-bit block banding + Hamming ≤ 3 — again no
    * all-pairs. Bigrams, not unigrams: the fixture corpus shares one small
    * vocabulary, so unigram-feature simhashes cluster into a few giant LSH
    * buckets (quadratic join fan-out); bigram features spread genuinely
    * different docs apart while keeping planted near-dups at Hamming ≈ 0.
    */
  def simhashes(corpus: DataFrame): DataFrame = {
    // Per-bit majority via explode → groupBy with 48 codegen'd conditional
    // sums (one shuffle, map-side partial agg). The lambda formulation of
    // the same math (aggregate ∘ filter per bit) is interpreted by Catalyst
    // and ~15× slower — measured, not guessed.
    // Hash BEFORE the distinct: the dedup shuffle then carries 8-byte longs
    // rather than bigram strings (same result — equal bigrams hash equal;
    // 2^60 collisions negligible).
    val hashed = fan(corpus)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"), posexplode(col("toks")))
      .filter(col("pos") <= size(col("toks")) - 2)
      .select(col("doc_id"),
        concat_ws(" ", col("col"), element_at(col("toks"), col("pos") + 2)).as("bg"))
      .select(col("doc_id"), expr(md5i.format("bg")).as("h"))
      .distinct()
    val aggCols = count(lit(1)).as("n") +:
      (0 until 48).map(b => sum(shiftright(col("h"), b) % 2).as(s"b$b"))
    val counts = hashed.groupBy(col("doc_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val simhash = (0 until 48)
      .map(b => when(col(s"b$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    counts.select(col("doc_id"), simhash.as("simhash"))
  }

  def simhashPairs(corpus: DataFrame): DataFrame = {
    val s = simhashes(corpus)
    val allBlocks = s.select(col("doc_id"), col("simhash"), posexplode(expr(
      "transform(sequence(0, 2), b -> shiftright(simhash, cast(16 * b as int)) % 65536)")))
      .toDF("doc_id", "simhash", "block_idx", "block_key")
    // Same skew guard as minhashCandidates: a degenerate corpus (empty or
    // boilerplate docs collapsing to one simhash) would otherwise mega-bucket
    // the block self-join into quadratic fan-out. Mirrored in the oracle.
    val blocks = allBlocks
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("block_idx"), col("block_key"))))
      .filter(col("bucket_n") <= MaxBucketSize)
      .drop("bucket_n")
    blocks.as("x").join(blocks.as("y"),
        col("x.block_idx") === col("y.block_idx") &&
          col("x.block_key") === col("y.block_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Duplicate clusters: connected components over the MinHash candidate
    * pairs — the transitive-closure step a dedup pipeline needs before it
    * can pick one keeper per GROUP (pairs alone under-delete: A~B, B~C must
    * collapse to one cluster even if A~C was never a candidate).
    *
    * Algorithm: iterative min-label propagation — every doc starts labeled
    * with itself; each round takes the min of its own and its neighbors'
    * labels; converges in O(component diameter) rounds. Each round is one
    * equi-join + partial-agg min — no windows, no driver-side graph. Near-dup
    * components are overwhelmingly tiny (pairs/triples), so diameter — and
    * the round count — stays small at any corpus size; the driver only ever
    * sees the per-round convergence COUNT, never the labels. At 100 TB the
    * refinement is the alternating large-star/small-star formulation
    * (Kiveris et al., "Connected Components in MapReduce"), which collapses
    * long chains in O(log n) rounds; the per-round plan shape is the same.
    */
  def dupClusters(corpus: DataFrame): DataFrame = {
    val pairs = minhashCandidates(corpus).select("doc_a", "doc_b")
    // Eager localCheckpoint, not persist: persist caches DATA but keeps the
    // full logical plan, and in an iterative loop each round's plan nests
    // the previous round's (plus the whole MinHash lineage) — the plan tree
    // grows geometrically with rounds and OOMs the driver long before the
    // data does. Checkpointing truncates lineage so every round's plan is
    // one join + one agg, constant-size. At cluster scale use
    // `spark.sparkContext.setCheckpointDir` + `.checkpoint()` (reliable
    // storage) instead of the executor-local variant.
    // Checkpoint the CANDIDATES before the symmetric closure: both union
    // branches reference `pairs`, so an un-materialized plan would run
    // the full MinHash-candidate pipeline twice (profiled: the sketch
    // stages appeared doubled at sf0.1). The closure itself stays a lazy
    // view over the checkpoint — each loop round reads it for pennies.
    val p = pairs.localCheckpoint(true)
    val edges = p
      .unionByName(p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      // Carry the pre-round label through the plan so convergence detection
      // is a filter over the (already materialized) checkpoint, not an
      // extra join against the previous labels frame.
      val next = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("label").as("nbr_label")),
          "doc_b")
        .groupBy(col("doc_a"))
        .agg(min(col("nbr_label")).as("min_nbr"))
        .join(labels.select(col("doc_id").as("doc_a"), col("label")), "doc_a")
        .select(col("doc_a").as("doc_id"),
          least(col("label"), col("min_nbr")).as("label"),
          col("label").as("old_label"))
        .localCheckpoint(true)
      changed = next.filter(col("label") =!= col("old_label")).count()
      labels = next.select("doc_id", "label")
      rounds += 1
    }
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("cluster_id"), col("n_members"))
      .orderBy(col("doc_id"))
  }

  /** One alternating star round (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"): every node links its larger (large-star) or
    * not-larger (small-star) neighbors directly to the minimum of its
    * closed neighborhood. Edges are kept symmetric-closed before grouping.
    */
  private def starRound(edges: DataFrame, large: Boolean): DataFrame = {
    // No distinct on the symmetric closure: every input edge carries a
    // strict order (u < v from the candidate pairs on entry; u > v from a
    // star round's output), so the reversed set cannot collide with the
    // original, and the downstream min-agg and final distinct are
    // insensitive to duplicates anyway. Saves one full shuffle per round.
    val sym = edges
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    val nbr = sym.join(mins, "u")
    val moved = (if (large) nbr.filter(col("v") > col("u"))
                 else nbr.filter(col("v") <= col("u")))
      .select(col("v").as("u"), col("m").as("v"))
    moved.unionByName(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Duplicate clusters via alternating large-star/small-star — the
    * published O(log n)-round connected-components algorithm and the
    * production-scale refinement of [[dupClusters]]'s label propagation:
    * propagation needs O(component diameter) rounds and funnels every
    * member of a hot component through one reducer key each round, while
    * star rounds contract the graph toward direct min-links so both the
    * round count and the per-key fan-in drop geometrically. Same output
    * contract and oracle as [[dupClusters]]; per-round lineage is
    * checkpoint-truncated exactly like the propagation loop.
    */
  def dupClustersStar(corpus: DataFrame): DataFrame = {
    val pairs = minhashCandidates(corpus)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    var edges = pairs.localCheckpoint(true)
    // Fixpoint test on the materialized checkpoints: same size and an
    // order-insensitive content checksum (cheap vs two except() jobs).
    // The previous round's signature is carried over, not recomputed —
    // one agg job per round, not two.
    def sig(df: DataFrame) = df
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(hash(col("u"), col("v")).cast("long")), lit(0L)).as("h"))
      .collect().head
    var edgeSig = sig(edges)
    var stable = false
    var rounds = 0
    while (!stable && rounds < 12) {
      val next = starRound(starRound(edges, large = true), large = false)
        .localCheckpoint(true)
      val nextSig = sig(next)
      stable = nextSig == edgeSig
      edges = next
      edgeSig = nextSig
      rounds += 1
    }
    // At the fixpoint each component is a star on its minimum: a node's
    // label is the least id in its closed neighborhood.
    val labels = edges
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("label"))
      .select(col("u").as("doc_id"), col("label"))
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("cluster_id"), col("n_members"))
      .orderBy(col("doc_id"))
  }

  /** Minimum duplicated run length, in tokens, for [[duplicateSpans]]. */
  val SpanGram = 5

  /** Cross-document duplicate SPAN detection — the exact-substring analog
    * of document-level near-dup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better" treat ≥50-token repeated substrings as
    * removable; the mechanism here is identical with a 5-token floor so the
    * fixture corpus exercises it). A span is a maximal run of consecutive
    * token positions whose [[SpanGram]]-grams each appear in more than one
    * document.
    *
    * Scale shape: one positional-gram explode (docs × positions), grams
    * hashed to 60-bit longs BEFORE any shuffle, the cross-doc test done as
    * min(doc)≠max(doc) in a single partial-aggregated groupBy (no
    * count-distinct), and span assembly is a per-document window (high-
    * cardinality partition key — no global sort). The suffix-array approach
    * of the paper is a single-machine construction; this explode→agg→window
    * plan is the shuffle-bounded equivalent that survives a 1000-executor
    * corpus.
    */
  def duplicateSpans(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = fan(corpus)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= SpanGram)
      .select(col("doc_id"), col("toks"), posexplode(col("toks")))
      .filter(col("pos") <= size(col("toks")) - SpanGram)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        concat_ws(" ", col("col"),
          element_at(col("toks"), col("pos") + 2),
          element_at(col("toks"), col("pos") + 3),
          element_at(col("toks"), col("pos") + 4),
          element_at(col("toks"), col("pos") + 5)).as("g"))
      .select(col("doc_id"), col("pos"), expr(md5i.format("g")).as("h"))
    val crossDoc = grams.groupBy(col("h"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("h")
    val dupPos = grams.join(crossDoc, "h").select("doc_id", "pos")
    dupPos
      .withColumn("island",
        col("pos") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + SpanGram - 1).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"), col("n_grams"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** Apply near-dup dedup to the corpus: every document annotated with its
    * cluster (if any) and whether it SURVIVES — one keeper (min doc_id) per
    * duplicate cluster, all unclustered docs kept. This is the
    * detect→apply closure: [[minhashCandidates]] finds pairs,
    * [[dupClusters]] closes them transitively, and this emits the
    * deduplicated corpus a training run actually consumes.
    *
    * The cluster join carries NO broadcast hint on purpose: the cluster
    * table holds one row per duplicate-involved document, and at web-corpus
    * dup rates (30–50%) that is a constant fraction of the corpus — far past
    * any broadcast threshold. A forced hint would override Spark's own size
    * check and OOM the executors at scale; instead the plain equi-join on
    * `doc_id` lets AQE pick broadcast when the cluster table happens to be
    * small and a shuffled hash join otherwise. (At cluster scale, bucket
    * both sides on `doc_id` — `sources.Bucketing` — and the shuffle
    * disappears too.)
    */
  def dedupApply(corpus: DataFrame): DataFrame = {
    val clusters = dupClusters(corpus)
      .withColumn("keeper_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))))
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"))
    corpus.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        (col("cluster_id").isNull || (col("doc_id") === col("keeper_id")))
          .as("survives"))
      .orderBy(col("doc_id"))
  }

  /** Detect→apply with a QUALITY keeper policy: instead of min-id, each
    * cluster keeps its LONGEST member (ties → lowest id) — the real-world
    * web-dedup policy of keeping the fullest version of a page, since the
    * near-dup plant truncates (the +10000 twins drop their first word).
    * Same join discipline as [[dedupApply]]: the corpus joins clusters on
    * `doc_id` unhinted (AQE picks broadcast only when the cluster table is
    * actually small), and the keeper choice is a `first_value` over the
    * cluster-partitioned window ordered (len DESC, doc_id ASC) — cluster
    * ids are high-cardinality, so the window spreads.
    */
  def dedupApplyQuality(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = corpus.select(col("doc_id"), length(col("text")).as("len"))
    val clusters = dupClusters(corpus)
      .join(lens, "doc_id")
      .withColumn("keeper_id",
        first(col("doc_id")).over(Window.partitionBy(col("cluster_id"))
          .orderBy(col("len").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"))
    corpus.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"),
        (col("cluster_id").isNull || (col("doc_id") === col("keeper_id")))
          .as("survives"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------ exact set-similarity join

  /** Jaccard threshold for the exact similarity join, as a fraction:
    * J(A, B) ≥ JacNum/JacDen — kept rational so the verification is an
    * integer cross-multiplication, never a float compare. */
  val JacNum = 19
  val JacDen = 20

  /** EXACT set-similarity self-join via prefix filtering (the
    * PPJoin/AllPairs family: Bayardo et al., "Scaling Up All Pairs
    * Similarity Search", WWW'07) — the exact-threshold complement to the
    * approximate MinHash/SimHash candidate paths: every token-set pair
    * with Jaccard ≥ 19/20, no sketches. Exactness caveat: the prefix-token
    * bucket cap below ([[MaxBucketSize]]) silently drops over-full buckets,
    * so recall is exact only up to that cap — a degenerate corpus where
    * thousands of docs share their rarest prefix token (e.g. thousands of
    * identical documents, pinned in EdgeCaseSpec) loses those pairs. Same
    * recall contract as the LSH paths' caps; raise the cap (or pre-dedup
    * exact duplicates first) when full recall matters.
    *
    * Prefix theorem: order every doc's distinct tokens by a single global
    * order (document frequency asc, then token — rarest first); if
    * J(A, B) ≥ t, then the first |A| − ⌈t·|A|⌉ + 1 tokens of A and the
    * corresponding prefix of B must share a token. So candidates come
    * from an equi-join on PREFIX tokens only — and because prefixes hold
    * each doc's RAREST tokens, the join key distribution is the flat tail
    * of the Zipf curve, not the head: fan-out per token is inherently
    * small, with the usual bucket cap as the backstop. Verification joins
    * the candidate pairs back to the full token table once, counts the
    * intersection, and checks `JacDen·inter ≥ JacNum·(|A|+|B|−inter)` in
    * exact integers.
    *
    * Scale: token tables shuffle on token/doc keys (high cardinality);
    * nothing quadratic anywhere — candidates are bounded by prefix-token
    * co-occurrence, the verify join is |candidates| × avg set size.
    */
  def jaccardPrefixJoin(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The token table feeds four plan arms (df count, rank, and both
    // sides of the verification join) — persist it so the explode runs
    // once. At cluster scale this is the doc-token table you'd
    // checkpoint/bucket between stages (same note as minhashCandidates).
    val toks = corpus
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .persist()
    val withDf = toks.join(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("df")), "tok")
    // DESIGN RECORD (r17): three "obvious" accelerations of this plan —
    // fanning the token explode, eager-checkpointing the token table, and
    // an explicit doc_id repartition ahead of the windows — were each
    // built and measured (same-session, idle host): the combination read
    // 5.0-6.2 s against the lazy-persist original's 3.2 s. The query is a
    // chain of many SMALL stages; lazy persists let AQE overlap them
    // (occasionally duplicating cheap subtrees), while eager waves
    // serialize the chain and the extra exchanges cost more than the
    // parallelism they buy at this scale. Reverted whole.
    val ranked = withDf
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    // prefix length p = n - ceil(t·n) + 1, with ceil(19n/20) = (19n+19) div 20
    val prefix = ranked
      .filter(col("rnk") <= col("n") - expr(s"($JacNum * n + $JacNum) div $JacDen") + 1)
      .select(col("doc_id"), col("tok"), col("n"))
    val capped = prefix
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .filter(col("bucket_n") <= MaxBucketSize)
      .drop("bucket_n")
    val cands = capped.as("x").join(capped.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .distinct()
    val inter = cands
      .join(toks.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(toks.as("tb"),
        col("doc_b") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter_n"))
    inter
      .withColumn("union_n", col("n_a") + col("n_b") - col("inter_n"))
      .filter(lit(JacDen) * col("inter_n") >= lit(JacNum) * col("union_n"))
      .select(col("doc_a"), col("doc_b"), col("inter_n").cast("long").as("inter_n"),
        col("union_n").cast("long").as("union_n"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ----------------------------------------------- fuzzy edit-distance dedup

  private val TitleTokens = 6
  private val TypoMod = 20
  private val TypoOffset = 40000
  private val BlockTokens = 2

  /** Edit-distance budget for a fuzzy title match. */
  val MaxEdit = 2

  /** Corpus of document "titles" (first [[TitleTokens]] tokens) with planted
    * retyped near-copies: every [[TypoMod]]th doc spawns doc_id +
    * [[TypoOffset]] whose title's last character is swapped for 'x' — edit
    * distance ≤ 1 from the original, invisible to every exact-hash path. */
  private def typoCorpus(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"),
      expr(s"array_join(slice(split(text, ' '), 1, $TitleTokens), ' ')").as("title"))
    base.unionByName(base
      .filter(pmod(col("doc_id"), lit(TypoMod)) === 0 && length(col("title")) >= 5)
      .select((col("doc_id") + TypoOffset).as("doc_id"),
        expr("concat(substring(title, 1, length(title) - 1), 'x')").as("title")))
  }

  /** Fuzzy short-string dedup via blocked edit distance — the entity-
    * resolution modality (titles, names, URLs) none of the token-set paths
    * cover: MinHash/Jaccard see a one-CHARACTER typo as a whole-token
    * substitution (a 6-token title drops to J ≈ 5/7, far under any sane
    * threshold), while `levenshtein` reads it as distance 1. Standard
    * prefix-blocking bounds the candidate space (Christen, "A survey of
    * indexing techniques for scalable record linkage", TKDE 2012): pairs
    * are generated only within a [[BlockTokens]]-token prefix block, each
    * block capped at [[MaxBucketSize]] rows (the same documented recall
    * tradeoff as every LSH path — a typo inside the blocking prefix itself
    * needs a second pass with a different key, e.g. a sorted-neighborhood
    * or phonetic key).
    *
    * Exact-duplicate titles collapse to their min-doc_id representative
    * BEFORE pairing — the production ordering (exact dedup runs upstream;
    * distance-0 pairs are reconstructable from the groups), and the scale
    * guard the 50× smoke demanded: a web corpus where every title repeats
    * 50× otherwise spends its time emitting C(50,2) distance-0 pairs per
    * group — 783 s at 250k docs; seconds once pairs are per DISTINCT
    * title. Emitted distances are therefore always ≥ 1.
    *
    * Scale shape: the self-join keys on the block prefix over distinct
    * titles (high cardinality, cap-bounded fan-out), and `levenshtein`
    * runs codegen'd on O(block²) SHORT strings per block — never on
    * document bodies.
    */
  def fuzzyTitlePairs(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reps = typoCorpus(documents)
      .groupBy(col("title")).agg(min(col("doc_id")).as("doc_id"))
    val capped = reps
      .withColumn("blk",
        expr(s"array_join(slice(split(title, ' '), 1, $BlockTokens), ' ')"))
      .withColumn("block_n", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("block_n") <= MaxBucketSize)
    capped.as("a").join(capped.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("edit_dist",
        levenshtein(col("a.title"), col("b.title")).cast("long"))
      .filter(col("edit_dist") <= MaxEdit)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("edit_dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) => exactDedup(exactCorpus(Tables.documents(s, d)))),
    "dedup_clusters" -> ((s, d) => dupClusters(nearCorpus(Tables.documents(s, d)))),
    "dedup_clusters_star" -> ((s, d) => dupClustersStar(nearCorpus(Tables.documents(s, d)))),
    "dedup_minhash" -> ((s, d) => minhashCandidates(nearCorpus(Tables.documents(s, d)))),
    "dedup_minhash_incremental" -> ((s, d) => minhashIncremental(nearCorpus(Tables.documents(s, d)))),
    "split_leakage" -> ((s, d) => splitLeakage(nearCorpus(Tables.documents(s, d)))),
    "dedup_ngram_jaccard" -> ((s, d) => ngramJaccard(nearCorpus(Tables.documents(s, d)))),
    "dedup_simhash_pairs" -> ((s, d) => simhashPairs(nearCorpus(Tables.documents(s, d)))),
    "duplicate_spans" -> ((s, d) => duplicateSpans(Tables.documents(s, d))),
    "dedup_apply" -> ((s, d) => dedupApply(nearCorpus(Tables.documents(s, d)))),
    "dedup_apply_quality" -> ((s, d) => dedupApplyQuality(nearCorpus(Tables.documents(s, d)))),
    "dedup_jaccard_prefix" -> ((s, d) => jaccardPrefixJoin(nearCorpus(Tables.documents(s, d)))),
    "dedup_fuzzy_title" -> ((s, d) => fuzzyTitlePairs(Tables.documents(s, d))),
  )

  /** Oracle CTEs: same corpora, same md5-prefix hash family. The oracle may
    * do the quadratic join (it's 500 rows); the Spark side must not.
    */
  private[ops] val nearCorpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, substr(text, instr(text, ' ') + 1)
      |  FROM documents WHERE doc_id % 25 = 0
      |)""".stripMargin

  private[ops] val sigSql =
    """sigs AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 12),
      |      i -> list_min(list_transform(hs,
      |        h -> (h * (2 * i + 3) + i * 7919) % 999999937))) AS sig,
      |    hs
      |  FROM (
      |    SELECT doc_id, shingles,
      |      list_transform(shingles,
      |        sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT % 999999937) AS hs
      |    FROM (
      |      SELECT doc_id,
      |        list_transform(generate_series(1, len(toks) - 2),
      |          i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS shingles
      |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
      |      WHERE len(toks) >= 3
      |    )
      |  )
      |)""".stripMargin

  private[ops] val candSql =
    """all_bands AS (
      |  SELECT doc_id, b AS band_idx,
      |    md5(sig[2 * b + 1]::VARCHAR || ',' || sig[2 * b + 2]::VARCHAR) AS band_key
      |  FROM sigs, range(0, 6) r(b)
      |), bands AS (
      |  SELECT doc_id, band_idx, band_key FROM (
      |    SELECT *, count(*) OVER (PARTITION BY band_idx, band_key) AS bucket_n
      |    FROM all_bands
      |  ) WHERE bucket_n <= 1000
      |), cands AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.band_idx = y.band_idx AND x.band_key = y.band_key
      |   AND x.doc_id < y.doc_id
      |)""".stripMargin

  def oracleSql: Map[String, String] =
    // Both cluster engines (label propagation / large-small star) compute
    // the same components, so they share the recursive-CTE oracle.
    baseOracleSql + ("dedup_clusters_star" -> baseOracleSql("dedup_clusters"))

  private def baseOracleSql: Map[String, String] = Map(
    "dedup_fuzzy_title" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    array_to_string(string_split(text, ' ')[1:$TitleTokens], ' ') AS title
         |  FROM documents
         |), corpus AS (
         |  SELECT doc_id, title FROM base
         |  UNION ALL
         |  SELECT doc_id + $TypoOffset, substr(title, 1, len(title) - 1) || 'x'
         |  FROM base WHERE doc_id % $TypoMod = 0 AND len(title) >= 5
         |), reps AS (
         |  SELECT title, min(doc_id) AS doc_id FROM corpus GROUP BY title
         |), blocked AS (
         |  SELECT doc_id, title,
         |    array_to_string(string_split(title, ' ')[1:$BlockTokens], ' ') AS blk
         |  FROM reps
         |), capped AS (
         |  SELECT doc_id, title, blk FROM (
         |    SELECT *, count(*) OVER (PARTITION BY blk) AS block_n FROM blocked)
         |  WHERE block_n <= $MaxBucketSize
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  levenshtein(a.title, b.title)::BIGINT AS edit_dist
         |FROM capped a JOIN capped b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE levenshtein(a.title, b.title) <= $MaxEdit
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_jaccard_prefix" ->
      s"""WITH $nearCorpusSql, toks AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
         |  FROM corpus
         |), dfreq AS (
         |  SELECT tok, count(*) AS df FROM toks GROUP BY tok
         |), ranked AS (
         |  SELECT t.doc_id, t.tok,
         |    row_number() OVER (PARTITION BY t.doc_id ORDER BY df, t.tok) AS rnk,
         |    count(*) OVER (PARTITION BY t.doc_id) AS n
         |  FROM toks t JOIN dfreq USING (tok)
         |), prefix AS (
         |  SELECT doc_id, tok, n FROM ranked
         |  WHERE rnk <= n - (($JacNum * n + $JacNum) // $JacDen) + 1
         |), capped AS (
         |  SELECT doc_id, tok, n FROM (
         |    SELECT *, count(*) OVER (PARTITION BY tok) AS bucket_n FROM prefix)
         |  WHERE bucket_n <= $MaxBucketSize
         |), cands AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    x.n AS n_a, y.n AS n_b
         |  FROM capped x JOIN capped y
         |    ON x.tok = y.tok AND x.doc_id < y.doc_id
         |), inter AS (
         |  SELECT doc_a, doc_b, n_a, n_b, count(*) AS inter_n
         |  FROM cands
         |  JOIN toks ta ON doc_a = ta.doc_id
         |  JOIN toks tb ON doc_b = tb.doc_id AND ta.tok = tb.tok
         |  GROUP BY doc_a, doc_b, n_a, n_b
         |)
         |SELECT doc_a, doc_b, inter_n::BIGINT AS inter_n,
         |  (n_a + n_b - inter_n)::BIGINT AS union_n
         |FROM inter
         |WHERE $JacDen * inter_n >= $JacNum * (n_a + n_b - inter_n)
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $nearCorpusSql, $sigSql, $candSql,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM cands
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM cands
         |),
         |reach AS (
         |  SELECT a AS node, a AS root FROM edges
         |  UNION
         |  SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
         |),
         |clusters AS (
         |  SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
         |)
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS n_members
         |FROM clusters ORDER BY doc_id""".stripMargin,
    "dedup_apply" ->
      s"""WITH RECURSIVE $nearCorpusSql, $sigSql, $candSql,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM cands
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM cands
         |),
         |reach AS (
         |  SELECT a AS node, a AS root FROM edges
         |  UNION
         |  SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
         |),
         |clusters AS (
         |  SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
         |),
         |keepers AS (
         |  SELECT doc_id, cluster_id,
         |    min(doc_id) OVER (PARTITION BY cluster_id) AS keeper_id
         |  FROM clusters
         |)
         |SELECT c.doc_id, k.cluster_id,
         |  (k.cluster_id IS NULL OR c.doc_id = k.keeper_id) AS survives
         |FROM corpus c LEFT JOIN keepers k USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin,
    "dedup_apply_quality" ->
      s"""WITH RECURSIVE $nearCorpusSql, $sigSql, $candSql,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM cands
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM cands
         |),
         |reach AS (
         |  SELECT a AS node, a AS root FROM edges
         |  UNION
         |  SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
         |),
         |clusters AS (
         |  SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
         |),
         |keepers AS (
         |  SELECT cl.doc_id, cl.cluster_id,
         |    first_value(cl.doc_id) OVER (PARTITION BY cl.cluster_id
         |      ORDER BY len(co.text) DESC, cl.doc_id ASC) AS keeper_id
         |  FROM clusters cl JOIN corpus co USING (doc_id)
         |)
         |SELECT c.doc_id, k.cluster_id, k.keeper_id,
         |  (k.cluster_id IS NULL OR c.doc_id = k.keeper_id) AS survives
         |FROM corpus c LEFT JOIN keepers k USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000, upper(text) FROM documents WHERE doc_id % 20 = 0
        |)
        |SELECT sha256(lower(trim(text))) AS text_hash,
        |  count(*) AS n_docs, min(doc_id) AS keeper_id
        |FROM corpus GROUP BY 1 ORDER BY text_hash""".stripMargin,
    "dedup_minhash" ->
      s"""WITH $nearCorpusSql, $sigSql, $candSql
         |SELECT doc_a, doc_b,
         |  round(len(list_filter(range(1, 13), i -> a.sig[i] = b.sig[i])) / 12.0, 4) AS est_jaccard
         |FROM cands
         |JOIN sigs a ON a.doc_id = doc_a
         |JOIN sigs b ON b.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_minhash_incremental" ->
      s"""WITH $nearCorpusSql, $sigSql, $candSql
         |SELECT doc_a, doc_b,
         |  round(len(list_filter(range(1, 13), i -> a.sig[i] = b.sig[i])) / 12.0, 4) AS est_jaccard
         |FROM cands
         |JOIN sigs a ON a.doc_id = doc_a
         |JOIN sigs b ON b.doc_id = doc_b
         |WHERE doc_b >= 10000
         |ORDER BY doc_a, doc_b""".stripMargin,
    "split_leakage" ->
      s"""WITH $nearCorpusSql, $sigSql, $candSql,
         |split AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 = 0 AS ho
         |  FROM (SELECT DISTINCT doc_id FROM corpus)
         |)
         |SELECT CASE WHEN sa.ho THEN doc_a ELSE doc_b END AS heldout_id,
         |  CASE WHEN sa.ho THEN doc_b ELSE doc_a END AS train_id,
         |  len(list_filter(range(1, 13), i -> a.sig[i] = b.sig[i]))::BIGINT AS matching
         |FROM cands
         |JOIN sigs a ON a.doc_id = doc_a
         |JOIN sigs b ON b.doc_id = doc_b
         |JOIN split sa ON sa.doc_id = doc_a
         |JOIN split sb ON sb.doc_id = doc_b
         |WHERE sa.ho <> sb.ho
         |  AND len(list_filter(range(1, 13), i -> a.sig[i] = b.sig[i])) >= 10
         |ORDER BY heldout_id, train_id""".stripMargin,
    // Jaccard over the HASHED shingle sets, mirroring the Spark side (which
    // hashes before the collect_set shuffle); identical values modulo 2^60
    // md5 collisions.
    "dedup_ngram_jaccard" ->
      s"""WITH $nearCorpusSql, $sigSql, $candSql
         |SELECT doc_a, doc_b,
         |  round(len(list_intersect(list_distinct(a.hs), list_distinct(b.hs))) /
         |    len(list_distinct(a.hs || b.hs))::DOUBLE, 4) AS jaccard
         |FROM cands
         |JOIN sigs a ON a.doc_id = doc_a
         |JOIN sigs b ON b.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    "duplicate_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), grams AS (
        |  SELECT doc_id, u.i - 1 AS pos,
        |    ('0x' || substr(md5(toks[u.i] || ' ' || toks[u.i+1] || ' ' ||
        |      toks[u.i+2] || ' ' || toks[u.i+3] || ' ' || toks[u.i+4]), 1, 15))::BIGINT AS h
        |  FROM toks, unnest(range(1, len(toks) - 3)) u(i)
        |  WHERE len(toks) >= 5
        |), cross_doc AS (
        |  SELECT h FROM grams GROUP BY h HAVING min(doc_id) <> max(doc_id)
        |), isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM grams JOIN cross_doc USING (h)
        |)
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens, n_grams
        |FROM (
        |  SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
        |    count(*) AS n_grams
        |  FROM isl GROUP BY doc_id, island
        |) ORDER BY doc_id, span_start""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""WITH $nearCorpusSql, sims AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(range(0, 48), b -> CASE
         |      WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
         |      THEN (1::BIGINT << b) ELSE 0::BIGINT END))::BIGINT AS simhash
         |  FROM (
         |    -- distinct AFTER hashing, mirroring the Spark side's
         |    -- hash-then-distinct shuffle narrowing
         |    SELECT doc_id,
         |      list_distinct(list_transform(
         |        list_transform(generate_series(1, len(toks) - 1),
         |          i -> toks[i] || ' ' || toks[i + 1]),
         |        t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)) AS hs
         |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
         |    WHERE len(toks) >= 2
         |  )
         |), all_blocks AS (
         |  SELECT doc_id, simhash, b AS block_idx, (simhash >> (16 * b)) & 65535 AS block_key
         |  FROM sims, range(0, 3) r(b)
         |), blocks AS (
         |  SELECT doc_id, simhash, block_idx, block_key FROM (
         |    SELECT *, count(*) OVER (PARTITION BY block_idx, block_key) AS bucket_n
         |    FROM all_blocks
         |  ) WHERE bucket_n <= 1000
         |)
         |SELECT * FROM (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
         |  FROM blocks x JOIN blocks y
         |    ON x.block_idx = y.block_idx AND x.block_key = y.block_key
         |   AND x.doc_id < y.doc_id
         |) WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
  )
}
