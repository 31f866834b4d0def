package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for an LLM training-data pipeline over the
  * `documents` fixture: quality stats, n-gram-heuristic language ID,
  * BPE-ish token counting, and rolling-hash document fingerprinting.
  *
  * These extend the reference's capability set per the north-star brief
  * (the reference itself has no text ops); expressions are all built-in
  * higher-order functions (no UDFs), so everything stays in whole-stage
  * codegen and scales embarrassingly-parallel: one narrow projection per
  * document, no shuffle except the final stated aggregations.
  */
object TextStats {

  /** English-ish stopword list used by both the quality score and the
    * language-ID profile (tiny by design: the corpus is synthetic). */
  val enStop = Seq("the", "a", "of", "to", "and")
  val deStop = Seq("der", "die", "das", "und", "ist")
  val esStop = Seq("el", "la", "de", "y", "que")
  val frStop = Seq("le", "les", "et", "des", "un")
  val zhStop = Seq("的", "是", "了", "在", "我")

  private def stopHits(tokens: String, words: Seq[String]): String =
    s"size(filter($tokens, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  private def stopHitsSql(tokens: String, words: Seq[String]): String =
    s"len(list_filter($tokens, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Per-document stats: sizes, type-token ratio, stopword ratio, and a
    * deterministic quality score (length saturation × lexical diversity).
    */
  def textStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        round((length(col("text")) - size(col("toks")) + 1) /
          size(col("toks")).cast("double"), 4).as("avg_token_len"),
        round(size(array_distinct(col("toks"))) / size(col("toks")).cast("double"), 4)
          .as("ttr"),
        round(expr(stopHits("toks", enStop)) / size(col("toks")).cast("double"), 4)
          .as("stopword_ratio"),
        round(least(size(col("toks")) / lit(100.0), lit(1.0)) *
          (size(array_distinct(col("toks"))) / size(col("toks")).cast("double")), 4)
          .as("quality_score"))
      .orderBy(col("doc_id"))

  /** Language ID via stopword-profile scoring (an n-gram heuristic over
    * word unigrams): score each language's profile, predict the argmax with
    * a deterministic en>de>es>fr>zh tiebreak, and report agreement with the
    * labeled `lang` column.
    */
  def langId(documents: DataFrame): DataFrame = {
    val scored = documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("en_score", expr(stopHits("toks", enStop)))
      .withColumn("de_score", expr(stopHits("toks", deStop)))
      .withColumn("es_score", expr(stopHits("toks", esStop)))
      .withColumn("fr_score", expr(stopHits("toks", frStop)))
      .withColumn("zh_score", expr(stopHits("toks", zhStop)))
    val best = greatest(col("en_score"), col("de_score"), col("es_score"),
      col("fr_score"), col("zh_score"))
    scored.select(
      col("doc_id"), col("lang"),
      col("en_score").cast("long").as("en_score"),
      when(best === 0, lit("unknown"))
        .when(col("en_score") === best, lit("en"))
        .when(col("de_score") === best, lit("de"))
        .when(col("es_score") === best, lit("es"))
        .when(col("fr_score") === best, lit("fr"))
        .otherwise(lit("zh")).as("predicted_lang"))
      .withColumn("agrees", col("predicted_lang") === col("lang"))
      .orderBy(col("doc_id"))
  }

  /** BPE-ish token counting: whitespace tokens vs a regex lexer
    * (letter-runs | digit-runs | single punctuation), rolled up per source —
    * the corpus-level token accounting a data pipeline reports.
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
          .as("bpe_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).cast("long").as("total_ws_tokens"),
        sum(col("bpe_tokens")).cast("long").as("total_bpe_tokens"))
      .orderBy(col("source"))

  /** BPE vocabulary induction — the first N merge rules of byte-pair
    * encoding (Sennrich et al. 2016) trained on the corpus. Each round
    * counts adjacent symbol pairs weighted by word frequency, merges the
    * most frequent pair (deterministic (freq, left, right) tiebreak), and
    * re-segments.
    *
    * The production-scale insight (shared by HF tokenizers): training
    * never iterates over the CORPUS — only over the word-frequency table,
    * which is vocab-sized (≈10⁵ rows) regardless of corpus size. The
    * corpus contributes exactly one explode+groupBy shuffle up front; the
    * N Lloyd-style rounds then run on the tiny table (here with
    * lineage-truncating checkpoints like the other iterative operators).
    * Interpreted array lambdas are fine at vocab scale — this is the one
    * place the codebase's no-interpreted-HOF hot-path rule does not bind.
    *
    * Segmentation state is the space-delimited symbol string (`" l o w "`)
    * and each merge is one non-overlapping left-to-right
    * `replace(" a b " → " ab ")` — the [[bpeApply]] encoding, whose
    * engine parity the bpe_apply oracle already hash-proves. That makes
    * the N-round argmax recursion itself oracle-able: the DuckDB mirror
    * unrolls the 8 rounds as chained CTEs (count pairs → argmax →
    * replace), exactly like link_rank's unrolled PageRank rounds.
    */
  def bpeMerges(documents: DataFrame, nMerges: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    var vocab = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" ")).as("enc"),
        col("freq"))
      .localCheckpoint(true)
    val merges = Vector.newBuilder[(Long, String, String, Long)]
    for (i <- 1 to nMerges) {
      val s = split(trim(col("enc")), " ")
      val top = vocab
        .select(col("freq"),
          explode(transform(slice(s, lit(1), size(s) - 1),
            (x, j) => struct(x.as("a"), element_at(s, j + lit(2)).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val a = top.head.getString(0)
        val b = top.head.getString(1)
        val pf = top.head.getLong(2)
        merges += ((i.toLong, a, b, pf))
        // Column-API literal replace — symbol text never enters a SQL
        // string literal, so quoting/escaping is a non-issue for any
        // corpus charset.
        vocab = vocab.withColumn("enc",
            replace(col("enc"), lit(s" $a $b "), lit(s" $a$b ")))
          .localCheckpoint(true)
      }
    }
    spark.createDataFrame(merges.result())
      .toDF("merge_n", "left", "right", "pair_freq")
  }

  /** Rolling polynomial hash fingerprint over the token stream
    * (order-sensitive, unlike the dedup sketches): fold
    * acc ← (acc·31 + h(token)) mod p with h = 60-bit md5 prefix mod p.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        expr("""aggregate(
          transform(split(text, ' '),
            t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) % 999999937),
          cast(0 as bigint),
          (acc, x) -> (acc * 31 + x) % 999999937)""").as("fingerprint"))
      .orderBy(col("doc_id"))

  /** Text cleaning/normalization ahead of tokenization: case-fold, strip
    * non-alphanumerics to spaces, collapse runs, trim — each step a codegen
    * regexp over a narrow projection (zero shuffle; at 100 TB this is pure
    * map-side throughput, bounded by scan speed).
    */
  def textClean(documents: DataFrame): DataFrame =
    documents
      .withColumn("clean_text",
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")))
      .select(col("doc_id"), col("clean_text"),
        size(split(col("clean_text"), " ")).cast("long").as("n_clean_tokens"))
      .orderBy(col("doc_id"))

  /** Corpus-frequency document score: the mean corpus frequency of a doc's
    * tokens — a cheap unigram-LM proxy separating common-word prose from
    * rare-token noise. Two passes: (1) the vocabulary table (token →
    * corpus count; explode + map-side partial agg), (2) score per doc via a
    * broadcast join against it. All arithmetic stays in exact BIGINTs until
    * one final division, so the oracle matches bit-for-bit (no transcendental
    * functions whose low bits differ across engines).
    *
    * At 100 TB the vocab table is Zipf-distributed: broadcast the top-V
    * head and fall back to a default count for the tail rather than
    * shuffling the full vocabulary.
    */
  def docFreqScore(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    toks.join(broadcast(vocab), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("tf")).as("sum_tf"))
      .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
        round(col("sum_tf") / col("n_tokens").cast("double"), 4).as("avg_tok_freq"))
      .orderBy(col("doc_id"))
  }

  /** Verdict offsets for [[unigramSurprisal]], in milli-bits relative to
    * the corpus mean: +0.05 bits/token flags gibberish, −0.02 boilerplate. */
  val SurprisalHighOffset = 50L
  val SurprisalLowOffset = 20L

  /** LM-perplexity-style quality scoring WITHOUT a language model — the
    * CCNet-family filter shape (score each document by how surprising its
    * tokens are; unusually-high = gibberish/noise, unusually-low =
    * boilerplate) built from the corpus's own unigram statistics, with
    * the log kept EXACT: a token's surprisal is floor(log2(N / tf)),
    * computed as `length(bin(N div tf)) - 1` — pure integer arithmetic,
    * no transcendental whose low bits differ across engines, so the
    * oracle hash-matches bit-for-bit (DuckDB mirrors it with
    * `printf('%b', …)`). A doc's score is its mean token surprisal in
    * exact milli-bits; verdicts hang off the CORPUS mean (a broadcast
    * 1-row aggregate), so the thresholds are scale-free — no fixture
    * tuning survives into the semantics.
    *
    * Scale shape: the vocab is a map-side-combinable groupBy; the
    * token→tf join is AQE's choice (broadcast for a Zipf head at fixture
    * scale, shuffle at 100 TB where the full vocab outgrows broadcast —
    * the production variant broadcasts the top-V head and defaults the
    * tail, same trick as [[docFreqScore]]'s note); the per-doc rollup is
    * one map-side-combined shuffle.
    */
  def unigramSurprisal(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val n = toks.agg(count(lit(1)).as("n_corpus"))
    val scored = toks.join(vocab, "tok")
      .crossJoin(broadcast(n))
      .withColumn("bits", length(bin(expr("n_corpus div tf"))) - 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("bits")).cast("long").as("sum_bits"))
      .withColumn("bits_permille", expr("(1000 * sum_bits) div n_toks"))
      // feeds both the corpus mean and the output — one tokenize+join pass
      .persist()
    val mean = scored.agg(
      expr("(1000 * sum(sum_bits)) div sum(n_toks)").as("mean_pm"))
    scored.crossJoin(broadcast(mean))
      .withColumn("verdict",
        when(col("bits_permille") > col("mean_pm") + SurprisalHighOffset, "gibberish")
          .when(col("bits_permille") < col("mean_pm") - SurprisalLowOffset, "boilerplate")
          .otherwise(lit("ok")))
      .select(col("doc_id"), col("n_toks"), col("sum_bits"),
        col("bits_permille"), col("verdict"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer-vocabulary size for the OOV screen. */
  val OovVocabSize = 30

  /** Vocabulary-coverage QA (OOV rate): the pre-training check that a
    * tokenizer's vocabulary actually covers the corpus it will train on —
    * a domain whose tokens fall outside the vocab head explodes into
    * byte-fallback sequences and inflates effective sequence length. The
    * vocab here is the corpus's own top-[[OovVocabSize]] tokens by
    * frequency (deterministic tie-break), standing in for the tokenizer's
    * token list; each doc reports its token count, out-of-vocabulary
    * occurrence count, and OOV rate in exact integer permille.
    *
    * Scale shape: the vocab is O(vocab) rows — broadcast; the per-doc
    * rollup is the only shuffle, map-side combined. A LEFT join marks
    * membership (an inner join would silently drop OOV occurrences — the
    * quantity being measured).
    */
  def oovRate(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok").asc)
      .limit(OovVocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("(1000 * n_oov) div n_tokens").as("oov_permille"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF top term per document — log-free: scoring by tf/df ranks
    * identically to tf·log(N/df) for fixed tf ordering purposes here and,
    * unlike the log form, stays in exact integer arithmetic until one final
    * division, so the DuckDB oracle matches bit-for-bit (ln() low bits
    * differ across engines). Two aggregates (per-doc tf, corpus df) joined
    * on token, then one `row_number` per doc_id — a high-cardinality
    * partition key, so no window funnel. At scale the df (vocabulary) side
    * is Zipf-headed: broadcast the head, default the tail.
    */
  def docTopTerm(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "tok").distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok")
      .withColumn("score", round(col("tf") / col("df").cast("double"), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("tok").asc)))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("tok").as("top_term"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"))
  }

  /** [[docTopTerm]] re-planned on the custom top-k-per-group physical
    * operator ([[graft.plans.TopK]]) instead of the `row_number` window:
    * same rows (same oracle), but the per-doc winner comes from k=1
    * bounded heaps — partial before the doc_id exchange, no sort — where
    * the window form sorts every (doc, token) group. High-cardinality
    * grouping is exactly where the heap operator's map-side reduction
    * pays: the exchange carries one row per (partition, doc). */
  def docTopTermTopK(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "tok").distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "tok")
      .withColumn("score", round(col("tf") / col("df").cast("double"), 6))
    graft.plans.TopK.topKPerGroup(scored, Seq("doc_id"),
        Seq("score" -> false, "tok" -> true), 1)
      .select(col("doc_id"), col("tok").as("top_term"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"))
  }

  /** A bigram is "common" when the whole corpus contains it at least this
    * many times; everything below is the model's long tail. */
  val CommonBigramMin = 3L

  /** Docs whose rare-bigram share exceeds this (ppm) get flagged. */
  val NoveltyFlagPpm = 500000L

  /** Corpus-model novelty score — the integer-exact skeleton of an n-gram
    * LM perplexity filter (CCNet-style: score each doc against a model of
    * the corpus; outliers on either end are gibberish or boilerplate).
    * A true log-prob sum is transcendental and diverges across engines at
    * ulp level, so the registered form scores the exact rational quantity
    * the filter actually thresholds on: the fraction (ppm) of a doc's
    * bigrams that fall in the corpus model's long tail (count <
    * [[CommonBigramMin]]).
    *
    * Scale shape — the interesting part: scoring joins every doc bigram
    * against the corpus model, but the model's HEAD (bigrams with count ≥
    * min) is tiny relative to its tail (Zipf), so the engine broadcasts
    * the head and counts tail hits as non-matches — the corpus-side
    * stream is never shuffled for the probe. The same head-not-tail
    * broadcast trick drives [[Curation]]'s line dedup; at 100 TB the head
    * stays broadcastable long after the full model stops fitting anywhere.
    * The two corpus passes (model build, scoring) share one bigram
    * explode shape, map-side partial-aggregated.
    */
  def rareBigramScore(documents: DataFrame): DataFrame = {
    def bigrams = documents
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(expr("""transform(sequence(1, size(tk) - 1),
          i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))""")).as("bg"))
    val perDoc = bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
    val commonHead = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= CommonBigramMin)
      .select(col("bg"), lit(1L).as("is_common"))
    perDoc
      .join(broadcast(commonHead), Seq("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_bigrams"),
        sum(when(col("is_common") === 1L, col("c")).otherwise(0L)).cast("long")
          .as("common_n"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("n_bigrams") - col("common_n")).as("rare_n"))
      .withColumn("novelty_ppm", expr("(1000000 * rare_n) div n_bigrams"))
      .withColumn("flagged", col("novelty_ppm") > NoveltyFlagPpm)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- registry

  // -------------------------------------------------------- inverted index

  /** Posting-list cap for [[invertedIndex]]. */
  private val PostingCap = 10

  /** Inverted index build: token -> document frequency + the first
    * [[PostingCap]] doc_ids (ascending) as a bounded posting sample — the
    * retrieval-side complement of the TF-IDF scoring ops, and the shape a
    * sparse BM25 index job produces before sharding.
    *
    * Scale: one explode + one shuffle on the token (high-cardinality key);
    * the posting collect is bounded IN AGG STATE, not just in output — a
    * per-token `row_number()` (partitioned window on the same exchange)
    * guards the collect with `CASE WHEN rn <= PostingCap`, so a stopword
    * token appearing in every document holds at most [[PostingCap]]
    * doc_ids in its buffer while `count(*)` still reports the true df.
    * A production index would shard full postings by (token, doc_block)
    * instead of sampling, same plan shape one explode deeper. Postings
    * travel as a joined string so the oracle compare stays cell-scalar.
    */
  def invertedIndex(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), " "))).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("rn", expr("row_number() over (partition by token order by doc_id)"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", sort_array(collect_list(
          expr(s"CASE WHEN rn <= $PostingCap THEN doc_id END"))))
          .as("postings"))
      .orderBy(col("token"))

  // ------------------------------------------------------------- BPE apply

  /** Fixed public merge table for [[bpeApply]] — rank-ordered pair merges
    * (a production run feeds [[bpeMerges]]' learned table in literally;
    * a fixed list keeps the application oracle-checkable). */
  private val BpeMergeTable: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"))

  /** Single-pass pair-merge chain over a space-separated symbol string —
    * each merge is one non-overlapping left-to-right `replace`, identical
    * byte-for-byte on both engines. */
  private def bpeChain(sym: String): String =
    BpeMergeTable.foldLeft(sym) { case (acc, (a, b)) =>
      s"replace($acc, ' $a $b ', ' $a$b ')"
    }

  /** Tokenizer application: segment every word by the rank-ordered merge
    * table (chars -> subwords) and report per-document word/subword counts
    * plus an md5 of the full subword stream — the "tokens under the learned
    * vocab" accounting every packing/budget stage downstream consumes.
    *
    * Merges apply as single passes in rank order (batch form of BPE's
    * leftmost-greedy loop; both engines scan-after-match identically, so
    * the oracle equality is exact). Pure map-side higher-order expressions
    * — no explode, no shuffle: at 100 TB this is scan-throughput work, and
    * the per-word chain cost is merge-table-length bounded.
    */
  def bpeApply(documents: DataFrame): DataFrame = {
    val chain = bpeChain("concat(' ', array_join(split(w, ''), ' '), ' ')")
    // fan + persist-before-sort: the merge chain is the heaviest map pass
    // in the suite (profiled: 11.4 s on ONE scan task at sf0.1, run a
    // second time by the final sort's range sampling). Fanning spreads the
    // chain over the cores; the persist makes the sampling read a
    // materialized 4-column result instead of re-running the chain.
    Par.fan(documents)
      .withColumn("words", expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .select(col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        expr(s"aggregate(words, 0L, (acc, w) -> acc + size(split(trim($chain), ' ')))")
          .as("n_subwords"),
        md5(expr(s"array_join(transform(words, w -> trim($chain)), ' | ')"))
          .as("stream_md5"))
      .persist()
      .orderBy(col("doc_id"))
  }

  // ----------------------------------------------------------- BM25 top-k

  /** BM25 constants scaled to integers: k1 = 1.2 -> 120, b = 0.75 -> 75/100,
    * idf surrogate scale 1e6. Query = the corpus's top-3 df terms
    * (deterministic, fixture-independent). */
  private val Bm25TopDocs = 20

  /** BM25-lite ranked retrieval over the corpus: take the three highest-df
    * tokens as the standing query, score every matching document with the
    * BM25 tf/length saturation, return the top-20. The scoring formula is
    * algebraically rearranged into ONE integer division per (doc, term) —
    * `idf * tf * (k1+1) / (tf + k1*(1-b+b*dl/avgdl))` becomes a single
    * cross-multiplied BIGINT ratio — so both engines agree exactly (the
    * idf is the linear surrogate `(N-df)*1e6 div N`: log-free on purpose,
    * libm log differs across engines in the last ulp).
    *
    * Scale shape: tf/df/dl are one exploded groupBy each (high-cardinality
    * keys); the query-term table is 3 rows broadcast; corpus-level scalars
    * (N, avgdl) ride a broadcast 1-row agg. The final top-20 plans through
    * the bounded TopK path, so only k rows per partition cross the last
    * exchange.
    */
  def bm25TopK(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // integer div, NOT `/`: Spark long / long is DOUBLE division, and
    // truncating the double can disagree with exact floor division when
    // the quotient rounds up across an integer boundary
    val scalars = dl.agg(count(lit(1)).as("n_docs"),
      expr("(sum(dl) * 100) div count(1)").as("avgdl100"))
    val qterms = df
      .withColumn("qrnk", row_number().over(
        Window.orderBy(col("df").desc, col("token").asc)))
      .filter(col("qrnk") <= 3)
      .drop("qrnk")
    tf.join(broadcast(qterms), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"),
        // one integer division per term: idf*tf*(k1+1) cross-multiplied by
        // avgdl100 so the length norm never nests a second division
        expr("""((((1000000 * (n_docs - df)) div n_docs) * tf * 220 * avgdl100) div
          (tf * 100 * avgdl100 + 120 * (25 * avgdl100 + 75 * dl * 100)))""")
          .cast("long").as("contrib"))
      .groupBy(col("doc_id")).agg(sum(col("contrib")).as("score"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rnk") <= Bm25TopDocs)
      .select(col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("rnk"))
  }

  // --------------------------------------------------------- collocations

  private val TopCollocations = 30
  /** Minimum pair count — PMI's classic low-frequency pathology (hapax
    * pairs score highest) is gated before ranking, not after. */
  private val MinPairCount = 5

  /** Collocation mining: the corpus's top word pairs by pointwise mutual
    * information, the vocabulary-induction signal BPE's count-based merges
    * don't see (PMI finds "new york"-style units even when each word is
    * common). Scored as the exact integer surrogate
    * `c(ab)·N·1e6 div (c(a)·c(b))` — monotone in PMI for fixed N, so the
    * ranking equals the log form's without ever calling libm. Headroom:
    * c2·N·1e6 needs c2·N < 9.2e12; at trillion-token corpora drop the 1e6
    * scale or go DECIMAL(38) — noted, not needed at fixture scale.
    *
    * Scale shape: unigram and bigram counts are one exploded groupBy each
    * on token keys (high-cardinality); the pair table joins the (much
    * smaller) vocab table twice on token; N rides a broadcast 1-row agg;
    * the final top-30 rank-filter plans through the bounded TopK operator.
    */
  def collocations(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = documents.select(split(lower(col("text")), " ").as("w"))
    // Vocab feeds three arms (both pair-side joins and N): persist the
    // vocab-sized table, not the corpus.
    val uni = words.select(explode(col("w")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
      .persist()
    val big = words
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] as a, w[i + 1] as b))")).as("p"))
      .select(col("p.a"), col("p.b"))
      .filter(length(col("a")) > 0 && length(col("b")) > 0)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= MinPairCount)
    val total = uni.agg(sum(col("c1")).as("n_tokens"))
    big
      .join(uni.select(col("tok").as("a"), col("c1").as("ca")), "a")
      .join(uni.select(col("tok").as("b"), col("c1").as("cb")), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("c2"),
        expr("(c2 * n_tokens * 1000000) div (ca * cb)").as("pmi_scaled"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("pmi_scaled").desc, col("a").asc, col("b").asc)).cast("long"))
      .filter(col("rnk") <= TopCollocations)
      .orderBy(col("rnk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_top_term" -> ((s, d) => docTopTerm(Tables.documents(s, d))),
    "doc_top_term_topk" -> ((s, d) => docTopTermTopK(Tables.documents(s, d))),
    "text_stats" -> ((s, d) => textStats(Tables.documents(s, d))),
    "lang_id" -> ((s, d) => langId(Tables.documents(s, d))),
    "token_counts" -> ((s, d) => tokenCounts(Tables.documents(s, d))),
    "doc_fingerprint" -> ((s, d) => fingerprints(Tables.documents(s, d))),
    "text_clean" -> ((s, d) => textClean(Tables.documents(s, d))),
    "doc_freq_score" -> ((s, d) => docFreqScore(Tables.documents(s, d))),
    "unigram_surprisal" -> ((s, d) => unigramSurprisal(Tables.documents(s, d))),
    "bpe_merges" -> ((s, d) => bpeMerges(Tables.documents(s, d))),
    "rare_bigram_score" -> ((s, d) => rareBigramScore(Tables.documents(s, d))),
    "inverted_index" -> ((s, d) => invertedIndex(Tables.documents(s, d))),
    "bpe_apply" -> ((s, d) => bpeApply(Tables.documents(s, d))),
    "bm25_topk" -> ((s, d) => bm25TopK(Tables.documents(s, d))),
    "collocations" -> ((s, d) => collocations(Tables.documents(s, d))),
    "oov_rate" -> ((s, d) => oovRate(Tables.documents(s, d))),
  )

  /** Unrolled-CTE mirror of [[bpeMerges]]: one (count-pairs → argmax →
    * replace) CTE triple per merge round, chained — the link_rank unrolled
    * PageRank technique applied to BPE. Round state is the same
    * space-delimited symbol string the Spark side folds over, so each
    * round's `replace` is bit-identical.
    */
  private def bpeMergesOracle(n: Int): String = {
    val rounds = (1 to n).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (
         |  SELECT string_split(pr, chr(31))[1] AS a,
         |    string_split(pr, chr(31))[2] AS b, sum(freq)::BIGINT AS pf
         |  FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(s) - 1),
         |      i -> s[i] || chr(31) || s[i + 1])) AS pr, freq
         |    FROM (SELECT string_split(trim(enc), ' ') AS s, freq FROM $prev)
         |    WHERE len(s) >= 2)
         |  GROUP BY a, b
         |), m$r AS (
         |  SELECT $r::BIGINT AS merge_n, a, b, pf
         |  FROM p$r ORDER BY pf DESC, a, b LIMIT 1
         |), v$r AS (
         |  SELECT replace(enc, ' ' || m.a || ' ' || m.b || ' ',
         |    ' ' || m.a || m.b || ' ') AS enc, freq
         |  FROM $prev, m$r m
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH v0 AS (
       |  SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS enc,
       |    freq
       |  FROM (
       |    SELECT w, count(*)::BIGINT AS freq
       |    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |    WHERE len(w) > 0 GROUP BY w)
       |),
       |$rounds
       |SELECT merge_n, a AS "left", b AS "right", pf AS pair_freq
       |FROM (${(1 to n).map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")})
       |ORDER BY merge_n""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    // The heap-operator re-plan returns identical rows — shared oracle.
    baseOracleSql +
      ("doc_top_term_topk" -> baseOracleSql("doc_top_term")) +
      ("bpe_merges" -> bpeMergesOracle(8)) +
      ("inverted_index" ->
        s"""SELECT token, count(*)::BIGINT AS df,
           |  array_to_string(list_sort(list(doc_id))[1:$PostingCap], ',') AS postings
           |FROM (
           |  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
           |  FROM documents)
           |WHERE len(token) > 0
           |GROUP BY token ORDER BY token""".stripMargin) +
      ("bpe_apply" ->
        s"""WITH d AS (
           |  SELECT doc_id,
           |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS words
           |  FROM documents)
           |SELECT doc_id, len(words)::BIGINT AS n_words,
           |  list_sum(list_transform(words,
           |    w -> len(string_split(trim(replace(replace(replace(replace(replace(replace(replace(replace((' ' || array_to_string(string_split(w, ''), ' ') || ' '), ' t h ', ' th '), ' th e ', ' the '), ' i n ', ' in '), ' a n ', ' an '), ' an d ', ' and '), ' e r ', ' er '), ' o n ', ' on '), ' r e ', ' re ')), ' '))))::BIGINT AS n_subwords,
           |  md5(array_to_string(list_transform(words, w -> trim(replace(replace(replace(replace(replace(replace(replace(replace((' ' || array_to_string(string_split(w, ''), ' ') || ' '), ' t h ', ' th '), ' th e ', ' the '), ' i n ', ' in '), ' a n ', ' an '), ' an d ', ' and '), ' e r ', ' er '), ' o n ', ' on '), ' r e ', ' re '))), ' | '))
           |    AS stream_md5
           |FROM d ORDER BY doc_id""".stripMargin) +
      ("bm25_topk" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
           |  FROM documents
           |), toks2 AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
           |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
           |df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
           |scalars AS (
           |  SELECT count(*)::BIGINT AS n_docs,
           |    (sum(dl) * 100 // count(*))::BIGINT AS avgdl100 FROM dl
           |),
           |qterms AS (
           |  SELECT token, df FROM (
           |    SELECT token, df, row_number() OVER (ORDER BY df DESC, token ASC) AS qrnk
           |    FROM df) WHERE qrnk <= 3
           |),
           |scored AS (
           |  SELECT tf.doc_id,
           |    sum(((1000000 * (s.n_docs - q.df) // s.n_docs) *
           |      tf.tf * 220 * s.avgdl100) //
           |      (tf.tf * 100 * s.avgdl100 +
           |        120 * (25 * s.avgdl100 + 75 * dl.dl * 100)))::BIGINT AS score
           |  FROM tf JOIN qterms q ON tf.token = q.token
           |  JOIN dl ON dl.doc_id = tf.doc_id, scalars s
           |  GROUP BY tf.doc_id
           |)
           |SELECT rnk, doc_id, score FROM (
           |  SELECT doc_id, score,
           |    (row_number() OVER (ORDER BY score DESC, doc_id ASC))::BIGINT AS rnk
           |  FROM scored)
           |WHERE rnk <= $Bm25TopDocs ORDER BY rnk""".stripMargin) +
      ("collocations" ->
        s"""WITH w AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
           |uni AS (
           |  SELECT tok, count(*)::BIGINT AS c1 FROM (
           |    SELECT unnest(w) AS tok FROM w) WHERE len(tok) > 0 GROUP BY tok),
           |big AS (
           |  SELECT a, b, count(*)::BIGINT AS c2 FROM (
           |    SELECT string_split(pr, chr(31))[1] AS a,
           |      string_split(pr, chr(31))[2] AS b
           |    FROM (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
           |      i -> w[i] || chr(31) || w[i + 1])) AS pr
           |      FROM w WHERE len(w) >= 2))
           |  WHERE len(a) > 0 AND len(b) > 0
           |  GROUP BY a, b HAVING count(*) >= $MinPairCount),
           |tot AS (SELECT sum(c1)::BIGINT AS n_tokens FROM uni),
           |scored AS (
           |  SELECT big.a, big.b, big.c2,
           |    (big.c2 * t.n_tokens * 1000000 // (ua.c1 * ub.c1))::BIGINT AS pmi_scaled
           |  FROM big JOIN uni ua ON big.a = ua.tok
           |  JOIN uni ub ON big.b = ub.tok, tot t)
           |SELECT rnk, a, b, c2, pmi_scaled FROM (
           |  SELECT a, b, c2, pmi_scaled,
           |    (row_number() OVER (ORDER BY pmi_scaled DESC, a ASC, b ASC))::BIGINT AS rnk
           |  FROM scored)
           |WHERE rnk <= $TopCollocations ORDER BY rnk""".stripMargin)
  }

  private def baseOracleSql: Map[String, String] = {
    val toks = "string_split(text, ' ')"
    Map(
      "oov_rate" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           |  FROM documents
           |), vocab AS (
           |  SELECT tok, 1 AS in_vocab FROM (
           |    SELECT tok, count(*) AS tf FROM toks GROUP BY tok
           |    ORDER BY tf DESC, tok ASC LIMIT $OovVocabSize)
           |)
           |SELECT doc_id, n_tokens, n_oov, (1000 * n_oov) // n_tokens AS oov_permille
           |FROM (
           |  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
           |    sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
           |  FROM toks t LEFT JOIN vocab v USING (tok)
           |  GROUP BY t.doc_id)
           |ORDER BY doc_id""".stripMargin,
      "rare_bigram_score" ->
        s"""WITH bg AS (
           |  SELECT doc_id, unnest(list_transform(
           |    generate_series(1, len(string_split(text, ' ')) - 1),
           |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bg
           |  FROM documents WHERE len(string_split(text, ' ')) >= 2
           |), cnt AS (
           |  SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
           |), head AS (
           |  SELECT bg FROM bg GROUP BY bg HAVING count(*) >= $CommonBigramMin
           |), scored AS (
           |  SELECT doc_id,
           |    sum(c)::BIGINT AS n_bigrams,
           |    sum(CASE WHEN head.bg IS NOT NULL THEN c ELSE 0 END)::BIGINT AS common_n
           |  FROM cnt LEFT JOIN head ON cnt.bg = head.bg
           |  GROUP BY doc_id
           |)
           |SELECT doc_id, n_bigrams,
           |  n_bigrams - common_n AS rare_n,
           |  (1000000 * (n_bigrams - common_n)) // n_bigrams AS novelty_ppm,
           |  ((1000000 * (n_bigrams - common_n)) // n_bigrams) > $NoveltyFlagPpm AS flagged
           |FROM scored ORDER BY doc_id""".stripMargin,
      "text_stats" ->
        s"""SELECT doc_id,
           |  length(text)::BIGINT AS n_chars,
           |  len($toks)::BIGINT AS n_tokens,
           |  len(list_distinct($toks))::BIGINT AS n_distinct,
           |  round((length(text) - len($toks) + 1) / len($toks)::DOUBLE, 4) AS avg_token_len,
           |  round(len(list_distinct($toks)) / len($toks)::DOUBLE, 4) AS ttr,
           |  round(${stopHitsSql(toks, enStop)} / len($toks)::DOUBLE, 4) AS stopword_ratio,
           |  round(least(len($toks) / 100.0, 1.0) *
           |    (len(list_distinct($toks)) / len($toks)::DOUBLE), 4) AS quality_score
           |FROM documents ORDER BY doc_id""".stripMargin,
      "lang_id" ->
        s"""WITH scored AS (
           |  SELECT doc_id, lang,
           |    ${stopHitsSql(toks, enStop)} AS en_score,
           |    ${stopHitsSql(toks, deStop)} AS de_score,
           |    ${stopHitsSql(toks, esStop)} AS es_score,
           |    ${stopHitsSql(toks, frStop)} AS fr_score,
           |    ${stopHitsSql(toks, zhStop)} AS zh_score
           |  FROM documents
           |), best AS (
           |  SELECT *, greatest(en_score, de_score, es_score, fr_score, zh_score) AS b
           |  FROM scored
           |)
           |SELECT doc_id, lang, en_score::BIGINT AS en_score,
           |  CASE WHEN b = 0 THEN 'unknown'
           |    WHEN en_score = b THEN 'en' WHEN de_score = b THEN 'de'
           |    WHEN es_score = b THEN 'es' WHEN fr_score = b THEN 'fr'
           |    ELSE 'zh' END AS predicted_lang,
           |  (CASE WHEN b = 0 THEN 'unknown'
           |    WHEN en_score = b THEN 'en' WHEN de_score = b THEN 'de'
           |    WHEN es_score = b THEN 'es' WHEN fr_score = b THEN 'fr'
           |    ELSE 'zh' END) = lang AS agrees
           |FROM best ORDER BY doc_id""".stripMargin,
      "token_counts" ->
        s"""SELECT source, count(*) AS n_docs,
           |  sum(len($toks))::BIGINT AS total_ws_tokens,
           |  sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))::BIGINT AS total_bpe_tokens
           |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "doc_top_term" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          |  FROM documents
          |), tf AS (
          |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
          |), df AS (
          |  SELECT tok, count(*) AS df
          |  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok
          |), scored AS (
          |  SELECT doc_id, tok, tf.tf, df.df,
          |    round(tf.tf / df.df::DOUBLE, 6) AS score,
          |    row_number() OVER (PARTITION BY doc_id
          |      ORDER BY round(tf.tf / df.df::DOUBLE, 6) DESC, tok ASC) AS rnk
          |  FROM tf JOIN df USING (tok)
          |)
          |SELECT doc_id, tok AS top_term, tf, df, score
          |FROM scored WHERE rnk = 1 ORDER BY doc_id""".stripMargin,
      "text_clean" ->
        """SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
          |    ' +', ' ', 'g')) AS clean_text,
          |  len(string_split(trim(regexp_replace(regexp_replace(lower(text),
          |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))::BIGINT AS n_clean_tokens
          |FROM documents ORDER BY doc_id""".stripMargin,
      "doc_freq_score" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          |  FROM documents
          |), vocab AS (
          |  SELECT tok, count(*) AS tf FROM toks GROUP BY tok
          |)
          |SELECT doc_id, count(*) AS n_tokens, sum(tf)::BIGINT AS sum_tf,
          |  round(sum(tf) / count(*)::DOUBLE, 4) AS avg_tok_freq
          |FROM toks JOIN vocab USING (tok)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "unigram_surprisal" ->
        s"""WITH t AS (
           |  SELECT doc_id, tok FROM (
           |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           |    FROM documents)
           |  WHERE length(tok) > 0
           |), vocab AS (
           |  SELECT tok, count(*) AS tf FROM t GROUP BY tok
           |), n AS (
           |  SELECT count(*) AS n_corpus FROM t
           |), scored AS (
           |  SELECT doc_id, count(*)::BIGINT AS n_toks,
           |    sum(length(printf('%b', n_corpus // tf)) - 1)::BIGINT AS sum_bits
           |  FROM t JOIN vocab USING (tok) CROSS JOIN n
           |  GROUP BY doc_id
           |), m AS (
           |  SELECT (1000 * sum(sum_bits)) // sum(n_toks) AS mean_pm FROM scored
           |)
           |SELECT doc_id, n_toks, sum_bits,
           |  ((1000 * sum_bits) // n_toks)::BIGINT AS bits_permille,
           |  CASE WHEN (1000 * sum_bits) // n_toks > mean_pm + $SurprisalHighOffset
           |         THEN 'gibberish'
           |       WHEN (1000 * sum_bits) // n_toks < mean_pm - $SurprisalLowOffset
           |         THEN 'boilerplate'
           |       ELSE 'ok' END AS verdict
           |FROM scored CROSS JOIN m ORDER BY doc_id""".stripMargin,
      "doc_fingerprint" ->
        s"""SELECT doc_id,
           |  list_reduce(
           |    [0::BIGINT] || list_transform($toks,
           |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 999999937),
           |    (acc, x) -> (acc * 31 + x) % 999999937) AS fingerprint
           |FROM documents ORDER BY doc_id""".stripMargin,
    )
  }
}
