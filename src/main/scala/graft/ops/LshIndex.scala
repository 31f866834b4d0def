package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Gavro, Tables}

/** A MATERIALIZED MinHash-LSH dedup index — sketch once, probe every
  * batch.
  *
  * The in-query near-dup family ([[Dedup.minhashCandidates]],
  * [[Dedup.minhashIncremental]]) recomputes the corpus sketch pipeline
  * (shingle → hash → 12-way MinHash → 6×2 banding) inside every query —
  * right for a self-contained oracle, but at 100 TB the corpus sketch is
  * THE expensive half (O(corpus tokens) of hashing) and a daily ingest
  * must not repeat it. [[Dedup.minhashIncremental]]'s scaladoc already
  * names the production shape: "band rows of the full corpus … READ BACK
  * from the persisted sketch/band table". This object IS that table,
  * persisted with the same machinery as the ANN index ([[IndexHome]]):
  *
  *   - `sigs/`  — the 12-element MinHash signature per document,
  *     scalar-exploded as (doc_id, pos, m) rows (scalars keep the gavro
  *     footer-stats machinery);
  *   - `bands/` — (doc_id, band_idx, band_key) bucket membership, the
  *     probe join's build side, range-partitioned by band_idx with
  *     band_idx in the footer stats.
  *
  * The nightly-batch probe then costs O(Δdocs): sketch ONLY the arriving
  * batch, union its band rows with the PERSISTED corpus bands, apply the
  * same mega-bucket cap, and join within buckets restricted to pairs
  * that touch the new batch — new×old and new×new, never old×old. At
  * cluster scale the persisted bands table is bucketed by band_key so
  * the probe join co-locates; the sandbox expresses the same plan as a
  * shuffle join on (band_idx, band_key).
  *
  * Everything is deterministic (md5-derived hash family, exact integer
  * arithmetic), so the probe result is hash-equal to the in-query
  * incremental rebuild — the oracle proves the persisted artifact
  * answers exactly what a from-scratch run would.
  */
object LshIndex {

  /** Bump when the sketch pipeline or layout changes — keys the cache. */
  val Version = 1

  /** First doc_id of "tonight's batch" — the fixture's planted near-dup
    * ids, matching [[Dedup.minhashIncremental]]'s default. */
  val NewFrom = 10000L

  /** `scope` separates the canonical probe instance ("") from the
    * append-maintained one ("a") — one key format, two namespaces. */
  private def sfPrefix(sfDir: String, scope: String = ""): String =
    s"graft_lsh_v${Version}${scope}_" + IndexHome.sha256Hex(sfDir, 6) + "_"

  private def srcFile(sfDir: String) =
    new java.io.File(sfDir, "documents.parquet")

  /** Sketch `corpus` = (doc_id, text) and persist sigs/ + bands/ under
    * `dir`. Pure function of the input (md5-derived hash family). */
  def buildAndWrite(corpus: DataFrame, dir: String): Unit = {
    val sigs = Dedup.minhashSignatures(corpus)
      .select(col("doc_id"), col("sig")).persist()
    val sigRows = sigs
      .select(col("doc_id"), posexplode(col("sig"))).toDF("doc_id", "pos", "m")
      .select(expr("to_avro_graft(struct(doc_id, pos, m), 'lsh_sigs')")
        .as("bin"))
    Gavro.write(sigRows.coalesce(1), s"$dir/sigs")
    // Uncapped: the index stores EVERY band row; the mega-bucket skew cap
    // is probe-time policy (it must see probe-side rows to count buckets
    // the way the oracle does).
    val bandRows = Dedup.bands(sigs)
      .select(expr(
        "to_avro_graft(struct(doc_id, band_idx, band_key), 'lsh_bands')")
        .as("bin"), col("band_idx"))
      .repartitionByRange(6, col("band_idx"))
    Gavro.write(bandRows, s"$dir/bands", statCols = Seq("band_idx"))
    sigs.unpersist()
    ()
  }

  /** The canonical per-sf-dir index over the PLAIN documents table (the
    * standing corpus a nightly batch probes against). */
  def ensure(spark: SparkSession, sfDir: String): String =
    IndexHome.ensureBuilt(spark, srcFile(sfDir), sfPrefix(sfDir)) { dir =>
      buildAndWrite(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), dir)
    }

  /** Signatures reassembled from the sigs table: (doc_id, sig). */
  def loadSigs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("gavro").option("schema", "lsh_sigs").load(s"$dir/sigs")
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("sig"))

  /** Band bucket membership read back: (doc_id, band_idx, band_key). */
  def loadBands(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("gavro").option("schema", "lsh_bands").load(s"$dir/bands")
      .select(col("doc_id"), col("band_idx"), col("band_key"))

  /** REBUILD the index and fingerprint the bands table READ BACK from
    * the written gavro files (per band: row count, distinct buckets, a
    * bucket-key checksum) — the oracle hash verifies the persisted
    * artifact itself, the same contract as `ann_ivfpq_build_index`. */
  def buildIndexSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val live = IndexHome.rebuildAndPublish(spark, srcFile(sfDir),
        sfPrefix(sfDir)) { dir =>
      buildAndWrite(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), dir)
    }
    loadBands(spark, live.getAbsolutePath)
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("band_key")).as("n_buckets"),
        sum(expr(s"${Dedup.md5i.format("band_key")} % 999999937"))
          .as("sum_key"))
      .orderBy(col("band_idx"))
  }

  /** Probe "tonight's batch" against the PERSISTED index: sketch ONLY
    * the delta (the planted near-dups, ids ≥ [[NewFrom]]), union its
    * band rows with the corpus bands read back from disk, apply the
    * probe-time mega-bucket cap over the combined view (exactly
    * [[Dedup.minhashIncremental]]'s semantics), and emit candidate pairs
    * touching the new batch with their estimated Jaccard. Hash-equal to
    * the in-query incremental rebuild — persisted-sketch probe ≡
    * recompute-everything, at O(Δdocs) sketch cost. */
  def probeNewBatch(spark: SparkSession, sfDir: String): DataFrame =
    probeBatch(spark, ensure(spark, sfDir),
      Dedup.nearCorpus(Tables.documents(spark, sfDir))
        .filter(col("doc_id") >= NewFrom),
      NewFrom)

  /** The serving form: probe an EXPLICIT arriving batch (doc_id, text)
    * against an index at `dir`. `newFrom` is the id floor of the batch —
    * pairs are restricted to those touching it. Sketch cost O(|delta|);
    * the corpus sketch is never recomputed. */
  def probeBatch(spark: SparkSession, dir: String, delta: DataFrame,
      newFrom: Long): DataFrame = {
    // NOT persisted: this path runs once per streaming micro-batch and
    // the returned lazy frame escapes, so a persist here would leak one
    // cached delta sketch per trigger. The sketch appears twice in the
    // plan (sigs ∪, bands ∪) — recomputing O(|delta|) hashing is the
    // price of a leak-free serve path.
    val deltaSigs = Dedup.minhashSignatures(delta)
      .select(col("doc_id"), col("sig"))
    Dedup.bandProbe(
      loadSigs(spark, dir).unionByName(deltaSigs),
      loadBands(spark, dir).unionByName(Dedup.bands(deltaSigs)),
      newFrom)
  }

  // ------------------------------------------------------- incremental append

  /** Fold an accepted batch (doc_id, text) into an EXISTING index at
    * `dir`: sketch the batch (O(|delta|)) and gavro-APPEND its sig and
    * band rows to the persisted tables — one new commit per table, so
    * the next batch's probe sees tonight's documents as standing corpus.
    * This is the dedup-on-ingest loop's write half: probe, filter,
    * append the survivors. */
  def appendBatch(spark: SparkSession, dir: String,
      delta: DataFrame): Unit = {
    val deltaSigs = Dedup.minhashSignatures(delta)
      .select(col("doc_id"), col("sig")).persist()
    deltaSigs
      .select(col("doc_id"), posexplode(col("sig"))).toDF("doc_id", "pos", "m")
      .coalesce(1)
      .write.format("gavro").option("schema", "lsh_sigs")
      .mode("append").save(s"$dir/sigs")
    Dedup.bands(deltaSigs)
      .repartitionByRange(2, col("band_idx")) // delta ≪ base
      .select(col("doc_id"), col("band_idx"), col("band_key"))
      .write.format("gavro").option("schema", "lsh_bands")
      .mode("append").save(s"$dir/bands")
    deltaSigs.unpersist()
    ()
  }

  /** The append-maintained instance: base corpus as commit 1 of each
    * table, the planted batch folded in as commit 2 via [[appendBatch]].
    * Separate cache scope so the mutation never touches the probe
    * query's instance. */
  def ensureAppended(spark: SparkSession, sfDir: String): String =
    IndexHome.ensureBuilt(spark, srcFile(sfDir), sfPrefix(sfDir, "a")) { dir =>
      val documents = Tables.documents(spark, sfDir)
      buildAndWrite(documents.select(col("doc_id"), col("text")), dir)
      appendBatch(spark, dir,
        Dedup.nearCorpus(documents).filter(col("doc_id") >= NewFrom))
    }

  /** Probe over the FULLY-materialized index (base + appended batch both
    * read from disk — zero in-query sketching anywhere in the plan): the
    * same candidate semantics as [[probeNewBatch]], so the result is
    * hash-equal to it AND to the in-query incremental rebuild — three
    * execution paths, one answer, proving the appended artifact encodes
    * the batch exactly as a from-scratch sketch would. */
  def probeAppended(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureAppended(spark, sfDir)
    Dedup.bandProbe(loadSigs(spark, dir), loadBands(spark, dir), NewFrom)
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lsh_index_build" -> ((s, d) => buildIndexSummary(s, d)),
    "lsh_index_probe" -> ((s, d) => probeNewBatch(s, d)),
    "lsh_index_append" -> ((s, d) => probeAppended(s, d)),
  )

  /** The build oracle unrolls the sketch over the PLAIN documents table
    * and fingerprints the band rows; the probe oracle is exactly the
    * in-query incremental unroll (planted corpus, same hash family, same
    * bucket cap) — determinism is what makes the persisted artifact
    * reproducible. */
  def oracleSql: Map[String, String] = Map(
    "lsh_index_build" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |${Dedup.sigSql},
         |all_bands AS (
         |  SELECT doc_id, b AS band_idx,
         |    md5(sig[2 * b + 1]::VARCHAR || ',' || sig[2 * b + 2]::VARCHAR) AS band_key
         |  FROM sigs, range(0, 6) r(b)
         |)
         |SELECT band_idx, count(*) AS n,
         |  count(DISTINCT band_key) AS n_buckets,
         |  sum(('0x' || substr(md5(band_key), 1, 15))::BIGINT % 999999937)::BIGINT
         |    AS sum_key
         |FROM all_bands GROUP BY band_idx ORDER BY band_idx""".stripMargin,
    "lsh_index_probe" -> probeOracleSql,
    // The SAME unroll object: the appended artifact must answer exactly
    // what the union probe and the in-query rebuild answer — sharing the
    // literal removes the drift surface between the two entries.
    "lsh_index_append" -> probeOracleSql,
  )

  private lazy val probeOracleSql: String =
    s"""WITH ${Dedup.nearCorpusSql}, ${Dedup.sigSql}, ${Dedup.candSql}
       |SELECT doc_a, doc_b,
       |  round(len(list_filter(range(1, 13), i -> a.sig[i] = b.sig[i])) / 12.0, 4) AS est_jaccard
       |FROM cands
       |JOIN sigs a ON a.doc_id = doc_a
       |JOIN sigs b ON b.doc_id = doc_b
       |WHERE doc_b >= $NewFrom
       |ORDER BY doc_a, doc_b""".stripMargin
}
