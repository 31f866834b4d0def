package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Gavro, Tables}

/** A MATERIALIZED IVF-PQ index — build once, search many.
  *
  * The in-query family (`ann_ivfpq_topk` / `_rerank` / `_incremental`,
  * [[Quantize]]) retrains the coarse centroids and residual codebooks
  * inside every query: correct for a self-contained oracle query, but a
  * production pipeline trains nightly and searches continuously (the
  * reference has no vector index at all — its embedding join in
  * src/streaming/enrichment.py is a straight lookup; this is the
  * capability a training-data pipeline needs on top). Here the trained
  * artifacts persist as three gavro tables and the registered search
  * query touches ONLY them plus the query vectors:
  *
  *   - `cells/`  — coarse centroid components (c_id, pos, x), K·dim rows;
  *   - `books/`  — residual PQ codebook components (sub_idx, c_id, pos, x);
  *   - `codes/`  — one row per (vec_id, sub_idx): the vector's coarse
  *     cell + PQ code — the corpus-scale table, laid out range-partitioned
  *     BY CELL with `cell` in the footer stats, so a probe list pushes an
  *     IN filter into the scan and unprobed cells' files are never opened
  *     (the posting-list read of a production ANN index, expressed as
  *     ordinary DSv2 pushdown).
  *
  * Everything in the index is exact integer arithmetic at [[Quantize]]'s
  * 1e4 scale (components stored as longs), and the build is fully
  * deterministic — so the search-only query hash-matches the same DuckDB
  * CTE unroll that verifies the in-query family, and a lost build race
  * (two processes ensuring concurrently) is benign: both builds are
  * bit-identical in content.
  *
  * Scale shape: the build is the oracle-proven [[Quantize.ivfPqTrainEncode]]
  * (capped-sample training, broadcast codebooks, one encode pass); search
  * reads K·dim + M·K·subdim stat rows plus only the probed cells' code
  * files, scores by broadcast LUT, and re-ranks [[Quantize.RerankCand]]
  * candidates per query against full precision — per-query cost is
  * O(corpus/K · nprobe) ADC rows and O(1) re-rank lookups, independent of
  * how many OTHER queries already amortized the build.
  */
object IvfPqIndex {

  /** Bump when the build pipeline changes — the version keys the cached
    * index directory, so a stale index from older code is never reused. */
  val Version = 1

  /** The search-many query count: 4× the in-query family's 5, the point
    * of a prebuilt index being that more queries cost no more training. */
  val SearchQueries = 20

  /** Cache key = (code version, sf dir, SOURCE-DATA fingerprint): the
    * embeddings parquet's file names, lengths, and mtimes are hashed in
    * so regenerated fixture data under the same path can never silently
    * reuse a stale index across JVM runs — pure filesystem metadata, no
    * Spark job on the warm path. */
  private def cacheDir(sfDir: String): java.io.File = {
    val src = new java.io.File(sfDir, "embeddings.parquet")
    val parts: Seq[java.io.File] =
      if (src.isDirectory)
        Option(src.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      else Seq(src)
    val fingerprint = parts.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
      .mkString("|")
    // collision-proof key: 32-bit hashCode could alias two fingerprints.
    // name = <stable per-sfDir segment> _ <data digest>: the first scopes
    // pruning to THIS source dir (indexes for other sf dirs are live
    // peers, not staleness), the second invalidates on data change
    new java.io.File(System.getProperty("java.io.tmpdir"),
      sfPrefix(sfDir) + sha256Hex(sfDir + "#" + fingerprint, 12))
  }

  private def sha256Hex(s: String, bytes: Int): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(bytes).map(b => f"$b%02x").mkString

  private def sfPrefix(sfDir: String): String =
    s"graft_ivfpq_v${Version}_" + sha256Hex(sfDir, 6) + "_"

  /** Train on `emb` = (vec_id, embedding) and persist the index under
    * `dir` (cells/ books/ codes/). Pure function of the input: the build
    * is [[Quantize.ivfPqTrainEncode]], which is deterministic end to end. */
  def buildAndWrite(emb: DataFrame, dir: String): Unit = {
    val (coarse, books, codes, _) = Quantize.ivfPqTrainEncode(
      emb.select(col("vec_id"), col("embedding").as("v")))
    // Components are integral doubles at QScale — exact as longs.
    val cellRows = coarse
      .select(col("c_id"), posexplode(col("cv"))).toDF("c_id", "pos", "xd")
      .select(expr("to_avro_graft(struct(c_id, pos, cast(xd as long)), 'ivf_cells')")
        .as("bin"))
    Gavro.write(cellRows.coalesce(1), s"$dir/cells")
    val bookRows = books
      .select(col("sub_idx"), col("c_id"), posexplode(col("cv")))
      .toDF("sub_idx", "c_id", "pos", "xd")
      .select(expr(
        "to_avro_graft(struct(sub_idx, c_id, pos, cast(xd as long)), 'ivf_books')")
        .as("bin"))
    Gavro.write(bookRows.coalesce(1), s"$dir/books")
    // The corpus-scale table: clustered by cell so each file covers a
    // disjoint cell range and the footer's min/max make the probe-list IN
    // pushdown skip whole files (at cluster scale: partition by cell).
    val codeRows = codes
      .repartitionByRange(Quantize.CoarseK, col("cell"))
      .select(expr(
        "to_avro_graft(struct(vec_id, cell, sub_idx, code), 'ivf_codes')")
        .as("bin"), col("cell"))
    Gavro.write(codeRows, s"$dir/codes", statCols = Seq("cell"))
  }

  /** The canonical per-sf-dir index, built on first use: build lands in a
    * fresh temp directory and is PUBLISHED by atomic rename, so the
    * canonical path either doesn't exist or is complete — a loser of the
    * publish race discards its (bit-identical) build. Returns the index
    * root. */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val root = cacheDir(sfDir)
    if (!root.exists()) {
      pruneStale(root, sfPrefix(sfDir))
      val tmp = new java.io.File(root.getParentFile,
        root.getName + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      buildAndWrite(Tables.embeddings(spark, sfDir), tmp.getAbsolutePath)
      try java.nio.file.Files.move(tmp.toPath, root.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException if root.exists() =>
        deleteRec(tmp) // lost the race; the published index is equivalent
      }
    }
    root.getAbsolutePath
  }

  /** The fingerprint-keyed cache would otherwise orphan one full index
    * copy per fixture regeneration: before building a fresh index, drop
    * siblings of THE SAME source dir (same `sfPrefix`) with a different
    * data digest — their source data changed, so no correct reader can
    * still want them. Indexes for OTHER sf dirs are live peers and are
    * never touched. */
  private def pruneStale(current: java.io.File, prefix: String): Unit =
    Option(current.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) &&
        f.getName != current.getName &&
        // grace hour for EVERYTHING: never race a live builder's
        // ".build-" temp, and give any process still scanning a
        // just-superseded published index time to finish before its
        // files vanish under it
        System.currentTimeMillis() - f.lastModified() > 60L * 60 * 1000)
      .foreach(deleteRec)

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  /** Coarse centroids reassembled from the cells table: (c_id, cv). */
  def loadCells(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("gavro").option("schema", "ivf_cells").load(s"$dir/cells")
      .groupBy(col("c_id"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, x))), s -> cast(s.x as double))")
        .as("cv"))

  /** Residual PQ codebooks reassembled: (sub_idx, c_id, cv). */
  def loadBooks(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("gavro").option("schema", "ivf_books").load(s"$dir/books")
      .groupBy(col("sub_idx"), col("c_id"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, x))), s -> cast(s.x as double))")
        .as("cv"))

  /** REBUILD the index end to end and return a per-(cell, subspace)
    * fingerprint of the codes table READ BACK from the written gavro
    * files — so the oracle hash verifies the persisted artifact itself
    * (write → file → scan → decode lossless), not just an in-memory
    * intermediate. Publishes the fresh build if no canonical index exists
    * yet, so a later search query starts warm. */
  def buildIndexSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val root = cacheDir(sfDir)
    if (!root.exists()) pruneStale(root, sfPrefix(sfDir))
    val tmp = new java.io.File(root.getParentFile,
      root.getName + ".build-" + java.util.UUID.randomUUID().toString.take(8))
    buildAndWrite(Tables.embeddings(spark, sfDir), tmp.getAbsolutePath)
    try java.nio.file.Files.move(tmp.toPath, root.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException if root.exists() =>
      // Canonical already present: the fresh build's CONTENT is identical
      // (deterministic training; only the file layout can differ), so the
      // layout-independent summary below reads the canonical copy.
      deleteRec(tmp)
    }
    spark.read.format("gavro").option("schema", "ivf_codes")
      .load(s"${root.getAbsolutePath}/codes")
      .groupBy(col("cell"), col("sub_idx"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("code")).as("n_codes"),
        sum(col("code").cast("long")).as("sum_code"))
      .orderBy(col("cell"), col("sub_idx"))
  }

  /** SEARCH-ONLY two-stage retrieval over the prebuilt index: encode the
    * [[SearchQueries]] query vectors, pick probes against the loaded
    * centroids, push the probe list into the codes scan as an IN filter
    * (file-skipped via footer stats), ADC-score, then re-rank the
    * [[Quantize.RerankCand]] shortlist against full precision. No
    * training anywhere in the plan. */
  def searchPrebuilt(spark: SparkSession, sfDir: String): DataFrame =
    searchIndex(spark, ensure(spark, sfDir), Tables.embeddings(spark, sfDir))

  /** The search plan against an explicit index directory and corpus
    * frame — what [[searchPrebuilt]] runs after `ensure`, and what the
    * ScaleSmoke harness times at replica volume (build once with
    * [[buildAndWrite]], then search repeatedly here). */
  def searchIndex(spark: SparkSession, dir: String,
      emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coarse = loadCells(spark, dir)
    val books = loadBooks(spark, dir)
    val qemb = emb.select(col("vec_id"),
      Quantize.quantQv("embedding").as("qv"))
    val queries = qemb.filter(col("vec_id") < SearchQueries)
      .select(col("vec_id").as("q_id"), col("qv"))
    // NOT persisted: the probe frame is queries×CoarseK rows and is used
    // twice (driver collect below + LUT build) — recomputing it is
    // trivial, while a persist here would leak one cached frame per
    // search on the path designed to be called many times.
    val probes = Quantize.ivfPqProbes(queries, coarse)
    // The router step every distributed ANN serve does: the probe list
    // (≤ SearchQueries·NProbe values, bounded by CoarseK distinct) comes
    // to the driver and becomes a pushed IN filter — the codes scan opens
    // only files whose cell range intersects it.
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val codes = spark.read.format("gavro").option("schema", "ivf_codes")
      .load(s"$dir/codes")
      .filter(col("cell").isin(probedCells.map(Int.box): _*))
    val lut = Quantize.ivfPqLut(probes, coarse, books)
    val scored = Quantize.ivfPqAdc(codes, lut)
    val cand = graft.plans.TopK.topKPerGroup(
      scored, Seq("q_id"), Seq("adist" -> true, "vec_id" -> true),
      Quantize.RerankCand)
    val qq = queries.select(col("q_id"), col("qv").as("qq"))
    cand.select(col("q_id"), col("vec_id"))
      .join(qemb, "vec_id") // fetch the shortlist's full-precision vectors
      .join(broadcast(qq), "q_id")
      .select(col("q_id"), col("vec_id"), Quantize.d2("qq", "qv").as("d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("d").asc, col("vec_id").asc)).cast("long"))
      .filter(col("rnk") <= Quantize.TopK)
      .select(col("q_id"), col("rnk"), col("vec_id"))
      .orderBy(col("q_id"), col("rnk"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfpq_build_index" -> ((s, d) => buildIndexSummary(s, d)),
    "ann_ivfpq_search_prebuilt" -> ((s, d) => searchPrebuilt(s, d)),
  )

  /** The build summary unrolls the same CTEs as the in-query family and
    * fingerprints the codes table; the search oracle is the rerank unroll
    * at [[SearchQueries]] queries. Both recompute the index from the raw
    * embeddings — training determinism (oracle-proven since the in-query
    * family landed) is what makes the persisted artifact reproducible. */
  def oracleSql: Map[String, String] = Map(
    "ann_ivfpq_build_index" ->
      s"""${Quantize.ivfPqCoreSql()},
         |summary AS (
         |  SELECT e.cell, k.sub_idx, count(*) AS n,
         |    count(DISTINCT k.code) AS n_codes,
         |    sum(k.code)::BIGINT AS sum_code
         |  FROM codes k JOIN res e USING (vec_id)
         |  GROUP BY e.cell, k.sub_idx
         |)
         |SELECT cell, sub_idx, n, n_codes, sum_code FROM summary
         |ORDER BY cell, sub_idx""".stripMargin,
    "ann_ivfpq_search_prebuilt" -> Quantize.ivfPqRerankSql(SearchQueries),
  )
}
