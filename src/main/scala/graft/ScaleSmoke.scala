package graft

import org.apache.spark.sql.functions._

/** Scale smoke harness: fabricates a corpus N× the sf0.1 fixture by
  * deterministic replication-with-mutation and runs the heavyweight
  * document operators over it, printing per-operator seconds and output
  * rows. Not part of the driver gates — a manual check that the sketch
  * pipelines, skew caps, and iterative operators keep working well past
  * fixture scale (the failure modes they guard against — mega-buckets,
  * lineage blowup, window funnels — only show up with volume).
  *
  * Usage: sbt "runMain graft.ScaleSmoke [replicas]"   (default 20 → 100k docs)
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(20)
    val spark = Session.local("graft-scale-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    // Replicate with a per-replica token suffix so replicas are near-dups of
    // their original (every suffix shifts the shingle set slightly) and
    // doc_ids stay unique.
    val corpus = base.crossJoin(spark.range(replicas).toDF("rep"))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .localCheckpoint(true)
    val n = corpus.count()
    println(s"corpus: $n docs (${replicas}x sf0.1)")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s ${secs}%8.2f s")
    }

    import graft.ops.{Curation, Dedup, Pipeline, TextStats}
    time("exact_dedup") { Dedup.exactDedup(corpus) }
    time("minhash_candidates") { Dedup.minhashCandidates(corpus) }
    time("simhash_pairs") { Dedup.simhashPairs(corpus) }
    time("dup_clusters") { Dedup.dupClusters(corpus) }
    time("dup_clusters_star") { Dedup.dupClustersStar(corpus) }
    time("token_packing") { Pipeline.tokenPacking(corpus) }
    time("quality_filter") { Pipeline.qualityFilter(corpus) }
    time("doc_top_term") { TextStats.docTopTerm(corpus) }
    time("doc_freq_score") { TextStats.docFreqScore(corpus) }
    time("line_dedup") { Curation.lineDedup(corpus) }
    time("contamination_check") { Curation.contaminationCheck(corpus) }
    time("contamination_bloom") { Curation.contaminationBloom(corpus) }
    time("paragraph_dedup") { Curation.paragraphDedup(corpus) }
    time("fuzzy_title_pairs") { Dedup.fuzzyTitlePairs(corpus) }
    time("curation_funnel") { Curation.curationFunnel(corpus) }
    time("duplicate_spans") { Dedup.duplicateSpans(corpus) }
    time("rare_bigram_score") { TextStats.rareBigramScore(corpus) }
    time("jaccard_prefix_join") { Dedup.jaccardPrefixJoin(corpus) }
    time("media_phash_dedup") { graft.ops.Multimodal.phashPairs(corpus) }
    time("training_order") { Pipeline.trainingOrder(corpus) }
    time("doc_chunks") { Pipeline.docChunks(corpus) }
    // Global top-k via the extended rewrite: the final merge only ever
    // sees ~P×k partial survivors, so this must stay flat as docs grow.
    time("bm25_topk") { TextStats.bm25TopK(corpus) }
    time("secret_scan") { Curation.secretScan(corpus) }
    time("length_bucketing") { Pipeline.lengthBucketing(corpus) }
    time("link_rank") { graft.ops.Graph.linkRank(corpus) }
    // embeddings scale path: replicate the vector fixture the same way
    val embBase = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val embCorpus = embBase.crossJoin(spark.range(replicas).toDF("rep"))
      .select((col("vec_id") * replicas + col("rep")).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + cast(rep as float) / 1000)").as("embedding"),
        col("label"))
      .localCheckpoint(true)
    println(s"embeddings: ${embCorpus.count()} vectors")
    time("semantic_dedup") { graft.ops.Similarity.semanticDedup(embCorpus) }
    time("knn_graph") { graft.ops.Similarity.knnGraph(embCorpus) }
    spark.stop()
  }
}
