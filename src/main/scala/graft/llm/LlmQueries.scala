package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
import graft.similarity.{Ann, Cluster}
import graft.text.TextAnalysis
import graft.multimodal.Multimodal

/** Driver-contract entries for the LLM-training-data operators. */
object LlmQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def embs(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  /** Deterministic PII-bearing payload built from events columns — the
    * test corpus carries no digits at all, so the PII scan's regex
    * semantics are exercised on a string BOTH engines synthesize
    * identically from real data (mixed rows: some with an email, some
    * with an IP, some with a phone, some clean). The operator itself
    * ([[TextAnalysis.piiScan]]) is generic over any string column. */
  private def piiPayload: org.apache.spark.sql.Column = concat(
    when(col("event_type") === "view",
      concat(lit("contact u"), col("user_id").cast("string"), lit("@mail.net ")))
      .otherwise(lit("anon ")),
    lit("from "),
    when(col("event_id") % 3 === 0,
      concat(lit("10.0."), (col("user_id") % 200).cast("string"), lit("."),
        (col("event_id") % 250).cast("string"))).otherwise(lit("intranet")),
    when(col("event_id") % 5 === 0,
      concat(lit(" call +1-555-"), lpad((col("event_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit("")))

  /** Deterministic per-doc URL built from real doc columns (the test
    * corpus carries no URLs) — with the scheme/www./case/tracking-query/
    * trailing-slash variants a crawl actually re-fetches pages under,
    * so normalization is load-bearing; canonical groups are keyed on
    * doc_id mod lcm(5,3,7)=105. Both engines synthesize it identically. */
  private def urlPayload: org.apache.spark.sql.Column = concat(
    lit("https://"),
    when(col("doc_id") % 4 === 0, lit("www.")).otherwise(lit("")),
    when(col("doc_id") % 11 === 0, lit("SITE")).otherwise(lit("site")),
    (col("doc_id") % 5).cast("string"),
    lit(".example"), (col("doc_id") % 3).cast("string"), lit(".com/page-"),
    (col("doc_id") % 7).cast("string"),
    when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 3 === 0, lit("?utm_source=feed&ref=rss")).otherwise(lit("")))

  /** Deterministic scratch dir for the snapshot queries' artifact
    * round-trips — per (sf dir, kind) so reruns overwrite in place
    * instead of accumulating temp dirs. */
  private def snapDir(sfDir: String, kind: String): String =
    s"${graft.core.Scratch.root}/graft_snap_${Integer.toHexString(sfDir.hashCode)}/$kind"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_url" -> ((s, d) =>
      Corpus.urlDedup(docs(s, d).withColumn("url", urlPayload))
        .orderBy(col("canonical_id"))),
    "q_url_domains" -> ((s, d) =>
      Corpus.domainStats(docs(s, d).withColumn("url", urlPayload))
        .orderBy(col("host"))),
    "q_dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d)).orderBy(col("canonical_id"))),
    "q_dedup_minhash_bands" -> ((s, d) =>
      Dedup.minhashBands(docs(s, d)).orderBy(col("id_a"), col("id_b"))),
    "q_minhash_calibration" -> ((s, d) =>
      Dedup.minhashCalibration(docs(s, d)).orderBy(col("id_a"), col("id_b"))),
    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(docs(s, d)).orderBy(col("id_a"), col("id_b"))),
    "q_dedup_incremental" -> ((s, d) =>
      Dedup.incrementalDedup(docs(s, d)).orderBy(col("doc_id"))),
    "q_embed_incremental" -> ((s, d) =>
      Dedup.embeddingIncremental(embs(s, d)).orderBy(col("vec_id"))),
    // same screens driven off the persisted index artifacts — candidate
    // orders differ (index-side vs full-corpus df) but verification is
    // exact, so the oracle is the incremental one, reused verbatim.
    // Each registered query round-trips the artifact through parquet
    // (save → load) so the benched+oracled path IS the artifact path,
    // not an in-memory rebuild wearing its name.
    "q_dedup_snapshot" -> ((s, d) => {
      val all = docs(s, d)
      val dir = snapDir(d, "text")
      Dedup.buildTextIndexSnapshot(all.filter(col("doc_id") % 10 =!= 0), 0.5).save(dir)
      Dedup.incrementalDedupWithSnapshot(all.filter(col("doc_id") % 10 === 0),
        Dedup.TextIndexSnapshot.load(s, dir)).orderBy(col("doc_id"))
    }),
    "q_embed_snapshot" -> ((s, d) => {
      val all = embs(s, d)
      val dir = snapDir(d, "embed")
      Dedup.buildEmbeddingIndexSnapshot(all.filter(col("vec_id") % 10 =!= 0))
        .write.mode("overwrite").parquet(dir)
      Dedup.embeddingIncrementalWithSnapshot(all.filter(col("vec_id") % 10 === 0),
        s.read.parquet(dir)).orderBy(col("vec_id"))
    }),
    // the sub-quadratic twin: the increment probes the PERSISTED band
    // signatures with a hash equi-join; flagged dups are exact-verified
    // (precision 1) but recall is the banding's — rows-only contract,
    // re-measured ≥ 0.8 each round in RECALL_r*.json
    "q_embed_snapshot_lsh" -> ((s, d) => {
      val all = embs(s, d)
      val dir = snapDir(d, "embed_lsh")
      Dedup.buildEmbeddingLshSnapshot(all.filter(col("vec_id") % 10 =!= 0)).save(dir)
      Dedup.embeddingIncrementalWithLshSnapshot(all.filter(col("vec_id") % 10 === 0),
        Dedup.EmbeddingLshSnapshot.load(s, dir)).orderBy(col("vec_id"))
    }),
    // the full daily cycle: build on day-0 corpus, save, APPEND day 1
    // onto the LOADED artifact under the frozen df order, save again,
    // screen day 2 off the re-loaded artifact — the appended index
    // equals the %10≠0 side, so the incremental oracle is reused
    // verbatim
    "q_dedup_snapshot_cycle" -> ((s, d) => {
      val all = docs(s, d)
      val dir = snapDir(d, "cycle")
      // day-0 build saves with overwrite (a rerun starts from a clean
      // artifact); day 1 APPENDS only its own index rows in place —
      // the O(increment) daily write, not a full-index rewrite; day 2
      // screens off the re-loaded grown artifact. Index row set — and
      // the screen output — equal the previous build→append→re-save
      // composition (oracle unchanged).
      Dedup.buildTextIndexSnapshot(
        all.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5), 0.5).save(dir)
      val appended = Dedup.appendToTextIndexSnapshotInPlace(dir,
        all.filter(col("doc_id") % 10 === 5))
      Dedup.incrementalDedupWithSnapshot(all.filter(col("doc_id") % 10 === 0),
        appended).orderBy(col("doc_id"))
    }),
    "q_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(docs(s, d)).orderBy(col("id_a"), col("id_b"))),
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(docs(s, d)).orderBy(col("id_a"), col("id_b"))),
    "q_dedup_components" -> ((s, d) =>
      Dedup.components(docs(s, d)).orderBy(col("doc_id"))),
    // daily cluster maintenance: day-0 labels compress the pair
    // history to star edges; the increment contributes its complete
    // cross-side (snapshot probe) and within-side pairs — equals the
    // one-shot components over the union, oracle reused verbatim
    "q_dedup_components_incr" -> ((s, d) => {
      val all = docs(s, d)
      val idxSide = all.filter(col("doc_id") % 10 =!= 0)
      // ONE shingle/df/prefix pass over the index side: the snapshot
      // build pays it, and the day-0 batch labels are derived FROM the
      // artifact (identical pairs → identical labels; the previous
      // shape ran components() and buildTextIndexSnapshot() as two
      // independent full passes over the same 90% side)
      val snap = Dedup.buildTextIndexSnapshot(idxSide, 0.5)
      val labels0 = Dedup.componentsFromSnapshot(idxSide.select(col("doc_id")), snap)
      Dedup.incrementalComponents(all.filter(col("doc_id") % 10 === 0), labels0, snap)
        .orderBy(col("doc_id"))
    }),
    "q_dedup_cluster_sizes" -> ((s, d) =>
      Dedup.clusterSizes(docs(s, d)).orderBy(col("comp_size"))),
    "q_dedup_bloom" -> ((s, d) =>
      graft.dedup.Bloom.screenQuery(docs(s, d)).orderBy(col("doc_id"))),
    "q_dedup_embedding" -> ((s, d) =>
      Dedup.embeddingPairs(embs(s, d)).orderBy(col("id_a"), col("id_b"))),
    "q_dedup_embedding_lsh" -> ((s, d) =>
      Dedup.embeddingPairsLsh(embs(s, d)).orderBy(col("id_a"), col("id_b"))),
    "q_ann_topk" -> ((s, d) => Ann.bruteTopK(embs(s, d)).orderBy(col("query_id"), col("rank"))),
    "q_mmr_rerank" -> ((s, d) => Ann.mmrRerank(embs(s, d))),
    "q_hard_negatives" -> ((s, d) => Ann.hardNegatives(embs(s, d))),
    "q_class_balance" -> ((s, d) => Cluster.classBalance(embs(s, d))),
    "q_gains_lift" -> ((s, d) => TextAnalysis.gainsLift(docs(s, d))),
    "q_ann_lsh" -> ((s, d) => Ann.lshTopK(embs(s, d)).orderBy(col("query_id"), col("rank"))),
    "q_ann_ivf" -> ((s, d) => Ann.ivfTopK(embs(s, d)).orderBy(col("query_id"), col("rank"))),
    "q_ann_pq" -> ((s, d) => Ann.pqTopK(embs(s, d)).orderBy(col("query_id"), col("rank"))),
    "q_ann_ivfpq" -> ((s, d) =>
      Ann.ivfpqTopK(embs(s, d)).orderBy(col("query_id"), col("rank"))),
    // the FAISS serve shape: codebook + centroids + compressed codes
    // persisted once, queries pay only routing + the bounded ADC scan;
    // deterministic build => output equals the inline q_ann_ivfpq
    // (spec-pinned), same rows-only approximate contract
    "q_ann_ivfpq_snapshot" -> ((s, d) => {
      val all = embs(s, d)
      val dir = snapDir(d, "ivfpq")
      Ann.buildIvfPqIndex(all).save(dir)
      Ann.ivfpqTopKWithIndex(all, Ann.PqIndex.load(s, dir))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_text_langid" -> ((s, d) => TextAnalysis.langId(docs(s, d)).orderBy(col("doc_id"))),
    "q_langid_confusion" -> ((s, d) =>
      TextAnalysis.langidConfusion(docs(s, d)).orderBy(col("lang"), col("predicted"))),
    "q_text_quality" -> ((s, d) => TextAnalysis.quality(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_tokens" -> ((s, d) => TextAnalysis.tokenCounts(docs(s, d)).orderBy(col("doc_id"))),
    "q_winnowing" -> ((s, d) => TextAnalysis.winnowing(docs(s, d)).orderBy(col("doc_id"))),
    "q_embed_drift" -> ((s, d) => Cluster.drift(embs(s, d)).orderBy(col("dim"))),
    "q_lang_centroid" -> ((s, d) =>
      Cluster.langCentroid(docs(s, d), embs(s, d)).orderBy(col("doc_id"))),
    "q_tokenizer_fertility" -> ((s, d) =>
      TextAnalysis.fertility(docs(s, d)).orderBy(col("lang"))),
    "q_zipf_fit" -> ((s, d) => TextAnalysis.zipfFit(docs(s, d))),
    "q_heaps_fit" -> ((s, d) => TextAnalysis.heapsFit(docs(s, d))),
    "q_doc_novelty" -> ((s, d) =>
      TextAnalysis.docNovelty(docs(s, d)).orderBy(col("doc_id"))),
    "q_calibration" -> ((s, d) => TextAnalysis.calibration(docs(s, d))),
    "q_dedup_sweep" -> ((s, d) => Dedup.thresholdSweep(docs(s, d))),
    "q_dedup_prefix" -> ((s, d) =>
      TextAnalysis.prefixDups(docs(s, d)).orderBy(col("prefix"))),
    "q_text_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_entropy" -> ((s, d) =>
      TextAnalysis.charEntropy(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogprob(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_logprob2" -> ((s, d) =>
      TextAnalysis.bigramLogprob(docs(s, d)).orderBy(col("doc_id"))),
    "q_ccnet_buckets" -> ((s, d) =>
      TextAnalysis.ccnetBuckets(docs(s, d)).orderBy(col("doc_id"))),
    "q_ccnet_buckets_approx" -> ((s, d) =>
      TextAnalysis.ccnetBucketsApprox(docs(s, d)).orderBy(col("doc_id"))),
    "q_token_hist" -> ((s, d) =>
      TextAnalysis.tokenHistogram(docs(s, d)).orderBy(col("bucket"))),
    "q_dsir_weights" -> ((s, d) =>
      Corpus.dsirWeights(docs(s, d)).orderBy(col("doc_id"))),
    "q_corpus_shuffle" -> ((s, d) =>
      Corpus.shuffle(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_bigrams" -> ((s, d) => TextAnalysis.topBigrams(docs(s, d))),
    "q_bpe_pairs" -> ((s, d) => TextAnalysis.bpePairs(docs(s, d)).orderBy(col("rank"))),
    "q_bpe_apply" -> ((s, d) => TextAnalysis.bpeApply(docs(s, d)).orderBy(col("rank"))),
    "q_oov_rate" -> ((s, d) => TextAnalysis.oovRate(docs(s, d)).orderBy(col("doc_id"))),
    "q_sample_weighted" -> ((s, d) =>
      Corpus.sampleWeighted(docs(s, d)).orderBy(col("rank"))),
    "q_stratified_sample" -> ((s, d) =>
      Corpus.stratifiedSample(docs(s, d)).orderBy(col("source"), col("rn"))),
    "q_lang_temperature" -> ((s, d) =>
      Corpus.langTemperature(docs(s, d)).orderBy(col("lang"))),
    "q_bands_eval" -> ((s, d) => Dedup.bandsEval(docs(s, d))),
    "q_heavy_hitters" -> ((s, d) =>
      TextAnalysis.heavyHitters(docs(s, d)).orderBy(col("rank"))),
    "q_bigram_pmi" -> ((s, d) =>
      TextAnalysis.bigramPmi(docs(s, d)).orderBy(col("rank"))),
    "q_classifier_roc" -> ((s, d) =>
      TextAnalysis.classifierRoc(docs(s, d)).orderBy(col("t"))),
    "q_embed_whiten" -> ((s, d) =>
      graft.similarity.Pca.whitenReport(embs(s, d)).orderBy(col("vec_id"))),
    "q_semdedup" -> ((s, d) =>
      Cluster.semDedup(embs(s, d)).orderBy(col("vec_id"))),
    "q_dbscan" -> ((s, d) => Cluster.dbscan(embs(s, d)).orderBy(col("vec_id"))),
    "q_text_repetition" -> ((s, d) =>
      TextAnalysis.repetition(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_ttr" -> ((s, d) =>
      TextAnalysis.typeTokenRatio(docs(s, d)).orderBy(col("doc_id"))),
    "q_lang_source_mi" -> ((s, d) =>
      TextAnalysis.langSourceMi(docs(s, d)).orderBy(col("lang"), col("source"))),
    "q_cramers_v" -> ((s, d) => TextAnalysis.cramersV(docs(s, d))),
    "q_gopher_rules" -> ((s, d) =>
      TextAnalysis.gopherRules(docs(s, d)).orderBy(col("rule_no"))),
    "q_inverted_search" -> ((s, d) => TextAnalysis.invertedSearch(docs(s, d))),
    "q_bm25" -> ((s, d) => TextAnalysis.bm25Search(docs(s, d))),
    "q_textrank" -> ((s, d) => TextAnalysis.textrankKeywords(docs(s, d))),
    "q_cms_heavy_hitters" -> ((s, d) => TextAnalysis.cmsHeavyHitters(docs(s, d))),
    "q_centroid_dist" -> ((s, d) =>
      Cluster.centroidDistances(docs(s, d), embs(s, d))
        .orderBy(col("lang_a"), col("lang_b"))),
    "q_embed_norms" -> ((s, d) => Cluster.normStats(embs(s, d))),
    "q_lsh_bucket_stats" -> ((s, d) =>
      Dedup.lshBucketStats(docs(s, d)).orderBy(col("band"))),
    "q_text_tfidf" -> ((s, d) =>
      TextAnalysis.tfidfTop(docs(s, d)).orderBy(col("doc_id"), col("rank"))),
    "q_dedup_spans" -> ((s, d) =>
      Dedup.dupSpans(docs(s, d)).orderBy(col("doc_id"))),
    "q_quality_classifier" -> ((s, d) =>
      TextAnalysis.qualityClassifier(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_dupngrams" -> ((s, d) =>
      TextAnalysis.dupNgrams(docs(s, d)).orderBy(col("doc_id"))),
    "q_pack_sequences" -> ((s, d) =>
      TextAnalysis.packSequences(docs(s, d)).orderBy(col("lang"), col("bin"))),
    "q_corpus_stats" -> ((s, d) =>
      TextAnalysis.corpusStats(docs(s, d)).orderBy(col("lang"))),
    "q_embed_outliers" -> ((s, d) =>
      Cluster.outliers(embs(s, d)).orderBy(col("vec_id"))),
    "q_contamination" -> ((s, d) =>
      Corpus.contamination(docs(s, d)).orderBy(col("doc_id"))),
    "q_corpus_split" -> ((s, d) =>
      Corpus.splitCounts(docs(s, d)).orderBy(col("lang"), col("split"))),
    "q_corpus_clean" -> ((s, d) => Corpus.clean(docs(s, d)).orderBy(col("doc_id"))),
    "q_corpus_sample" -> ((s, d) => Corpus.sample(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_pii" -> ((s, d) =>
      TextAnalysis.piiScan(Tables.events(s, d).withColumn("payload", piiPayload),
        "event_id", "payload").orderBy(col("event_id"))),
    "q_text_chunks" -> ((s, d) =>
      TextAnalysis.chunks(docs(s, d)).orderBy(col("doc_id"), col("chunk_start"))),
    "q_source_mix" -> ((s, d) => Corpus.sourceMix(docs(s, d)).orderBy(col("source"))),
    "q_vocab_coverage" -> ((s, d) =>
      TextAnalysis.vocabCoverage(docs(s, d)).orderBy(col("rank"))),
    "q_source_jsd" -> ((s, d) => TextAnalysis.sourceJsd(docs(s, d))),
    "q_dedup_cross_source" -> ((s, d) =>
      Corpus.crossSourceDup(docs(s, d)).orderBy(col("source_a"), col("source_b"))),
    "q_robots_filter" -> ((s, d) =>
      Robots.robotsFilter(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_ingest_pdf" -> ((s, d) =>
      graft.sources.Pdf.pdfIngest(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_ingest_sitemap" -> ((s, d) =>
      graft.sources.Sitemap.sitemapIngest(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_ingest_tar" -> ((s, d) =>
      graft.sources.Tar.tarIngest(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_ingest_zip" -> ((s, d) =>
      graft.sources.Zip.zipIngest(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_ingest_warc" -> ((s, d) =>
      graft.sources.Warc.warcIngest(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_ingest_gzip" -> ((s, d) =>
      graft.sources.Sources.jsonlGzRoundtrip(s, d).orderBy(col("source"))),
    "q_ingest_jsonl" -> ((s, d) =>
      graft.sources.Sources.jsonlRoundtrip(s, d).orderBy(col("source"))),
    "q_ingest_csv" -> ((s, d) =>
      graft.sources.Sources.csvRoundtrip(s, d).orderBy(col("source"))),
    "q_ingest_orc" -> ((s, d) =>
      graft.sources.Sources.orcRoundtrip(s, d).orderBy(col("source"))),
    "q_ingest_bucketed" -> ((s, d) =>
      graft.sources.Sources.bucketedRoundtrip(s, d).orderBy(col("user_id"))),
    "q_readability" -> ((s, d) =>
      TextAnalysis.readability(docs(s, d)).orderBy(col("doc_id"))),
    "q_rbo" -> ((s, d) => TextAnalysis.rboTokens(docs(s, d))),
    "q_token_burstiness" -> ((s, d) =>
      TextAnalysis.tokenBurstiness(docs(s, d)).orderBy(col("rnk"))),
    "q_cohens_kappa" -> ((s, d) => TextAnalysis.cohensKappa(docs(s, d))),
    "q_quality_sample" -> ((s, d) =>
      Corpus.sampleByQuality(docs(s, d)).orderBy(col("doc_id"))),
    "q_embed_cluster" -> ((s, d) => Cluster.kmeans(embs(s, d)).orderBy(col("vec_id"))),
    "q_silhouette" -> ((s, d) => Cluster.silhouette(embs(s, d))),
    "q_embed_pca" -> ((s, d) =>
      graft.similarity.Pca.powerProjection(embs(s, d)).orderBy(col("vec_id"))),
    "q_embed_quantize" -> ((s, d) =>
      graft.similarity.Quantize.sq8Report(embs(s, d)).orderBy(col("vec_id"))),
    "q_multimodal_meta" -> ((s, d) => Multimodal.metadata(docs(s, d)).orderBy(col("doc_id"))),
    "q_image_decode" -> ((s, d) =>
      Multimodal.imageDecode(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_decode_png" -> ((s, d) =>
      Multimodal.imageDecodePng(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_decode_jpeg" -> ((s, d) =>
      Multimodal.imageDecodeJpeg(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_decode_gif" -> ((s, d) =>
      Multimodal.imageDecodeGif(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_decode_bmp" -> ((s, d) =>
      Multimodal.imageDecodeBmp(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_decode_tiff" -> ((s, d) =>
      Multimodal.imageDecodeTiff(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_decode_ico" -> ((s, d) =>
      Multimodal.imageDecodeIco(s, docs(s, d))
        .orderBy(col("doc_id"), col("icon_idx"))),
    "q_gif_frames" -> ((s, d) =>
      Multimodal.gifFrames(s, docs(s, d)).orderBy(col("doc_id"), col("frame_idx"))),
    "q_gif_composite" -> ((s, d) =>
      Multimodal.gifComposite(s, docs(s, d)).orderBy(col("doc_id"), col("frame_idx"))),
    "q_image_cross_format" -> ((s, d) =>
      Multimodal.imageCrossFormat(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_exif" -> ((s, d) =>
      Multimodal.imageExif(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_image_phash" -> ((s, d) =>
      Multimodal.imagePhash(s, docs(s, d)).orderBy(col("doc_id"))),
    // same complete hamming<=3 semantics via 2x32-bit multi-index
    // hashing — output equals q_image_phash, oracle reused verbatim
    "q_image_phash_mih" -> ((s, d) =>
      Multimodal.imagePhashMih(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_cdc_chunks" -> ((s, d) =>
      TextAnalysis.cdcChunks(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_charclass" -> ((s, d) =>
      TextAnalysis.charClasses(docs(s, d)).orderBy(col("doc_id"))),
    "q_text_normalize" -> ((s, d) =>
      TextAnalysis.unicodeNormalize(docs(s, d)).orderBy(col("doc_id"))),
    "q_feature_hash" -> ((s, d) =>
      TextAnalysis.featureHash(docs(s, d)).orderBy(col("doc_id"))),
    "q_html_metrics" -> ((s, d) =>
      TextAnalysis.htmlMetrics(docs(s, d)).orderBy(col("doc_id"))),
    "q_image_resize" -> ((s, d) =>
      Multimodal.imageResize(s, docs(s, d))
        .orderBy(col("doc_id"), col("cell_y"), col("cell_x"))),
    "q_audio_decode" -> ((s, d) =>
      Multimodal.audioDecode(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_audio_mulaw" -> ((s, d) =>
      Multimodal.audioDecodeMulaw(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_audio_alaw" -> ((s, d) =>
      Multimodal.audioDecodeAlaw(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_audio_aiff" -> ((s, d) =>
      Multimodal.audioDecodeAiff(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_audio_adpcm" -> ((s, d) =>
      Multimodal.audioDecodeAdpcm(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_audio_spectrum" -> ((s, d) =>
      Multimodal.audioSpectrum(s, docs(s, d)).orderBy(col("doc_id"), col("bin"))),
    "q_video_decode" -> ((s, d) =>
      Multimodal.videoDecode(s, docs(s, d)).orderBy(col("doc_id"))),
    "q_video_scenes" -> ((s, d) =>
      Multimodal.videoScenes(s, docs(s, d))
        .orderBy(col("doc_id"), col("frame_idx"))))
}
