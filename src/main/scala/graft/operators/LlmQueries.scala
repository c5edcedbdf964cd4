package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** LLM-training-data pipeline queries over the driver's `documents` and
  * `embeddings` tables, with DuckDB oracles that replay the identical
  * algorithms (same md5 hash family, same band layout, same fold order).
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)

  /** Stored-index location for the llm_ivfpq_index entry: keyed by the
    * fixture dir AND its newest file mtime, so a regenerated fixture
    * can never serve a stale index (the build is skipped only while
    * the data is byte-identical). Lives under target/ (build
    * scratch). */
  private def indexPath(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stamp = fs.listStatus(p).map(_.getModificationTime)
      .maxOption.getOrElse(0L)
    val san = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"target/pq_index/${san}_${java.lang.Long.toHexString(stamp)}"
  }

  val queries: Map[String, Q] = Map(
    "llm_recrawl_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      // events as the crawl-log stand-in: (user_id, event_type) plays
      // the URL key, 30-min refetch window
      LlmPrep.recrawlDedup(Tables.events(s, d),
          Seq("user_id", "event_type"), "ts", "event_id", 1800L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"))
        .orderBy(col("event_id"))
    }),
    // oracle: the fixed 12 merge rounds unrolled as chained CTEs
    // (BpeTrainSql); exact parity additionally pinned by BpeTrainSpec's
    // single-threaded reference differential
    "llm_bpe_train" -> ((s, d) =>
      BpeTrain.train(docs(s, d), merges = 12, minCount = 2L)),
    "llm_pmi" -> ((s, d) => LlmPrep.collocations(docs(s, d))),
    "llm_calibrate" -> ((s, d) => LlmCorpus.calibrateBySource(docs(s, d))),
    "llm_normalize" -> ((s, d) => LlmText.normalizeText(docs(s, d))),
    "llm_bigram_lm" -> ((s, d) => LlmCorpus.bigramLm(docs(s, d))),
    "llm_distinctive" -> ((s, d) => LlmCorpus.distinctiveTerms(docs(s, d))),
    // the learned 12-rule table (bounded driver collect) applied
    // corpus-wide; oracle joins the unrolled chain's final word table
    "llm_bpe_encode" -> ((s, d) => {
      val dd = docs(s, d)
      val m = BpeTrain.train(dd, merges = 12, minCount = 2L)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      BpeTrain.encode(dd, m)
    }),
    "llm_dedup_exact" -> ((s, d) => LlmText.dedupExact(docs(s, d))),
    "llm_dedup_near" -> ((s, d) => LlmText.dedupNear(docs(s, d))),
    "llm_dedup_ngram" -> ((s, d) => LlmText.dedupNgram(docs(s, d))),
    "llm_dedup_cluster" -> ((s, d) => LlmText.dedupClusters(docs(s, d))),
    "llm_dedup_canonical" -> ((s, d) => LlmText.dedupCanonical(docs(s, d))),
    "llm_simhash" -> ((s, d) => LlmText.simhash(docs(s, d))),
    "llm_fingerprint" -> ((s, d) => LlmText.fingerprint(docs(s, d))),
    "llm_textstats" -> ((s, d) => LlmText.textStats(docs(s, d))),
    "llm_knn" -> ((s, d) => LlmSim.knnBrute(embs(s, d))),
    "llm_hard_negatives" -> ((s, d) => LlmSim.hardNegatives(embs(s, d))),
    "llm_knn_ivf" -> ((s, d) => LlmSim.knnIvf(embs(s, d))),
    "llm_knn_ivf2" -> ((s, d) => LlmSim.knnIvfTrained(embs(s, d))),
    "llm_ann_recall" -> ((s, d) => LlmSim.annRecall(embs(s, d))),
    "llm_pq_encode" -> ((s, d) => Pq.encode(embs(s, d))),
    "llm_pq_search" -> ((s, d) => Pq.search(embs(s, d))),
    "llm_ivfpq_search" -> ((s, d) => Pq.searchIvf(embs(s, d))),
    // PRODUCTION-path twins (exactFold = false): codebooks train with
    // plain partial-aggregating avg instead of the vec_id-ordered fold
    // the DuckDB oracle needs for bit-parity (~1.4 s of the sf0.1
    // llm_pq_search entry is that fold alone). No SQL oracle — the
    // training-sum order is unspecified by design — so the gate
    // records a rows-only check; PqSpec pins that both paths return
    // the SAME top-k rows under the round(·,6) ranking.
    "llm_pq_search_prod" ->
      ((s, d) => Pq.search(embs(s, d), exactFold = false)),
    "llm_ivfpq_search_prod" ->
      ((s, d) => Pq.searchIvf(embs(s, d), exactFold = false)),
    // THE SERVING PATH, gated end-to-end: freeze + encode the fixture
    // into a stored index ONCE (a ready-marker makes reps and the
    // verify pass reuse it), then serve the house query split from the
    // stored packed codes + frozen books alone. Output is pinned ≡
    // searchIvf (PqMigrateSpec/StreamingPqEncodeSpec), so it shares
    // llm_ivfpq_search's DuckDB oracle — the r17 verdict's untimed,
    // unoracled serving plan is now both timed and oracle-checked.
    "llm_ivfpq_index" -> ((s, d) => {
      val e = embs(s, d)
      val path = indexPath(s, d)
      Pq.buildIndexIfAbsent(s, e, path)
      Pq.searchIvfIndex(s, e.filter(
        org.apache.spark.sql.functions.col("vec_id")
          % LlmSim.QueryMod === 0), path)
    }),
    // the stored FULL-SCAN twin (no coarse pruning — the recall-exact
    // fallback a deployment keeps for small/critical query sets);
    // shares the same built index, pinned ≡ Pq.search so it rides
    // llm_pq_search's oracle
    "llm_pq_index" -> ((s, d) => {
      val e = embs(s, d)
      val path = indexPath(s, d)
      Pq.buildIndexIfAbsent(s, e, path)
      Pq.searchIndex(s, e.filter(
        org.apache.spark.sql.functions.col("vec_id")
          % LlmSim.QueryMod === 0), path)
    }),
    "llm_dedup_embed" -> ((s, d) => LlmSim.dedupEmbed(embs(s, d))),
    // exact-bound PQ prefilter: provably identical output, so it
    // shares llm_dedup_embed's oracle verbatim
    "llm_dedup_embed_pq" -> ((s, d) => LlmSim.dedupEmbedPq(embs(s, d))),
    "llm_contamination_embed" ->
      ((s, d) => LlmSim.contaminationEmbed(embs(s, d))),
    "llm_semdedup" -> ((s, d) => LlmSim.semDedup(embs(s, d))),
    "llm_label_noise" -> ((s, d) => LlmSim.labelNoise(embs(s, d))),
    "llm_multimodal" -> ((s, d) => Multimodal.mediaStats(docs(s, d))),
    "llm_curation" -> ((s, d) => LlmText.curate(docs(s, d))),
    "llm_contamination" -> ((s, d) => LlmPrep.contamination(docs(s, d))),
    "llm_sample_stratified" ->
      ((s, d) => LlmPrep.sampleStratified(docs(s, d))),
    "llm_pack" -> ((s, d) => LlmPrep.pack(docs(s, d))),
    "llm_entropy" -> ((s, d) => LlmPrep.entropy(docs(s, d))),
    "llm_vocab" -> ((s, d) => LlmPrep.vocab(docs(s, d))),
    "llm_heavy_hitters" -> ((s, d) => LlmPrep.heavyTokens(docs(s, d))),
    "llm_heavy_domains" ->
      ((s, d) => LlmPrep.heavyDomainTokens(docs(s, d))),
    "llm_sample_weighted" ->
      ((s, d) => LlmPrep.sampleWeighted(docs(s, d))),
    "llm_split" -> ((s, d) => LlmPrep.splitAssign(docs(s, d))),
    "llm_repetition" -> ((s, d) => LlmText.repetition(docs(s, d))),
    "llm_pii" ->
      ((s, d) => LlmPrep.piiScrub(LlmPrep.withSyntheticPii(docs(s, d)))),
    "llm_corpus_stats" -> ((s, d) => LlmPrep.corpusStats(docs(s, d))),
    "llm_blocklist" -> ((s, d) => {
      val dd = docs(s, d)
      LlmPrep.blocklistFilter(dd, LlmPrep.syntheticBlocklist(dd))
    }),
    "llm_bm25" -> ((s, d) => LlmPrep.bm25(docs(s, d))),
    "llm_bm25_multi" -> ((s, d) => {
      val dd = docs(s, d)
      LlmPrep.bm25Multi(dd, LlmPrep.bm25FixtureQueries(dd))
    }),
    "llm_chunk" -> ((s, d) => LlmPrep.chunk(docs(s, d))),
    "llm_boilerplate" -> ((s, d) => LlmPrep.boilerplateScrub(docs(s, d))),
    "llm_bpe_pairs" -> ((s, d) => LlmPrep.bpePairs(docs(s, d))),
    "llm_shuffle_shards" -> ((s, d) => LlmCorpus.shuffleShards(docs(s, d))),
    "llm_unigram_lm" -> ((s, d) => LlmCorpus.unigramLm(docs(s, d))),
    "llm_ppl_bucket" -> ((s, d) => LlmCorpus.pplBucket(docs(s, d))),
    "llm_domain_mix" ->
      ((s, d) => LlmCorpus.domainMix(docs(s, d), LlmCorpus.MixTargets.toMap)),
    "llm_substr_dup" -> ((s, d) => LlmCorpus.substrDup(docs(s, d))),
    "llm_quality_clf" -> ((s, d) => LlmCorpus.qualityClf(docs(s, d))),
    "llm_keywords" -> ((s, d) => LlmCorpus.keywords(docs(s, d))),
    "llm_tfidf_pairs" -> ((s, d) => LlmCorpus.tfidfPairs(docs(s, d))),
    "llm_vocab_encode" -> ((s, d) => LlmCorpus.vocabEncode(docs(s, d))),
    "llm_curation_report" ->
      ((s, d) => LlmCorpus.curationReport(docs(s, d), embs(s, d))),
    "llm_embed_quant" -> ((s, d) => LlmSim.embedQuant(embs(s, d))),
    "llm_cms" -> ((s, d) => LlmSketch.cmsEstimates(docs(s, d))),
    "llm_skipgram" -> ((s, d) => LlmPrep.skipgrams(docs(s, d))),
    "llm_split_safe" -> ((s, d) => LlmText.splitSafe(docs(s, d))),
    // same clustering oracle as llm_dedup_cluster: the star-contraction
    // and label-propagation paths must agree with SQL reachability
    "llm_dedup_cluster2" -> ((s, d) => LlmText.dedupClustersStar(docs(s, d))),
    "llm_rnn" -> ((s, d) => LlmSim.rnnPairs(embs(s, d))),
    "llm_decontaminate" -> ((s, d) => LlmPrep.decontaminate(docs(s, d))))

  val oracles: Map[String, String] = Map(
    "llm_bpe_train" -> BpeTrainSql.trainSql(merges = 12, minCount = 2L),
    "llm_bpe_encode" -> BpeTrainSql.encodeSql(merges = 12, minCount = 2L),
    "llm_recrawl_dedup" -> LlmPrepSql.recrawlSql,
    "llm_pmi" -> LlmPrepSql.pmiSql,
    "llm_calibrate" -> LlmCorpusSql.calibrateSql,
    "llm_normalize" -> LlmTextSql.normalizeSql,
    "llm_bigram_lm" -> LlmCorpusSql.bigramLmSql,
    "llm_distinctive" -> LlmCorpusSql.distinctiveTermsSql,
    "llm_dedup_exact" -> LlmTextSql.dedupExactSql,
    "llm_dedup_near" -> LlmTextSql.dedupNearSql,
    "llm_dedup_ngram" -> LlmTextSql.dedupNgramSql,
    "llm_dedup_cluster" -> LlmTextSql.dedupClustersSql,
    "llm_dedup_canonical" -> LlmTextSql.dedupCanonicalSql,
    "llm_simhash" -> LlmTextSql.simhashSql,
    "llm_fingerprint" -> LlmTextSql.fingerprintSql,
    "llm_textstats" -> LlmTextSql.textStatsSql,
    "llm_knn" -> LlmSimSql.knnBruteSql,
    "llm_hard_negatives" -> LlmSimSql.hardNegativesSql,
    "llm_knn_ivf" -> LlmSimSql.knnIvfSql,
    "llm_knn_ivf2" -> LlmSimSql.knnIvfTrainedSql,
    "llm_ann_recall" -> LlmSimSql.annRecallSql,
    "llm_pq_encode" -> PqSql.encodeSql,
    "llm_pq_search" -> PqSql.searchSql,
    "llm_ivfpq_search" -> PqSql.searchIvfSql,
    // the stored-index serving paths return the SAME rows as their
    // in-memory twins by spec pin, so the same oracles check them
    "llm_ivfpq_index" -> PqSql.searchIvfSql,
    "llm_pq_index" -> PqSql.searchSql,
    "llm_dedup_embed" -> LlmSimSql.dedupEmbedSql,
    // the PQ exact-bound prefilter is output-identical by proof
    // (triangle-inequality prune + identical verify), so the SAME
    // oracle checks it end-to-end
    "llm_dedup_embed_pq" -> LlmSimSql.dedupEmbedSql,
    "llm_contamination_embed" -> LlmSimSql.contaminationEmbedSql,
    "llm_semdedup" -> LlmSimSql.semDedupSql,
    "llm_label_noise" -> LlmSimSql.labelNoiseSql,
    "llm_multimodal" -> MultimodalSql.mediaStatsSql,
    "llm_curation" -> LlmTextSql.curateSql(),
    "llm_contamination" -> LlmPrepSql.contaminationSql,
    "llm_sample_stratified" -> LlmPrepSql.sampleStratifiedSql,
    "llm_pack" -> LlmPrepSql.packSql,
    "llm_entropy" -> LlmPrepSql.entropySql,
    "llm_vocab" -> LlmPrepSql.vocabSql,
    "llm_heavy_hitters" -> LlmPrepSql.heavyTokensSql,
    "llm_heavy_domains" -> LlmPrepSql.heavyDomainTokensSql,
    "llm_sample_weighted" -> LlmPrepSql.sampleWeightedSql,
    "llm_split" -> LlmPrepSql.splitAssignSql,
    "llm_repetition" -> LlmTextSql.repetitionSql,
    "llm_pii" -> LlmPrepSql.piiSql,
    "llm_corpus_stats" -> LlmPrepSql.corpusStatsSql,
    "llm_blocklist" -> LlmPrepSql.blocklistSql,
    "llm_bm25" -> LlmPrepSql.bm25Sql,
    "llm_bm25_multi" -> LlmPrepSql.bm25MultiSql,
    "llm_chunk" -> LlmPrepSql.chunkSql,
    "llm_boilerplate" -> LlmPrepSql.boilerplateSql,
    "llm_bpe_pairs" -> LlmPrepSql.bpePairsSql,
    "llm_shuffle_shards" -> LlmCorpusSql.shuffleShardsSql,
    "llm_unigram_lm" -> LlmCorpusSql.unigramLmSql,
    "llm_ppl_bucket" -> LlmCorpusSql.pplBucketSql,
    "llm_domain_mix" -> LlmCorpusSql.domainMixSql,
    "llm_substr_dup" -> LlmCorpusSql.substrDupSql,
    "llm_quality_clf" -> LlmCorpusSql.qualityClfSql,
    "llm_keywords" -> LlmCorpusSql.keywordsSql,
    "llm_tfidf_pairs" -> LlmCorpusSql.tfidfPairsSql,
    "llm_vocab_encode" -> LlmCorpusSql.vocabEncodeSql,
    "llm_curation_report" -> LlmCorpusSql.curationReportSql,
    "llm_embed_quant" -> LlmSimSql.embedQuantSql,
    "llm_cms" -> LlmSketchSql.cmsSql,
    "llm_skipgram" -> LlmPrepSql.skipgramsSql,
    "llm_split_safe" -> LlmTextSql.splitSafeSql,
    "llm_dedup_cluster2" -> LlmTextSql.dedupClustersSql,
    "llm_rnn" -> LlmSimSql.rnnPairsSql,
    "llm_decontaminate" -> LlmPrepSql.decontaminateSql)
}
