package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (name -> runnable
  * DataFrame builder) and an `oracles` map (name -> ANSI SQL the driver
  * replays in DuckDB over the same parquet tables). Column names and
  * rounding conventions must match pairwise — see ClassicQueries scaladoc.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The flagship is the defining computation of the engine:
    * the sessionize → CO-aggregate spine. */
  def entry(spark: SparkSession): DataFrame =
    RcoQueries.coAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ClassicQueries.queries ++ RcoQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ClassicQueries.oracles ++ RcoQueries.oracles ++ LlmQueries.oracles

  /** Headline queries graft.Bench times at sf0.1 (first doubles as the
    * untimed warmup). Keep this the representative cross-section, not the
    * full verify set — Verify runs everything at sf0.01 already. */
  def benchQueries: Seq[String] = Seq(
    "cls_pricing_summary",
    "cls_shipping_priority",
    "cls_regional_revenue",
    "cls_semi_join",
    "cls_anti_join",
    "cls_top_orders_per_customer",
    "cls_asof_join",
    "cls_asof_sliced",
    "cls_range_join",
    "cls_zorder",
    "cls_funnel",
    "cls_session_paths",
    "cls_scd2",
    "cls_bloom_join",
    "cls_fuzzy_join",
    "cls_table_diff",
    "cls_quality_audit",
    "cls_entity_res",
    "cls_cdc_apply",
    "cls_pagerank",
    "llm_pmi",
    "llm_heavy_hitters",
    "rco_sessionize",
    "rco_co_agg",
    "rco_brandcode",
    "rco_first_stop",
    "rco_co_uptime",
    "rco_gantt",
    "llm_dedup_near",
    "llm_dedup_ngram",
    "llm_tfidf_pairs",
    "llm_knn",
    "llm_knn_ivf2",
    "llm_pq_search",
    "llm_ivfpq_search",
    // production-path twins: exactFold=false — the deployment plan,
    // free of the oracle's vec_id-ordered training fold
    "llm_pq_search_prod",
    "llm_ivfpq_search_prod",
    // the STORED-index serving paths (freeze+encode once — the ready
    // marker makes reps 2+ time the query alone, which is the number
    // that matters: rep 1 pays the one-off build)
    "llm_ivfpq_index",
    "llm_pq_index",
    "llm_semdedup",
    "llm_textstats",
    "llm_contamination",
    "llm_bm25",
    "llm_unigram_lm",
    "llm_ppl_bucket",
    "llm_substr_dup",
    "llm_quality_clf",
    "llm_vocab_encode",
    "llm_curation_report",
    "llm_cms",
    "llm_skipgram",
    "llm_rnn",
    "cls_rolling_anomaly",
    "cls_triangles",
    "cls_kcore",
    "cls_bfs",
    "cls_item_cooccur",
    "cls_itemsets3",
    "cls_interval_merge",
    "llm_decontaminate",
    // pseudo-queries handled inside Bench: full RcoEtl.run+load for one
    // site — the direct comparand for BASELINE.md's per-site anchor —
    // and the 3-site heterogeneous fleet (the production entry point)
    Bench.E2E,
    Bench.Fleet)
}
