package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` entry has a matching `oracleSql` DuckDB statement
  * unless the operator is not SQL-expressible (sketch-based dedup,
  * ML scoring) — those get the driver's rows-only check and a
  * ScalaTest determinism/quality spec instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §D dashboard + TPC-H-grade analytics
    "q_total_amount" -> (Analytics.totalAmount _),
    "q_amount_by_priority" -> (Analytics.amountByPriority _),
    "q_count_by_state" -> (Analytics.countByState _),
    "q1_pricing_summary" -> (Analytics.pricingSummary _),
    "q3_shipping_priority" -> (Analytics.shippingPriority _),
    "q5_region_revenue" -> (Analytics.regionRevenue _),
    "q_top_customers_window" -> (Analytics.topCustomersWindow _),
    "q_running_total_window" -> (Analytics.runningTotalWindow _),
    "q_bucketed_amounts" -> (Analytics.bucketedAmounts _),
    "q_distinct_parts" -> (Analytics.distinctParts _),
    "q_pivot_status_month" -> (Analytics.pivotStatusMonth _),
    "q_rollup_priority" -> (Analytics.rollupPriority _),
    "q4_priority_exists" -> (Analytics.priorityExists _),
    "q_cust_no_orders" -> ((s: SparkSession, d: String) =>
      Analytics.lapsedCustomers(s, d)),
    "q17_small_qty_revenue" -> (Analytics.smallQtyRevenue _),
    "q14_promo_share" -> (Analytics.promoShare _),
    "q7_nation_volume" -> (Analytics.nationVolume _),
    "q8_market_share" -> (Analytics.marketShare _),
    "q9_profit_nation" -> (Analytics.profitByNation _),
    "events_funnel" -> (Analytics.eventFunnel _),
    "ml_feature_hash" -> ((s: SparkSession, d: String) => Analytics.featureHash(s, d)),
    "q6_forecast_revenue" -> (Analytics.forecastRevenue _),
    "q10_returned_revenue" -> (Analytics.returnedRevenue _),
    "q13_order_distribution" -> (Analytics.orderDistribution _),
    "q15_top_supplier" -> (Analytics.topSupplier _),
    "q18_large_orders" -> (Analytics.largeOrders _),
    "q19_brand_revenue" -> (Analytics.brandRevenue _),
    "q22_idle_customers" -> (Analytics.idleCustomers _),
    "q2_min_cost_supp" -> (Analytics.minCostSupplier _),
    "q11_important_parts" -> (Analytics.importantParts _),
    "q12_priority_shipping" -> (Analytics.priorityShipping _),
    "q16_supplier_cnt" -> (Analytics.supplierCount _),
    "q20_excess_suppliers" -> (Analytics.excessSuppliers _),
    "q21_waiting_suppliers" -> (Analytics.waitingSuppliers _),
    "q_set_ops_customers" -> (Analytics.setOpsCustomers _),
    "q_percentile_bands" -> (Analytics.percentileBands _),
    "q_string_filters" -> (Analytics.stringFilters _),
    "q_case_agg_by_year" -> (Analytics.caseAggByYear _),
    "q_mom_growth" -> (Analytics.momGrowth _),
    "profile_orders" -> (Profile.profileOrders _),
    // §B medallion
    "ingest_bronze" -> (Medallion.ingestBronze _),
    "silver_clean" -> (Medallion.silverClean _),
    "gold_enrich" -> (Medallion.goldEnrich _),
    // §G dedup
    "dedup_exact" -> (Dedup.exact _),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "dedup_cross_split_leaks" -> ((s: SparkSession, d: String) => Dedup.crossSplitLeaks(s, d)),
    // the production 64-perm/16-band layout in the PORTABLE hash
    // family, so the row is oracle-checked end-to-end (the xxhash64
    // fast path, Dedup.minhashLsh, stays spec-covered)
    "dedup_minhash_lsh" -> ((s: SparkSession, d: String) =>
      Dedup.minhashPortable(s, d, numPerm = 64, bands = 16)),
    "dedup_minhash_portable" -> ((s: SparkSession, d: String) => Dedup.minhashPortable(s, d)),
    "dedup_incremental" -> (Dedup.incrementalScenario _),
    "dedup_incremental_probe" -> (Dedup.incrementalProbeScenario _),
    "dedup_forget" -> (Dedup.forgetScenario _),
    // the 3-block/20-bit maxHamming=2 configuration of the portable
    // kernel — oracle-checked (the xxhash64 64-bit fast path,
    // Dedup.simhash, stays spec-covered)
    "dedup_simhash" -> ((s: SparkSession, d: String) =>
      Dedup.simhashPortable(s, d, maxHamming = 2)),
    "dedup_simhash_portable" -> ((s: SparkSession, d: String) => Dedup.simhashPortable(s, d)),
    "dedup_cluster_survivors" -> ((s: SparkSession, d: String) => Dedup.clusterSurvivors(s, d)),
    "dedup_cluster_best" -> ((s: SparkSession, d: String) => Dedup.clusterSurvivorsByQuality(s, d)),
    "dedup_incremental_clusters" -> (Dedup.incrementalClustersScenario _),
    "dedup_admission" -> (Dedup.admissionScenario _),
    "dedup_admission_gated" -> (Dedup.admissionGatedScenario _),
    "dedup_admission_semantic" -> (Dedup.admissionSemanticScenario _),
    "dedup_window_coverage" -> ((s: SparkSession, d: String) => Dedup.windowDupCoverage(s, d)),
    "stream_curation" -> (graft.streaming.Streams.curationScenario _),
    // §I text analysis
    "text_quality" -> (TextAnalysis.quality _),
    "text_gopher_rules" -> (TextAnalysis.gopherRules _),
    "text_langid" -> (TextAnalysis.langId _),
    "text_token_count" -> (TextAnalysis.tokenCount _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_pii_scrub" -> (TextAnalysis.piiScrub _),
    "text_repetition_ratio" -> (TextAnalysis.repetitionRatio _),
    "text_deterministic_split" -> (TextAnalysis.deterministicSplit _),
    "text_corpus_stats" -> (TextAnalysis.corpusStats _),
    "mv_corpus_stats" -> (TextAnalysis.corpusStatsMaintained _),
    "text_bm25_rank" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bm25Rank(s, d)),
    "text_perplexity" -> (TextAnalysis.textPerplexity _),
    "text_dsir_weight" -> ((s: SparkSession, d: String) =>
      TextAnalysis.dsirWeight(s, d)),
    "text_paragraph_dedup" -> (TextAnalysis.paragraphDedupScenario _),
    "text_heavy_hitters" -> (TextAnalysis.heavyHitterLangs _),
    "sample_stratified" -> (TextAnalysis.sampleStratified _),
    "text_pack_bins" -> ((s: SparkSession, d: String) => TextAnalysis.packBins(s, d)),
    "text_export_shards" -> ((s: SparkSession, d: String) =>
      TextAnalysis.exportShardsManifest(s, d)),
    "text_export_shards_incremental" -> ((s: SparkSession, d: String) =>
      TextAnalysis.exportShardsIncrementalScenario(s, d)),
    "text_export_shards_shuffled" -> ((s: SparkSession, d: String) =>
      TextAnalysis.shardManifest(
        TextAnalysis.exportShardsShuffled(Tables.load(s, d, "documents")))),
    "text_export_shards_shuffled_epoch" -> ((s: SparkSession, d: String) =>
      TextAnalysis.shardManifest(TextAnalysis.exportShardsShuffled(
        Tables.load(s, d, "documents"), seed = 1L))),
    "text_export_shards_bpe" -> ((s: SparkSession, d: String) =>
      TextAnalysis.shardManifest(TextAnalysis.exportShards(
        Tables.load(s, d, "documents"), tokenizer = "bpe"))),
    "text_export_shards_materialized" -> ((s: SparkSession, d: String) =>
      TextAnalysis.exportShardsMaterializedScenario(s, d)),
    "text_pack_sequences" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packSequences(Tables.load(s, d, "documents"))),
    "text_seq_manifest" -> ((s: SparkSession, d: String) =>
      TextAnalysis.seqManifest(Tables.load(s, d, "documents"))),
    "text_pack_sequences_materialized" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packSequencesMaterializedScenario(s, d)),
    "text_pack_incremental" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packSequencesIncrementalScenario(s, d)),
    "text_pack_tokens_materialized" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packTokensMaterializedScenario(s, d)),
    "text_pack_tokens_mixture" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packTokensMixtureScenario(s, d)),
    "text_pack_describe" -> ((s: SparkSession, d: String) =>
      TextAnalysis.describePackScenario(s, d)),
    "text_pack_tokens_vp_incremental" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packTokensVpIncrementalScenario(s, d)),
    "text_pack_tokens_incremental" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packTokensIncrementalScenario(s, d)),
    "text_mixture_resample" -> ((s: SparkSession, d: String) =>
      TextAnalysis.mixtureResampleScenario(s, d)),
    "text_export_shards_mixture" -> ((s: SparkSession, d: String) =>
      TextAnalysis.exportShardsMixtureScenario(s, d)),
    "text_export_shards_mixture_materialized" ->
      ((s: SparkSession, d: String) =>
        TextAnalysis.exportShardsMixtureMaterializedScenario(s, d)),
    "stream_export_shards" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.exportStreamScenario(s, d)),
    "stream_pack_sequences" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.packStreamScenario(s, d)),
    "stream_export_epochs" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.epochExportScenario(s, d)),
    "text_vocab_induct" -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabInduct(s, d)),
    "text_vocab_segment" -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabSegmentScenario(s, d)),
    "text_vocab_segment_ids" -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabSegmentIdsScenario(s, d)),
    "text_vocab_segment_ids_1k" -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabSegmentIds1kScenario(s, d)),
    "text_pack_tokens_vp" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packTokensVpScenario(s, d)),
    "text_pack_tokens_bpemerge" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packTokensBpeMergeScenario(s, d)),
    "text_vocab_coverage" -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabCoverage(s, d)),
    "text_domain_mix" -> (TextAnalysis.domainMix _),
    // §C transactional table layer (GraftTable)
    "tbl_merge_upsert" -> (TableOps.mergeUpsert _),
    "tbl_merge_evolve" -> (TableOps.mergeEvolve _),
    "tbl_merge_sync" -> (TableOps.mergeSync _),
    "tbl_deep_clone" -> (TableOps.deepCloneScenario _),
    "ml_run_ledger" -> (TableOps.runLedgerScenario _),
    "ml_model_registry" -> (TableOps.modelRegistryScenario _),
    "tbl_delete_where" -> (TableOps.deleteWhere _),
    "tbl_bloom_point" -> (TableOps.bloomPointDelete _),
    "tbl_partition_overwrite" -> (TableOps.partitionOverwrite _),
    "tbl_replace_where" -> (TableOps.replaceWhereScenario _),
    "tbl_delete_dv" -> (TableOps.deleteMorScenario _),
    "tbl_update_dv" -> (TableOps.updateMorScenario _),
    "tbl_merge_dv" -> (TableOps.mergeMorScenario _),
    "tbl_delete_dv_purge" -> (TableOps.deleteMorPurge _),
    "tbl_update_where" -> (TableOps.updateWhere _),
    "tbl_time_travel" -> (TableOps.timeTravel _),
    "tbl_compact" -> (TableOps.compactFiles _),
    "tbl_cluster_by" -> (TableOps.clusterByKey _),
    "tbl_history" -> (TableOps.historyLog _),
    "tbl_change_feed" -> (TableOps.changeFeedScenario _),
    "tbl_dsv2_read" -> (TableOps.dsv2Read _),
    "tbl_sql_delete" -> (TableOps.sqlDelete _),
    "tbl_sql_update" -> (TableOps.sqlUpdate _),
    "tbl_sql_merge" -> (TableOps.sqlMerge _),
    "tbl_sql_insert" -> (TableOps.sqlInsert _),
    "tbl_convert_hive" -> (TableOps.convertHive _),
    "tbl_copy_into" -> (TableOps.copyIntoScenario _),
    "tbl_merge_conditional" -> (TableOps.mergeConditional _),
    "tbl_merge_identity" -> (TableOps.mergeIdentity _),
    "mv_incremental" -> (TableOps.mvIncremental _),
    "mv_incremental_avg" -> (TableOps.mvIncrementalAvg _),
    "mv_incremental_approx" -> (TableOps.mvIncrementalApprox _),
    "mv_incremental_minmax" -> (TableOps.mvIncrementalMinMax _),
    "mv_incremental_multi" -> (TableOps.mvIncrementalMulti _),
    "mv_incremental_lineitem" -> (TableOps.mvIncrementalLineitem _),
    "mv_incremental_derived" -> (TableOps.mvIncrementalDerived _),
    "mv_incremental_dim" -> (TableOps.mvIncrementalDim _),
    // §D temporal joins
    "asof_join_events_orders" -> (TemporalJoins.asofEventsOrders _),
    "asof_join_native" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.col
      graft.plans.AsOfJoinNative.join(
        graft.Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
        // defensive flavor alignment: the native as-of join
        // (correctly) refuses mixed timestamp flavors, and the
        // testdata generator has emitted o_orderdate under several
        // parquet encodings across rounds. With Sessions.tune pinning
        // inference to TimestampType the cast is a no-op; under any
        // other session it is micros-exact (UTC session zone).
        graft.Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"))
          .dropDuplicates("o_custkey", "o_orderdate"),
        "user_id", "o_custkey", "ts", "o_orderdate")
    }),
    "range_join_price_band" -> (TemporalJoins.rangeJoinPriceBand _),
    // §E streaming (batch-equivalent forms; streaming twins in specs)
    "stream_windowed_agg" -> (graft.streaming.Streams.windowedAgg _),
    "stream_interval_join" -> (graft.streaming.Streams.intervalJoin _),
    "stream_dedup" -> (graft.streaming.Streams.dedupEvents _),
    "stream_sessionize" -> (graft.streaming.Streams.sessionize _),
    "stream_session_window" -> (graft.streaming.Streams.sessionWindow _),
    // §A sources
    "json_extract_props" -> (graft.sources.Ingest.jsonExtractProps _),
    "ingest_csv_roundtrip" -> (graft.sources.Ingest.csvRoundtrip _),
    "incremental_autoloader" -> (graft.sources.Ingest.incrementalAutoloader _),
    "incremental_evolution" -> (graft.sources.Ingest.autoloaderEvolution _),
    // §H similarity search
    "ann_topk_bruteforce" -> ((s: SparkSession, d: String) => Similarity.annTopKBrute(s, d)),
    "ann_ivf_topk" -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "ann_topk_batch" -> ((s: SparkSession, d: String) => Similarity.annTopKBatch(s, d)),
    "ann_quantized_topk" -> ((s: SparkSession, d: String) => Similarity.annQuantizedTopK(s, d)),
    "ann_pq_topk" -> ((s: SparkSession, d: String) => Similarity.annPqTopK(s, d)),
    "ann_quantized_rerank" -> ((s: SparkSession, d: String) => Similarity.annQuantizedRerank(s, d)),
    "ann_ivf_trained" -> ((s: SparkSession, d: String) => Similarity.annIvfTrained(s, d)),
    "ann_incremental" -> ((s: SparkSession, d: String) => Similarity.annIncremental(s, d)),
    "ann_incremental_serve" -> ((s: SparkSession, d: String) => Similarity.annIncrementalServe(s, d)),
    "ann_sql_lifecycle" -> (Similarity.annSqlLifecycleScenario _),
    "ann_batch_indexed" -> ((s: SparkSession, d: String) =>
      Similarity.annBatchIndexedScenario(s, d)),
    "ann_batch_indexed_pq" -> ((s: SparkSession, d: String) =>
      Similarity.annBatchIndexedPqScenario(s, d)),
    "ann_filtered" -> ((s: SparkSession, d: String) => Similarity.annFilteredScenario(s, d)),
    "ann_filtered_pq" -> ((s: SparkSession, d: String) => Similarity.annFilteredPqScenario(s, d)),
    "embedding_kmeans" -> ((s: SparkSession, d: String) => Similarity.embeddingKmeans(s, d)),
    "dedup_semantic" -> ((s: SparkSession, d: String) => Similarity.semanticDedup(s, d)),
    "dedup_semantic_indexed" -> (Similarity.semanticDedupIndexedScenario _),
    "ann_ivfpq_serve" -> (Similarity.ivfPqServeScenario _),
    "dedup_embedding_cosine" -> ((s: SparkSession, d: String) => Similarity.embeddingNearDup(s, d)),
    // md5-bit hyperplanes + integer projections: the whole LSH
    // replays in the oracle (the xxhash64 fast path,
    // Similarity.embeddingNearDupLsh, stays spec-covered)
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) =>
      Similarity.embeddingNearDupLshPortable(s, d)),
    // §F ML
    "ml_risk_score" -> (graft.ml.RiskPipeline.score _),
    "ml_score_fixed" -> (graft.ml.RiskPipeline.scoreFixed _),
    "ml_threshold_fixed" -> (graft.ml.RiskPipeline.thresholdFixed _),
    "ml_gbt_fixed" -> (graft.ml.RiskPipeline.gbtScoreFixed _),
    "ml_risk_features" -> (graft.ml.RiskPipeline.featureFrame _),
    "ml_confusion_value" -> (graft.ml.RiskPipeline.confusionValue _),
    "feature_store_customer" -> (graft.ml.RiskPipeline.customerFeatures _),
    "feature_store_orders" -> (graft.ml.RiskPipeline.orderFeatures _),
    // §J multimodal
    "multimodal_features" -> (Multimodal.extractFeatures _),
    "multimodal_framesample" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    "multimodal_frame_neardup" -> ((s: SparkSession, d: String) => Multimodal.frameNearDup(s, d)),
    "multimodal_frame_ann" -> ((s: SparkSession, d: String) => Multimodal.frameAnnTopK(s, d)),
    "multimodal_frame_ann_indexed" -> ((s: SparkSession, d: String) =>
      Multimodal.frameAnnIndexedScenario(s, d)),
    "multimodal_frame_ann_pq" -> ((s: SparkSession, d: String) =>
      Multimodal.frameAnnPqScenario(s, d)),
    "multimodal_frame_ann_filtered" -> ((s: SparkSession, d: String) =>
      Multimodal.frameAnnFilteredScenario(s, d)),
  )

  // ---- DuckDB oracle SQL ------------------------------------------------
  // Conventions for bit-exact parity with the Spark plans:
  //  * money aggs: CAST(x AS DECIMAL(12,4)) before SUM, CAST(... AS
  //    DOUBLE) after — exact decimals are order-insensitive, so both
  //    engines produce the identical double.
  //  * DuckDB regexp_replace needs the 'g' flag to match Spark's
  //    replace-all semantics.
  //  * int-typed derivations are CAST to INTEGER to mirror Spark's
  //    int32 results (DuckDB defaults to BIGINT).

  private val decPrice = "CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"

  private val silverSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |  CAST(o_orderstatus <> 'F' AS VARCHAR) AS bad_flag,
      |  CAST(regexp_replace(o_orderpriority, '[^0-9]', '', 'g') AS DOUBLE) AS priority_num,
      |  trim(regexp_replace(o_orderpriority, '^[0-9]+-', '', 'g')) AS priority_label,
      |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |  CAST(year(o_orderdate) - 1995 AS INTEGER) AS years_since_1995
      |FROM orders WHERE o_orderstatus IN ('F','O','P')""".stripMargin

  /** The serve-path scenarios answer from an identical index with an
    * identical result, so the combined scenarios' relational replays
    * check them verbatim.
    */
  def oracleSql: Map[String, String] =
    oracleSqlMain +
      ("ann_incremental_serve" -> oracleSqlMain("ann_incremental")) +
      // the SQL-statement lifecycle builds/ingests/maintains the SAME
      // index state over the same split, so the same replay checks it
      ("ann_sql_lifecycle" -> oracleSqlMain("ann_incremental")) +
      ("dedup_incremental_probe" -> oracleSqlMain("dedup_incremental")) +
      // the maintained clustering's final state over all 3 batches IS
      // the one-shot clustering of the full pair set
      ("dedup_incremental_clusters" ->
        oracleSqlMain("dedup_cluster_survivors")) +
      // the index-riding verdict pass rides the SAME Lloyd geometry
      // as the batch operator, so the same relational replay checks it
      ("dedup_semantic_indexed" -> oracleSqlMain("dedup_semantic")) +
      // the SQL-staged frame index probes EVERY cell, so its served
      // answer is exactly the brute-force frame top-k — the same
      // oracle checks the whole lifecycle, geometry-independent
      ("multimodal_frame_ann_indexed" ->
        oracleSqlMain("multimodal_frame_ann")) +
      // three monotone batches + a replay accumulate to the one-shot
      // export, so the same manifest replay checks the incremental path
      ("text_export_shards_incremental" ->
        oracleSqlMain("text_export_shards")) +
      // the SUBWORD incremental pack (vp measure, pinned full-corpus
      // gram vocab) accumulates to EXACTLY the one-shot subword pack,
      // so its end-to-end replay (induction → rank ids → greedy
      // cursor → prefix sum → slicing → ids_sum) checks the
      // incremental path too
      ("text_pack_tokens_vp_incremental" ->
        oracleSqlMain("text_pack_tokens_vp")) +
      // the non-toy-V encode gate: the identical end-to-end replay
      // with the induction cut at 1000 grams instead of 64
      ("text_vocab_segment_ids_1k" ->
        oracleSqlMain("text_vocab_segment_ids")
          .replace("LIMIT 64", "LIMIT 1000")) +
      // the materialized scenario RE-DERIVES the manifest from the
      // landed shard content (token counts re-run on the written
      // text), so the same replay checks the write's integrity
      ("text_export_shards_materialized" ->
        oracleSqlMain("text_export_shards")) +
      // three streamed cycles accumulate to the one-shot export (the
      // engine's epoch ids ride the exporter's batch-id contract), so
      // the same manifest replay checks the streaming sink
      ("stream_export_shards" -> oracleSqlMain("text_export_shards")) +
      // the materialized pack RE-DERIVES its manifest from the landed
      // sequence text + provenance arrays, so the same per-sequence
      // replay checks the training-batch write's integrity
      ("text_pack_sequences_materialized" ->
        oracleSqlMain("text_seq_manifest")) +
      // the materialized mixture RE-DERIVES its manifest from each
      // copy's landed shard content (token counts re-run on the
      // written text), so the assignment-manifest replay checks the
      // write-receipt end-to-end
      ("text_export_shards_mixture_materialized" ->
        oracleSqlMain("text_export_shards_mixture")) +
      // the all-cells-probed, query-excluding batch serve over the
      // staged index is exactly the brute-force batch, so the same
      // relational top-k replay checks the routed path end-to-end
      ("ann_batch_indexed" -> oracleSqlMain("ann_topk_batch")) +
      // the PQ leg saturates BOTH stages (all cells, shortlist passes
      // everything) so the exact re-rank is brute-force-equivalent —
      // the same replay checks the routed ADC plumbing
      ("ann_batch_indexed_pq" -> oracleSqlMain("ann_topk_batch"))

  /** Portable banded-minhash oracle parameterized by the family's
    * (numPerm, bands) layout — ONE relational replay checks both the
    * 16/4 portable spelling and the production 64/16 layout.
    */
  private def minhashPortableOracleSql(numPerm: Int, bands: Int,
      tau: String): String = {
    val r = numPerm / bands
    s"""WITH w AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
       |  FROM w WHERE len(w) >= 3),
       |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |hp AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x,
       |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 2147483647 AS y
       |  FROM posts),
       |sig AS (
       |  SELECT doc_id, i,
       |    MIN((((i * 1103515245 + 12345) % 2147483647) * x + y) % 2147483647) AS m
       |  FROM hp, (SELECT unnest(range(0, $numPerm)) AS i)
       |  GROUP BY doc_id, i),
       |bandsig AS (
       |  SELECT doc_id, i // $r AS band,
       |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bsig
       |  FROM sig GROUP BY doc_id, i // $r),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandsig a JOIN bandsig b
       |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       |common AS (
       |  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, COUNT(*) AS nc
       |  FROM posts pa JOIN posts pb ON pa.s = pb.s AND pa.doc_id < pb.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh)
       |SELECT c.doc_a, c.doc_b, CAST(nc AS INTEGER) AS n_common,
       |  CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) AS jaccard
       |FROM cand c
       |JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
       |JOIN sizes sa ON c.doc_a = sa.doc_id
       |JOIN sizes sb ON c.doc_b = sb.doc_id
       |WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= $tau""".stripMargin
  }

  /** Portable 60-bit SimHash oracle parameterized by the hamming
    * radius (blocks = maxHamming + 1 by pigeonhole).
    */
  private def simhashPortableOracleSql(maxHamming: Int): String = {
    val nBlocks = maxHamming + 1
    val blockBits = 60 / nBlocks
    val mask = (1L << blockBits) - 1L
    s"""WITH posts AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
       |  FROM posts),
       |bits AS (
       |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM hs, (SELECT unnest(range(0, 60)) AS b)
       |  GROUP BY doc_id, b),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id),
       |blocked AS (
       |  SELECT doc_id, simhash, blk, (simhash >> (blk * $blockBits)) & $mask AS bval
       |  FROM sig, (SELECT unnest(range(0, $nBlocks)) AS blk)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM blocked a JOIN blocked b
       |    ON a.blk = b.blk AND a.bval = b.bval AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHamming""".stripMargin
  }

  private lazy val oracleSqlMain: Map[String, String] = Map(
    "q_total_amount" ->
      "SELECT CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount FROM orders",
    "q_amount_by_priority" ->
      """SELECT o_orderpriority, CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_count_by_state" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty,
         |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_base_price,
         |  CAST(round(SUM($decPrice), 4) AS DOUBLE) AS sum_disc_price,
         |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4)))), 4) AS DOUBLE) AS sum_charge,
         |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(*) AS avg_price,
         |  CAST(round(SUM(CAST(l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(round(SUM($decPrice), 4) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(round(SUM($decPrice), 4) AS DOUBLE) AS revenue
         |FROM lineitem, orders, supplier, customer, nation, region
         |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |  AND o_custkey = c_custkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "q_top_customers_window" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_mktsegment, rank, o_custkey, revenue FROM (
        |  SELECT c_mktsegment, o_custkey, revenue,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY revenue DESC, o_custkey) AS INTEGER) AS rank
        |  FROM rev JOIN customer ON o_custkey = c_custkey)
        |WHERE rank <= 3""".stripMargin,
    "q_running_total_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total
        |FROM orders""".stripMargin,
    "q_bucketed_amounts" ->
      """SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) * 1000 AS amount_bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY 1""".stripMargin,
    "q_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_pivot_status_month" ->
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1""".stripMargin,
    "q_rollup_priority" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "ingest_bronze" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority, 'orders_raw' AS src_table FROM orders""".stripMargin,
    "silver_clean" -> silverSql,
    "gold_enrich" ->
      s"""WITH silver AS ($silverSql),
         |charges AS (
         |  SELECT l_orderkey, SUM($decPrice) AS line_charges
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT s.*,
         |  trim(regexp_replace(o_orderpriority, '1-URGENT|2-HIGH', 'EXPEDITED', 'g')) AS priority_group,
         |  CAST(round(COALESCE(c.line_charges, 0) - CAST(o_totalprice AS DECIMAL(12,4)), 2) AS DOUBLE) AS net
         |FROM silver s LEFT JOIN charges c ON s.o_orderkey = c.l_orderkey""".stripMargin,
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash, COUNT(*) AS n_copies
        |FROM documents WHERE text IS NOT NULL GROUP BY md5(text)""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(n_common AS INTEGER) AS n_common,
        |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        |FROM common
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6""".stripMargin,
    "dedup_cluster_survivors" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM common
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6),
        |undirected AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        |  UNION
        |  SELECT e.u, r.label FROM undirected e JOIN reach r ON e.v = r.u)
        |SELECT u AS doc_id, MIN(label) AS cluster_id,
        |  CAST(u = MIN(label) AS INTEGER) AS is_survivor
        |FROM reach GROUP BY u""".stripMargin,
    "dedup_cluster_best" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM common
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6),
        |undirected AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        |  UNION
        |  SELECT e.u, r.label FROM undirected e JOIN reach r ON e.v = r.u),
        |lab AS (SELECT u AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY u),
        |nw AS (
        |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words
        |  FROM documents),
        |best AS (
        |  SELECT cluster_id, doc_id AS best_id FROM (
        |    SELECT l.cluster_id, l.doc_id,
        |      row_number() OVER (PARTITION BY l.cluster_id
        |        ORDER BY n.n_words DESC, l.doc_id) AS rn
        |    FROM lab l JOIN nw n ON l.doc_id = n.doc_id) WHERE rn = 1)
        |SELECT d.doc_id,
        |  COALESCE(b.best_id, d.doc_id) AS survivor_id,
        |  CAST(COALESCE(b.best_id, d.doc_id) = d.doc_id AS INTEGER) AS is_best
        |FROM documents d
        |LEFT JOIN lab l ON d.doc_id = l.doc_id
        |LEFT JOIN best b ON l.cluster_id = b.cluster_id""".stripMargin,
    "dedup_cross_split_leaks" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b,
        |    CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        |  FROM common
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6),
        |splits AS (
        |  SELECT doc_id,
        |    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
        |         WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT doc_a, doc_b, x.split AS split_a, y.split AS split_b, jaccard
        |FROM pairs JOIN splits x ON doc_a = x.doc_id
        |           JOIN splits y ON doc_b = y.doc_id
        |WHERE x.split <> y.split""".stripMargin,
    "dedup_minhash_portable" -> minhashPortableOracleSql(16, 4, "0.6"),
    // the SAME relational replay at the production 64/16 layout
    "dedup_minhash_lsh" -> minhashPortableOracleSql(64, 16, "0.6"),
    "dedup_simhash" -> simhashPortableOracleSql(2),
    // md5-bit hyperplanes over 10^6-scaled integer projections (a
    // float projection sum would be order-sensitive in the last ULP
    // and could flip borderline sign bits between engines), banded
    // 4×4, exact cosine verification with the family's rounding
    "dedup_embedding_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, len(embedding) + 1)])) AS nrm
        |  FROM embeddings),
        |posts AS (
        |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS d,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
        |  FROM (SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i
        |        FROM e)),
        |hp AS (
        |  SELECT vec_id, vq,
        |    CAST(concat('0x', substr(md5(CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM posts),
        |proj AS (
        |  SELECT vec_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN vq ELSE -vq END) AS p
        |  FROM hp, (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS j)
        |  GROUP BY vec_id, j),
        |bandsig AS (
        |  SELECT vec_id, j // 4 AS band,
        |    string_agg(CASE WHEN p >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bsig
        |  FROM proj GROUP BY vec_id, j // 4),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT c.vec_a, c.vec_b,
        |    list_sum([CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE) for i in range(1, len(ea.embedding) + 1)]) /
        |      (ea.nrm * eb.nrm) AS cs
        |  FROM cand c JOIN e ea ON c.vec_a = ea.vec_id
        |              JOIN e eb ON c.vec_b = eb.vec_id)
        |SELECT vec_a, vec_b,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored
        |WHERE CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) >= 0.3""".stripMargin,
    // incremental probe ≡ the batch family restricted to pairs
    // touching the incremental batch (doc_id % 5 = 0)
    "dedup_incremental" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |hp AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x,
        |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 2147483647 AS y
        |  FROM posts),
        |sig AS (
        |  SELECT doc_id, i,
        |    MIN((((i * 1103515245 + 12345) % 2147483647) * x + y) % 2147483647) AS m
        |  FROM hp, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY doc_id, i),
        |bandsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bsig
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
        |common AS (
        |  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, COUNT(*) AS nc
        |  FROM posts pa JOIN posts pb ON pa.s = pb.s AND pa.doc_id < pb.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh)
        |SELECT c.doc_a, c.doc_b, CAST(nc AS INTEGER) AS n_common,
        |  CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) AS jaccard
        |FROM cand c
        |JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
        |JOIN sizes sa ON c.doc_a = sa.doc_id
        |JOIN sizes sb ON c.doc_b = sb.doc_id
        |WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= 0.6""".stripMargin,
    // forget ≡ the incremental probe against a corpus that never
    // held the forgotten slice (doc_id % 10 = 1, indexed docs only):
    // the same relational replay minus those documents
    "dedup_forget" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents WHERE doc_id % 10 <> 1),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |hp AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x,
        |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 2147483647 AS y
        |  FROM posts),
        |sig AS (
        |  SELECT doc_id, i,
        |    MIN((((i * 1103515245 + 12345) % 2147483647) * x + y) % 2147483647) AS m
        |  FROM hp, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY doc_id, i),
        |bandsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bsig
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
        |common AS (
        |  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, COUNT(*) AS nc
        |  FROM posts pa JOIN posts pb ON pa.s = pb.s AND pa.doc_id < pb.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh)
        |SELECT c.doc_a, c.doc_b, CAST(nc AS INTEGER) AS n_common,
        |  CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) AS jaccard
        |FROM cand c
        |JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
        |JOIN sizes sa ON c.doc_a = sa.doc_id
        |JOIN sizes sb ON c.doc_b = sb.doc_id
        |WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= 0.6""".stripMargin,
    "dedup_admission" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |hp AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x,
        |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 2147483647 AS y
        |  FROM posts),
        |sig AS (
        |  SELECT doc_id, i,
        |    MIN((((i * 1103515245 + 12345) % 2147483647) * x + y) % 2147483647) AS m
        |  FROM hp, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY doc_id, i),
        |bandsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bsig
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
        |common AS (
        |  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, COUNT(*) AS nc
        |  FROM posts pa JOIN posts pb ON pa.s = pb.s AND pa.doc_id < pb.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |pairs AS (
        |  SELECT c.doc_a, c.doc_b FROM cand c
        |  JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
        |  JOIN sizes sa ON c.doc_a = sa.doc_id
        |  JOIN sizes sb ON c.doc_b = sb.doc_id
        |  WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= 0.6),
        |undirected AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        |  UNION
        |  SELECT e.u, r.label FROM undirected e JOIN reach r ON e.v = r.u),
        |lab AS (SELECT u AS doc_id, MIN(label) AS root FROM reach GROUP BY u),
        |batch AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0)
        |SELECT b.doc_id,
        |  COALESCE(l.root, b.doc_id) AS canonical_id,
        |  CASE WHEN COALESCE(l.root, b.doc_id) = b.doc_id
        |    THEN 'keep' ELSE 'drop' END AS action
        |FROM batch b LEFT JOIN lab l ON b.doc_id = l.doc_id""".stripMargin,
    "dedup_admission_gated" ->
      """WITH RECURSIVE docs0 AS (
        |  SELECT * FROM documents WHERE n_chars >= 100),
        |w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM docs0),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |hp AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x,
        |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 2147483647 AS y
        |  FROM posts),
        |sig AS (
        |  SELECT doc_id, i,
        |    MIN((((i * 1103515245 + 12345) % 2147483647) * x + y) % 2147483647) AS m
        |  FROM hp, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY doc_id, i),
        |bandsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bsig
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
        |common AS (
        |  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, COUNT(*) AS nc
        |  FROM posts pa JOIN posts pb ON pa.s = pb.s AND pa.doc_id < pb.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |pairs AS (
        |  SELECT c.doc_a, c.doc_b FROM cand c
        |  JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
        |  JOIN sizes sa ON c.doc_a = sa.doc_id
        |  JOIN sizes sb ON c.doc_b = sb.doc_id
        |  WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= 0.6),
        |undirected AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        |  UNION
        |  SELECT e.u, r.label FROM undirected e JOIN reach r ON e.v = r.u),
        |lab AS (SELECT u AS doc_id, MIN(label) AS root FROM reach GROUP BY u),
        |batch AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 5 = 0)
        |SELECT b.doc_id,
        |  CASE WHEN NOT COALESCE(b.n_chars >= 100, FALSE) THEN b.doc_id
        |    ELSE COALESCE(l.root, b.doc_id) END AS canonical_id,
        |  CASE WHEN NOT COALESCE(b.n_chars >= 100, FALSE) THEN 'reject'
        |    WHEN COALESCE(l.root, b.doc_id) = b.doc_id THEN 'keep'
        |    ELSE 'drop' END AS action
        |FROM batch b LEFT JOIN lab l ON b.doc_id = l.doc_id""".stripMargin,
    "dedup_admission_semantic" ->
      """WITH RECURSIVE docs0 AS (
        |  SELECT * FROM documents WHERE n_chars >= 100),
        |w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM docs0),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |hp AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x,
        |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 2147483647 AS y
        |  FROM posts),
        |sig AS (
        |  SELECT doc_id, i,
        |    MIN((((i * 1103515245 + 12345) % 2147483647) * x + y) % 2147483647) AS m
        |  FROM hp, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY doc_id, i),
        |bandsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bsig
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
        |common AS (
        |  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, COUNT(*) AS nc
        |  FROM posts pa JOIN posts pb ON pa.s = pb.s AND pa.doc_id < pb.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |lexpairs AS (
        |  SELECT c.doc_a, c.doc_b FROM cand c
        |  JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
        |  JOIN sizes sa ON c.doc_a = sa.doc_id
        |  JOIN sizes sb ON c.doc_b = sb.doc_id
        |  WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= 0.6),
        |qe AS (
        |  SELECT e.vec_id, e.embedding,
        |    [CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) for i in range(1, len(e.embedding) + 1)] AS qv
        |  FROM embeddings e JOIN docs0 d ON e.vec_id = d.doc_id),
        |dim AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
        |seedq AS (SELECT * FROM qe WHERE vec_id % 5 <> 0),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id, qv AS cent
        |  FROM (SELECT vec_id, qv FROM seedq ORDER BY vec_id LIMIT 16)),
        |a1 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i]) for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM seedq e, c0 c) WHERE rn = 1),
        |c1 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a1 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a2 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i]) for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM seedq e, c1 c) WHERE rn = 1),
        |c2 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a2 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a3 AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT e.vec_id, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i]) for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c2 c) WHERE rn = 1),
        |ae AS (
        |  SELECT a3.vec_id, a3.cent_id, qe.embedding
        |  FROM a3 JOIN qe ON a3.vec_id = qe.vec_id),
        |semraw AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(b.embedding) + 1)]))) AS cs
        |  FROM ae a JOIN ae b ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id % 5 = 0),
        |sempairs AS (
        |  SELECT DISTINCT least(va, vb) AS doc_a, greatest(va, vb) AS doc_b
        |  FROM semraw
        |  WHERE CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) >= 0.3),
        |allpairs AS (
        |  SELECT doc_a, doc_b FROM lexpairs
        |  UNION SELECT doc_a, doc_b FROM sempairs),
        |undirected AS (
        |  SELECT doc_a AS u, doc_b AS v FROM allpairs
        |  UNION ALL SELECT doc_b, doc_a FROM allpairs),
        |reach(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        |  UNION
        |  SELECT e.u, r.label FROM undirected e JOIN reach r ON e.v = r.u),
        |lab AS (SELECT u AS doc_id, MIN(label) AS root FROM reach GROUP BY u),
        |batch AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 5 = 0)
        |SELECT b.doc_id,
        |  CASE WHEN NOT COALESCE(b.n_chars >= 100, FALSE) THEN b.doc_id
        |    ELSE COALESCE(l.root, b.doc_id) END AS canonical_id,
        |  CASE WHEN NOT COALESCE(b.n_chars >= 100, FALSE) THEN 'reject'
        |    WHEN COALESCE(l.root, b.doc_id) = b.doc_id THEN 'keep'
        |    ELSE 'drop' END AS action
        |FROM batch b LEFT JOIN lab l ON b.doc_id = l.doc_id""".stripMargin,
    "stream_curation" ->
      """WITH RECURSIVE base AS (
        |  SELECT * FROM documents WHERE doc_id % 2 = 0),
        |w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM base),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |hp AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x,
        |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 2147483647 AS y
        |  FROM posts),
        |sig AS (
        |  SELECT doc_id, i,
        |    MIN((((i * 1103515245 + 12345) % 2147483647) * x + y) % 2147483647) AS m
        |  FROM hp, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY doc_id, i),
        |bandsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bsig
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
        |common AS (
        |  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, COUNT(*) AS nc
        |  FROM posts pa JOIN posts pb ON pa.s = pb.s AND pa.doc_id < pb.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |pairs AS (
        |  SELECT c.doc_a, c.doc_b FROM cand c
        |  JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
        |  JOIN sizes sa ON c.doc_a = sa.doc_id
        |  JOIN sizes sb ON c.doc_b = sb.doc_id
        |  WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= 0.6),
        |u1 AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  WHERE doc_a % 5 <> 0 AND doc_b % 5 <> 0
        |  UNION ALL SELECT doc_b, doc_a FROM pairs
        |  WHERE doc_a % 5 <> 0 AND doc_b % 5 <> 0),
        |reach1(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM u1)
        |  UNION
        |  SELECT e.u, r.label FROM u1 e JOIN reach1 r ON e.v = r.u),
        |lab1 AS (SELECT u AS doc_id, MIN(label) AS root FROM reach1 GROUP BY u),
        |uall AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach2(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM uall)
        |  UNION
        |  SELECT e.u, r.label FROM uall e JOIN reach2 r ON e.v = r.u),
        |lab2 AS (SELECT u AS doc_id, MIN(label) AS root FROM reach2 GROUP BY u),
        |curated AS (
        |  SELECT d.doc_id FROM base d LEFT JOIN lab1 l ON d.doc_id = l.doc_id
        |  WHERE d.doc_id % 5 <> 0 AND d.doc_id = COALESCE(l.root, d.doc_id)
        |  UNION ALL
        |  SELECT d.doc_id FROM base d LEFT JOIN lab2 l ON d.doc_id = l.doc_id
        |  WHERE d.doc_id % 5 = 0 AND d.doc_id = COALESCE(l.root, d.doc_id))
        |SELECT c.doc_id, d.n_chars
        |FROM curated c JOIN base d ON c.doc_id = d.doc_id""".stripMargin,
    "dedup_simhash_portable" -> simhashPortableOracleSql(3),
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_m,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS INTEGER) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS INTEGER) AS n_punct,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it|for)\b')) AS INTEGER) AS n_stop,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS INTEGER) AS n_word_chars,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it|for)\b')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z0-9]+')), 1) AS stopword_ratio,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z0-9]+')), 1) AS avg_word_len,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) BETWEEN 5 AND 10000
        |    AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) / greatest(length(text), 1) < 0.3
        |    AS INTEGER) AS keep_flag
        |FROM documents""".stripMargin,
    "text_gopher_rules" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_words,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS INTEGER) AS n_nonspace_chars,
        |    CAST(len(regexp_extract_all(text, '#'))
        |      + len(regexp_extract_all(text, '\.\.\.'))
        |      + len(regexp_extract_all(text, '…')) AS INTEGER) AS n_symbols,
        |    CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS INTEGER) AS n_alpha_words,
        |    CAST(len(string_split(text, chr(10))) AS INTEGER) AS n_lines,
        |    CAST(len(regexp_extract_all(text, '(?m)^\s*[-*•]')) AS INTEGER) AS n_bullet_lines,
        |    CAST(len(regexp_extract_all(text, '(?m)(\.\.\.|…)$')) AS INTEGER) AS n_ellipsis_lines
        |  FROM documents)
        |SELECT doc_id, n_words, n_nonspace_chars, n_symbols,
        |  n_alpha_words, n_lines, n_bullet_lines, n_ellipsis_lines,
        |  CAST(n_nonspace_chars AS DOUBLE) / greatest(n_words, 1) AS mean_word_len,
        |  CAST(n_symbols AS DOUBLE) / greatest(n_words, 1) AS symbol_ratio,
        |  CAST(n_alpha_words AS DOUBLE) / greatest(n_words, 1) AS alpha_word_frac,
        |  CAST(n_bullet_lines AS DOUBLE) / greatest(n_lines, 1) AS bullet_frac,
        |  CAST(n_ellipsis_lines AS DOUBLE) / greatest(n_lines, 1) AS ellipsis_frac,
        |  CAST(n_words >= 50 AND n_words <= 100000
        |    AND CAST(n_nonspace_chars AS DOUBLE) / greatest(n_words, 1) >= 3.0
        |    AND CAST(n_nonspace_chars AS DOUBLE) / greatest(n_words, 1) <= 10.0
        |    AND CAST(n_symbols AS DOUBLE) / greatest(n_words, 1) < 0.1
        |    AND CAST(n_bullet_lines AS DOUBLE) / greatest(n_lines, 1) < 0.9
        |    AND CAST(n_ellipsis_lines AS DOUBLE) / greatest(n_lines, 1) < 0.3
        |    AND CAST(n_alpha_words AS DOUBLE) / greatest(n_words, 1) > 0.8
        |    AS INTEGER) AS gopher_flag
        |FROM m""".stripMargin,
    "text_langid" ->
      """SELECT doc_id, lang AS lang_tagged,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|is|in|that|with)\b')) AS INTEGER) AS s_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS INTEGER) AS s_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|avec)\b')) AS INTEGER) AS s_fr,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|es|en|que|con)\b')) AS INTEGER) AS s_es,
        |  CASE
        |    WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
        |    WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
        |    WHEN s_fr >= s_es THEN 'fr'
        |    ELSE 'es' END AS lang_pred
        |FROM (SELECT doc_id, lang, text,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|is|in|that|with)\b')) AS s_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS s_de,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|avec)\b')) AS s_fr,
        |  len(regexp_extract_all(lower(text), '\b(el|los|las|es|en|que|con)\b')) AS s_es
        |  FROM documents)""".stripMargin,
    "mv_corpus_stats" ->
      """WITH del AS (
        |  SELECT * FROM documents
        |  WHERE NOT (n_chars > 900 AND doc_id % 3 = 0)),
        |app AS (
        |  SELECT doc_id + 100000000 AS doc_id, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 10 = 7),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (n_chars < 50)),
        |tok AS (
        |  SELECT source, lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS tokens,
        |    n_chars
        |  FROM live)
        |SELECT source, lang,
        |  CAST(round(SUM(CAST(tokens AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_tokens,
        |  CAST(round(SUM(CAST(n_chars AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_n_chars,
        |  COUNT(*) AS n_rows,
        |  CAST(round(MIN(CAST(tokens AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_tokens,
        |  CAST(round(MAX(CAST(tokens AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_tokens,
        |  CAST(round(MIN(CAST(n_chars AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_n_chars,
        |  CAST(round(MAX(CAST(n_chars AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_n_chars,
        |  COUNT(DISTINCT n_chars // 100) AS adc_len_centile
        |FROM tok GROUP BY source, lang""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS INTEGER) AS bpe_tokens
        |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16) AS fingerprint
        |FROM documents""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_cust_no_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey AS ap,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN pa ON l_partkey = ap
        |WHERE l_quantity < avg_qty * 0.5""".stripMargin,
    "q14_promo_share" ->
      """SELECT 100.0 *
        |  CAST(round(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
        |    ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) /
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE)
        |  AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "events_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT ev.user_id, MIN(ev.ts) AS t2 FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ev.ts > s1.t1 GROUP BY ev.user_id),
        |s3 AS (SELECT ev.user_id, MIN(ev.ts) AS t3 FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ev.ts > s2.t2 GROUP BY ev.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM s1
        |UNION ALL SELECT '2_view_click', COUNT(*) FROM s2
        |UNION ALL SELECT '3_full_funnel', COUNT(*) FROM s3""".stripMargin,
    "ml_feature_hash" ->
      """WITH f AS (
        |  SELECT unnest(['priority=' || o_orderpriority,
        |                 'segment=' || c_mktsegment,
        |                 'status=' || o_orderstatus]) AS feat
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT CAST(CAST(concat('0x', substr(md5(feat), 1, 15)) AS BIGINT) % 64 AS INTEGER) AS bucket,
        |  COUNT(*) AS n
        |FROM f GROUP BY 1""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        |   OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin,
    "q8_market_share" ->
      """WITH x AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, ns.n_name AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS v
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE')
        |SELECT o_year,
        |  CAST(round(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) /
        |  CAST(round(SUM(v), 4) AS DOUBLE) AS mkt_share
        |FROM x GROUP BY o_year""".stripMargin,
    "q9_profit_nation" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, year(l_shipdate)""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(l_discount AS DECIMAL(5,4))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q10_returned_revenue" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(round(SUM($decPrice), 4) AS DOUBLE) AS revenue
         |FROM lineitem, orders, customer, nation
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(round(SUM($decPrice), 4) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""".stripMargin,
    "q18_large_orders" ->
      """WITH heavy AS (
        |  SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM heavy, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_brand_revenue" ->
      s"""SELECT CAST(round(SUM($decPrice), 4) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_idle_customers" ->
      """WITH avg_bal AS (
        |  SELECT CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 4) AS DOUBLE)
        |    / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, COUNT(*) AS numcust,
        |  CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 4) AS DOUBLE) AS totacctbal
        |FROM customer, nation, avg_bal
        |WHERE c_nationkey = n_nationkey AND c_acctbal > avg_bal
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY n_name""".stripMargin,
    "q2_min_cost_supp" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(12,4))) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |europe AS (
        |  SELECT supply.*, s_acctbal, s_name, n_name
        |  FROM supply, supplier, nation, region
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |min_cost AS (
        |  SELECT l_partkey AS mc_partkey, MIN(cost) AS mc
        |  FROM europe GROUP BY l_partkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  CAST(round(cost, 4) AS DOUBLE) AS cost
        |FROM europe, min_cost, part
        |WHERE l_partkey = mc_partkey AND cost = mc
        |  AND l_partkey = p_partkey AND p_size <= 15 AND p_type = 'STANDARD'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 10""".stripMargin,
    "q11_important_parts" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS part_value
        |  FROM lineitem, supplier, nation, region
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  GROUP BY l_partkey)
        |SELECT l_partkey,
        |  CAST(round(part_value, 4) AS DOUBLE) AS part_value
        |FROM per_part
        |WHERE part_value * (SELECT COUNT(*) FROM per_part)
        |  > (SELECT SUM(part_value) FROM per_part) * 2""".stripMargin,
    "q12_priority_shipping" ->
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 END) AS low_line_count
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs, part
        |WHERE l_partkey = p_partkey
        |  AND p_brand <> 'Brand#15' AND p_type <> 'PROMO'
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem, part
        |  WHERE l_partkey = p_partkey AND p_name LIKE 'small%'),
        |per_pair AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(12,4))) AS pair_qty
        |  FROM shipped GROUP BY l_partkey, l_suppkey),
        |per_part AS (
        |  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,4))) AS part_qty,
        |    COUNT(DISTINCT l_suppkey) AS n_supp
        |  FROM shipped GROUP BY l_partkey)
        |SELECT s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT DISTINCT pp.l_suppkey FROM per_pair pp, per_part pt
        |  WHERE pp.l_partkey = pt.l_partkey
        |    AND pp.pair_qty * pt.n_supp > pt.part_qty * 2)""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH fli AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
        |  WHERE l_orderkey IN
        |    (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')),
        |per_order AS (
        |  SELECT l_orderkey, MAX(l_shipdate) AS max_shipdate,
        |    COUNT(DISTINCT l_suppkey) AS n_suppliers
        |  FROM fli GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2),
        |latest AS (
        |  SELECT f.l_orderkey, f.l_suppkey FROM fli f, per_order g
        |  WHERE f.l_orderkey = g.l_orderkey AND f.l_shipdate = g.max_shipdate),
        |unique_late AS (
        |  SELECT l_orderkey FROM latest GROUP BY l_orderkey
        |  HAVING COUNT(DISTINCT l_suppkey) = 1)
        |SELECT s_name, COUNT(*) AS numwait FROM
        |  (SELECT DISTINCT l_orderkey, l_suppkey FROM latest
        |   WHERE l_orderkey IN (SELECT l_orderkey FROM unique_late)) w,
        |  supplier
        |WHERE w.l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,
    "q_set_ops_customers" ->
      """SELECT 'both' AS grp, COUNT(*) AS n FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |UNION ALL
        |SELECT 'only_1996', COUNT(*) FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)""".stripMargin,
    "q_percentile_bands" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  CAST(round(SUM(CASE WHEN rn = (n + 1) // 2 OR rn = n // 2 + 1
        |    THEN CAST(o_totalprice AS DECIMAL(12,4)) END), 4) AS DOUBLE) /
        |  SUM(CASE WHEN rn = (n + 1) // 2 OR rn = n // 2 + 1 THEN 1 END) AS median_price,
        |  CAST(round(SUM(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
        |    THEN CAST(o_totalprice AS DECIMAL(12,4)) END), 4) AS DOUBLE) AS p90_price
        |FROM ranked GROUP BY o_orderpriority""".stripMargin,
    "q_string_filters" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |  CAST(round(SUM(CAST(p_retailprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_retail
        |FROM part WHERE p_name LIKE 'small%' OR p_name LIKE '%bolt'
        |GROUP BY p_brand""".stripMargin,
    "q_case_agg_by_year" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(round(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) AS fulfilled_amount,
        |  CAST(round(SUM(CASE WHEN o_orderstatus <> 'F' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) AS open_amount,
        |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
        |FROM orders GROUP BY year(o_orderdate)""".stripMargin,
    "q_mom_growth" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue,
        |  lag(revenue) OVER (ORDER BY month) AS prev_revenue,
        |  (revenue - lag(revenue) OVER (ORDER BY month))
        |    / lag(revenue) OVER (ORDER BY month) AS mom_growth
        |FROM m""".stripMargin,
    "tbl_history" ->
      """SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'CREATE'),
        |  (CAST(1 AS BIGINT), 'DELETE'), (CAST(2 AS BIGINT), 'COMPACT'))
        |  t(version, operation)""".stripMargin,
    "text_heavy_hitters" ->
      """SELECT lang AS item, COUNT(*) AS cnt FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang LIMIT 5""".stripMargin,
    "text_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
        |      '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
        |    '\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b', '[PHONE]', 'g') AS text_scrubbed
        |FROM documents""".stripMargin,
    "text_repetition_ratio" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest([concat_ws(' ', w[i], w[i+1], w[i+2])
        |    for i in range(1, len(w) - 1)]) AS shingle
        |  FROM w WHERE len(w) >= 3),
        |cnt AS (
        |  SELECT doc_id, shingle, COUNT(*) AS c FROM sh GROUP BY 1, 2)
        |SELECT doc_id, CAST(MAX(c) AS INTEGER) AS max_rep,
        |  CAST(SUM(c) AS INTEGER) AS n_shingles,
        |  CAST(MAX(c) AS DOUBLE) / SUM(c) AS rep_ratio
        |FROM cnt GROUP BY doc_id""".stripMargin,
    "text_deterministic_split" ->
      """SELECT doc_id,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, source,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS residue
        |FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 <
        |  CASE WHEN lang = 'en' THEN 400
        |       WHEN lang IN ('fr', 'de') THEN 700
        |       ELSE 1000 END""".stripMargin,
    "text_pack_bins" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d)
        |SELECT lang, CAST(FLOOR(tokens_before / 2048) AS BIGINT) AS bin_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY lang, CAST(FLOOR(tokens_before / 2048) AS BIGINT)""".stripMargin,
    // shard export: GLOBAL exclusive token cumsum over doc_id order,
    // shard = tokens_before div budget (the Spark plan computes it as
    // a distributed bucket-prefix sum — value-identical, spec-pinned)
    "text_export_shards" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d)
        |SELECT CAST(tokens_before // 2048 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY tokens_before // 2048""".stripMargin,
    // sequence packing: per-doc span over the seqLen=512 cuts of the
    // concatenated stream — pure integer arithmetic on the cumsum
    // (the GREATEST guard keeps a zero-token doc a one-seq span);
    // every output CASTs because the window SUM is HUGEINT in DuckDB
    "text_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d)
        |SELECT doc_id, n_tokens,
        |  CAST(tokens_before AS BIGINT) AS tokens_before,
        |  CAST(tokens_before // 512 AS BIGINT) AS start_seq,
        |  CAST(tokens_before % 512 AS BIGINT) AS start_offset,
        |  CAST((tokens_before + GREATEST(n_tokens, 1) - 1) // 512 AS BIGINT) AS end_seq,
        |  CAST((tokens_before + GREATEST(n_tokens, 1) - 1) // 512
        |    - tokens_before // 512 + 1 AS BIGINT) AS n_seqs
        |FROM c""".stripMargin,
    // per-sequence manifest: each doc unnests to the sequences it
    // overlaps; fill = intersection of the doc's token interval with
    // the sequence's [seq*512, (seq+1)*512) window
    "text_seq_manifest" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d),
        |s AS (
        |  SELECT doc_id, n_tokens, CAST(tokens_before AS BIGINT) AS tokens_before,
        |    CAST(UNNEST(generate_series(CAST(tokens_before // 512 AS BIGINT),
        |      CAST((tokens_before + n_tokens - 1) // 512 AS BIGINT))) AS BIGINT) AS seq_id
        |  FROM c WHERE n_tokens > 0)
        |SELECT seq_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(LEAST((seq_id + 1) * 512, tokens_before + n_tokens)
        |    - GREATEST(seq_id * 512, tokens_before)) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM s GROUP BY seq_id""".stripMargin,
    // the STREAMING pack accumulates to EXACTLY the one-shot manifest
    // (the exactly-once export sink at budget = seqLen IS the pack's
    // continuation state) — same replay as text_seq_manifest
    "stream_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d),
        |s AS (
        |  SELECT doc_id, n_tokens, CAST(tokens_before AS BIGINT) AS tokens_before,
        |    CAST(UNNEST(generate_series(CAST(tokens_before // 512 AS BIGINT),
        |      CAST((tokens_before + n_tokens - 1) // 512 AS BIGINT))) AS BIGINT) AS seq_id
        |  FROM c WHERE n_tokens > 0)
        |SELECT seq_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(LEAST((seq_id + 1) * 512, tokens_before + n_tokens)
        |    - GREATEST(seq_id * 512, tokens_before)) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM s GROUP BY seq_id""".stripMargin,
    // the incremental pack accumulates to EXACTLY the one-shot
    // manifest (doc_id-monotone batches + stored-offset continuation)
    // — same replay as text_seq_manifest
    "text_pack_incremental" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d),
        |s AS (
        |  SELECT doc_id, n_tokens, CAST(tokens_before AS BIGINT) AS tokens_before,
        |    CAST(UNNEST(generate_series(CAST(tokens_before // 512 AS BIGINT),
        |      CAST((tokens_before + n_tokens - 1) // 512 AS BIGINT))) AS BIGINT) AS seq_id
        |  FROM c WHERE n_tokens > 0)
        |SELECT seq_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(LEAST((seq_id + 1) * 512, tokens_before + n_tokens)
        |    - GREATEST(seq_id * 512, tokens_before)) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM s GROUP BY seq_id""".stripMargin,
    // token-ID sequence packing: the vocabulary ranks the top 512
    // whole tokens by (count desc, token), ids 1..512 by row_number,
    // UNK = 0; every token maps individually to its seqLen=128 cut of
    // the global stream, so the per-sequence rollup (counts + id
    // checksum) replays the id lookup AND the slicing relationally
    "text_pack_tokens_materialized" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d),
        |tok AS (
        |  SELECT doc_id, tokens_before, UNNEST(toks) AS token,
        |    CAST(UNNEST(generate_series(1, CAST(len(toks) AS INT))) AS BIGINT) AS pos
        |  FROM c WHERE n_tokens > 0),
        |vc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        |vocab AS (
        |  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS id
        |  FROM vc ORDER BY cnt DESC, token LIMIT 512),
        |ids AS (
        |  SELECT t.doc_id, t.tokens_before, t.pos, COALESCE(v.id, 0) AS id
        |  FROM tok t LEFT JOIN vocab v USING (token)),
        |st AS (
        |  SELECT doc_id, tokens_before,
        |    CAST((tokens_before + pos - 1) // 128 AS BIGINT) AS seq_id, id
        |  FROM ids),
        |sd AS (
        |  SELECT seq_id, doc_id, tokens_before, COUNT(*) AS n_tok, SUM(id) AS s_ids
        |  FROM st GROUP BY seq_id, doc_id, tokens_before)
        |SELECT seq_id, CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  CAST(SUM(s_ids) AS BIGINT) AS ids_sum,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM sd GROUP BY seq_id""".stripMargin,
    // the INCREMENTAL token pack accumulates to EXACTLY the one-shot
    // token-ID artifact (pinned full-corpus vocab + stored-offset
    // continuation + read-side fragment assembly) — the same replay
    // as text_pack_tokens_materialized
    "text_pack_tokens_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d),
        |tok AS (
        |  SELECT doc_id, tokens_before, UNNEST(toks) AS token,
        |    CAST(UNNEST(generate_series(1, CAST(len(toks) AS INT))) AS BIGINT) AS pos
        |  FROM c WHERE n_tokens > 0),
        |vc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        |vocab AS (
        |  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS id
        |  FROM vc ORDER BY cnt DESC, token LIMIT 512),
        |ids AS (
        |  SELECT t.doc_id, t.tokens_before, t.pos, COALESCE(v.id, 0) AS id
        |  FROM tok t LEFT JOIN vocab v USING (token)),
        |st AS (
        |  SELECT doc_id, tokens_before,
        |    CAST((tokens_before + pos - 1) // 128 AS BIGINT) AS seq_id, id
        |  FROM ids),
        |sd AS (
        |  SELECT seq_id, doc_id, tokens_before, COUNT(*) AS n_tok, SUM(id) AS s_ids
        |  FROM st GROUP BY seq_id, doc_id, tokens_before)
        |SELECT seq_id, CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  CAST(SUM(s_ids) AS BIGINT) AS ids_sum,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM sd GROUP BY seq_id""".stripMargin,
    // DESCRIBE PACK serves the O(1) summary sidecar; the oracle
    // re-aggregates the token-pack replay from scratch — landed
    // totals checked against an independent recomputation
    "text_pack_describe" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d),
        |tok AS (
        |  SELECT doc_id, tokens_before, UNNEST(toks) AS token,
        |    CAST(UNNEST(generate_series(1, CAST(len(toks) AS INT))) AS BIGINT) AS pos
        |  FROM c WHERE n_tokens > 0),
        |vc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        |vocab AS (
        |  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS id
        |  FROM vc ORDER BY cnt DESC, token LIMIT 512),
        |st AS (
        |  SELECT CAST((t.tokens_before + t.pos - 1) // 128 AS BIGINT) AS seq_id,
        |    COALESCE(v.id, 0) AS id
        |  FROM tok t LEFT JOIN vocab v USING (token))
        |SELECT 'tokens' AS form, 'ws' AS tokenizer,
        |  CAST(128 AS BIGINT) AS seq_len,
        |  CAST((SELECT COUNT(*) FROM vocab) AS BIGINT) AS vocab_size,
        |  CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_sequences,
        |  CAST(COUNT(*) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(id) AS BIGINT) AS ids_sum
        |FROM st""".stripMargin,
    // the COMPLETE mixture training artifact: reps → md5 coin →
    // per-copy permutation → cumsum (the mixture replay) composed
    // with the id lookup + per-token sequence mapping (the token-pack
    // replay) — each copy's token stream joins the base corpus's
    // per-token id/position table, every token maps to its seq cut
    "text_pack_tokens_mixture" ->
      """WITH d AS (
        |  SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS toks,
        |    CAST(concat('0x', substr(md5(concat('mix0:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, toks,
        |    CASE lang
        |      WHEN 'en' THEN 0 + CASE WHEN h < 576460752303423488 THEN 1 ELSE 0 END
        |      WHEN 'zh' THEN 2 + CASE WHEN h < 288230376151711744 THEN 1 ELSE 0 END
        |      WHEN 'es' THEN 3
        |      WHEN 'fr' THEN 0
        |      ELSE 1 END AS n_reps
        |  FROM d),
        |x AS (
        |  SELECT doc_id, toks, CAST(UNNEST(generate_series(0, n_reps - 1)) AS BIGINT) AS rep
        |  FROM r WHERE n_reps > 0),
        |p AS (
        |  SELECT doc_id, rep, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(concat('0x', substr(md5(concat('mixshuf0:', CAST(doc_id AS VARCHAR), ':', CAST(rep AS VARCHAR))), 1, 15)) AS BIGINT) AS h2
        |  FROM x),
        |c AS (
        |  SELECT doc_id, rep, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY h2, doc_id, rep
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM p),
        |tok AS (
        |  SELECT doc_id, UNNEST(toks) AS token,
        |    CAST(UNNEST(generate_series(1, CAST(len(toks) AS INT))) AS BIGINT) AS pos
        |  FROM d WHERE len(toks) > 0),
        |vc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        |vocab AS (
        |  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS id
        |  FROM vc ORDER BY cnt DESC, token LIMIT 512),
        |ids AS (
        |  SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS id
        |  FROM tok t LEFT JOIN vocab v USING (token)),
        |st AS (
        |  SELECT c.doc_id, c.rep, c.tokens_before,
        |    CAST((c.tokens_before + i.pos - 1) // 128 AS BIGINT) AS seq_id, i.id
        |  FROM c JOIN ids i ON c.doc_id = i.doc_id),
        |sd AS (
        |  SELECT seq_id, doc_id, rep, tokens_before, COUNT(*) AS n_tok, SUM(id) AS s_ids
        |  FROM st GROUP BY seq_id, doc_id, rep, tokens_before)
        |SELECT seq_id, CAST(COUNT(*) AS INTEGER) AS n_copies,
        |  CAST(SUM(n_tok) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  CAST(SUM(s_ids) AS BIGINT) AS ids_sum,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM sd GROUP BY seq_id""".stripMargin,
    // mixture resampling: the md5 coin (residue < frac * 2^60) and
    // the per-domain repetition counts replay exactly — thresholds
    // are 0.5 * 2^60 (en) and 0.25 * 2^60 (zh), es fixed 3, fr
    // dropped, default 1 (de)
    "text_mixture_resample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(concat('mix0:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    CASE lang
        |      WHEN 'en' THEN 0 + CASE WHEN h < 576460752303423488 THEN 1 ELSE 0 END
        |      WHEN 'zh' THEN 2 + CASE WHEN h < 288230376151711744 THEN 1 ELSE 0 END
        |      WHEN 'es' THEN 3
        |      WHEN 'fr' THEN 0
        |      ELSE 1 END AS n_reps
        |  FROM d)
        |SELECT doc_id, lang,
        |  CAST(UNNEST(generate_series(0, n_reps - 1)) AS BIGINT) AS rep
        |FROM r WHERE n_reps > 0""".stripMargin,
    // the mixture pipeline exit: reps unnest, every (doc, rep) copy
    // draws an independent md5 position, global-window cumsum over
    // that permutation, manifest per 2048-token shard
    "text_export_shards_mixture" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(concat('0x', substr(md5(concat('mix0:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    CASE lang
        |      WHEN 'en' THEN 0 + CASE WHEN h < 576460752303423488 THEN 1 ELSE 0 END
        |      WHEN 'zh' THEN 2 + CASE WHEN h < 288230376151711744 THEN 1 ELSE 0 END
        |      WHEN 'es' THEN 3
        |      WHEN 'fr' THEN 0
        |      ELSE 1 END AS n_reps
        |  FROM d),
        |x AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(UNNEST(generate_series(0, n_reps - 1)) AS BIGINT) AS rep
        |  FROM r WHERE n_reps > 0),
        |p AS (
        |  SELECT doc_id, rep, n_tokens,
        |    CAST(concat('0x', substr(md5(concat('mixshuf0:', CAST(doc_id AS VARCHAR), ':', CAST(rep AS VARCHAR))), 1, 15)) AS BIGINT) AS h2
        |  FROM x),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY h2, doc_id, rep
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM p)
        |SELECT CAST(tokens_before // 2048 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_copies,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY tokens_before // 2048""".stripMargin,
    // the bpe-tokenizer budget measure: same pack plan, the GPT-2ish
    // pre-tokenization regex as the per-doc count
    "text_export_shards_bpe" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d)
        |SELECT CAST(tokens_before // 2048 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY tokens_before // 2048""".stripMargin,
    // the seed-1 EPOCH reshuffle: same global-window replay over the
    // '1:'-prefixed md5 permutation
    "text_export_shards_shuffled_epoch" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(concat('0x', substr(md5(concat('1:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d)
        |SELECT CAST(tokens_before // 2048 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY tokens_before // 2048""".stripMargin,
    // shuffle-then-pack: the cumsum runs over the (md5(doc_id),
    // doc_id) permutation — the oracle's GLOBAL window over that
    // order IS the equivalence check for the hash-bucket-aligned
    // distributed spelling
    "text_export_shards_shuffled" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM d)
        |SELECT CAST(tokens_before // 2048 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY tokens_before // 2048""".stripMargin,
    // the streaming epoch export: each requested epoch lands the
    // full seed-reshuffled pack exactly-once — the oracle replays
    // both permutations (epoch 0 = bare md5, epoch 1 = '1:' prefix)
    // and unions the per-(epoch, shard) manifests
    "stream_export_epochs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |e0 AS (
        |  SELECT 0 AS epoch, doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM (SELECT doc_id, n_tokens,
        |      CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |    FROM d) t0),
        |e1 AS (
        |  SELECT 1 AS epoch, doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM (SELECT doc_id, n_tokens,
        |      CAST(concat('0x', substr(md5(concat('1:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        |    FROM d) t1),
        |u AS (SELECT * FROM e0 UNION ALL SELECT * FROM e1)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  CAST(tokens_before // 2048 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM u GROUP BY epoch, tokens_before // 2048""".stripMargin,
    // vocabulary induction: word-internal char n-grams scored by
    // coverage (count * (len-1)), deterministic top-V cut by
    // (score desc, gram)
    "text_vocab_induct" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        |  FROM documents),
        |w2 AS (
        |  SELECT word, n FROM w CROSS JOIN (SELECT UNNEST([2,3,4,5]) AS n) t
        |  WHERE length(word) >= n),
        |g AS (
        |  SELECT substr(word, CAST(UNNEST(generate_series(1, length(word) - n + 1)) AS INT), CAST(n AS INT)) AS gram
        |  FROM w2)
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(COUNT(*) * (length(gram) - 1) AS BIGINT) AS score
        |FROM g GROUP BY gram ORDER BY score DESC, gram LIMIT 64""".stripMargin,
    // APPLYING the induced vocabulary: the greedy longest-match
    // WordPiece encode replays as a recursive CTE — each DISTINCT
    // word's cursor advances by the longest induced gram that fits
    // (5→2), else one character; vp_tokens sums the per-word counts
    // back over every word instance
    "text_vocab_segment" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        |  FROM documents),
        |wu AS (SELECT DISTINCT word FROM w),
        |g AS (
        |  SELECT gram FROM (
        |    SELECT substr(word, CAST(UNNEST(generate_series(1, length(word) - n + 1)) AS INT), CAST(n AS INT)) AS gram
        |    FROM (SELECT word, n FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents) t0
        |          CROSS JOIN (SELECT UNNEST([2,3,4,5]) AS n) t WHERE length(word) >= n))
        |  GROUP BY gram ORDER BY COUNT(*) * (length(gram) - 1) DESC, gram LIMIT 64),
        |seg AS (
        |  SELECT word, CAST(1 AS INT) AS pos, CAST(0 AS BIGINT) AS cnt FROM wu
        |  UNION ALL
        |  SELECT word, pos + step, cnt + 1 FROM (
        |    SELECT word, pos, cnt,
        |      CASE WHEN length(word) - pos + 1 >= 5 AND substr(word, pos, 5) IN (SELECT gram FROM g) THEN 5
        |           WHEN length(word) - pos + 1 >= 4 AND substr(word, pos, 4) IN (SELECT gram FROM g) THEN 4
        |           WHEN length(word) - pos + 1 >= 3 AND substr(word, pos, 3) IN (SELECT gram FROM g) THEN 3
        |           WHEN length(word) - pos + 1 >= 2 AND substr(word, pos, 2) IN (SELECT gram FROM g) THEN 2
        |           ELSE 1 END AS step
        |    FROM seg WHERE pos <= length(word))),
        |done AS (SELECT word, cnt FROM seg WHERE pos > length(word))
        |SELECT d.doc_id, CAST(COALESCE(SUM(s.cnt), 0) AS BIGINT) AS vp_tokens
        |FROM documents d
        |LEFT JOIN w ON d.doc_id = w.doc_id
        |LEFT JOIN done s ON w.word = s.word
        |GROUP BY d.doc_id""".stripMargin,
    // the greedy encode EMITTING IDS: the same recursive cursor, now
    // carrying each step's matched PIECE; ids from the rank order of
    // the induced grams (row_number over score desc, gram — exactly
    // gramVocab's assignment), single-char fallbacks to 0
    "text_vocab_segment_ids" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        |  FROM documents),
        |wu AS (SELECT DISTINCT word FROM w),
        |g AS (
        |  SELECT gram, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, gram) AS BIGINT) AS id
        |  FROM (
        |    SELECT gram, COUNT(*) * (length(gram) - 1) AS score FROM (
        |      SELECT substr(word, CAST(UNNEST(generate_series(1, length(word) - n + 1)) AS INT), CAST(n AS INT)) AS gram
        |      FROM (SELECT word, n FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents) t0
        |            CROSS JOIN (SELECT UNNEST([2,3,4,5]) AS n) t WHERE length(word) >= n))
        |    GROUP BY gram ORDER BY score DESC, gram LIMIT 64)),
        |seg AS (
        |  SELECT word, CAST(1 AS INT) AS pos, CAST(0 AS INT) AS seg_idx, '' AS piece FROM wu
        |  UNION ALL
        |  SELECT word, pos + step, seg_idx + 1, substr(word, pos, step) FROM (
        |    SELECT word, pos, seg_idx,
        |      CASE WHEN length(word) - pos + 1 >= 5 AND substr(word, pos, 5) IN (SELECT gram FROM g) THEN 5
        |           WHEN length(word) - pos + 1 >= 4 AND substr(word, pos, 4) IN (SELECT gram FROM g) THEN 4
        |           WHEN length(word) - pos + 1 >= 3 AND substr(word, pos, 3) IN (SELECT gram FROM g) THEN 3
        |           WHEN length(word) - pos + 1 >= 2 AND substr(word, pos, 2) IN (SELECT gram FROM g) THEN 2
        |           ELSE 1 END AS step
        |    FROM seg WHERE pos <= length(word))),
        |pieces AS (
        |  SELECT s.word, s.seg_idx, COALESCE(g.id, 0) AS id
        |  FROM seg s LEFT JOIN g ON s.piece = g.gram
        |  WHERE s.seg_idx >= 1),
        |wsum AS (SELECT word, COUNT(*) AS n_segs, SUM(id) AS s_ids FROM pieces GROUP BY word)
        |SELECT d.doc_id, CAST(COALESCE(SUM(u.n_segs), 0) AS BIGINT) AS vp_tokens,
        |  CAST(COALESCE(SUM(u.s_ids), 0) AS BIGINT) AS ids_sum
        |FROM documents d
        |LEFT JOIN w ON d.doc_id = w.doc_id
        |LEFT JOIN wsum u ON w.word = u.word
        |GROUP BY d.doc_id""".stripMargin,
    // the SUBWORD pack: gram induction + ranked ids + greedy cursor
    // (the segment-id replay above) composed with the doc_id-ordered
    // prefix sum and the per-token sequence mapping — the landed
    // subword id arrays checked end to end via the ids_sum checksum
    "text_pack_tokens_vp" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word,
        |    CAST(UNNEST(generate_series(1, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT))) AS BIGINT) AS widx
        |  FROM documents),
        |wu AS (SELECT DISTINCT word FROM w),
        |g AS (
        |  SELECT gram, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, gram) AS BIGINT) AS id
        |  FROM (
        |    SELECT gram, COUNT(*) * (length(gram) - 1) AS score FROM (
        |      SELECT substr(word, CAST(UNNEST(generate_series(1, length(word) - n + 1)) AS INT), CAST(n AS INT)) AS gram
        |      FROM (SELECT word, n FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents) t0
        |            CROSS JOIN (SELECT UNNEST([2,3,4,5]) AS n) t WHERE length(word) >= n))
        |    GROUP BY gram ORDER BY score DESC, gram LIMIT 64)),
        |seg AS (
        |  SELECT word, CAST(1 AS INT) AS pos, CAST(0 AS INT) AS seg_idx, '' AS piece FROM wu
        |  UNION ALL
        |  SELECT word, pos + step, seg_idx + 1, substr(word, pos, step) FROM (
        |    SELECT word, pos, seg_idx,
        |      CASE WHEN length(word) - pos + 1 >= 5 AND substr(word, pos, 5) IN (SELECT gram FROM g) THEN 5
        |           WHEN length(word) - pos + 1 >= 4 AND substr(word, pos, 4) IN (SELECT gram FROM g) THEN 4
        |           WHEN length(word) - pos + 1 >= 3 AND substr(word, pos, 3) IN (SELECT gram FROM g) THEN 3
        |           WHEN length(word) - pos + 1 >= 2 AND substr(word, pos, 2) IN (SELECT gram FROM g) THEN 2
        |           ELSE 1 END AS step
        |    FROM seg WHERE pos <= length(word))),
        |pieces AS (
        |  SELECT s.word, s.seg_idx, COALESCE(g.id, 0) AS id
        |  FROM seg s LEFT JOIN g ON s.piece = g.gram
        |  WHERE s.seg_idx >= 1),
        |wsum AS (SELECT word, COUNT(*) AS n_segs FROM pieces GROUP BY word),
        |wo AS (
        |  SELECT w.doc_id, w.word, w.widx, u.n_segs,
        |    COALESCE(SUM(u.n_segs) OVER (PARTITION BY w.doc_id ORDER BY w.widx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS segs_before_word
        |  FROM w JOIN wsum u USING (word)),
        |dt AS (SELECT doc_id, SUM(n_segs) AS n_tokens FROM wo GROUP BY doc_id),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM dt),
        |tok AS (
        |  SELECT wo.doc_id, c.tokens_before,
        |    wo.segs_before_word + p.seg_idx AS pos, p.id
        |  FROM wo JOIN pieces p ON wo.word = p.word
        |  JOIN c ON wo.doc_id = c.doc_id),
        |st AS (
        |  SELECT doc_id, tokens_before,
        |    CAST((tokens_before + pos - 1) // 128 AS BIGINT) AS seq_id, id
        |  FROM tok),
        |sd AS (
        |  SELECT seq_id, doc_id, tokens_before, COUNT(*) AS n_tok, SUM(id) AS s_ids
        |  FROM st GROUP BY seq_id, doc_id, tokens_before)
        |SELECT seq_id, CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  CAST(SUM(s_ids) AS BIGINT) AS ids_sum,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM sd GROUP BY seq_id""".stripMargin,
    // the MERGE-ORDER BPE pack: the FIXED literal tokenizer spec
    // (36 base symbols + 18 merges in training order — the same
    // literal the Spark scenario embeds) applied by an independent
    // replay of the merge state machine — a recursive cursor over
    // (merge_idx, scan position) carrying (current symbols, emitted,
    // pending) with training's pending-fuse convention — then the id
    // lookup, the doc_id-ordered prefix sum and the per-token
    // sequence mapping: the landed merge-order id arrays checked end
    // to end via the ids_sum checksum
    "text_pack_tokens_bpemerge" ->
      ("""WITH RECURSIVE w AS (
        |  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word,
        |    CAST(UNNEST(generate_series(1, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT))) AS BIGINT) AS widx
        |  FROM documents),
        |wu AS (SELECT DISTINCT word FROM w),
        |v(token, id) AS (VALUES """.stripMargin +
        (('a' to 'z') ++ ('0' to '9')).zipWithIndex
          .map { case (c, i) => s"('$c',${i + 1})" }.mkString(",") + "," +
        Seq("th" -> 37, "the" -> 38, "in" -> 39, "er" -> 40,
          "an" -> 41, "on" -> 42, "re" -> 43, "at" -> 44, "en" -> 45,
          "or" -> 46, "es" -> 47, "ti" -> 48, "and" -> 49,
          "ing" -> 50, "tion" -> 51, "ed" -> 52, "so" -> 53,
          "ort" -> 54)
          .map { case (t, i) => s"('$t',$i)" }.mkString(",") + """),
        |m(m_idx, a, b) AS (VALUES """.stripMargin +
        Seq("t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r",
          "a" -> "n", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
          "o" -> "r", "e" -> "s", "t" -> "i", "an" -> "d", "in" -> "g",
          "ti" -> "on", "e" -> "d", "s" -> "o", "or" -> "t")
          .zipWithIndex
          .map { case ((a, b), i) => s"($i,'$a','$b')" }
          .mkString(",") + """),
        |enc AS (
        |  SELECT word, 0 AS m_idx, CAST(1 AS INT) AS pos, string_split(word,'') AS cur,
        |    CAST([] AS VARCHAR[]) AS out, CAST(NULL AS VARCHAR) AS pend
        |  FROM wu
        |  UNION ALL
        |  SELECT word,
        |    CASE WHEN pos <= len(cur) THEN e.m_idx ELSE e.m_idx + 1 END,
        |    CASE WHEN pos <= len(cur) THEN pos + 1 ELSE 1 END,
        |    CASE WHEN pos <= len(cur) THEN cur
        |         ELSE (CASE WHEN pend IS NULL THEN out ELSE list_append(out, pend) END) END,
        |    CASE WHEN pos <= len(cur) THEN
        |         (CASE WHEN pend = a AND cur[pos] = b THEN list_append(out, a || b)
        |               WHEN pend IS NULL THEN out
        |               ELSE list_append(out, pend) END)
        |         ELSE CAST([] AS VARCHAR[]) END,
        |    CASE WHEN pos <= len(cur) THEN
        |         (CASE WHEN pend = a AND cur[pos] = b THEN NULL ELSE cur[pos] END)
        |         ELSE NULL END
        |  FROM enc e JOIN m ON m.m_idx = e.m_idx
        |  WHERE e.m_idx < 18),
        |fin AS (SELECT word, cur FROM enc WHERE m_idx = 18 AND pos = 1),
        |pieces AS (
        |  SELECT word, CAST(UNNEST(generate_series(1, CAST(len(cur) AS INT))) AS INT) AS seg_idx,
        |    UNNEST(cur) AS piece
        |  FROM fin),
        |pid AS (
        |  SELECT p.word, p.seg_idx, COALESCE(v.id, 0) AS id
        |  FROM pieces p LEFT JOIN v ON p.piece = v.token),
        |wsum AS (SELECT word, COUNT(*) AS n_segs FROM pid GROUP BY word),
        |wo AS (
        |  SELECT w.doc_id, w.word, w.widx, u.n_segs,
        |    COALESCE(SUM(u.n_segs) OVER (PARTITION BY w.doc_id ORDER BY w.widx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS segs_before_word
        |  FROM w JOIN wsum u USING (word)),
        |dt AS (SELECT doc_id, SUM(n_segs) AS n_tokens FROM wo GROUP BY doc_id),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM dt),
        |tok AS (
        |  SELECT wo.doc_id, c.tokens_before,
        |    wo.segs_before_word + p.seg_idx AS pos, p.id
        |  FROM wo JOIN pid p ON wo.word = p.word
        |  JOIN c ON wo.doc_id = c.doc_id),
        |st AS (
        |  SELECT doc_id, tokens_before,
        |    CAST((tokens_before + pos - 1) // 128 AS BIGINT) AS seq_id, id
        |  FROM tok),
        |sd AS (
        |  SELECT seq_id, doc_id, tokens_before, COUNT(*) AS n_tok, SUM(id) AS s_ids
        |  FROM st GROUP BY seq_id, doc_id, tokens_before)
        |SELECT seq_id, CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS filled_tokens,
        |  CAST(SUM(CASE WHEN tokens_before < seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in,
        |  CAST(SUM(s_ids) AS BIGINT) AS ids_sum,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM sd GROUP BY seq_id""".stripMargin),
    // vocabulary coverage: the top-512 whole-token vocab's per-lang
    // OOV accounting — exact integer counts, one double quotient
    "text_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT lang, UNNEST(regexp_extract_all(text, '\S+')) AS token
        |  FROM documents),
        |vc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        |vocab AS (
        |  SELECT token FROM vc ORDER BY cnt DESC, token LIMIT 512),
        |j AS (
        |  SELECT lang, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tok t LEFT JOIN vocab v USING (token))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS total_tokens,
        |  CAST(SUM(oov) AS BIGINT) AS oov_tokens,
        |  CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
        |FROM j GROUP BY lang""".stripMargin,
    "text_corpus_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars,
        |  CAST(SUM(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS total_ws_tokens,
        |  CAST(SUM(CAST(length(text) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents GROUP BY lang, source""".stripMargin,
    "text_bm25_rank" ->
      """WITH tl AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl,
        |    CAST(SUM(CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
        |    CAST(SUM(CASE WHEN list_contains(w, 'join') THEN 1 ELSE 0 END) AS DOUBLE) AS df_join,
        |    CAST(SUM(CASE WHEN list_contains(w, 'filter') THEN 1 ELSE 0 END) AS DOUBLE) AS df_filter
        |  FROM tl)
        |SELECT doc_id, round(
        |    ln((n_docs - df_spark + 0.5) / (df_spark + 0.5) + 1.0)
        |      * (CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) * 2.2)
        |      / (CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE)
        |         + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
        |  + ln((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0)
        |      * (CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE) * 2.2)
        |      / (CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE)
        |         + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
        |  + ln((n_docs - df_filter + 0.5) / (df_filter + 0.5) + 1.0)
        |      * (CAST(len(list_filter(w, x -> x = 'filter')) AS DOUBLE) * 2.2)
        |      / (CAST(len(list_filter(w, x -> x = 'filter')) AS DOUBLE)
        |         + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
        |  , 8) AS score
        |FROM tl, stats
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // exact-substring dup coverage: fixed-L token windows, content-
    // matched corpus-wide through a 120-bit md5 key pair (the
    // hash-keyed shuffle the Spark plan uses — replayed, not assumed),
    // per-doc covered-position accounting
    "dedup_window_coverage" ->
      """WITH tl AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS i,
        |    CAST(concat('0x', substr(md5(array_to_string(w[i:i+9], ' ')), 1, 15)) AS BIGINT) AS h1,
        |    CAST(concat('0x', substr(md5(array_to_string(w[i:i+9], ' ')), 16, 15)) AS BIGINT) AS h2
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 8)) AS i
        |        FROM tl WHERE len(w) >= 10)),
        |dup AS (SELECT h1, h2 FROM win GROUP BY h1, h2 HAVING COUNT(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, i + d.d AS pos
        |  FROM win JOIN dup USING (h1, h2),
        |    (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS d) d),
        |agg AS (SELECT doc_id, COUNT(*) AS n_covered FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(a.n_covered, 0) AS BIGINT) AS n_covered,
        |  CAST(COALESCE(a.n_covered, 0) AS DOUBLE) /
        |    CAST(greatest(len(w), 1) AS DOUBLE) AS dup_frac
        |FROM tl t LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // RefinedWeb keep-first line dedup over the synthesized two-line
    // corpus: first occurrence by min (doc_id, idx) per 120-bit
    // md5-keyed line (the hash-keyed shuffle replayed, not assumed);
    // short lines (< 16 chars) carry NULL keys and keep everywhere
    "text_paragraph_dedup" ->
      """WITH src AS (
        |  SELECT d.doc_id, concat(d.text, chr(10), s.text) AS text
        |  FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 50),
        |ls AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM src),
        |l AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS idx, ls[i] AS line
        |      FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
        |            FROM ls)),
        |h AS (SELECT doc_id, idx, line,
        |    CASE WHEN len(line) >= 16 THEN
        |      CAST(concat('0x', substr(md5(line), 1, 15)) AS BIGINT) END AS h1,
        |    CASE WHEN len(line) >= 16 THEN
        |      CAST(concat('0x', substr(md5(line), 16, 15)) AS BIGINT) END AS h2
        |  FROM l),
        |f AS (SELECT h1, h2, doc_id AS fdoc, idx AS fidx FROM (
        |    SELECT h1, h2, doc_id, idx, row_number() OVER (
        |      PARTITION BY h1, h2 ORDER BY doc_id, idx) AS rn
        |    FROM h WHERE h1 IS NOT NULL) WHERE rn = 1),
        |kept AS (SELECT h.doc_id, h.idx, h.line
        |  FROM h LEFT JOIN f ON h.h1 = f.h1 AND h.h2 = f.h2
        |  WHERE f.fdoc IS NULL OR (f.fdoc = h.doc_id AND f.fidx = h.idx)),
        |r AS (SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY idx) AS clean_text,
        |    COUNT(*) AS kept FROM kept GROUP BY doc_id)
        |SELECT s.doc_id, COALESCE(r.clean_text, '') AS clean_text,
        |  CAST(len(str_split(s.text, chr(10))) - COALESCE(r.kept, 0)
        |    AS INTEGER) AS n_removed
        |FROM src s LEFT JOIN r USING (doc_id)""".stripMargin,
    // DSIR hashed-feature importance: md5-residue token buckets,
    // add-one-smoothed log-ratios rounded to decimal, exact decimal
    // dot per doc, one double quotient at the end
    "text_dsir_weight" ->
      """WITH posts AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 1024 AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        |        FROM documents)),
        |raw_cnt AS (SELECT b, COUNT(*) AS c_raw FROM posts GROUP BY b),
        |tgt_cnt AS (SELECT b, COUNT(*) AS c_tgt FROM posts
        |            WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT COUNT(*) AS n_raw,
        |          SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt
        |        FROM posts),
        |ratios AS (
        |  SELECT r.b,
        |    CAST(round(ln((CAST(COALESCE(t.c_tgt, 0) + 1 AS DOUBLE) /
        |        CAST(n_tgt + 1024 AS DOUBLE)) /
        |      (CAST(r.c_raw + 1 AS DOUBLE) /
        |        CAST(n_raw + 1024 AS DOUBLE))), 12) AS DECIMAL(20,12)) AS rr
        |  FROM raw_cnt r LEFT JOIN tgt_cnt t ON r.b = t.b, tot),
        |db AS (SELECT doc_id, b, COUNT(*) AS n FROM posts GROUP BY doc_id, b)
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  round(CAST(SUM(CAST(n AS DECIMAL(10,0)) * rr) AS DOUBLE) /
        |    CAST(greatest(SUM(n), 1) AS DOUBLE), 6) AS weight
        |FROM db JOIN ratios USING (b) GROUP BY doc_id""".stripMargin,
    // bigram-LM perplexity: exact integer counts, per-pair ln terms
    // rounded to DECIMAL(28,12) before the (order-insensitive) sum,
    // mean as one double quotient — bit-exact across engines
    "text_perplexity" ->
      """WITH tl AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |posts AS (
        |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM tl
        |        WHERE len(w) >= 2)),
        |uni AS (
        |  SELECT t AS w1, COUNT(*) AS c1
        |  FROM (SELECT unnest(w) AS t FROM tl) GROUP BY t),
        |vocab AS (
        |  SELECT COUNT(DISTINCT t) AS v
        |  FROM (SELECT unnest(w) AS t FROM tl)),
        |bi AS (
        |  SELECT w1, w2, COUNT(*) AS c2 FROM posts GROUP BY w1, w2),
        |terms AS (
        |  SELECT p.doc_id,
        |    CAST(round(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)), 12)
        |      AS DECIMAL(28,12)) AS t
        |  FROM posts p JOIN bi USING (w1, w2) JOIN uni USING (w1), vocab)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  round(-CAST(SUM(t) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS nll
        |FROM terms GROUP BY doc_id""".stripMargin,
    // domain-mix solver: weights w=idx%4+1, binding domain caps the
    // total (t_star), ppm rates sample via the md5 residue — all
    // integer arithmetic, bit-exact across engines
    "text_domain_mix" ->
      """WITH dom AS (
        |  SELECT source, COUNT(*) AS avail_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS avail_chars,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 4 + 1 AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM dom),
        |tstar AS (
        |  SELECT MIN((avail_chars * w_total) // w) AS t_star FROM dom, tot),
        |plan AS (
        |  SELECT d.source, d.w, d.avail_docs, d.avail_chars,
        |    (d.w * t.t_star) // tt.w_total AS need_chars,
        |    (((d.w * t.t_star) // tt.w_total) * 1000000) // d.avail_chars
        |      AS rate_ppm
        |  FROM dom d, tstar t, tot tt)
        |SELECT p.source, p.w, p.avail_docs, p.avail_chars, p.need_chars,
        |  p.rate_ppm, COUNT(*) AS picked_docs,
        |  CAST(SUM(doc.n_chars) AS BIGINT) AS picked_chars,
        |  CAST(SUM(doc.doc_id) AS BIGINT) AS picked_docid_sum
        |FROM documents doc JOIN plan p ON doc.source = p.source
        |WHERE CAST(concat('0x', substr(md5(CAST(doc.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |    % 1000000 < p.rate_ppm
        |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin,
    // §C — final table state after each DML scenario
    "tbl_merge_upsert" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT * FROM src
        |UNION ALL
        |SELECT o.* FROM orders o ANTI JOIN src s ON o.o_orderkey = s.o_orderkey""".stripMargin,
    // merge-on-read merge: matched 'F' rows delete, other matched
    // rows take the source's bumped price, fresh keys insert
    "tbl_merge_dv" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT s.* FROM src s JOIN orders o ON o.o_orderkey = s.o_orderkey
        |WHERE o.o_orderstatus <> 'F'
        |UNION ALL
        |SELECT s.* FROM src s ANTI JOIN orders o ON o.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT o.* FROM orders o ANTI JOIN src s ON o.o_orderkey = s.o_orderkey""".stripMargin,
    // schema-evolving merge: the source-only o_channel column joins
    // the schema; pre-merge rows surface null for it
    "tbl_merge_evolve" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority,
        |    'online' AS o_channel
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority, 'batch'
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT * FROM src
        |UNION ALL
        |SELECT o.*, CAST(NULL AS VARCHAR) AS o_channel
        |FROM orders o ANTI JOIN src s ON o.o_orderkey = s.o_orderkey""".stripMargin,
    // sync merge: matched rows take the source version, fresh source
    // keys insert, unmatched 'O' rows downgrade priority, unmatched
    // 'P' rows delete (the BY SOURCE clauses), 'F' strays survive
    "tbl_merge_sync" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice + 500.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 1000 = 0)
        |SELECT * FROM src
        |UNION ALL
        |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
        |  o.o_orderdate,
        |  CASE WHEN o.o_orderstatus = 'O' THEN '5-LOW'
        |       ELSE o.o_orderpriority END AS o_orderpriority
        |FROM orders o ANTI JOIN src s ON o.o_orderkey = s.o_orderkey
        |WHERE o.o_orderstatus <> 'P'""".stripMargin,
    // the deep clone is self-contained: after source DELETE + compact
    // + vacuum, the clone still reads the ORIGINAL state
    "tbl_deep_clone" -> "SELECT * FROM orders",
    "ml_run_ledger" ->
      """SELECT * FROM (VALUES
        |  ('run-001', '{"estimator":"lr","maxIter":"10"}',
        |   '{"auc":"0.61"}', '/models/run-001'),
        |  ('run-002', '{"estimator":"gbt"}',
        |   '{"auc":"0.58"}', '/models/run-002'))
        |  AS t(run_id, params, metrics, model_path)""".stripMargin,
    "ml_model_registry" ->
      """SELECT * FROM (VALUES
        |  ('best', 'gbt', 'run-002', 0.58),
        |  ('best', 'lr', 'run-004', 0.71),
        |  ('latest', 'gbt', 'run-002', 0.58),
        |  ('latest', 'lr', 'run-005', 0.60))
        |  AS t(view, estimator, run_id, auc)""".stripMargin,
    "tbl_delete_where" ->
      """SELECT * FROM orders
        |WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)""".stripMargin,
    "tbl_bloom_point" ->
      """SELECT * FROM orders
        |WHERE o_orderkey <> (SELECT min(o_orderkey) FROM orders)""".stripMargin,
    "tbl_partition_overwrite" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'P' THEN 0.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    "tbl_replace_where" ->
      """SELECT * FROM orders
        |WHERE o_orderstatus <> 'F' OR o_orderkey % 2 = 0""".stripMargin,
    "tbl_delete_dv" ->
      """SELECT * FROM orders
        |WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)
        |  AND NOT (o_totalprice < 5000.0)""".stripMargin,
    "tbl_delete_dv_purge" ->
      """SELECT * FROM orders
        |WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)
        |  AND NOT (o_totalprice < 5000.0)""".stripMargin,
    // sequential MoR updates: the price bump first, then the priority
    // downgrade — the second sees the first's post-update rows
    "tbl_update_dv" ->
      """WITH u1 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderstatus = 'P' AND o_custkey % 7 = 0
        |    THEN '5-LOW' ELSE o_orderpriority END AS o_orderpriority
        |FROM u1""".stripMargin,
    "mv_incremental" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)),
        |app AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (o_totalprice < 1000.0))
        |SELECT o_orderstatus,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_o_totalprice,
        |  COUNT(*) AS n_rows
        |FROM live GROUP BY o_orderstatus""".stripMargin,
    "mv_incremental_approx" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)),
        |app AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (o_totalprice < 1000.0))
        |SELECT o_orderstatus,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_o_totalprice,
        |  COUNT(*) AS n_rows,
        |  COUNT(DISTINCT o_orderpriority) AS adc_o_orderpriority
        |FROM live GROUP BY o_orderstatus""".stripMargin,
    "mv_incremental_avg" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)),
        |app AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (o_totalprice < 1000.0))
        |SELECT o_orderstatus,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_o_totalprice,
        |  COUNT(*) AS n_rows,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(o_totalprice) AS avg_o_totalprice
        |FROM live GROUP BY o_orderstatus""".stripMargin,
    "mv_incremental_minmax" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)),
        |app AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (o_totalprice < 1000.0))
        |SELECT o_orderstatus,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_o_totalprice,
        |  COUNT(*) AS n_rows,
        |  CAST(round(MIN(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_o_totalprice,
        |  CAST(round(MAX(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_o_totalprice
        |FROM live GROUP BY o_orderstatus""".stripMargin,
    "mv_incremental_multi" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)),
        |app AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (o_totalprice < 1000.0))
        |SELECT o_orderstatus,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_o_totalprice,
        |  CAST(round(SUM(CAST(o_custkey AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_o_custkey,
        |  COUNT(*) AS n_rows,
        |  CAST(round(MIN(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_o_totalprice,
        |  CAST(round(MAX(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_o_totalprice,
        |  CAST(round(MIN(CAST(o_custkey AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_o_custkey,
        |  CAST(round(MAX(CAST(o_custkey AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_o_custkey
        |FROM live GROUP BY o_orderstatus""".stripMargin,
    "mv_incremental_lineitem" ->
      """WITH base AS (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0),
        |upd AS (
        |  SELECT l_orderkey, l_returnflag, l_linestatus,
        |    CASE WHEN l_discount > 0.05 THEN l_quantity + 1.0
        |      ELSE l_quantity END AS l_quantity,
        |    l_extendedprice
        |  FROM base),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (l_returnflag = 'A' AND l_orderkey % 30 = 0)),
        |app AS (
        |  SELECT l_orderkey + 100000000 AS l_orderkey, l_returnflag,
        |    l_linestatus, l_quantity, l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 10 = 1),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (l_quantity <= 2.0))
        |SELECT l_returnflag, l_linestatus,
        |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_l_quantity,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_l_extendedprice,
        |  COUNT(*) AS n_rows,
        |  CAST(round(MIN(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_l_quantity,
        |  CAST(round(MAX(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_l_quantity,
        |  CAST(round(MIN(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_l_extendedprice,
        |  CAST(round(MAX(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_l_extendedprice
        |FROM live GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "mv_incremental_derived" ->
      """WITH base AS (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0),
        |upd AS (
        |  SELECT l_orderkey, l_returnflag, l_shipdate, l_extendedprice,
        |    CASE WHEN l_quantity > 45.0 THEN 0.0 ELSE l_discount END AS l_discount
        |  FROM base),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (l_returnflag = 'R' AND l_orderkey % 20 = 0)),
        |app AS (
        |  SELECT l_orderkey + 100000000 AS l_orderkey, l_returnflag,
        |    l_shipdate, l_extendedprice, l_discount
        |  FROM lineitem WHERE l_orderkey % 10 = 3),
        |fin AS (SELECT * FROM del UNION ALL SELECT * FROM app),
        |live AS (SELECT * FROM fin WHERE NOT (l_extendedprice < 2000.0)),
        |rev AS (
        |  SELECT l_returnflag, date_trunc('month', l_shipdate) AS lmonth,
        |    CAST(round(CAST(l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1.0 - l_discount AS DECIMAL(5,4)), 4) AS DOUBLE) AS revenue
        |  FROM live)
        |SELECT l_returnflag, lmonth,
        |  CAST(round(SUM(CAST(revenue AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_revenue,
        |  COUNT(*) AS n_rows,
        |  CAST(round(MIN(CAST(revenue AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_revenue,
        |  CAST(round(MAX(CAST(revenue AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_revenue
        |FROM rev GROUP BY l_returnflag, lmonth""".stripMargin,
    "mv_incremental_dim" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      ELSE o_totalprice END AS o_totalprice
        |  FROM orders),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)),
        |live AS (SELECT * FROM del WHERE NOT (o_totalprice < 1000.0)),
        |j AS (
        |  SELECT c.c_mktsegment, l.o_totalprice
        |  FROM live l LEFT JOIN customer c ON l.o_custkey = c.c_custkey)
        |SELECT c_mktsegment,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_o_totalprice,
        |  COUNT(*) AS n_rows,
        |  CAST(round(MIN(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS min_o_totalprice,
        |  CAST(round(MAX(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS max_o_totalprice
        |FROM j GROUP BY c_mktsegment""".stripMargin,
    "tbl_update_where" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |    ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    "tbl_change_feed" ->
      """WITH pre AS (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'),
        |post AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS o_totalprice,
        |  o_orderdate, o_orderpriority FROM pre),
        |state1 AS (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT'
        |           UNION ALL SELECT * FROM post),
        |del AS (SELECT * FROM state1 WHERE o_orderstatus = 'P' AND o_custkey % 7 = 0)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |  'update_preimage' AS _change_type, CAST(1 AS BIGINT) AS _commit_version FROM pre
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |  'update_postimage', CAST(1 AS BIGINT) FROM post
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |  'delete', CAST(2 AS BIGINT) FROM del""".stripMargin,
    "tbl_time_travel" -> "SELECT * FROM orders",
    "tbl_dsv2_read" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_custkey <= 100",
    // SQL-text DML drives the same transactional scenarios → same oracles
    "tbl_sql_delete" ->
      """SELECT * FROM orders
        |WHERE NOT (o_orderstatus = 'P' AND o_custkey % 7 = 0)""".stripMargin,
    "tbl_sql_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |    ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    "tbl_sql_merge" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT * FROM src
        |UNION ALL
        |SELECT o.* FROM orders o ANTI JOIN src s ON o.o_orderkey = s.o_orderkey""".stripMargin,
    "tbl_merge_identity" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |fin AS (
        |  SELECT * FROM src
        |  UNION ALL
        |  SELECT o.* FROM orders o ANTI JOIN src s ON o.o_orderkey = s.o_orderkey)
        |SELECT *, TRUE AS ids_unique, TRUE AS ids_dense FROM fin""".stripMargin,
    "tbl_sql_insert" ->
      """SELECT * FROM orders
        |UNION ALL
        |SELECT 20000001, 1, 'O', 123.45,
        |  TIMESTAMP '1997-01-01 00:00:00', '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey + 30000000, o_custkey, 'N', o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "tbl_convert_hive" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderpriority <> '1-URGENT'""".stripMargin,
    // COPY INTO is file-idempotent: two drops + re-runs reassemble
    // exactly the full table
    "tbl_copy_into" -> "SELECT * FROM orders",
    "tbl_merge_conditional" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0
        |    THEN CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(1.05 AS DECIMAL(3,2)), 2) AS DOUBLE)
        |    ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |WHERE NOT (o_orderkey % 10 = 0 AND o_orderstatus = 'P')
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0 AND o_custkey % 2 = 0""".stripMargin,
    "tbl_compact" -> "SELECT * FROM orders",
    "tbl_cluster_by" -> "SELECT * FROM orders",
    // §D temporal joins
    "asof_join_events_orders" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.event_type,
        |  o.o_orderdate AS matched_orderdate
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "asof_join_native" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.event_type,
        |  o.o_orderdate AS matched_o_orderdate
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "range_join_price_band" ->
      """SELECT p.p_partkey, COALESCE(m.n, 0) AS n_lines
        |FROM part p LEFT JOIN (
        |  SELECT p_partkey, COUNT(*) AS n FROM part, lineitem
        |  WHERE l_extendedprice >= p_retailprice * 5
        |    AND l_extendedprice < p_retailprice * 5 + 500
        |  GROUP BY p_partkey) m ON p.p_partkey = m.p_partkey""".stripMargin,
    // §E streaming batch-equivalents
    "stream_windowed_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(round(SUM(CAST(value AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_interval_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
        |  CAST(v.ts AS TIMESTAMP) AS view_ts,
        |  CAST(p.ts AS TIMESTAMP) AS purchase_ts, p.value
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
        |  AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM (SELECT DISTINCT event_id, event_type, user_id FROM events)
        |GROUP BY event_type""".stripMargin,
    "stream_sessionize" ->
      """WITH f AS (
        |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
        |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM f),
        |s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(round(SUM(CAST(value AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    // session_window: end = last event + gap; boundary is EXCLUSIVE
    // (an event exactly gap-after starts a new session → >= in the
    // gap rule, unlike stream_sessionize's > convention)
    "stream_session_window" ->
      """WITH f AS (
        |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
        |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM f),
        |s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(round(SUM(CAST(value AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    // §A sources
    "json_extract_props" ->
      """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
        |  COUNT(*) AS n_events,
        |  CAST(round(SUM(CAST(value AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "ingest_csv_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    "incremental_autoloader" ->
      "SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1",
    // schema evolution: batch 2 (odd event_ids) arrives with the new
    // region column populated; nothing is ever rescued on this feed
    "incremental_evolution" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_with_region,
        |  COUNT(CASE WHEN false THEN 1 END) AS n_rescued
        |FROM events GROUP BY event_type""".stripMargin,
    // §H similarity: cosine spelled as the same double-op sequence as
    // the Spark kernels (dot/(sqrt·sqrt), sequential list_sum) so the
    // doubles agree bit-for-bit before the round(6).
    "ann_topk_bruteforce" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |c AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(q.qe) + 1)]))) AS cs
        |  FROM embeddings e, q WHERE e.vec_id <> 0)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM c ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    // filtered ANN against the served index: label = 7 is ~10%
    // selective, so the selectivity-scaled probe expansion
    // (ceil(4 · total/matching) ≈ 40 cells) saturates past the
    // 16-cell geometry — the served answer is then EXACTLY
    // filter-then-brute-force top-k, which this replays. (The
    // un-saturated partial-probe regime is spec-pinned instead.)
    "ann_filtered" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |c AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(q.qe) + 1)]))) AS cs
        |  FROM embeddings e, q WHERE e.vec_id <> 0 AND e.label = 7)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM c ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "ann_topk_batch" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |          for i in range(1, len(embedding) + 1)])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qnrm
        |      FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    CAST(round(CAST(
        |      list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |            for i in range(1, len(e.embedding) + 1)]) / (e.nrm * q.qnrm)
        |      AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |  FROM e, q WHERE e.vec_id >= 5)
        |SELECT query_id, vec_id, cos_sim,
        |  CAST(rank AS INTEGER) AS rank
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "ann_quantized_topk" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding,
        |    list_max([abs(CAST(embedding[i] AS DOUBLE))
        |              for i in range(1, len(embedding) + 1)]) AS amax
        |  FROM embeddings),
        |q8 AS (
        |  SELECT vec_id, label,
        |    [CASE WHEN amax = 0 THEN 0
        |          ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / amax * 127.0 + 0.5) AS BIGINT) END
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM e),
        |n8 AS (
        |  SELECT vec_id, label, qv,
        |    list_sum([qv[i] * qv[i] for i in range(1, len(qv) + 1)]) AS qnormsq
        |  FROM q8),
        |q AS (SELECT qv AS qqv, qnormsq AS qn FROM n8 WHERE vec_id = 0),
        |scored AS (
        |  SELECT n.vec_id, n.label,
        |    CAST(list_sum([n.qv[i] * q.qqv[i] for i in range(1, len(n.qv) + 1)]) AS DOUBLE) /
        |    (sqrt(CAST(n.qnormsq AS DOUBLE)) * sqrt(CAST(q.qn AS DOUBLE))) AS cs
        |  FROM n8 n, q WHERE n.vec_id <> 0)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS q_cos_sim
        |FROM scored ORDER BY q_cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH c AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)
        |              for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
        |              for i in range(1, len(b.embedding) + 1)]))) AS cs
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM c WHERE CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) >= 0.3""".stripMargin,
    "ann_ivf_topk" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
        |  ORDER BY vec_id LIMIT 16),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |assigned AS (
        |  SELECT vec_id, label, embedding, cent_id FROM (
        |    SELECT e.vec_id, e.label, e.embedding, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE))
        |                * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE))
        |                for i in range(1, len(e.embedding) + 1)]), c.cent_id) AS rn
        |    FROM embeddings e, cents c) WHERE rn = 1),
        |probe AS (
        |  SELECT cent_id FROM (
        |    SELECT c.cent_id, row_number() OVER (ORDER BY
        |      list_sum([(CAST(c.cent[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
        |              * (CAST(c.cent[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
        |              for i in range(1, len(c.cent) + 1)]), c.cent_id) AS rn
        |    FROM cents c, q) WHERE rn <= 4),
        |scored AS (
        |  SELECT a.vec_id, a.label,
        |    list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)
        |              for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(q.qe) + 1)]))) AS cs
        |  FROM assigned a JOIN probe USING (cent_id), q WHERE a.vec_id <> 0)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "ann_ivf_trained" ->
      """WITH qe AS (
        |  SELECT vec_id, label, embedding,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |dim AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id, qv AS cent
        |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16)),
        |a1 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c0 c) WHERE rn = 1),
        |c1 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a1 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a2 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c1 c) WHERE rn = 1),
        |c2 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a2 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a3 AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT e.vec_id, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c2 c) WHERE rn = 1),
        |q AS (SELECT qv AS qqv, embedding AS qvec FROM qe WHERE vec_id = 0),
        |probe AS (
        |  SELECT cent_id FROM (
        |    SELECT c.cent_id, row_number() OVER (ORDER BY
        |      list_sum([(c.cent[i] - q.qqv[i]) * (c.cent[i] - q.qqv[i])
        |                for i in range(1, len(c.cent) + 1)]), c.cent_id) AS rn
        |    FROM c2 c, q) WHERE rn <= 4),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)
        |              for i in range(1, len(q.qvec) + 1)]))) AS cs
        |  FROM embeddings e JOIN a3 USING (vec_id) JOIN probe USING (cent_id), q
        |  WHERE e.vec_id <> 0)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    // persisted-index variant: centroids train on the SEED slice
    // (vec_id % 4 <> 0) only; every vector (seed + ingested) assigns
    // to the final centroids; probe + exact cosine as the trained IVF
    "ann_incremental" ->
      """WITH qe AS (
        |  SELECT vec_id, label, embedding,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |seed AS (SELECT * FROM qe WHERE vec_id % 4 <> 0),
        |dim AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id, qv AS cent
        |  FROM (SELECT vec_id, qv FROM seed ORDER BY vec_id LIMIT 16)),
        |a1 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM seed e, c0 c) WHERE rn = 1),
        |c1 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a1 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a2 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM seed e, c1 c) WHERE rn = 1),
        |c2 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a2 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a3 AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT e.vec_id, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c2 c) WHERE rn = 1),
        |q AS (SELECT qv AS qqv, embedding AS qvec FROM qe WHERE vec_id = 0),
        |probe AS (
        |  SELECT cent_id FROM (
        |    SELECT c.cent_id, row_number() OVER (ORDER BY
        |      list_sum([(c.cent[i] - q.qqv[i]) * (c.cent[i] - q.qqv[i])
        |                for i in range(1, len(c.cent) + 1)]), c.cent_id) AS rn
        |    FROM c2 c, q) WHERE rn <= 4),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)
        |              for i in range(1, len(q.qvec) + 1)]))) AS cs
        |  FROM embeddings e JOIN a3 USING (vec_id) JOIN probe USING (cent_id), q
        |  WHERE e.vec_id <> 0)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    // filtered ADC cascade against the served IVF+PQ index: the
    // ~10%-selective predicate saturates the probe expansion past the
    // 16-cell geometry, so the replay is geometry-independent —
    // PQ-encode the filtered corpus, ADC-shortlist 25 (BELOW the
    // match count, so the code stage genuinely decides), exact-rerank
    "ann_filtered_pq" ->
      """WITH qe AS (
        |  SELECT vec_id, label, embedding,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |params AS (SELECT (SELECT len(embedding) FROM embeddings LIMIT 1) // 8 AS sub),
        |seeds AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, qv
        |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16)),
        |sdim AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS s),
        |cb AS (
        |  SELECT sdim.s, seeds.j,
        |    list_slice(qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS cent
        |  FROM seeds, sdim, params),
        |subv AS (
        |  SELECT vec_id, sdim.s,
        |    list_slice(qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS sv
        |  FROM qe, sdim, params
        |  WHERE qe.label = 7 AND qe.vec_id <> 0),
        |codes AS (
        |  SELECT vec_id, s, j AS code FROM (
        |    SELECT v.vec_id, v.s, c.j,
        |      row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY
        |        list_sum([(v.sv[i] - c.cent[i]) * (v.sv[i] - c.cent[i]) for i in range(1, len(v.sv) + 1)]), c.j) AS rn
        |    FROM subv v JOIN cb c ON v.s = c.s) WHERE rn = 1),
        |qsub AS (
        |  SELECT sdim.s,
        |    list_slice(q.qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS sv
        |  FROM (SELECT qv FROM qe WHERE vec_id = 0) q, sdim, params),
        |dt AS (
        |  SELECT c.s, c.j AS code,
        |    list_sum([(x.sv[i] - c.cent[i]) * (x.sv[i] - c.cent[i]) for i in range(1, len(x.sv) + 1)]) AS d
        |  FROM cb c JOIN qsub x ON c.s = x.s),
        |approx AS (
        |  SELECT codes.vec_id, CAST(SUM(dt.d) AS BIGINT) AS approx_dist
        |  FROM codes JOIN dt USING (s, code) GROUP BY codes.vec_id),
        |short AS (SELECT vec_id FROM approx ORDER BY approx_dist, vec_id LIMIT 25),
        |q2 AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q2.qvec[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q2.qvec[i] AS DOUBLE) * CAST(q2.qvec[i] AS DOUBLE)
        |              for i in range(1, len(q2.qvec) + 1)]))) AS cs
        |  FROM embeddings e JOIN short USING (vec_id), q2)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "ann_pq_topk" ->
      """WITH qe AS (
        |  SELECT vec_id, label,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |params AS (SELECT (SELECT len(embedding) FROM embeddings LIMIT 1) // 8 AS sub),
        |seeds AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, qv
        |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16)),
        |sdim AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS s),
        |cb AS (
        |  SELECT sdim.s, seeds.j,
        |    list_slice(qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS cent
        |  FROM seeds, sdim, params),
        |subv AS (
        |  SELECT vec_id, sdim.s,
        |    list_slice(qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS sv
        |  FROM qe, sdim, params),
        |codes AS (
        |  SELECT vec_id, s, j AS code FROM (
        |    SELECT v.vec_id, v.s, c.j,
        |      row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY
        |        list_sum([(v.sv[i] - c.cent[i]) * (v.sv[i] - c.cent[i]) for i in range(1, len(v.sv) + 1)]), c.j) AS rn
        |    FROM subv v JOIN cb c ON v.s = c.s) WHERE rn = 1),
        |qsub AS (
        |  SELECT sdim.s,
        |    list_slice(q.qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS sv
        |  FROM (SELECT qv FROM qe WHERE vec_id = 0) q, sdim, params),
        |dt AS (
        |  SELECT c.s, c.j AS code,
        |    list_sum([(x.sv[i] - c.cent[i]) * (x.sv[i] - c.cent[i]) for i in range(1, len(x.sv) + 1)]) AS d
        |  FROM cb c JOIN qsub x ON c.s = x.s)
        |SELECT e.vec_id, e.label, CAST(SUM(dt.d) AS BIGINT) AS approx_dist
        |FROM codes JOIN dt USING (s, code) JOIN embeddings e USING (vec_id)
        |WHERE vec_id <> 0
        |GROUP BY e.vec_id, e.label
        |ORDER BY approx_dist, e.vec_id LIMIT 10""".stripMargin,
    "embedding_kmeans" ->
      """WITH qe AS (
        |  SELECT vec_id, label, embedding,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |dim AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id, qv AS cent
        |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16)),
        |a1 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c0 c) WHERE rn = 1),
        |c1 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a1 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a2 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c1 c) WHERE rn = 1),
        |c2 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a2 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a3 AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT e.vec_id, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c2 c) WHERE rn = 1)
        |SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
        |FROM a3 GROUP BY cent_id""".stripMargin,
    "ann_ivfpq_serve" ->
      """WITH qe AS (
        |  SELECT vec_id, label, embedding,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |dim AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id, qv AS cent
        |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16)),
        |a1 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c0 c) WHERE rn = 1),
        |c1 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a1 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a2 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c1 c) WHERE rn = 1),
        |c2 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a2 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a3 AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT e.vec_id, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c2 c) WHERE rn = 1),
        |qv0 AS (SELECT qv FROM qe WHERE vec_id = 0),
        |probe AS (
        |  SELECT cent_id FROM c2, qv0 q
        |  ORDER BY list_sum([(c2.cent[i] - q.qv[i]) * (c2.cent[i] - q.qv[i])
        |                     for i in range(1, len(q.qv) + 1)]), cent_id
        |  LIMIT 4),
        |members AS (
        |  SELECT a3.vec_id FROM a3 JOIN probe USING (cent_id)
        |  WHERE a3.vec_id <> 0),
        |params AS (SELECT (SELECT len(embedding) FROM embeddings LIMIT 1) // 8 AS sub),
        |seeds AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, qv
        |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16)),
        |sdim AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS s),
        |cb AS (
        |  SELECT sdim.s, seeds.j,
        |    list_slice(qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS cent
        |  FROM seeds, sdim, params),
        |subv AS (
        |  SELECT vec_id, sdim.s,
        |    list_slice(qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS sv
        |  FROM qe, sdim, params),
        |codes AS (
        |  SELECT vec_id, s, j AS code FROM (
        |    SELECT v.vec_id, v.s, c.j,
        |      row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY
        |        list_sum([(v.sv[i] - c.cent[i]) * (v.sv[i] - c.cent[i]) for i in range(1, len(v.sv) + 1)]), c.j) AS rn
        |    FROM subv v JOIN cb c ON v.s = c.s) WHERE rn = 1),
        |qsub AS (
        |  SELECT sdim.s,
        |    list_slice(q.qv, sdim.s * params.sub + 1, sdim.s * params.sub + params.sub) AS sv
        |  FROM qv0 q, sdim, params),
        |dt AS (
        |  SELECT c.s, c.j AS code,
        |    list_sum([(x.sv[i] - c.cent[i]) * (x.sv[i] - c.cent[i]) for i in range(1, len(x.sv) + 1)]) AS d
        |  FROM cb c JOIN qsub x ON c.s = x.s),
        |short AS (
        |  SELECT codes.vec_id, SUM(dt.d) AS ad
        |  FROM codes JOIN dt USING (s, code) JOIN members USING (vec_id)
        |  GROUP BY codes.vec_id
        |  ORDER BY ad, codes.vec_id LIMIT 50),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |rr AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              for i in range(1, len(q.qe) + 1)]))) AS cs
        |  FROM embeddings e JOIN short ON e.vec_id = short.vec_id, q)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM rr ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "dedup_semantic" ->
      """WITH RECURSIVE qe AS (
        |  SELECT vec_id, label, embedding,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |dim AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id, qv AS cent
        |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16)),
        |a1 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c0 c) WHERE rn = 1),
        |c1 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a1 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a2 AS (
        |  SELECT vec_id, qv, cent_id FROM (
        |    SELECT e.vec_id, e.qv, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c1 c) WHERE rn = 1),
        |c2 AS (
        |  SELECT cent_id, list(m ORDER BY i) AS cent FROM (
        |    SELECT a.cent_id, dim.i,
        |      CAST(floor(CAST(SUM(a.qv[dim.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |    FROM a2 a, dim GROUP BY a.cent_id, dim.i) GROUP BY cent_id),
        |a3 AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT e.vec_id, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum([(e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i])
        |                  for i in range(1, len(e.qv) + 1)]), c.cent_id) AS rn
        |    FROM qe e, c2 c) WHERE rn = 1),
        |ae AS (
        |  SELECT a3.vec_id, a3.cent_id, qe.embedding
        |  FROM a3 JOIN qe ON a3.vec_id = qe.vec_id),
        |cp AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)
        |              for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
        |              for i in range(1, len(b.embedding) + 1)]))) AS cs
        |  FROM ae a JOIN ae b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
        |pairs AS (
        |  SELECT vec_a, vec_b FROM cp
        |  WHERE CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) >= 0.3),
        |undirected AS (
        |  SELECT vec_a AS u, vec_b AS v FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        |  UNION
        |  SELECT e.u, r.label FROM undirected e JOIN reach r ON e.v = r.u),
        |lab AS (SELECT u AS vec_id, MIN(label) AS root FROM reach GROUP BY u)
        |SELECT e.vec_id,
        |  COALESCE(l.root, e.vec_id) AS canonical_id,
        |  CASE WHEN COALESCE(l.root, e.vec_id) = e.vec_id
        |    THEN 'keep' ELSE 'drop' END AS action
        |FROM embeddings e LEFT JOIN lab l ON e.vec_id = l.vec_id""".stripMargin,
    "multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |    length(text) AS n,
        |    list_sum([unicode(c) for c in string_split(text, '')]) AS bsum
        |  FROM documents)
        |SELECT media_id, kind, CAST(n AS INTEGER) AS n_bytes,
        |  CAST(n % 1024 AS INTEGER) AS width,
        |  CAST((n // 3) % 768 AS INTEGER) AS height,
        |  CAST(bsum % 100000 AS BIGINT) AS duration_ms,
        |  CAST(bsum AS DOUBLE) / greatest(n, 1) AS mean_byte
        |FROM m""".stripMargin,
    "multimodal_frame_neardup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |f0 AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest((n + 127) // 128, 1))) AS fi
        |  FROM m),
        |f AS (
        |  SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
        |    substring(text, CAST(fi * 128 + 1 AS INTEGER), 64) AS fc
        |  FROM f0),
        |toks AS (
        |  SELECT media_id, frame_idx,
        |    unnest(list_distinct([substring(fc, i, 4) for i in range(1, len(fc) - 2)])) AS t
        |  FROM f WHERE length(fc) >= 4),
        |hs AS (
        |  SELECT media_id, frame_idx,
        |    CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
        |  FROM toks),
        |bits AS (
        |  SELECT media_id, frame_idx, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM hs, (SELECT unnest(range(0, 60)) AS b)
        |  GROUP BY media_id, frame_idx, b),
        |sig AS (
        |  SELECT media_id, frame_idx,
        |    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh
        |  FROM bits GROUP BY media_id, frame_idx),
        |blocked AS (
        |  SELECT media_id, frame_idx, sh, blk, (sh >> (blk * 15)) & 32767 AS bval
        |  FROM sig, (SELECT unnest(range(0, 4)) AS blk)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS media_a, a.frame_idx AS frame_a,
        |    b.media_id AS media_b, b.frame_idx AS frame_b,
        |    a.sh AS sa, b.sh AS sb
        |  FROM blocked a JOIN blocked b
        |    ON a.blk = b.blk AND a.bval = b.bval
        |    AND (a.media_id < b.media_id OR
        |         (a.media_id = b.media_id AND a.frame_idx < b.frame_idx)))
        |SELECT media_a, frame_a, media_b, frame_b,
        |  CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,
    "multimodal_frame_ann" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |f0 AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest((n + 127) // 128, 1))) AS fi
        |  FROM m),
        |f AS (
        |  SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
        |    substring(text, CAST(fi * 128 + 1 AS INTEGER), 64) AS fc
        |  FROM f0),
        |emb AS (
        |  SELECT media_id, frame_idx,
        |    [CAST(len([x for x in [unicode(c) for c in string_split(fc, '')] if x // 32 = b]) AS DOUBLE) for b in range(0, 8)] AS e
        |  FROM f WHERE length(fc) > 0),
        |q AS (SELECT e FROM emb WHERE media_id = 0 AND frame_idx = 0),
        |scored AS (
        |  SELECT emb.media_id, emb.frame_idx,
        |    list_sum([emb.e[i] * q.e[i] for i in range(1, 9)]) /
        |    (sqrt(list_sum([emb.e[i] * emb.e[i] for i in range(1, 9)])) *
        |     sqrt(list_sum([q.e[i] * q.e[i] for i in range(1, 9)]))) AS cs
        |  FROM emb, q
        |  WHERE NOT (emb.media_id = 0 AND emb.frame_idx = 0))
        |SELECT media_id, frame_idx,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, media_id, frame_idx
        |LIMIT 10""".stripMargin,
    // FILTERED frame retrieval: the ~10%-selective media filter
    // saturates the selectivity-scaled probe expansion past the
    // 16-cell geometry (spec-asserted), so the served answer is
    // exactly filter-then-brute-force over the frame grid
    "multimodal_frame_ann_filtered" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |f0 AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest((n + 127) // 128, 1))) AS fi
        |  FROM m),
        |f AS (
        |  SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
        |    substring(text, CAST(fi * 128 + 1 AS INTEGER), 64) AS fc
        |  FROM f0),
        |emb AS (
        |  SELECT media_id, frame_idx, media_id * 65536 + frame_idx AS vec_id,
        |    [CAST(len([x for x in [unicode(c) for c in string_split(fc, '')] if x // 32 = b]) AS DOUBLE) for b in range(0, 8)] AS e
        |  FROM f WHERE length(fc) > 0),
        |q AS (SELECT e FROM emb WHERE media_id = 0 AND frame_idx = 0),
        |scored AS (
        |  SELECT emb.media_id, emb.frame_idx, emb.vec_id,
        |    list_sum([emb.e[i] * q.e[i] for i in range(1, 9)]) /
        |    (sqrt(list_sum([emb.e[i] * emb.e[i] for i in range(1, 9)])) *
        |     sqrt(list_sum([q.e[i] * q.e[i] for i in range(1, 9)]))) AS cs
        |  FROM emb, q
        |  WHERE emb.media_id % 10 = 3 AND emb.vec_id <> 0)
        |SELECT media_id, frame_idx,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    // frame ANN on the IVF+PQ path: relational replay of the WHOLE
    // ADC cascade over the frame grid — codebook = first 16 seed
    // frames' (media_id % 4 ≠ 0) quantized subvectors (sub = 1 at
    // dim 8 / m 8), codes = per-subspace argmin, ADC shortlist of 25
    // by exact integer distance, exact cosine re-rank of just the
    // shortlist; the Spark side probes EVERY cell so geometry never
    // enters, but the CODE stage genuinely decides the shortlist
    "multimodal_frame_ann_pq" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |f0 AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest((n + 127) // 128, 1))) AS fi
        |  FROM m),
        |f AS (
        |  SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
        |    substring(text, CAST(fi * 128 + 1 AS INTEGER), 64) AS fc
        |  FROM f0),
        |emb AS (
        |  SELECT media_id, frame_idx, media_id * 65536 + frame_idx AS vec_id,
        |    [CAST(len([x for x in [unicode(c) for c in string_split(fc, '')] if x // 32 = b]) AS DOUBLE) for b in range(0, 8)] AS e
        |  FROM f WHERE length(fc) > 0),
        |qe AS (
        |  SELECT media_id, frame_idx, vec_id, e,
        |    [CAST(floor(e[i] * 1000000.0) AS BIGINT) for i in range(1, 9)] AS qv
        |  FROM emb),
        |seeds AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, qv
        |  FROM (SELECT vec_id, qv FROM qe WHERE media_id % 4 <> 0 ORDER BY vec_id LIMIT 16) s0),
        |sdim AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS s),
        |cb AS (
        |  SELECT sdim.s, seeds.j, qv[sdim.s + 1] AS cent FROM seeds, sdim),
        |subv AS (
        |  SELECT vec_id, sdim.s, qv[sdim.s + 1] AS sv
        |  FROM qe, sdim WHERE vec_id <> 0),
        |codes AS (
        |  SELECT vec_id, s, j AS code FROM (
        |    SELECT v.vec_id, v.s, c.j,
        |      row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY
        |        (v.sv - c.cent) * (v.sv - c.cent), c.j) AS rn
        |    FROM subv v JOIN cb c ON v.s = c.s) c0 WHERE rn = 1),
        |qsub AS (
        |  SELECT sdim.s, q.qv[sdim.s + 1] AS sv
        |  FROM (SELECT qv FROM qe WHERE vec_id = 0) q, sdim),
        |dt AS (
        |  SELECT c.s, c.j AS code, (x.sv - c.cent) * (x.sv - c.cent) AS d
        |  FROM cb c JOIN qsub x ON c.s = x.s),
        |approx AS (
        |  SELECT codes.vec_id, CAST(SUM(dt.d) AS BIGINT) AS approx_dist
        |  FROM codes JOIN dt USING (s, code) GROUP BY codes.vec_id),
        |short AS (SELECT vec_id FROM approx ORDER BY approx_dist, vec_id LIMIT 25),
        |q2 AS (SELECT e AS qvec FROM qe WHERE vec_id = 0),
        |scored AS (
        |  SELECT t.media_id, t.frame_idx, t.vec_id,
        |    list_sum([t.e[i] * q2.qvec[i] for i in range(1, 9)]) /
        |    (sqrt(list_sum([t.e[i] * t.e[i] for i in range(1, 9)])) *
        |     sqrt(list_sum([q2.qvec[i] * q2.qvec[i] for i in range(1, 9)]))) AS cs
        |  FROM qe t JOIN short USING (vec_id), q2)
        |SELECT media_id, frame_idx,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "multimodal_framesample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |    text, length(text) AS n
        |  FROM documents),
        |f0 AS (
        |  SELECT media_id, kind, text, n,
        |    unnest(range(0, (n + 127) // 128)) AS fi
        |  FROM m),
        |f AS (
        |  SELECT media_id, kind, CAST(fi AS INTEGER) AS frame_idx,
        |    CAST(fi * 128 AS INTEGER) AS frame_offset,
        |    CAST(least(64, n - fi * 128) AS INTEGER) AS frame_len,
        |    CAST(list_sum([unicode(c) for c in string_split(substring(text, CAST(fi * 128 + 1 AS INTEGER), CAST(least(64, n - fi * 128) AS INTEGER)), '')]) AS BIGINT) AS byte_sum
        |  FROM f0)
        |SELECT media_id, kind, frame_idx, frame_offset, frame_len, byte_sum,
        |  CAST(byte_sum AS DOUBLE) / greatest(frame_len, 1) AS mean_byte
        |FROM f""".stripMargin,
    // §F ML (rule-scored, oracle-replicable parts)
    "profile_orders" ->
      """WITH m AS (
        |  SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(o_orderkey) AS null_count,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS DOUBLE) AS min_num, CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
        |    COUNT(DISTINCT o_custkey),
        |    CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
        |    NULL, NULL
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
        |    COUNT(DISTINCT o_totalprice),
        |    MIN(o_totalprice), MAX(o_totalprice), NULL, NULL
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |    COUNT(DISTINCT o_orderstatus), NULL, NULL,
        |    MIN(o_orderstatus), MAX(o_orderstatus)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
        |    COUNT(DISTINCT o_orderpriority), NULL, NULL,
        |    MIN(o_orderpriority), MAX(o_orderpriority)
        |  FROM orders)
        |SELECT "column", CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(null_count AS BIGINT) AS null_count,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  min_num, max_num, min_str, max_str
        |FROM m""".stripMargin,
    "ann_quantized_rerank" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding,
        |    list_max([abs(CAST(embedding[i] AS DOUBLE))
        |              for i in range(1, len(embedding) + 1)]) AS amax
        |  FROM embeddings),
        |q8 AS (
        |  SELECT vec_id, label,
        |    [CASE WHEN amax = 0 THEN 0
        |          ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / amax * 127.0 + 0.5) AS BIGINT) END
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM e),
        |n8 AS (
        |  SELECT vec_id, label, qv,
        |    list_sum([qv[i] * qv[i] for i in range(1, len(qv) + 1)]) AS qnormsq
        |  FROM q8),
        |q AS (SELECT qv AS qqv, qnormsq AS qn FROM n8 WHERE vec_id = 0),
        |short AS (
        |  SELECT vec_id FROM (
        |    SELECT n.vec_id,
        |      CAST(round(CAST(
        |        CAST(list_sum([n.qv[i] * q.qqv[i] for i in range(1, len(n.qv) + 1)]) AS DOUBLE) /
        |        (sqrt(CAST(n.qnormsq AS DOUBLE)) * sqrt(CAST(q.qn AS DOUBLE)))
        |      AS DECIMAL(18,12)), 6) AS DOUBLE) AS qcs
        |    FROM n8 n, q WHERE n.vec_id <> 0)
        |  ORDER BY qcs DESC, vec_id LIMIT 50),
        |qe AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |              for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)
        |              for i in range(1, len(q.qvec) + 1)]))) AS cs
        |  FROM embeddings e JOIN short USING (vec_id), qe q)
        |SELECT vec_id, label,
        |  CAST(round(CAST(cs AS DECIMAL(18,12)), 6) AS DOUBLE) AS cos_sim
        |FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "ml_score_fixed" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS DOUBLE) AS n_lines,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey),
        |f AS (
        |  SELECT o_orderkey, o_orderpriority, c_mktsegment, o_totalprice, c_acctbal,
        |    COALESCE(li.n_lines, 0.0) AS n_lines, COALESCE(li.sum_qty, 0.0) AS sum_qty,
        |    CAST(o_orderstatus <> 'F' AS INTEGER) AS bad_flag,
        |    CAST(year(o_orderdate) AS INTEGER) AS issue_year
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  LEFT JOIN li ON o_orderkey = li.l_orderkey),
        |scored AS (
        |  SELECT o_orderkey, bad_flag,
        |    CAST(round(
        |      CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(0.8 AS DECIMAL(2,1)) ELSE CAST(0 AS DECIMAL(2,1)) END
        |      + CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(0.5 AS DECIMAL(2,1)) ELSE CAST(0 AS DECIMAL(2,1)) END
        |      + CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(0.3 AS DECIMAL(2,1)) ELSE CAST(0 AS DECIMAL(2,1)) END
        |      + CAST(o_totalprice AS DECIMAL(12,4)) * CAST(0.000002 AS DECIMAL(7,6))
        |      + CAST(c_acctbal AS DECIMAL(12,4)) * CAST(0.00005 AS DECIMAL(7,6))
        |      + CAST(n_lines AS DECIMAL(10,1)) * CAST(0.01 AS DECIMAL(3,2))
        |      + CAST(sum_qty AS DECIMAL(14,4)) * CAST(0.001 AS DECIMAL(4,3)), 6) AS DOUBLE) AS score
        |  FROM f WHERE issue_year > 1997)
        |SELECT o_orderkey, bad_flag, score,
        |  CAST(score > 1.0 AS INTEGER) AS prediction
        |FROM scored""".stripMargin,
    // max-F1 threshold selection over the decimal-exact fixed scores:
    // every distinct score is a candidate threshold (positive =
    // score >= t), cumulative tp/pp over the score-desc pane, argmax
    // F1 with ties to the smallest threshold — fMeasureByThreshold's
    // sweep as pure relational arithmetic
    "ml_threshold_fixed" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS DOUBLE) AS n_lines,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey),
        |f AS (
        |  SELECT o_orderkey, o_orderpriority, c_mktsegment, o_totalprice, c_acctbal,
        |    COALESCE(li.n_lines, 0.0) AS n_lines, COALESCE(li.sum_qty, 0.0) AS sum_qty,
        |    CAST(o_orderstatus <> 'F' AS INTEGER) AS bad_flag,
        |    CAST(year(o_orderdate) AS INTEGER) AS issue_year
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  LEFT JOIN li ON o_orderkey = li.l_orderkey),
        |scored AS (
        |  SELECT bad_flag,
        |    CAST(round(
        |      CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(0.8 AS DECIMAL(2,1)) ELSE CAST(0 AS DECIMAL(2,1)) END
        |      + CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(0.5 AS DECIMAL(2,1)) ELSE CAST(0 AS DECIMAL(2,1)) END
        |      + CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(0.3 AS DECIMAL(2,1)) ELSE CAST(0 AS DECIMAL(2,1)) END
        |      + CAST(o_totalprice AS DECIMAL(12,4)) * CAST(0.000002 AS DECIMAL(7,6))
        |      + CAST(c_acctbal AS DECIMAL(12,4)) * CAST(0.00005 AS DECIMAL(7,6))
        |      + CAST(n_lines AS DECIMAL(10,1)) * CAST(0.01 AS DECIMAL(3,2))
        |      + CAST(sum_qty AS DECIMAL(14,4)) * CAST(0.001 AS DECIMAL(4,3)), 6) AS DOUBLE) AS score
        |  FROM f WHERE issue_year > 1997),
        |ps AS (
        |  SELECT score, COUNT(*) AS n, SUM(bad_flag) AS n_pos
        |  FROM scored GROUP BY score),
        |cum AS (
        |  SELECT score,
        |    SUM(n_pos) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |    SUM(n) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
        |  FROM ps),
        |tot AS (SELECT SUM(bad_flag) AS pos_total FROM scored)
        |SELECT score AS threshold,
        |  CAST(2 * tp AS DOUBLE) / CAST(2 * tp + (pp - tp) + (pos_total - tp) AS DOUBLE) AS f1,
        |  CAST(tp AS BIGINT) AS tp, CAST(pp - tp AS BIGINT) AS fp,
        |  CAST(pos_total - tp AS BIGINT) AS fn
        |FROM cum, tot
        |ORDER BY f1 DESC, threshold LIMIT 1""".stripMargin,
    "ml_gbt_fixed" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS DOUBLE) AS n_lines,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey),
        |f AS (
        |  SELECT o_orderkey, o_orderpriority, c_mktsegment, o_totalprice, c_acctbal,
        |    COALESCE(li.n_lines, 0.0) AS n_lines, COALESCE(li.sum_qty, 0.0) AS sum_qty,
        |    CAST(o_orderstatus <> 'F' AS INTEGER) AS bad_flag,
        |    CAST(year(o_orderdate) AS INTEGER) AS issue_year
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  LEFT JOIN li ON o_orderkey = li.l_orderkey),
        |scored AS (
        |  SELECT o_orderkey, bad_flag,
        |    CAST(round(
        |      CASE WHEN o_totalprice <= 150000 THEN
        |        CASE WHEN n_lines <= 3 THEN CAST(-0.40 AS DECIMAL(3,2)) ELSE CAST(0.10 AS DECIMAL(3,2)) END
        |      ELSE
        |        CASE WHEN c_acctbal <= 0 THEN CAST(0.60 AS DECIMAL(3,2)) ELSE CAST(0.30 AS DECIMAL(3,2)) END
        |      END
        |      + CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN CAST(0.20 AS DECIMAL(3,2))
        |        ELSE CASE WHEN sum_qty <= 50 THEN CAST(-0.10 AS DECIMAL(3,2)) ELSE CAST(0.05 AS DECIMAL(3,2)) END END
        |      + CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(0.05 AS DECIMAL(3,2)) ELSE CAST(-0.03 AS DECIMAL(3,2)) END,
        |      6) AS DOUBLE) AS margin
        |  FROM f WHERE issue_year > 1997)
        |SELECT o_orderkey, bad_flag, margin,
        |  CAST(margin > 0.0 AS INTEGER) AS prediction
        |FROM scored""".stripMargin,
    "ml_risk_features" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS DOUBLE) AS n_lines,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderpriority, c_mktsegment, o_totalprice, c_acctbal,
        |  COALESCE(li.n_lines, 0.0) AS n_lines, COALESCE(li.sum_qty, 0.0) AS sum_qty,
        |  o_orderkey, CAST(o_orderstatus <> 'F' AS DOUBLE) AS bad_flag,
        |  CAST(year(o_orderdate) AS INTEGER) AS issue_year,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(0.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |    * CASE WHEN o_orderstatus <> 'F' THEN -1 ELSE 1 END AS net
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN li ON o_orderkey = li.l_orderkey""".stripMargin,
    "ml_confusion_value" ->
      """WITH f AS (
        |  SELECT CAST(o_orderstatus <> 'F' AS INTEGER) AS label,
        |    CAST(o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice > 150000 AS INTEGER) AS prediction,
        |    CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) * CAST(0.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |      * CASE WHEN o_orderstatus <> 'F' THEN -1 ELSE 1 END AS net
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT label, prediction,
        |  CAST(round(SUM(CAST(net AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_net
        |FROM f GROUP BY label, prediction""".stripMargin,
    "feature_store_customer" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    "feature_store_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
        |  CAST(o_orderstatus <> 'F' AS VARCHAR) AS bad_flag,
        |  CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS price_band
        |FROM orders""".stripMargin,
  )
}
