"""Physical-plan shape assertions: the scale properties README claims are
pinned here so a refactor can't silently regress them — predicate pushdown
reaching the parquet scan, column pruning in ReadSchema, broadcast (not
shuffle) joins for dims, top-k as TakeOrderedAndProject, no nested-loop
joins in the temporal operators, and whole-stage codegen on the hot path."""

import pytest

from mini_flink_spark.queries import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    return QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_predicate")
    assert "PushedFilters: [" in plan
    assert "EqualTo(event_type,purchase)" in plan
    assert "GreaterThan(value,50.0)" in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "map_project")
    # only the three referenced columns reach ReadSchema
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "event_id" in rs and "event_type" in rs and "value" in rs
    assert "props" not in rs and "user_id" not in rs


def test_pricing_summary_pushdown_and_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side partial aggregation before the exchange (the combiner the
    # reference never had)
    assert plan.count("HashAggregate") >= 2


def test_dim_joins_broadcast_not_shuffle(spark, sf_dir):
    for q in ("join_revenue_by_segment", "join_customer_nation_region"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, q
        assert "SortMergeJoin" not in plan, q


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_orders")
    assert "TakeOrderedAndProject" in plan


def test_temporal_joins_avoid_nested_loop(spark, sf_dir):
    for q in ("interval_join_click_purchase", "asof_click_attribution"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastNestedLoopJoin" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_hot_paths_whole_stage_codegen(spark, sf_dir):
    # AQE plans only show codegen spans after execution; explain("codegen")
    # compiles them up front
    import contextlib
    import io

    for q in ("pricing_summary", "keyed_agg", "wordcount"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[q].fn(spark, sf_dir).explain("codegen")
        out = buf.getvalue()
        assert "WholeStageCodegen" in out, q


def test_no_python_udfs_in_core_queries(spark, sf_dir):
    # every core/relational query stays JVM-side (UDFs would appear as
    # BatchEvalPython / ArrowEvalPython); decontam is exempt since round 4 —
    # its broadcast-eval Arrow fold is a declared pandas path (PLANS.md),
    # bit-identical to the literal expression by pinned test; NFC
    # normalization (round 6) is likewise declared — Spark has no builtin
    # Unicode normalizer, and the pandas path is md5-pinned against DuckDB's
    # nfc_normalize by its oracle
    for name, spec in QUERIES.items():
        if (
            "dedup" in name
            or "ann" in name
            or "streaming" in name
            or "multimodal" in name
            or "semantic_decontam" in name
            or "unicode_normalize" in name
        ):
            continue
        plan = plan_of(spark, sf_dir, name)
        assert "EvalPython" not in plan, name


def test_tpch_shapes_broadcast_and_takeordered(spark, sf_dir):
    # Q3/Q10 shapes: dims broadcast (no fact-side shuffle for the join),
    # top-k via TakeOrderedAndProject, partial+final agg around one exchange
    for q in ("shipping_priority", "returned_item_revenue"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, q
        assert "TakeOrderedAndProject" in plan, q
        assert plan.count("HashAggregate") >= 2, q


def test_grouping_sets_single_expand_not_three_scans(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "grouping_sets_orders")
    assert plan.count("Expand") == 1
    assert plan.count("Scan parquet") == 1


def test_scalar_subquery_broadcasts_aggregate(spark, sf_dir):
    # the 1-row global aggregate joins via broadcast; the fact side never
    # collects to the driver
    plan = plan_of(spark, sf_dir, "parts_above_avg_price")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_curation_pipeline_single_shuffle_after_spread(spark, sf_dir):
    # spread exchange + aggregate exchange only; the quality gate must NOT
    # appear as a Filter below the first exchange (conditional-agg form)
    plan = plan_of(spark, sf_dir, "curation_pipeline")
    assert plan.count("Exchange") == 2
    body = plan.split("Exchange", 1)[1]  # everything below the agg exchange
    assert "Filter (" not in body or "isnotnull(keep_id" not in body


def test_count_distinct_expands_two_phase(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "distinct_users_per_type")
    assert "Expand" in plan or plan.count("HashAggregate") >= 3


def test_q6_shape_min_io_scan(spark, sf_dir):
    # all three predicates reach the parquet reader; only the 4 referenced
    # columns are read; partial+final agg around a single-partition exchange
    plan = plan_of(spark, sf_dir, "forecast_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in rs and "l_tax" not in rs and "l_orderkey" not in rs
    assert plan.count("HashAggregate") == 2


def test_q4_shape_semi_join_with_range_conjunct(spark, sf_dir):
    # EXISTS compiles to a LeftSemi hash join carrying the non-equi
    # shipdate conjunct — not a nested loop
    plan = plan_of(spark, sf_dir, "order_priority_checking")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q7_shape_dims_broadcast_nation_filter_pushed(spark, sf_dir):
    # five-way join: every dim side broadcast, no sort-merge; the nation
    # name filters are pushed into the nation scans (semi-reduction)
    plan = plan_of(spark, sf_dir, "volume_shipping")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert "In(n_name" in plan


def test_q18_shape_aggregates_before_join(spark, sf_dir):
    # the HAVING reduces lineitem to a handful of keys before orders/customer
    # are touched: the grouped aggregate must sit below the joins
    plan = plan_of(spark, sf_dir, "large_volume_orders")
    join_pos = plan.find("Join")
    agg_pos = plan.find("HashAggregate")
    assert join_pos != -1 and agg_pos != -1 and join_pos < agg_pos
    assert "Scan parquet" in plan.split("HashAggregate", 1)[1]


def test_q19_shape_derives_single_side_predicates(spark, sf_dir):
    # Catalyst extracts brand/size and quantity bands from the OR'd bands
    # and pushes them below the join into BOTH scans
    plan = plan_of(spark, sf_dir, "disjunctive_brand_revenue")
    lines = plan.splitlines()
    li_scan = [l for l in lines if "Scan parquet" in l and "l_quantity" in l][0]
    p_scan = [l for l in lines if "Scan parquet" in l and "p_brand" in l][0]
    # quantity bands derived from the disjunction, pushed into the fact scan
    assert "l_quantity" in li_scan.split("DataFilters:", 1)[1]
    # brand/size disjunction pushed into the dim scan
    assert "p_brand" in p_scan.split("DataFilters:", 1)[1]


def test_per_doc_signals_have_no_shuffle(spark, sf_dir):
    # chunking and repetition scoring are per-row array computations; an
    # Exchange appearing here would mean a corpus-wide shuffle at 100 TB
    for q in ("doc_chunking", "repetition_score"):
        plan = plan_of(spark, sf_dir, q)
        assert "Exchange" not in plan, q
        assert "EvalPython" not in plan, q


def test_corpus_trigram_topk_partial_agg_and_take_ordered(spark, sf_dir):
    # heavy-hitter n-grams are absorbed map-side (partial+final agg around
    # one exchange); the top-20 is TakeOrderedAndProject, not a global sort
    plan = plan_of(spark, sf_dir, "corpus_trigram_topk")
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1


def test_stratified_ops_window_group_limit(spark, sf_dir):
    # round 8: top-k-per-stratum sampling must keep Spark 4's native
    # tournament — a PARTIAL WindowGroupLimit on the map side (each input
    # split pre-cuts to its local top-k per group BEFORE the stratum
    # exchange) plus the Final one after it. If a refactor breaks the
    # rank-filter pattern Catalyst recognizes, the Partial node disappears
    # and a hot stratum sorts in one task again.
    plan = plan_of(spark, sf_dir, "stratified_sample")
    assert "WindowGroupLimit" in plan
    # assert the exchange exists first so a missing node reads as an
    # assertion failure, not an IndexError from the split (ADVICE r8)
    assert "Exchange hashpartitioning" in plan
    assert "Partial" in plan.split("Exchange hashpartitioning", 1)[1]
    for q in ("topn_orders_per_priority",):
        assert "WindowGroupLimit" in plan_of(spark, sf_dir, q), q


def test_cumsum_ops_bounded_sorts(spark, sf_dir):
    # round 8: the cumsum family (every row needs its prefix sum, so
    # WindowGroupLimit cannot apply) uses the two-phase md5-prefix scan —
    # the corpus-sized window partitions on (stratum, slice), bounding
    # every sort task; only the tiny offsets frame windows on the bare
    # stratum key. The offsets attach must be a broadcast, never an SMJ.
    for q in ("token_budget_shards", "packed_sequence_offsets"):
        plan = plan_of(spark, sf_dir, q)
        assert "_slc" in plan, q  # the slice key reached the physical plan
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, q
        assert "BroadcastHashJoin" in plan, q


def test_rank_ops_bounded_sorts(spark, sf_dir):
    # round 9: the rank family (ccnet's ntile, curriculum's global
    # row_number) uses the range-sliced exact rank — the corpus-sized
    # window partitions on (stratum, slice); only the tiny per-slice
    # counts frame windows on the bare stratum key. No full-stratum
    # ntile window, no SMJ/cartesian, offsets/totals attach broadcast.
    plan = plan_of(spark, sf_dir, "ccnet_perplexity_buckets")
    assert "_slc" in plan
    assert "ntile" not in plan  # the full-stratum window is gone
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the row_number window must include the slice key in its partition
    assert "windowspecdefinition(lang" in plan and "_slc" in plan.split(
        "windowspecdefinition(lang", 1
    )[1][:80]

    # curriculum_global_rank: pure Catalyst now — the round-8 DISK_ONLY
    # persist + driver-collected partition offsets + mapInPandas stamp is
    # replaced by the same range-sliced rank (global stratum)
    plan = plan_of(spark, sf_dir, "curriculum_global_rank")
    assert "_slc" in plan
    assert "MapInPandas" not in plan
    assert "InMemoryTableScan" not in plan  # no persist
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q17_single_fact_shuffle_window_decorrelation(spark, sf_dir):
    # the correlated subquery must NOT appear as a second lineitem scan +
    # self-join: one lineitem scan, one partkey exchange for the window
    plan = plan_of(spark, sf_dir, "small_quantity_revenue")
    assert plan.count("Scan parquet") == 2  # lineitem + part, once each
    assert "Window" in plan
    assert "SortMergeJoin" not in plan


def test_decontamination_broadcasts_eval_set(spark, sf_dir):
    # the eval trigram set must broadcast (benchmarks are KBs, the corpus is
    # TBs); a SortMergeJoin here would shuffle every corpus trigram
    plan = plan_of(spark, sf_dir, "decontamination_check")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_simhash_is_shuffle_free_per_row_fold(spark, sf_dir):
    # batch SimHash must be the stateless per-row fold, not the historical
    # explode(tokens x 56 bits) + two keyed aggregations (a 56x row inflation
    # through a shuffle for the same signature)
    plan = plan_of(spark, sf_dir, "dedup_simhash")
    assert "Generate" not in plan  # no explode anywhere
    # the only exchange is the _spread repartition of the single-file scan
    assert plan.count("Exchange") <= 1
    assert "HashAggregate" not in plan


def test_pii_redaction_pure_projection(spark, sf_dir):
    # PII scrub is a per-row regex projection: no shuffle beyond _spread,
    # no Python in the loop
    plan = plan_of(spark, sf_dir, "pii_redaction")
    assert plan.count("Exchange") <= 1
    assert "EvalPython" not in plan
    assert "HashAggregate" not in plan


def test_funnel_chain_scalar_buffers_no_collect(spark, sf_dir):
    # round-10 default (VERDICT r9 #1): the min-after-min CHAIN — every
    # aggregation buffer is a single min(ts), so no collect_list
    # ObjectHashAggregate appears anywhere in the plan (the retired fold
    # rendering's unbounded per-user buffer). The user-keyed joins against
    # 1-row-per-user aggregates are the skew-immune shape; nothing
    # broadcasts a user-sized frame and nothing goes cartesian.
    plan = plan_of(spark, sf_dir, "funnel_view_click_purchase")
    assert "collect_list" not in plan
    assert "ObjectHashAggregate" not in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_new_analytics_avoid_sort_merge_joins(spark, sf_dir):
    # dim/stats sides must broadcast; a SortMergeJoin would shuffle the fact
    for q in ("event_transition_matrix", "retention_cohorts",
              "event_rate_anomaly", "mixture_weights", "text_search_bm25",
              "dedup_incremental"):
        plan = plan_of(spark, sf_dir, q)
        assert "SortMergeJoin" not in plan, q


def test_incremental_dedup_broadcasts_new_batch(spark, sf_dir):
    # the new batch's band keys broadcast against the corpus index — the
    # candidate join must never shuffle the index side
    plan = plan_of(spark, sf_dir, "dedup_incremental")
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_fact_before_shuffle(spark, sf_dir):
    # selective dim -> fact shuffle join: Catalyst injects bloom_filter_agg
    # on the dim keys and a might_contain pre-filter on the fact side below
    # its Exchange, so non-matching fact rows never shuffle. Default
    # thresholds are cluster-scale (10 GB application-side scan); drop them
    # to fixture scale to observe the injection here.
    from pyspark.sql import functions as F

    from mini_flink_spark.session import read_table, runtime_filter_conf

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for k, v in runtime_filter_conf(local_scale=True).items():
            spark.conf.set(k, v)
        o = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = read_table(spark, sf_dir, "lineitem")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # the pre-filter must sit on the fact's scan side, i.e. the fact scan
        # line appears after a might_contain Filter in the same subtree
        fact_side = plan[plan.index("might_contain"):]
        assert "lineitem" in fact_side.lower() or "l_orderkey" in fact_side
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_round2_retrieval_plans(spark, sf_dir):
    # hybrid: each branch's top-k is TakeOrderedAndProject (never a global
    # corpus sort); fusion joins two k-row frames
    plan = plan_of(spark, sf_dir, "hybrid_search_rrf")
    assert plan.count("TakeOrderedAndProject") >= 3
    # the one merge join is the FULL OUTER fusion of the two 20-row top-k
    # frames (broadcast cannot preserve both sides) — it sorts k rows, and
    # must be the ONLY merge join in the plan
    assert plan.count("SortMergeJoin") == 1 and "FullOuter" in plan
    # rerank: candidate fetch broadcasts the k-row side; inference is the
    # Arrow-batched python slot, after the join
    plan = plan_of(spark, sf_dir, "rerank_cross_encoder")
    assert "BroadcastHashJoin" in plan
    assert "MapInPandas" in plan
    # only merge join is the inherited hybrid fusion (k-row FULL OUTER)
    assert plan.count("SortMergeJoin") == 1 and "FullOuter" in plan


def test_round2_agg_plans(spark, sf_dir):
    # heavy hitters: exact re-count joins the broadcast candidate set
    plan = plan_of(spark, sf_dir, "heavy_hitter_tokens")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # per-source quality cut: median broadcast back, no corpus shuffle join
    plan = plan_of(spark, sf_dir, "quality_filter_by_source")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # incremental agg merge: pure aggregation, no join anywhere
    plan = plan_of(spark, sf_dir, "incremental_revenue_agg")
    assert "Join" not in plan
    assert "HashAggregate" in plan
    # kmeans final profile: broadcast-literal assignment -> keyed agg, no join
    plan = plan_of(spark, sf_dir, "kmeans_clusters")
    assert "Join" not in plan


def test_q5_broadcasts_dims_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_perplexity_broadcasts_model(spark, sf_dir):
    # the alphabet^3-bounded trigram model must broadcast; the corpus side
    # must never sort-merge against it
    plan = plan_of(spark, sf_dir, "lm_perplexity_score")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_representatives_component_join_unhinted(spark, sf_dir):
    """r11 contract (1000× probe finding): the components join must NOT be a
    forced broadcast — comp is corpus-scale on a duplicate-heavy corpus.
    The initial plan is a shuffle join of PRUNED doc_ids (no text column in
    any exchange); AQE converts it to a broadcast at runtime when comp is
    actually small, which is the size-scaled behavior we want pinned."""
    plan = plan_of(spark, sf_dir, "dedup_representatives")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchanges and not any("text" in l.lower() for l in exchanges)


def test_duplicate_spans_shuffles_hashes_not_text(spark, sf_dir):
    # the span inventory may shuffle only 8-byte hashes (+ doc ids): the raw
    # text column must die in the scan-side projection, and the aggregation
    # must have a map-side partial pass before its exchange
    plan = plan_of(spark, sf_dir, "dedup_duplicate_spans")
    assert "Join" not in plan
    assert "partial_count" in plan
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchanges and all("span_hash" in l for l in exchanges)
    assert not any("text" in l.lower() for l in exchanges)


def test_gopher_flags_pure_projection(spark, sf_dir):
    # rule flags are a per-row projection: no join, no aggregation exchange
    plan = plan_of(spark, sf_dir, "gopher_quality_flags")
    assert "Join" not in plan
    assert "hashpartitioning" not in plan


def test_span_removal_never_shuffles_text(spark, sf_dir):
    # removal joins positions back on 8-byte hashes; the token arrays / text
    # must stay out of every exchange (reconstruction is scan-side)
    plan = plan_of(spark, sf_dir, "dedup_span_removal")
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchanges
    # match the specific attribute names with a word boundary — a bare
    # "t#" substring would spuriously hit any attribute ending in t
    # (cnt#, kept#) that later appears in an exchange (ADVICE r2 item 4)
    import re

    assert not any(re.search(r"\b(_text|t)#\d", l) for l in exchanges)


def test_dsir_and_ccnet_broadcast_models(spark, sf_dir):
    # both LM scoring passes must broadcast the alphabet^3-bounded models;
    # the corpus side never sort-merges against them
    for q in ("dsir_importance_weights", "ccnet_perplexity_buckets"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, q
        assert "SortMergeJoin" not in plan, q


def test_ir_and_sketch_plans(spark, sf_dir):
    # TF-IDF: vocab df broadcasts; corpus never sort-merges
    plan = plan_of(spark, sf_dir, "tfidf_keywords")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # PMI: unigram tables broadcast; final top-20 is TakeOrderedAndProject
    plan = plan_of(spark, sf_dir, "pmi_collocations")
    assert "TakeOrderedAndProject" in plan and "SortMergeJoin" not in plan
    # Bloom probe: the 1-row filter broadcasts; membership join broadcasts
    plan = plan_of(spark, sf_dir, "sketch_bloom_membership")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # IQR fences: per-source quartiles broadcast back over the corpus
    plan = plan_of(spark, sf_dir, "length_outliers_iqr")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # weighted sampling: global top-k, never a full sort
    plan = plan_of(spark, sf_dir, "weighted_sample_es")
    assert "TakeOrderedAndProject" in plan


def test_source_overlap_histogram_shape(spark, sf_dir):
    # the mask histogram path: no shingle self-join anywhere — the only
    # joins are the broadcast src-index attach and the 190-pair lookup
    plan = plan_of(spark, sf_dir, "source_overlap_matrix")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_intradoc_block_dedup_zero_shuffle(spark, sf_dir):
    # pure per-row array computation: blocks, hashes, first-occurrence filter
    # and rejoin all live in one projection — no exchange, no join
    plan = plan_of(spark, sf_dir, "dedup_intradoc_blocks")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_zipf_fit_topk_not_global_window(spark, sf_dir):
    # the rank window must run over the 100 TakeOrderedAndProject survivors,
    # never the full vocabulary (a bare global row_number would single-thread
    # every token count)
    plan = plan_of(spark, sf_dir, "zipf_fit")
    assert "TakeOrderedAndProject(limit=100" in plan
    lines = plan.splitlines()
    w = next(i for i, l in enumerate(lines) if "Window [row_number()" in l)
    assert any("TakeOrderedAndProject" in l for l in lines[w:w + 4])


def test_feature_hash_embed_single_shuffle(spark, sf_dir):
    # explode → hash-to-dim → one (doc_id, dim) keyed agg with map-side
    # partials; integer weights, no float agg, no join
    plan = plan_of(spark, sf_dir, "feature_hash_embed")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan
    assert "Join" not in plan


def test_ivf_persisted_probe_prunes_partitions(spark, sf_dir):
    # the probe scan must carry the nprobe cells as PartitionFilters (cell is
    # the partitioning column of the persisted index) — directory-level
    # pruning, the point of the layout
    plan = plan_of(spark, sf_dir, "ann_topk_ivf_persisted")
    scan = [l for l in plan.splitlines() if "Scan parquet" in l and "ivf_idx_" in l]
    assert scan, plan[:800]
    assert "PartitionFilters: [cell" in plan


# ---- round-3 additions: gap-fill / EWMA / vocab / split / paths / SCD2 ----


def test_gapfill_dims_broadcast_no_smj(spark, sf_dir):
    # the spine x types grid is a broadcast of the bounded type dim (BNLJ
    # BuildRight over a calendar-bounded spine), and the fill join broadcasts
    # the pre-aggregated hourly counts — no sort-merge join anywhere
    plan = plan_of(spark, sf_dir, "timeseries_gapfill")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_coverage_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "vocab_oov_rate")
    assert "TakeOrderedAndProject(limit=15" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dataset_split_single_exchange(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dataset_split_assign")
    assert plan.count("Exchange hashpartitioning") == 1


def test_event_path_topk_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "event_path_trigrams")
    assert "TakeOrderedAndProject(limit=10" in plan


def test_scd2_single_user_shuffle(spark, sf_dir):
    # lag + running segment sum + segment agg + lead all reuse ONE
    # hashpartitioning(user_id) exchange
    plan = plan_of(spark, sf_dir, "scd2_user_state_history")
    assert plan.count("Exchange hashpartitioning") == 1


def test_full_outer_aggregates_before_join(spark, sf_dir):
    # both sides partial-aggregate to nation cardinality before the join:
    # the exchanges carry groupBy keys, and the join itself is the full outer
    plan = plan_of(spark, sf_dir, "full_outer_nation_activity")
    assert "FullOuter" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per side


def test_cooccurrence_dims_broadcast(spark, sf_dir):
    # item counts + user total ride in as broadcasts; only the per-user
    # pair join and pair counts shuffle
    plan = plan_of(spark, sf_dir, "item_cooccurrence_lift")
    assert "TakeOrderedAndProject(limit=50" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_rolling_revenue_windows_preaggregated_series(spark, sf_dir):
    # the RANGE window runs over the daily aggregate (calendar-bounded), so
    # the single-partition sort sits above a HashAggregate, and the scan
    # prunes to the two referenced columns
    plan = plan_of(spark, sf_dir, "rolling_daily_revenue")
    assert "Window" in plan and "HashAggregate" in plan
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_orderdate" in rs and "o_totalprice" in rs and "o_custkey" not in rs


def test_bm25_persisted_postings_prune_partitions(spark, sf_dir):
    # the persisted-postings read must carry PartitionFilters on the bucket
    # column — term lookups touch ~|terms|/64 of the index
    import tempfile

    from pyspark.sql import functions as F

    from mini_flink_spark import queries_ext as E
    from mini_flink_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="bm25_planpin_")
    E.bm25_persist(docs, path)
    out = E.bm25_query_persisted(spark, path, E._BM25_TERMS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_winnowing_zero_shuffle(spark, sf_dir):
    # fingerprint selection is per-row: one spread exchange of raw rows at
    # most, no hashpartitioning, no join, no Python
    plan = plan_of(spark, sf_dir, "winnowing_fingerprints")
    assert "Join" not in plan
    assert "hashpartitioning" not in plan
    assert "Python" not in plan


def test_url_canonical_dedup_single_group_exchange(spark, sf_dir):
    # canonicalization is scan-side projection; the only exchange groups the
    # canonical key with a map-side partial agg
    plan = plan_of(spark, sf_dir, "url_canonical_dedup")
    assert "Join" not in plan
    assert "partial_min" in plan or "partial_count" in plan
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex and all("canonical_url" in l for l in ex)


def test_paragraph_boilerplate_text_stays_out_of_exchanges(spark, sf_dir):
    # same discipline as span dedup: only 8-byte paragraph hashes (+ ids)
    # may shuffle; raw text dies scan-side
    plan = plan_of(spark, sf_dir, "paragraph_boilerplate")
    import re

    ex = [l for l in plan.splitlines() if "Exchange" in l]
    assert ex
    assert not any(re.search(r"\btext#\d", l) for l in ex)


def test_stats_moments_single_pass(spark, sf_dir):
    # sufficient statistics in one map-combinable aggregation: exactly one
    # partial+final HashAggregate pair over one 1-key exchange, no join
    plan = plan_of(spark, sf_dir, "stats_moments_battery")
    assert "Join" not in plan
    assert "partial_sum" in plan and "partial_count" in plan
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 1 and "l_returnflag" in ex[0]


def test_q2_shape_window_min_over_broadcast_dim(spark, sf_dir):
    # min_cost_supplier: the EUROPE supplier dim broadcasts, the correlated
    # MIN renders as a window (no self-join re-aggregation), and the one big
    # shuffle is lineitem's (part,supp) aggregation
    plan = plan_of(spark, sf_dir, "min_cost_supplier")
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_shape_semi_join_and_name_filter_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "excess_stock_suppliers")
    assert "LeftSemi" in plan
    # the widget name filter reaches the part scan
    assert "StringEndsWith(p_name,widget)" in plan or "EndsWith" in plan
    assert "CartesianProduct" not in plan


def test_classifier_inference_zero_shuffle(spark, sf_dir):
    # quality_classifier_linear is a pure per-row fold: the plan must
    # contain NO exchange of any kind and no Python boundary, and both the
    # token array and the weight fold are bound behind Generate barriers so
    # each runs once per row (not once per consuming expression)
    plan = plan_of(spark, sf_dir, "quality_classifier_linear")
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Generate explode") == 2
    # exactly one tokenizer run (regexp pipeline) and one fold in the plan
    assert plan.count("aggregate(") == 1
    assert plan.count("regexp_replace(lower(") == 1


def test_blocklist_filter_is_broadcast_equi_join(spark, sf_dir):
    # the blocklist broadcasts and matches on the normalized registered
    # domain as an EQUI join — never a suffix-predicate nested loop
    plan = plan_of(spark, sf_dir, "domain_blocklist_filter")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_phash_banding_is_equi_join_with_single_fold(spark, sf_dir):
    # the Hamming band self-join must be an equi join on the band key —
    # never a nested loop over hash pairs — with the XOR/bit_count verify
    # riding on the join condition (no post-join pair blowup). At fixture
    # SF the planner broadcasts one side (fold evaluated per side); at
    # corpus scale the same plan SMJs and ReuseExchange shares one fold.
    plan = plan_of(spark, sf_dir, "multimodal_phash_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin [band" in plan) or ("SortMergeJoin [band" in plan)
    # XOR/bit_count verification present, applied to signature pairs (the
    # hamming filter), and the band join operates on DISTINCT signatures
    # (the round-7 identical-signature collapse)
    # the hamming verify rides the band join condition itself
    band_join_lines = [l for l in plan.splitlines() if "Join [band" in l]
    assert band_join_lines, "no band-keyed join rendered in the plan"
    assert "bit_count" in band_join_lines[0]
    # r12 (VERDICT r11 #5): the GRADED query now carries the
    # MAX_BAND_BUCKET hot-bucket cap — its oracle was rewritten to the
    # banded algorithm's DuckDB twin with the same cap, so the r7-era
    # "uncapped because the O(n²) oracle can't mirror it" rationale no
    # longer applies. The cap's anti-join must be present.
    assert "LeftAnti" in plan


def test_phash_band_cap_renders_anti_join(spark, sf_dir):
    # the corpus-scale entry point (default max_bucket=MAX_BAND_BUCKET)
    # keeps the hot-bucket defense: at least one LeftAnti against over-cap
    # band values survives planning (presence, not an occurrence count —
    # ReuseExchange may legitimately merge the two sides' anti-joins; the
    # distinct-signature collapse is pinned behaviorally in
    # test_simhash_pairs_identical_signature_collapse)
    from mini_flink_spark.functions.dedup import simhash_pairs
    from mini_flink_spark.functions.multimodal import phash_table, text_as_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ph = phash_table(text_as_media(docs, "text", kind="image"))
    pairs = simhash_pairs(
        ph.withColumnRenamed("phash", "simhash"), max_hamming=3, n_blocks=4
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the payload is bound behind a Generate barrier before the gram lambda
    # (higher-order-lambda re-evaluation trap, SCALE_NOTES round 3)
    assert "Generate explode" in plan


def test_epoch_manifest_single_exchange(spark, sf_dir):
    # two epoch projections union into ONE partial-aggregated exchange on
    # (epoch, shard); nothing else shuffles and no Python boundary exists
    plan = plan_of(spark, sf_dir, "epoch_shard_manifest")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_line_filter_suite_is_scan_side(spark, sf_dir):
    # C4 line filters and the Gopher repetition suite are per-row array
    # work: no exchange (beyond the _spread round-robin), no Python, no
    # join — at 100 TB they run inside the corpus scan. The oracle's shape
    # (explode -> groupBy per line/gram) would be four corpus-wide shuffles.
    for q in ("c4_line_filters", "gopher_repetition_suite"):
        plan = plan_of(spark, sf_dir, q)
        assert "Exchange hashpartitioning" not in plan, q
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, q
        assert "Join" not in plan, q
