"""Pins the driver-graded window: the driver grades exactly the first 50
queries in registration order (CORRECTNESS_r{N}.json), so `all_queries()`
must lead with the curated GRADED_WINDOW.

Rotation policy (VERDICT r3 "Next round" #3): 25 slots are PINNED — the 15
SURVEY §2 reference-surface rows plus 10 flagship LLM-pipeline anchors —
and the other 25 slots ROTATE each round — to never-graded queries first,
then declared changed-shape regrades, then an oldest-verdict refresh
(round-9 amendment; 211 registered queries as of round 10).
Every windowed query must carry a DuckDB oracle (a no-oracle row inside the
window wastes a graded slot on a weaker rows-only check)."""

from __future__ import annotations

import json
import os

from mini_flink_spark.queries import GRADED_WINDOW, QUERIES, all_oracles, all_queries

# One driver row per §2 operator (VERDICT r2/r3 operator table) — these must
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

# Flagship LLM-pipeline anchors (VERDICT r3: keep ~10 fixed across rotations;
# dedup_embedding_cosine pinned to certify the round-4 de-vacuation).
LLM_FLAGSHIP = {
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_duplicate_spans",
    "dedup_span_removal",
    "dedup_embedding_cosine",
    "ann_topk_lsh",
    "heavy_hitter_tokens",
    "gopher_quality_flags",
    "curation_pipeline_v2",
    "bpe_learn_merges",
}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifacts() -> list[dict]:
    """All recorded CORRECTNESS_r*.json artifacts in round order (globbed,
    not a pinned range — a pinned range silently stops reading new rounds),
    EXCLUDING any artifact that is the CURRENT window's own grading record
    (key set == GRADED_WINDOW): once the driver grades this window, its
    artifact must not retroactively flag the very window it recorded — the
    no-regrade guard compares a window against the rounds BEFORE it. Two
    windows can never share a key set under the no-regrade policy itself
    (25 slots always rotate to new names), so the exclusion is unambiguous."""
    import glob

    window = set(GRADED_WINDOW)
    out = []
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            art = json.load(f)
        if set(art) != window:
            out.append(art)
    return out


def _previously_graded() -> set[str]:
    names: set[str] = set()
    for art in _artifacts():
        names |= set(art)
    return names


def _regrade_allowed() -> set[str]:
    """A rotation slot may REGRADE a query only while its LATEST recorded
    driver verdict is NOT FULLY GREEN — an err (pq_codes r5: canonicalizer
    crash on array output, reshaped scalar in r6) or a red match flag
    (priority_shipping_counts r6: hash_match false on an oracle typing bug,
    ::BIGINT-fixed in r7). The exemption self-expires the moment a green row
    lands; a green row is never regraded."""
    last: dict[str, dict] = {}
    for art in _artifacts():
        last.update(art)
    return {
        name
        for name, row in last.items()
        if row.get("err")
        or not (
            row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
        )
    }


def test_window_is_first_50():
    assert len(GRADED_WINDOW) == 50
    assert list(all_queries())[:50] == list(GRADED_WINDOW)


def test_window_covers_s2_and_flagship():
    window = set(GRADED_WINDOW)
    assert S2_ROWS <= window
    assert LLM_FLAGSHIP <= window


def test_rotation_slots_are_never_graded():
    """The 25 non-pinned slots must be spent, in priority order, on
    (a) queries without a prior driver verdict, (b) red/err rows awaiting a
    fixed regrade, (c) declared changed-shape regrades (round-9 amendment:
    VERDICT r8 #1 explicitly orders regrades of queries whose plan was
    rewritten after their verdict — CHANGED_SHAPE_REGRADES in queries.py
    names them with the round+reason), and (d) once the never-graded pool
    runs dry, an oldest-verdict refresh drained OLDEST-FIRST: a slot may
    re-certify a row from artifact round i only if every green row from
    rounds < i is also in this window's refresh set — no skipping over an
    older verdict to re-certify a newer one. (Round-11 amendment: the
    original rule admitted only the SINGLE oldest artifact, which deadlocks
    when that artifact holds fewer rows than there are slots — round 11
    faced 1 r2-era row + 25 r3-era rows against 17 free slots, and VERDICT
    r10 #2 orders the whole stale pool drained as fast as slots allow.)"""
    from mini_flink_spark.queries import CHANGED_SHAPE_REGRADES

    prior = _previously_graded()
    if not prior:  # artifacts absent (fresh clone) — nothing to check
        return
    rotation = [n for n in GRADED_WINDOW if n not in S2_ROWS | LLM_FLAGSHIP]
    assert len(rotation) == 25
    regrade_ok = _regrade_allowed() | set(CHANGED_SHAPE_REGRADES)
    refresh = [n for n in rotation if n in prior and n not in regrade_ok]
    if refresh:
        # refresh slots allowed only once never-graded names are exhausted
        ungraded_outside = [
            n for n in QUERIES if n not in prior and n not in GRADED_WINDOW
        ]
        assert not ungraded_outside, (
            f"refresh slots used while never-graded queries wait: "
            f"{ungraded_outside[:5]}"
        )
        # and refresh rows must drain the verdict pool OLDEST-FIRST: no row
        # from round i while a green row from an earlier round is skipped
        last_round: dict[str, int] = {}
        for i, art in enumerate(_artifacts()):
            for name in art:
                last_round[name] = i
        graded_green = [n for n in last_round if n not in regrade_ok]
        newest_refreshed = max(last_round[n] for n in refresh)
        skipped = [
            n
            for n in graded_green
            if last_round[n] < newest_refreshed and n not in refresh
        ]
        assert not skipped, (
            f"refresh drains oldest-first: the window refreshes rows from "
            f"round-index {newest_refreshed} while these OLDER green rows "
            f"are skipped: {skipped}"
        )


def test_window_queries_all_registered_with_oracles():
    oracles = all_oracles()
    for name in GRADED_WINDOW:
        assert name in QUERIES, name
        assert name in oracles and oracles[name], name


def test_reorder_drops_nothing():
    assert set(all_queries()) == set(QUERIES)
    assert len(all_queries()) == len(QUERIES)
