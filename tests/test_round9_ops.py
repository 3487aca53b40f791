"""Round 9: the range-sliced exact rank family.

`_range_sliced_rank` is the rank sibling of `_md5_prefix_cumsum`: ranks
decompose exactly like prefix sums, so a per-stratum row_number (and from
it, ntile and percentile_cont) never needs a full-stratum sort. These
tests pin bit-identity against the native window/aggregate machinery, the
closed-form ntile arithmetic (including the n < k degenerate tiles), the
percentile interpolation weights, and the boundary-insensitivity claim
(any monotone bucketing — width_bucket here — still gives EXACT ranks).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mini_flink_spark.queries_pipeline import _ntile_from_rank, _range_sliced_rank


def _mkdf(spark, n=2000):
    # ties in v on purpose: slice boundaries land ON tied values, and the
    # doc_id tiebreak must resolve identically in both rank constructions
    return spark.createDataFrame(
        [(i, "a" if i % 3 else "b", float((i * 17) % 40) / 7.0) for i in range(n)],
        "doc_id bigint, lang string, v double",
    )


def test_range_sliced_rank_matches_window_stratified(spark):
    df = _mkdf(spark)
    w = Window.partitionBy("lang").orderBy("v", "doc_id")
    exp = {
        (r.doc_id, r.rk)
        for r in df.select("doc_id", F.row_number().over(w).alias("rk")).collect()
    }
    got = {
        (r.doc_id, r["rank"])
        for r in _range_sliced_rank(
            df, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["lang"], n_slices=16
        ).collect()
    }
    assert exp == got


def test_range_sliced_rank_matches_window_global_desc(spark):
    # no stratum + descending primary: slice_expr is the negated key
    df = _mkdf(spark)
    w = Window.orderBy(F.desc("v"), F.asc("doc_id"))
    exp = {
        (r.doc_id, r.rk)
        for r in df.select("doc_id", F.row_number().over(w).alias("rk")).collect()
    }
    got = {
        (r.doc_id, r["rank"])
        for r in _range_sliced_rank(
            df, [F.desc("v"), F.asc("doc_id")], -F.col("v"), n_slices=16
        ).collect()
    }
    assert exp == got


def test_range_sliced_rank_exact_under_any_slice_count(spark):
    # boundary-insensitivity: 1 slice, more slices than rows, and a prime
    # count must all give the identical exact ranks (balance is a
    # performance property, never a correctness one)
    df = _mkdf(spark, n=300)
    w = Window.partitionBy("lang").orderBy("v", "doc_id")
    exp = {
        (r.doc_id, r.rk)
        for r in df.select("doc_id", F.row_number().over(w).alias("rk")).collect()
    }
    for ns in (1, 7, 512):
        got = {
            (r.doc_id, r["rank"])
            for r in _range_sliced_rank(
                df, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["lang"], n_slices=ns
            ).collect()
        }
        assert exp == got, ns


def test_range_sliced_rank_total_col(spark):
    df = _mkdf(spark, n=400)
    out = _range_sliced_rank(
        df, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["lang"], total_col="_n"
    )
    per = {r.lang: (r.mx, r.n0) for r in out.groupBy("lang").agg(
        F.max("rank").alias("mx"), F.min("_n").alias("n0")).collect()}
    truth = {r.lang: r.c for r in df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    for lang, (mx, n0) in per.items():
        assert mx == truth[lang] == n0


@pytest.mark.parametrize("k", [2, 3, 4, 7])
def test_ntile_from_rank_matches_native(spark, k):
    df = _mkdf(spark, n=997)  # prime: exercises every remainder class
    w = Window.partitionBy("lang").orderBy("v", "doc_id")
    exp = {
        (r.doc_id, r.t)
        for r in df.select("doc_id", F.ntile(k).over(w).alias("t")).collect()
    }
    ranked = _range_sliced_rank(
        df, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["lang"], total_col="_n"
    )
    got = {
        (r.doc_id, r.t)
        for r in ranked.select(
            "doc_id", _ntile_from_rank("rank", "_n", k).alias("t")
        ).collect()
    }
    assert exp == got


def test_ntile_from_rank_fewer_rows_than_tiles(spark):
    # n < k: native ntile gives each row its own tile = rank; the closed
    # form's base is 0 and the guarded else-branch must never fire
    tiny = spark.createDataFrame(
        [(1, "z", 0.5), (2, "z", 0.1)], "doc_id bigint, lang string, v double"
    )
    w = Window.partitionBy("lang").orderBy("v", "doc_id")
    exp = {
        (r.doc_id, r.t)
        for r in tiny.select("doc_id", F.ntile(5).over(w).alias("t")).collect()
    }
    ranked = _range_sliced_rank(
        tiny, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["lang"], total_col="_n"
    )
    got = {
        (r.doc_id, r.t)
        for r in ranked.select(
            "doc_id", _ntile_from_rank("rank", "_n", 5).alias("t")
        ).collect()
    }
    assert exp == got


def test_percentile_cont_contrib_matches_percentile_aggregate(spark):
    # the rank-decomposed percentile must reproduce Spark's exact
    # percentile() aggregate across interpolation cases: p hitting a row
    # exactly, p between rows, tiny strata (n=1, n=2), duplicate values
    from mini_flink_spark.queries_pipeline import (
        _percentile_cont_contrib,
        _range_sliced_rank,
    )

    rows = []
    # stratum a: 997 rows with duplicates; b: n=2; c: n=1
    rows += [(i, "a", float((i * 13) % 97)) for i in range(997)]
    rows += [(2001, "b", 10.0), (2002, "b", 20.0), (3001, "c", 42.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string, v double")
    ranked = _range_sliced_rank(
        df, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["g"], total_col="_n"
    )
    for p in (0.0, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0):
        exp = {
            r.g: r.e
            for r in df.groupBy("g")
            .agg(F.round(F.expr(f"percentile(v, {p})"), 6).alias("e"))
            .collect()
        }
        got = {
            r.g: r.e
            for r in ranked.groupBy("g")
            .agg(F.round(F.sum(_percentile_cont_contrib(p, "v")), 6).alias("e"))
            .collect()
        }
        assert exp == got, (p, exp, got)


def test_event_sequence_plans_sliced_equals_naive(spark):
    # the time-sliced skew-immune defaults must reproduce the naive plans'
    # result multisets exactly — including the edge cases the boundary
    # stitching must survive: duplicate timestamps (event_id tiebreak),
    # single-event users (no pairs, no trigrams), a hot user spanning many
    # slices, and slice counts exceeding the distinct-ts count
    import datetime

    import mini_flink_spark.queries  # noqa: F401 (registry import contract)
    from mini_flink_spark.queries_ext import transition_matrix_plan
    from mini_flink_spark.queries_pipeline import path_trigrams_plan

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hot user 0: 400 events, heavy ts duplication (4 events per second)
    for i in range(400):
        rows.append((eid, 0, base + datetime.timedelta(seconds=i // 4),
                     ["view", "click", "purchase", "cart"][i % 4], 1.0))
        eid += 1
    # normal users 1..30: 3 events each, some sharing timestamps
    for u in range(1, 31):
        for j in range(3):
            rows.append((eid, u, base + datetime.timedelta(seconds=u + j),
                         ["view", "click", "purchase"][j], 1.0))
            eid += 1
    # single-event users (contribute nothing to pairs/trigrams)
    for u in range(31, 36):
        rows.append((eid, u, base, "view", 1.0))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    for slices in (4, 64, 10_000):
        a = sorted(map(tuple, transition_matrix_plan(ev, slices=None).collect()))
        b = sorted(map(tuple, transition_matrix_plan(ev, slices=slices).collect()))
        assert a == b, f"transition_matrix diverged at slices={slices}"
        a = sorted(map(tuple, path_trigrams_plan(ev, slices=None).collect()))
        b = sorted(map(tuple, path_trigrams_plan(ev, slices=slices).collect()))
        assert a == b, f"path_trigrams diverged at slices={slices}"


def test_range_sliced_rank_random_frames_property(spark):
    # randomized pin (fixed seeds — deterministic in CI): arbitrary value
    # distributions including negatives, heavy duplication, and skewed
    # strata must all rank bit-identically to the native window
    import random

    for seed in (7, 1234, 999331):
        rng = random.Random(seed)
        n = rng.randint(50, 1500)
        langs = ["x", "y", "z"][: rng.randint(1, 3)]
        rows = [
            (
                i,
                # skew: most rows land in the first stratum
                langs[0] if rng.random() < 0.8 else rng.choice(langs),
                # negatives + duplicates: values drawn from a small grid
                float(rng.randint(-50, 50)) / rng.choice([1, 2, 4]),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string, v double")
        w = Window.partitionBy("lang").orderBy("v", "doc_id")
        exp = {
            (r.doc_id, r.rk)
            for r in df.select("doc_id", F.row_number().over(w).alias("rk")).collect()
        }
        got = {
            (r.doc_id, r["rank"])
            for r in _range_sliced_rank(
                df,
                [F.asc("v"), F.asc("doc_id")],
                F.col("v"),
                ["lang"],
                n_slices=rng.choice([2, 16, 256]),
            ).collect()
        }
        assert exp == got, seed
