"""Round-10 hardening: the rank family's enforced precondition + oracle-exact
percentile positions, and the sink's job-unique publish names.

VERDICT r9 #3 / ADVICE r9: `_range_sliced_rank` used to TRUST its
non-null/NaN-free slice precondition — a violation silently dropped rows at
the slice join. Now it raises per-row. ADVICE r9 also caught the percentile
position arithmetic flooring p*(n-1)+1.0 in doubles (an ulp below an integer
rounds across it); the fix floors p*(n-1) itself and adds 1 as an integer,
matching Spark percentile() / DuckDB quantile_cont bit-for-bit.
"""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.queries_pipeline import (
    _percentile_cont_contrib,
    _range_sliced_rank,
)


def test_range_sliced_rank_null_slice_raises_not_drops(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 2.0)],
        "g string, id long, v double",
    )
    # the raise can fire as early as the helper's internal localCheckpoint,
    # so the construction itself sits inside the raises block
    with pytest.raises(Exception, match="_range_sliced_rank"):
        _range_sliced_rank(
            df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"]
        ).collect()


def test_range_sliced_rank_nan_slice_raises_not_drops(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, float("nan")), ("a", 3, 2.0)],
        "g string, id long, v double",
    )
    with pytest.raises(Exception, match="_range_sliced_rank"):
        _range_sliced_rank(
            df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"]
        ).collect()


def test_range_sliced_rank_coalesced_nulls_rank_cleanly(spark):
    # the documented caller-side remedy: coalesce NULL into a real value
    # consistent with the order (nulls-first ASC => below the min)
    df = spark.createDataFrame(
        [("a", 1, 3.0), ("a", 2, None), ("a", 3, 1.0), ("a", 4, None)],
        "g string, id long, v double",
    )
    keyed = df.withColumn("vk", F.coalesce("v", F.lit(-1.0)))
    got = {
        (r["id"]): r["rank"]
        for r in _range_sliced_rank(
            keyed, [F.asc("vk"), F.asc("id")], F.col("vk"), ["g"], n_slices=4
        ).collect()
    }
    assert got == {2: 1, 4: 2, 3: 3, 1: 4}


def test_percentile_positions_match_oracle_at_ulp_edges(spark):
    """Hunt the exact (p, n) pairs where the OLD arithmetic
    (floor(p*(n-1)+1.0) in doubles) and the oracle's (floor(p*(n-1)), then
    an integer +1) pick DIFFERENT ranks — p*(n-1) an ulp below an integer,
    where the double +1.0 rounds across it. Values are spaced 1e12 apart so
    an off-by-one rank is a ~1e12 error, unmistakable next to fp noise."""
    cases = [(1 / 49, 50), (1 / 49, 99), (2 / 49, 50), (1 / 49, 197)]
    for p, n in cases:
        pos = p * (n - 1)
        # confirm these really are the disagreement points: the old double
        # +1.0 lands ON the next integer, the integer-add-after-floor not
        assert math.floor(pos + 1.0) != math.floor(pos) + 1, (p, n, pos)
    for p, n in cases:
        df = spark.createDataFrame(
            [("z", i, float(i) * 1e12) for i in range(n)],
            "g string, id long, v double",
        )
        ranked = _range_sliced_rank(
            df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"], n_slices=4,
            total_col="_n",
        )
        got = ranked.groupBy("g").agg(
            F.sum(_percentile_cont_contrib(p, "v")).alias("x")
        ).collect()[0]["x"]
        exp = df.selectExpr(f"percentile(v, {p!r}) as x").collect()[0]["x"]
        # EXACT equality: the fixed arithmetic performs the oracle's own
        # double ops (frac on the same idx, two products, one add of exact
        # zeros elsewhere); the old arithmetic returned the pure upper
        # order statistic here instead of the epsilon blend — different bits
        assert got == exp, (p, n, got, exp)


def test_percentile_contrib_boundary_ps(spark):
    df = spark.createDataFrame(
        [("z", i, float(i)) for i in range(10)], "g string, id long, v double"
    )
    ranked = _range_sliced_rank(
        df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"], n_slices=4,
        total_col="_n",
    )
    for p, want in ((0.0, 0.0), (1.0, 9.0), (0.5, 4.5)):
        got = ranked.groupBy("g").agg(
            F.sum(_percentile_cont_contrib(p, "v")).alias("x")
        ).collect()[0]["x"]
        assert got == pytest.approx(want, abs=1e-12)


def test_funnel_chain_equals_fold(spark, sf_dir):
    """The bounded min-after-min chain (round-10 default) must reproduce the
    retired collect_list fold row-for-row on real event data."""
    from mini_flink_spark.queries_ext import _funnel_stages
    from mini_flink_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    chain = {r["stage"]: r["n_users"] for r in _funnel_stages(ev).collect()}
    fold = {
        r["stage"]: r["n_users"]
        for r in _funnel_stages(ev, naive=True).collect()
    }
    assert chain == fold and sum(chain.values()) > 0


def test_funnel_chain_edge_semantics(spark):
    """Strict ts ordering between stages, stage 0 for funnel-irrelevant
    users, and click-before-view not counting — the fold's exact semantics
    on a hand-built timeline."""
    rows = [
        # u1: full funnel in order -> stage 3
        ("u1", "view", 10.0), ("u1", "click", 20.0), ("u1", "purchase", 30.0),
        # u2: click at the SAME ts as view (strict > fails) -> stage 1
        ("u2", "view", 10.0), ("u2", "click", 10.0),
        # u3: click BEFORE view -> stage 1 (the later click is missing)
        ("u3", "click", 5.0), ("u3", "view", 10.0),
        # u4: purchase before click -> stage 2
        ("u4", "view", 1.0), ("u4", "purchase", 2.0), ("u4", "click", 3.0),
        # u5: only an unrelated event type -> stage 0
        ("u5", "scroll", 1.0),
    ]
    ev = spark.createDataFrame(
        [(u, t, float(s), f"{u}-{t}-{s}") for u, t, s in rows],
        "user_id string, event_type string, sec double, event_id string",
    ).select(
        "user_id", "event_type", "event_id",
        F.timestamp_seconds("sec").alias("ts"),
    )
    from mini_flink_spark.queries_ext import _funnel_stages

    for naive in (False, True):
        got = {
            r["stage"]: r["n_users"]
            for r in _funnel_stages(ev, naive=naive).collect()
        }
        assert got == {3: 1, 1: 2, 2: 1, 0: 1}, (naive, got)


def test_cooccurrence_cap_drops_bot_user(spark):
    """Planted bot: with the cap injected below its basket size, the bot's
    pairs, item counts, and user-total contribution all vanish — on Spark
    AND on a DuckDB rendering of the same capped semantics."""
    import duckdb

    rows = []
    for u, items in (
        ("a", [1, 2, 3]),
        ("b", [2, 3]),
        ("c", [1, 3]),
        ("bot", [1, 2, 3, 4, 5, 6, 7]),
    ):
        for it in items:
            rows.append((u, "purchase", '{"k": %d}' % it))
    rows.append(("a", "view", '{"k": 99}'))  # non-purchase noise
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, props string"
    )
    from mini_flink_spark.queries_pipeline import _cooccurrence_lift

    got = [
        (r["item_a"], r["item_b"], r["n_co"], r["lift_micros"])
        for r in _cooccurrence_lift(ev, max_basket=5).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pur0 AS SELECT * FROM (VALUES "
        + ",".join(
            f"('{u}', {it})"
            for u, items in (
                ("a", [1, 2, 3]), ("b", [2, 3]), ("c", [1, 3]),
                ("bot", [1, 2, 3, 4, 5, 6, 7]),
            )
            for it in items
        )
        + ") t(user_id, item)"
    )
    exp = con.execute(
        """
        WITH ok AS (SELECT user_id FROM pur0 GROUP BY 1 HAVING count(*) <= 5),
        pur AS (SELECT pur0.* FROM pur0 JOIN ok USING (user_id)),
        ic AS (SELECT item, count(*)::BIGINT AS n_u FROM pur GROUP BY 1),
        u AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM pur),
        co AS (SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS n_co
               FROM pur a JOIN pur b ON a.user_id = b.user_id AND a.item < b.item
               GROUP BY 1, 2)
        SELECT item_a, item_b, n_co,
               round((n_co::DOUBLE * n_users * 1e6) / (ia.n_u::DOUBLE * ib.n_u))::BIGINT
        FROM co JOIN ic ia ON co.item_a = ia.item
        JOIN ic ib ON co.item_b = ib.item CROSS JOIN u
        ORDER BY n_co DESC, item_a, item_b LIMIT 50
        """
    ).fetchall()
    assert sorted(got) == sorted(tuple(r) for r in exp)
    # and the bot's signature pair (6, 7) exists only in its basket
    assert not any(a == 6 and b == 7 for a, b, *_ in got)


def test_cooccurrence_streamed_pairs_equal_registry_at_sf(spark, sf_dir):
    """The streamed posexplode pair generation reproduces the registry
    query end-to-end at test scale (no user near the real cap here — the
    cap's engagement is the planted-bot test above)."""
    from mini_flink_spark.queries import QUERIES

    df = QUERIES["item_cooccurrence_lift"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    assert all(r["item_a"] < r["item_b"] for r in rows)


def test_batch_sink_second_job_appends_instead_of_clobbering(tmp_path):
    """ADVICE r9 (medium): partition-only part names made a second
    non-overwrite job to the same directory silently clobber the first
    job's files. The job token (minted per writer instance on the driver)
    keeps retry-idempotency within a job while separating jobs."""
    from pyspark.sql import Row

    from mini_flink_spark.sources.python_sink import _JsonlBatchWriter

    out = str(tmp_path / "append_out")
    j1 = _JsonlBatchWriter({"path": out})
    j2 = _JsonlBatchWriter({"path": out})
    m1 = j1.write(iter([Row(id=i) for i in range(5)]))
    m2 = j2.write(iter([Row(id=i) for i in range(5, 9)]))
    assert m1.path != m2.path, "cross-job part names must not collide"
    # within-job determinism still holds: a retry republishes the same path
    m1r = j1.write(iter([Row(id=i) for i in range(5)]))
    assert m1r.path == m1.path
    j1.commit([m1r])
    j2.commit([m2])
    rows = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                rows.extend(json.loads(line)["id"] for line in f)
    assert sorted(rows) == list(range(9))


# --- round-10 additions (exactness is the oracle-parity/driver gate; these
# pin the semantics the hash can't express) ---


def test_doc_chunk_offsets_geometry(spark, sf_dir):
    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.queries_pipeline import CHUNK_STRIDE, CHUNK_TOKENS

    df = QUERIES["doc_chunk_offsets"].fn(spark, sf_dir).toPandas()
    assert len(df) > 0
    assert (df.start_tok == df.chunk_id * CHUNK_STRIDE).all()
    assert (df.end_tok > df.start_tok).all()  # every chunk non-empty
    assert (df.end_tok - df.start_tok <= CHUNK_TOKENS).all()
    last = df.sort_values("chunk_id").groupby("doc_id").last()
    first = df.groupby("doc_id").chunk_id.min()
    assert (first == 0).all()  # chunk 0 always exists for a non-empty doc
    # the final chunk is clipped to the doc, never past it
    assert (last.end_tok - last.start_tok <= CHUNK_TOKENS).all()


def test_vocab_coverage_bounds(spark, sf_dir):
    from mini_flink_spark.queries import QUERIES

    df = QUERIES["vocab_coverage_top100"].fn(spark, sf_dir).toPandas()
    assert len(df) > 0
    assert (df.top100_coverage_micros <= 1_000_000).all()
    assert (df.top100_coverage_micros > 0).all()
    # with a vocabulary bigger than 100 types, coverage is strictly < 100%
    big = df[df.vocab_size > 100]
    assert (big.top100_coverage_micros < 1_000_000).all()


def test_rfm_quartiles_match_native_ntile(spark, sf_dir):
    """The three _range_sliced_rank + _ntile_from_rank passes must equal
    native ntile(4) windows cell-for-cell."""
    from pyspark.sql.window import Window as W

    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.session import read_table

    got = {
        (r["r_q"], r["f_q"], r["m_q"]): r["n_customers"]
        for r in QUERIES["rfm_segment_counts"].fn(spark, sf_dir).collect()
    }
    o = read_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("r"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum("o_totalprice").cast("double").alias("m"),
    )
    native = cust.select(
        F.ntile(4).over(W.orderBy("r", "o_custkey")).cast("bigint").alias("r_q"),
        F.ntile(4).over(W.orderBy("f", "o_custkey")).cast("bigint").alias("f_q"),
        F.ntile(4).over(W.orderBy("m", "o_custkey")).cast("bigint").alias("m_q"),
    ).groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    exp = {
        (r["r_q"], r["f_q"], r["m_q"]): r["n_customers"]
        for r in native.collect()
    }
    assert got == exp


def test_funnel_conversion_rates_monotone(spark, sf_dir):
    from mini_flink_spark.queries import QUERIES

    rows = {
        r["step"]: r
        for r in QUERIES["funnel_conversion_rates"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    assert rows["1_view"]["conv_from_prev_micros"] == 1_000_000
    assert (
        rows["1_view"]["n_reached"]
        >= rows["2_click"]["n_reached"]
        >= rows["3_purchase"]["n_reached"]
    )


def test_pagerank_edges_cap_drops_bot_user(spark):
    """The r10 audit find: pagerank's edge build shares the MAX_BASKET
    guard. Planted bot above an injected cap contributes NO edges; normal
    users' edge sets are unaffected."""
    rows = []
    for u, items in (
        ("a", [1, 2]),
        ("b", [2, 3]),
        ("bot", [1, 2, 3, 4, 5, 6]),
    ):
        for it in items:
            rows.append((u, "purchase", '{"k": %d}' % it))
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, props string"
    )
    from mini_flink_spark.queries_pipeline import _item_copurchase_edges

    got = {
        (r["src"], r["dst"])
        for r in _item_copurchase_edges(ev, max_basket=4).collect()
    }
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_sliced_event_ops_null_ts_raises(spark):
    """The _range_sliced_rank guard's siblings: the time-sliced event ops
    must fail loudly on NULL ts instead of silently dropping (trigrams) or
    re-ordering (transition matrix) the malformed rows."""
    import mini_flink_spark.queries  # noqa: F401 (registration import contract)
    from mini_flink_spark.queries_ext import transition_matrix_plan
    from mini_flink_spark.queries_pipeline import path_trigrams_plan

    ev = spark.createDataFrame(
        [("u1", "view", "e1", 1.0), ("u1", "click", "e2", None),
         ("u1", "purchase", "e3", 3.0)],
        "user_id string, event_type string, event_id string, sec double",
    ).select(
        "user_id", "event_type", "event_id",
        F.timestamp_seconds("sec").alias("ts"),
    )
    for plan in (transition_matrix_plan, path_trigrams_plan):
        with pytest.raises(Exception, match="NULL ts"):
            plan(ev, slices=8).collect()


def test_null_stratum_ranks_exactly_like_the_window(spark):
    """A NULL stratum is a legitimate window partition; the decomposed rank
    must keep it (r10: the internal joins are null-safe — a plain equi-join
    silently dropped the whole NULL group)."""
    from pyspark.sql.window import Window as W

    rows = [("a", 1, 3.0), ("a", 2, 1.0), (None, 3, 2.0), (None, 4, 1.0),
            ("b", 5, 9.0), (None, 6, 5.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        r["id"]: (r["rank"], r["_n"])
        for r in _range_sliced_rank(
            df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"], n_slices=4,
            total_col="_n",
        ).collect()
    }
    w = W.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    exp = {
        r["id"]: (r["rank"], r["_n"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(W.partitionBy("g")))
        .collect()
    }
    assert got == exp and len(got) == len(rows)


def test_null_stratum_cumsum_exactly_like_the_window(spark):
    from mini_flink_spark.queries_pipeline import _md5_prefix_cumsum

    rows = [("a", 1, 10), ("a", 2, 20), (None, 3, 5), (None, 4, 7), ("b", 5, 1)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, v long")
    got = {
        r["doc_id"]: r["cum"]
        for r in _md5_prefix_cumsum(df, "v", "lang", "doc_id", prefix_len=1).collect()
    }
    exp = {
        r["doc_id"]: r["cum"]
        for r in _md5_prefix_cumsum(df, "v", "lang", "doc_id", prefix_len=0).collect()
    }
    assert got == exp and len(got) == len(rows)


def test_trigrams_null_user_kept_like_naive(spark):
    """A NULL user_id is one pseudo-user in GROUP BY semantics; the sliced
    positional joins must keep its trigrams (r10 null-safe joins), matching
    the naive collect_list shape exactly."""
    import mini_flink_spark.queries  # noqa: F401 (registration import contract)
    from mini_flink_spark.queries_pipeline import path_trigrams_plan

    rows = [(None, t, f"e{i}", float(i)) for i, t in
            enumerate(["view", "click", "purchase", "view", "click"])]
    rows += [("u1", t, f"f{i}", float(i)) for i, t in
             enumerate(["view", "view", "view"])]
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, event_id string, sec double"
    ).select(
        "user_id", "event_type", "event_id",
        F.timestamp_seconds("sec").alias("ts"),
    )
    naive = {(r["trigram"], r["n"]) for r in path_trigrams_plan(ev, slices=None).collect()}
    sliced = {(r["trigram"], r["n"]) for r in path_trigrams_plan(ev, slices=8).collect()}
    assert naive == sliced
    assert any("view click purchase" == t for t, _ in sliced)


def test_basket_guard_drops_oversized_null_pseudo_user(spark):
    """A NULL user_id whose pseudo-basket exceeds the cap must be dropped
    like any bot — the plain anti-join's NULL key never matches, so before
    the null-safe fix an oversized NULL-user basket evaded the guard."""
    rows = [("a", "purchase", '{"k": 1}'), ("a", "purchase", '{"k": 2}')]
    rows += [(None, "purchase", '{"k": %d}' % i) for i in range(10)]
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, props string"
    )
    from mini_flink_spark.queries_pipeline import (
        _cooccurrence_lift,
        _item_copurchase_edges,
    )

    pairs = _cooccurrence_lift(ev, max_basket=5).collect()
    assert [(r["item_a"], r["item_b"]) for r in pairs] == [(1, 2)]
    edges = {(r["src"], r["dst"]) for r in _item_copurchase_edges(ev, max_basket=5).collect()}
    assert edges == {(1, 2), (2, 1)}
