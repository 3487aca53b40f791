"""Round-11 hardening — the four ADVICE r10 findings plus VERDICT r10 #1.

The test corpus carries no NULL user_id / NULL ts rows, so every divergence
these fixes close is LATENT there: the driver's sf0.01 grade would stay
green with or without them. The evidence therefore lives here, on planted
frames — each engine-vs-oracle test registers the same toy data with DuckDB
and runs the REGISTERED oracle SQL against it, so the consistency contract
is checked end-to-end, not asserted by hand.

1. `_percentile_cont_contrib` gates the hi branch on frac > 0: at an
   integral position (p*(n-1) whole) engines return the order statistic at
   lo untouched, so a ±Inf/NaN neighbor at lo+1 must not poison the stratum
   via v * 0.0 = NaN.
2. The sliced event-sequence plans raise on ts IS NULL directly — the
   degenerate single-timestamp branch used to assign slice 1 to NULL-ts
   rows before the inferred NULL-_slc check could see them.
3. The basket family (item_cooccurrence_lift, pagerank_item_graph) filters
   NULL user_id on both engines — GROUP BY's NULL pseudo-basket vs the
   oracle equi-join's silent no-match emitted different pair/edge sets.
4. funnel_conversion_rates' oracle excludes NULL user_id from v, matching
   the chain where an anonymous view never reaches r1.
5. pagerank's out-degree rides as a column of the checkpointed edge table —
   no per-iteration node-sized broadcast (VERDICT r10 #1).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mini_flink_spark.queries import QUERIES
from mini_flink_spark.queries_pipeline import (
    _item_copurchase_edges,
    _percentile_cont_contrib,
    _range_sliced_rank,
    pagerank_plan,
)


# ---------------------------------------------------------------- percentile


def _ranked(spark, values):
    df = spark.createDataFrame(
        [("z", i, float(v)) for i, v in enumerate(values)],
        "g string, id long, v double",
    )
    return _range_sliced_rank(
        df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"], n_slices=4,
        total_col="_n",
    )


def _pctl(ranked, p):
    return ranked.groupBy("g").agg(
        F.sum(_percentile_cont_contrib(p, "v")).alias("x")
    ).collect()[0]["x"]


def test_percentile_integral_position_immune_to_inf_neighbor(spark):
    """p=0.75 over n=5 → pos = 3.0 exactly: the answer is the rank-4 order
    statistic and rank 5 must not be touched. With +Inf planted at rank 5,
    the ungated hi branch contributed inf * 0.0 = NaN and poisoned the
    stratum sum; the frac > 0 gate returns the exact 4.0."""
    ranked = _ranked(spark, [1.0, 2.0, 3.0, 4.0, float("inf")])
    assert _pctl(ranked, 0.75) == 4.0
    # p=1.0 (pos = n-1, integral): the max itself — here the Inf, which IS
    # the legitimate answer and must come back as Inf, not NaN
    assert _pctl(ranked, 1.0) == float("inf")


def test_percentile_p0_immune_to_inf_at_second_rank(spark):
    """p=0.0 → pos = 0.0: rank 1 carries everything; an Inf at rank 2 used
    to leak through the hi branch as inf * 0.0."""
    ranked = _ranked(spark, [float("inf"), 5.0, 7.0])  # sorts to rank 3
    ranked_lo = _ranked(spark, [2.0, float("inf"), 9.0])
    assert _pctl(ranked_lo, 0.0) == 2.0
    assert _pctl(ranked, 0.0) == 5.0


def test_percentile_frac_gate_bit_identical_on_finite_values(spark):
    """For non-integral positions and finite values the gate must change
    nothing: exact equality against Spark's percentile() across a p sweep
    (the r10 ulp-crossing pins re-asserted through the gated branch)."""
    values = [float(i) * 1e12 for i in range(50)]
    ranked = _ranked(spark, values)
    df = spark.createDataFrame(
        [("z", float(v)) for v in values], "g string, v double"
    )
    for p in (1 / 49, 2 / 49, 0.25, 0.5, 0.75, 0.95):
        exp = df.selectExpr(f"percentile(v, {p!r}) as x").collect()[0]["x"]
        assert _pctl(ranked, p) == exp, p


# ------------------------------------------------------- NULL-ts loud guard


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def test_transition_matrix_null_ts_raises_in_degenerate_branch(spark):
    """ONE distinct timestamp + a NULL-ts row: _hi > _lo is false, so the
    r10 guard's `otherwise(lit(1))` silently admitted the NULL-ts row at
    slice 1. The direct ts-IS-NULL raise fires first (ADVICE r10)."""
    from datetime import datetime

    from mini_flink_spark.queries_ext import transition_matrix_plan
    from mini_flink_spark.queries_pipeline import path_trigrams_plan

    t = datetime(2024, 1, 1)
    rows = [(1, t, 1, "view"), (1, t, 2, "click"), (2, None, 3, "view")]
    with pytest.raises(Exception, match="NULL ts"):
        transition_matrix_plan(_events_df(spark, rows)).collect()
    with pytest.raises(Exception, match="NULL ts"):
        path_trigrams_plan(_events_df(spark, rows)).collect()


def test_transition_matrix_all_null_ts_raises(spark):
    """All-NULL ts: _lo/_hi are NULL, _hi > _lo is NULL — the other route
    into the degenerate branch. Must raise, not return slice-1 garbage."""
    from mini_flink_spark.queries_ext import transition_matrix_plan

    rows = [(1, None, 1, "view"), (1, None, 2, "click")]
    with pytest.raises(Exception, match="NULL ts"):
        transition_matrix_plan(_events_df(spark, rows)).collect()


def test_transition_matrix_degenerate_single_ts_still_works(spark):
    """The legitimate degenerate case — every event at the same instant, no
    NULLs — must keep working: one slice, pairs ordered by event_id within
    it, equal to the naive (slices=None) baseline."""
    from datetime import datetime

    from mini_flink_spark.queries_ext import transition_matrix_plan

    t = datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "view"), (1, t, 2, "click"), (1, t, 3, "purchase"),
        (2, t, 4, "view"), (2, t, 5, "view"),
    ]
    ev = _events_df(spark, rows)
    sliced = {
        (r["cur"], r["nxt"]): r["n"]
        for r in transition_matrix_plan(ev).collect()
    }
    naive = {
        (r["cur"], r["nxt"]): r["n"]
        for r in transition_matrix_plan(ev, slices=None).collect()
    }
    assert sliced == naive
    assert sliced[("view", "click")] == 1 and sliced[("view", "view")] == 1


# ------------------------------------------- NULL-user basket consistency


def _events_pdf(rows):
    """rows: (user_id|None, ts, event_id, event_type, props|None) → the
    pandas frame DuckDB registers as the `events` view for oracle SQL."""
    return pd.DataFrame(
        {
            "user_id": pd.array([r[0] for r in rows], dtype="Int64"),
            "ts": pd.to_datetime([r[1] for r in rows]),
            "event_id": pd.array([r[2] for r in rows], dtype="int64"),
            "event_type": [r[3] for r in rows],
            "props": [r[4] for r in rows],
            "value": [1.0] * len(rows),
        }
    )


def _spark_events(spark, pdf):
    rows = [
        (
            None if pd.isna(r.user_id) else int(r.user_id),
            r.ts.to_pydatetime(),
            int(r.event_id),
            r.event_type,
            r.props,
            float(r.value),
        )
        for r in pdf.itertuples()
    ]
    return spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string, "
        "props string, value double",
    )


def _oracle(pdf, sql):
    con = duckdb.connect()
    con.register("events", pdf)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_cooccurrence_null_user_consistent_with_oracle(spark):
    """Planted anonymous purchases: u1/u2 both buy {1,2}; a NULL user buys
    {1,3}. Before r11 the engine's GROUP BY fused the anonymous rows into a
    pseudo-basket (emitting a (1,3) pair and counting a third 'user') while
    the oracle's equi-join emitted nothing for it — a silent lift skew. Both
    engines now drop NULL users, and this runs the REGISTERED oracle SQL on
    the same planted frame to prove they agree."""
    from datetime import datetime

    from mini_flink_spark.queries_pipeline import _cooccurrence_lift

    t = datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "purchase", '{"k": 1}'),
        (1, t, 2, "purchase", '{"k": 2}'),
        (2, t, 3, "purchase", '{"k": 1}'),
        (2, t, 4, "purchase", '{"k": 2}'),
        (None, t, 5, "purchase", '{"k": 1}'),
        (None, t, 6, "purchase", '{"k": 3}'),
    ]
    pdf = _events_pdf(rows)
    got = {
        (r["item_a"], r["item_b"]): (r["n_co"], r["lift_micros"])
        for r in _cooccurrence_lift(_spark_events(spark, pdf)).collect()
    }
    exp = {
        (int(r.item_a), int(r.item_b)): (int(r.n_co), int(r.lift_micros))
        for r in _oracle(
            pdf, QUERIES["item_cooccurrence_lift"].oracle
        ).itertuples()
    }
    assert got == exp
    assert (1, 3) not in got  # the pseudo-basket's pair is gone
    # 2 users, both bought {1,2}: n_co=2, lift = 2·2/(2·2) = 1.0 → 1e6 micros
    assert got[(1, 2)] == (2, 1000000)


def test_pagerank_null_user_consistent_with_oracle(spark):
    """Planted graph with an anonymous basket: engine vs the registered
    unrolled-SQL oracle on the same frame. The NULL user's {3,4} edges must
    appear in NEITHER — before r11 the engine emitted them (GROUP BY) and
    the oracle did not (equi-join)."""
    from datetime import datetime

    t = datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "purchase", '{"k": 1}'),
        (1, t, 2, "purchase", '{"k": 2}'),
        (2, t, 3, "purchase", '{"k": 2}'),
        (2, t, 4, "purchase", '{"k": 3}'),
        (None, t, 5, "purchase", '{"k": 3}'),
        (None, t, 6, "purchase", '{"k": 4}'),
    ]
    pdf = _events_pdf(rows)
    got = {
        r["item"]: r["rank_micros"]
        for r in pagerank_plan(_spark_events(spark, pdf)).collect()
    }
    exp = {
        int(r.item): int(r.rank_micros)
        for r in _oracle(pdf, QUERIES["pagerank_item_graph"].oracle).itertuples()
    }
    assert got == exp
    assert 4 not in got  # the anonymous basket's node contributed nothing


def test_copurchase_edges_degree_column_and_no_null_user(spark):
    """The r11 edge table carries the out-degree as column `d` (the fold
    that retired the per-iteration broadcast(deg)) and ignores NULL-user
    purchases entirely."""
    from datetime import datetime

    t = datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "purchase", '{"k": 1}'),
        (1, t, 2, "purchase", '{"k": 2}'),
        (2, t, 3, "purchase", '{"k": 2}'),
        (2, t, 4, "purchase", '{"k": 3}'),
        (None, t, 5, "purchase", '{"k": 8}'),
        (None, t, 6, "purchase", '{"k": 9}'),
    ]
    ev = _spark_events(spark, _events_pdf(rows))
    edges = _item_copurchase_edges(ev).collect()
    by_src = {}
    for r in edges:
        by_src.setdefault(r["src"], set()).add(r["dst"])
        assert r["d"] is not None
    # degree column == actual out-degree, for every src
    for r in edges:
        assert r["d"] == len(by_src[r["src"]]), r
    assert set(by_src) == {1, 2, 3}  # items 8/9 (anonymous) never enter
    assert by_src[2] == {1, 3}


def test_pagerank_plan_has_no_degree_broadcast(spark, sf_dir):
    """VERDICT r10 #1 structural pin: the executed plan must not broadcast
    a degree frame — `d` arrives in the checkpointed edge scan, so the only
    broadcast input is the rank frame (Catalyst's size-based choice, which
    flips to a shuffle join at real node counts). One join per iteration:
    exactly `iters` BroadcastHashJoins at toy scale, each building on the
    rank side."""
    df = QUERIES["pagerank_item_graph"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the edge scan carries d; no plan node broadcasts a (src, d) aggregate
    assert plan.count("BroadcastHashJoin") == 3
    assert "Scan ExistingRDD[src" in plan and ",d#" in plan.replace(" ", "")


# ------------------------------------------------- funnel NULL-user oracle


def test_funnel_conversion_null_user_consistent_with_oracle(spark):
    """An anonymous 'view' event must not count as a funnel entrant on
    EITHER engine. Before r11 the oracle's r1 = count(*) of the GROUP BY
    kept a NULL pseudo-user (r1=3 here) while the chain's stage histogram
    excluded it (r1=2) — r2/r3 agreed, making the drift silent and partial
    (ADVICE r10, medium). Runs the registered oracle SQL on the planted
    frame and compares every row."""
    from datetime import datetime

    from mini_flink_spark.queries_ext import funnel_conversion_plan

    t = datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "view", None),
        (1, t.replace(hour=1), 2, "click", None),
        (1, t.replace(hour=2), 3, "purchase", None),
        (2, t, 4, "view", None),
        (None, t, 5, "view", None),
    ]
    pdf = _events_pdf(rows)
    got = {
        r["step"]: (r["n_reached"], r["conv_from_prev_micros"])
        for r in funnel_conversion_plan(_spark_events(spark, pdf)).collect()
    }
    exp = {
        r.step: (int(r.n_reached), int(r.conv_from_prev_micros))
        for r in _oracle(
            pdf, QUERIES["funnel_conversion_rates"].oracle
        ).itertuples()
    }
    assert got == exp
    assert got["1_view"] == (2, 1000000)  # the anonymous view is NOT a user
    assert got["2_click"] == (1, 500000)
    assert got["3_purchase"] == (1, 1000000)
