"""Keyed-semantics property tests (SURVEY.md §5 item 3): for random keyed
integer streams, the engine's keyed reduce must equal the sequential
left-fold in arrival order per key — guaranteed in the reference by
single-threaded per-key processing, and here by per-key grouping.

Hypothesis drives the inputs; one shared SparkSession keeps each example
cheap (deadline disabled — Spark latency is not the property under test).
"""

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from mini_flink_spark.operators.aggregations import keyed_aggregates, salted_agg
from mini_flink_spark.operators.running_reduce import running_agg

KV = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
    min_size=1,
    max_size=60,
)

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def seq_folds(data):
    """Sequential per-key folds in arrival order — the reference semantics."""
    acc = defaultdict(list)
    for k, v in data:
        acc[k].append(v)
    return {
        k: {
            "sum": sum(vs),
            "min": min(vs),
            "max": max(vs),
            "cnt": len(vs),
            "running": [sum(vs[: i + 1]) for i in range(len(vs))],
        }
        for k, vs in acc.items()
    }


@given(data=KV)
@PROP
def test_keyed_aggregates_equal_sequential_fold(spark, data):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(data)], "arr bigint, k bigint, v bigint"
    )
    exp = seq_folds(data)
    got = {
        r.k: (r.sum_v, r.min_v, r.max_v, r.cnt)
        for r in keyed_aggregates(df, [F.col("k")], "v").collect()
    }
    assert got == {k: (e["sum"], e["min"], e["max"], e["cnt"]) for k, e in exp.items()}


@given(data=KV)
@PROP
def test_salted_agg_equals_plain_agg(spark, data):
    df = spark.createDataFrame(
        [(k, v) for k, v in data], "k bigint, v bigint"
    )
    exp = seq_folds(data)
    got = {
        r.k: (r.sum_v, r.min_v, r.max_v, r.cnt)
        for r in salted_agg(df, ["k"], "v", n_salts=4).collect()
    }
    assert got == {k: (e["sum"], e["min"], e["max"], e["cnt"]) for k, e in exp.items()}


@given(data=KV)
@PROP
def test_running_reduce_is_prefix_fold(spark, data):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(data)], "arr bigint, k bigint, v bigint"
    )
    out = running_agg(df, ["k"], "arr", running_sum=F.sum("v")).collect()
    exp = seq_folds(data)
    per_key = defaultdict(list)
    for r in sorted(out, key=lambda r: (r.k, r.arr)):
        per_key[r.k].append(r.running_sum)
    assert dict(per_key) == {k: e["running"] for k, e in exp.items()}


@given(data=KV)
@PROP
def test_python_fold_reduce_matches_builtin_sum(spark, data):
    """The opaque-ReduceFunction slow path (applyInPandas fold) agrees with
    the columnar fast path — the two renderings of KeyedStream.reduce."""
    from mini_flink_spark.operators.environment import StreamExecutionEnvironment

    env = StreamExecutionEnvironment(spark)
    ds = env.from_collection(
        [(i, k, v) for i, (k, v) in enumerate(data)], "arr bigint, k bigint, v bigint"
    )
    slow = (
        ds.key_by("k")
        .reduce(
            fn=lambda a, b: {"arr": b["arr"], "k": b["k"], "v": a["v"] + b["v"]},
            order_col="arr",
        )
        .to_df()
        .collect()
    )
    exp = seq_folds(data)
    assert {r.k: r.v for r in slow} == {k: e["sum"] for k, e in exp.items()}


TOKENS = st.lists(st.sampled_from(["a", "b", "c", "ab", "x y"]), min_size=0, max_size=40)


@given(toks=TOKENS)
@PROP
def test_repetition_fold_equals_counter(spark, toks):
    """The in-array longest-equal-run fold in `repetition_score` must equal
    the naive bigram Counter — the fold is the one piece of custom aggregate
    logic in the pipeline battery, so it gets randomized validation."""
    from collections import Counter

    from mini_flink_spark.queries_pipeline import _bigrams

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    run = (
        "aggregate(array_sort(bi),"
        " named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L),"
        "   'best', greatest(acc.best,"
        "     IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L))),"
        " acc -> acc.best)"
    )
    row = (
        df.withColumn("bi", _bigrams("toks"))
        .selectExpr("size(bi) as n", f"{run} as top")
        .collect()[0]
    )
    bigrams = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    exp_top = max(Counter(bigrams).values()) if bigrams else 0
    assert row.n == len(bigrams)
    assert row.top == exp_top


def _z_py(vals, bits):
    # reference bit-interleave in plain Python
    out = 0
    n = len(vals)
    for j in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> j) & 1) << (j * n + i)
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_key_matches_python_interleave(spark, pairs):
    from mini_flink_spark.storage import zorder_key

    df = spark.createDataFrame(pairs, "a bigint, b bigint")
    got = [
        r.z
        for r in df.select(
            zorder_key([F.col("a"), F.col("b")], bits=12).alias("z")
        ).collect()
    ]
    want = [_z_py([a, b], 12) for a, b in pairs]
    assert sorted(got) == sorted(want)


@given(st.integers(0, 4095), st.lists(st.integers(0, 4095), min_size=2, max_size=20))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_key_monotone_when_other_dim_fixed(spark, fixed_b, avals):
    # with one coordinate held constant, the Morton key orders by the other —
    # the locality property row-group pruning relies on
    from mini_flink_spark.storage import zorder_key

    df = spark.createDataFrame(
        [(a, fixed_b) for a in avals], "a bigint, b bigint"
    )
    rows = df.select(
        "a", zorder_key([F.col("a"), F.col("b")], bits=12).alias("z")
    ).collect()
    by_a = sorted((r.a, r.z) for r in rows)
    zs = [z for _, z in by_a]
    assert zs == sorted(zs)


WORDS = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=60
)


@given(toks=WORDS)
@PROP
def test_intradoc_block_dedup_equals_python_reference(spark, toks):
    """Randomized validation of the in-array first-occurrence block filter
    against a plain-Python reference over the same 5-token blocking."""
    from mini_flink_spark.functions.dedup import intradoc_block_dedup

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    row = intradoc_block_dedup(df, w=5).collect()[0]
    blocks = [tuple(toks[i : i + 5]) for i in range(0, len(toks), 5)]
    seen, kept = set(), []
    for b in blocks:
        if b not in seen:
            seen.add(b)
            kept.append(b)
    assert row.n_blocks == len(blocks)
    assert row.n_dropped == len(blocks) - len(kept)
    assert row.clean_text == " ".join(" ".join(b) for b in kept).strip()


@given(
    ta=st.lists(st.sampled_from(["p", "q", "r", "s", "t"]), min_size=3, max_size=25),
    tb=st.lists(st.sampled_from(["p", "q", "r", "s", "t"]), min_size=3, max_size=25),
)
@PROP
def test_containment_dominates_jaccard(spark, ta, tb):
    """For any doc pair: max-direction containment ≥ Jaccard (|∩|/min ≥
    |∩|/|∪|), and both match the Python set computation on 3-shingles."""
    from mini_flink_spark.functions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(1, " ".join(ta)), (2, " ".join(tb))], "doc_id bigint, text string"
    )
    sa = {tuple(ta[i : i + 3]) for i in range(len(ta) - 2)}
    sb = {tuple(tb[i : i + 3]) for i in range(len(tb) - 2)}
    inter = len(sa & sb)
    cont = {
        (r.a, r.b): r.containment
        for r in ngram_containment_pairs(df, "doc_id", "text", threshold=-1.0, max_df=None).collect()
    }
    jac = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=-1.0, max_df=None).collect()
    }
    if inter == 0:
        assert not cont and not jac
        return
    assert cont[(1, 2)] == round(inter / len(sa), 6)
    assert cont[(2, 1)] == round(inter / len(sb), 6)
    assert jac[(1, 2)] == round(inter / (len(sa | sb)), 6)
    assert max(cont[(1, 2)], cont[(2, 1)]) >= jac[(1, 2)]


# ---------------------------------------------------------------------------
# Connected components vs a union-find reference (the BSP min-label loop's
# docstring worries specifically about long chains — band-join cliques
# converge in 2-3 rounds, but the loop must be correct on ANY graph,
# including paths/chains whose diameter forces many rounds and graphs with
# several components; the round-4 scan-based convergence probe must not
# terminate a round early)
# ---------------------------------------------------------------------------

EDGES = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=24,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = defaultdict(list)
    for n in parent:
        roots[find(n)].append(n)
    return {n: min(members) for members in roots.values() for n in members}


@given(edges=EDGES)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_equal_union_find(spark, edges):
    from mini_flink_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == _uf_components(edges)


# ---------------------------------------------------------------------------
# Round 4: semantic decontamination recall/precision is EXACT (the flagship
# claim — a decontamination pass may not miss a single leaked vector), and
# the Arrow LSH bucket projection matches the interpreted expression on
# arbitrary vectors (sign boundaries included).

VEC = st.lists(
    st.integers(-3, 3).map(float), min_size=6, max_size=6
).filter(lambda v: any(x != 0.0 for x in v))

CORPUS = st.lists(VEC, min_size=4, max_size=24)


def _seq_cos(a, b):
    """The engine's exact op order: left-to-right products, sqrt, divide —
    python floats ARE IEEE doubles, so this is bit-identical to the fold."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


@given(vecs=CORPUS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_semantic_decontam_matches_exact_reference(spark, vecs):
    import math

    from mini_flink_spark.functions.similarity import semantic_decontam_pairs

    tau = 0.5
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    expected = set()
    for i, a in rows:
        if i % 3 == 0:
            continue  # train side
        for j, b in rows:
            if j % 3 != 0:
                continue  # eval side
            c = math.floor(_seq_cos(a, b) * 1e6 + 0.5) / 1e6  # arrow rounding
            if c >= tau:
                expected.add((i, j, c))
    got = {
        (r.train_id, r.eval_id, r.cos)
        for r in semantic_decontam_pairs(
            df, "vec_id % 3 = 0", tau=tau, path="arrow"
        ).collect()
    }
    assert got == expected


@given(vecs=st.lists(st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=8, max_size=8), min_size=1, max_size=12))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucket_expr_arrow_parity_property(spark, vecs):
    from mini_flink_spark.functions.similarity import (
        multi_table_buckets_arrow,
        multi_table_buckets_expr,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, v array<float>"
    )
    kw = dict(tables=3, planes=4, dim=8)
    expr_keys = {
        r.vec_id: list(r.b)
        for r in df.select(
            "vec_id", multi_table_buckets_expr("v", **kw).alias("b")
        ).collect()
    }
    arrow_keys = {
        r.vec_id: list(r.b)
        for r in df.select(
            "vec_id", multi_table_buckets_arrow(F.col("v"), **kw).alias("b")
        ).collect()
    }
    assert arrow_keys == expr_keys


# --------------------------------------------- Hamming banding (round 7)

SIGS = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, (1 << 56) - 1)),
    min_size=2,
    max_size=40,
    unique_by=lambda kv: kv[0],
)


@given(sigs=SIGS, max_h=st.integers(0, 3))
@PROP
def test_simhash_banding_equals_bruteforce(spark, sigs, max_h):
    """Pigeonhole completeness on arbitrary signatures: the banded plan
    (distinct-signature collapse + expansion joins, cap off so adversarial
    draws can't trip it) must produce EXACTLY the brute-force pair set —
    random draws include hash collisions and near-misses at every radius."""
    from mini_flink_spark.functions.dedup import simhash_pairs

    sim = spark.createDataFrame(sigs, "id bigint, simhash bigint")
    got = {
        (r.a, r.b, r.hamming)
        for r in simhash_pairs(
            sim, max_hamming=max_h, n_blocks=4, max_bucket=None
        ).collect()
    }
    want = set()
    for i, (ia, ha) in enumerate(sigs):
        for ib, hb in sigs[i + 1 :]:
            d = bin(ha ^ hb).count("1")
            if d <= max_h:
                a, b = min(ia, ib), max(ia, ib)
                want.add((a, b, d))
    assert got == want


LINES = st.lists(
    st.sampled_from(["la", "lb", "lc", "a longer line.", "x {", "lorem ipsum y"]),
    min_size=0,
    max_size=30,
)


@given(ls=LINES)
@PROP
def test_dup_fold_equals_counter(spark, ls):
    """gopher_repetition_suite's duplicate-mass fold must equal the Counter
    definition: a value occurring c >= 2 times contributes c occurrences
    and c*len(value) characters."""
    from collections import Counter

    import mini_flink_spark.queries  # noqa: F401 (registration order — import contract)
    from mini_flink_spark.queries_ext import _DUP_FOLD

    df = spark.createDataFrame([(ls,)], "ls array<string>").select(
        F.expr("array_sort(ls)").alias("ls")
    )
    d = df.select(F.expr(_DUP_FOLD.format(arr="ls")).alias("d")).first().d
    cnt = Counter(ls)
    assert d.dl == sum(c for c in cnt.values() if c >= 2)
    assert d.dc == sum(c * len(v) for v, c in cnt.items() if c >= 2)


@given(gs=LINES)
@PROP
def test_run_fold_equals_modal_with_min_tiebreak(spark, gs):
    """The modal-gram fold must pick (max count, lexicographically smallest
    value among ties) — the exact contract the DuckDB oracle's
    ORDER BY c DESC, g ASC expresses."""
    from collections import Counter

    import mini_flink_spark.queries  # noqa: F401 (registration order — import contract)
    from mini_flink_spark.queries_ext import _RUN_FOLD

    df = spark.createDataFrame([(gs,)], "gs array<string>").select(
        F.expr("array_sort(gs)").alias("gs")
    )
    t = df.select(F.expr(_RUN_FOLD.format(arr="gs")).alias("t")).first().t
    if not gs:
        assert t.cnt == 0 and t.gram is None
    else:
        cnt = Counter(gs)
        best = max(cnt.values())
        assert t.cnt == best
        assert t.gram == min(v for v, c in cnt.items() if c == best)


# --- funnel chain/fold equivalence (round 10) -----------------------------

FUNNEL_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user
        st.sampled_from(["view", "click", "purchase", "scroll"]),
        st.integers(0, 20),                     # ts seconds (ties likely)
    ),
    min_size=1,
    max_size=40,
)


def _funnel_reference(data):
    """Pure-Python min-after-min chain — order-independent by definition,
    so it is THE semantics both Spark shapes must reproduce."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, s in data:
        by_user[u].append((t, s))
    hist = defaultdict(int)
    for u, evs in by_user.items():
        tv = min((s for t, s in evs if t == "view"), default=None)
        tc = (
            min((s for t, s in evs if t == "click" and s > tv), default=None)
            if tv is not None
            else None
        )
        tp = (
            min((s for t, s in evs if t == "purchase" and s > tc), default=None)
            if tc is not None
            else None
        )
        stage = 3 if tp is not None else 2 if tc is not None else 1 if tv is not None else 0
        hist[stage] += 1
    return dict(hist)


@PROP
@given(data=FUNNEL_EVENTS)
def test_funnel_chain_and_fold_match_reference(spark, data):
    import mini_flink_spark.queries  # noqa: F401 (registration import contract)
    from mini_flink_spark.queries_ext import _funnel_stages

    ev = spark.createDataFrame(
        [
            (str(u), t, f"e{i}", float(s))
            for i, (u, t, s) in enumerate(data)
        ],
        "user_id string, event_type string, event_id string, sec double",
    ).select(
        "user_id", "event_type", "event_id",
        F.timestamp_seconds("sec").alias("ts"),
    )
    want = _funnel_reference(data)
    for naive in (False, True):
        got = {
            r["stage"]: r["n_users"]
            for r in _funnel_stages(ev, naive=naive).collect()
        }
        assert got == want, (naive, got, want, data)
