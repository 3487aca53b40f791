"""Round-8 additions: the preference-pair salted tournament (exactness vs
the naive full-sort window, including tie and tiny-stratum edge cases) and
the graded sink-roundtrip query's fixture behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_flink_spark.queries_pipeline import preference_pairs_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, doc_id bigint, text string")


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_tournament_matches_full_sort_with_ties_and_tiny_strata(spark):
    # ties (identical text -> identical q) force the doc_id tiebreak total
    # order through both paths; strata of size 1, 2, 3 (< 2k) exercise the
    # overlap region where a row is both top-k and bottom-k; the big
    # stratum exercises multi-slice survivors.
    rows = []
    for i in range(200):
        # quality varies with doc length; every 7th doc duplicates text
        # (a q tie) with a different doc_id
        txt = "the quick brown fox " * ((i % 13) + 1)
        rows.append(("big", i, txt if i % 7 else "tied text exactly here"))
    rows += [("solo", 1000, "one doc only")]
    rows += [("duo", 2000, "short"), ("duo", 2001, "a much longer document text")]
    rows += [
        ("trio", 3000, "aaa bbb"),
        ("trio", 3001, "aaa bbb"),  # tie inside a tiny stratum
        ("trio", 3002, "a considerably longer third document"),
    ]
    d = _docs(spark, rows)
    full = _pairs(preference_pairs_plan(d, salt=None))
    tour = _pairs(preference_pairs_plan(d, salt=4))
    assert tour == full
    # non-vacuous: the big stratum must actually emit ranked pairs
    assert any(p[0] == "big" for p in full)


def test_tournament_salt_value_is_irrelevant_to_output(spark):
    rows = [("s", i, f"doc text number {i} " * (i % 5 + 1)) for i in range(60)]
    d = _docs(spark, rows)
    outs = [_pairs(preference_pairs_plan(d, salt=s)) for s in (1, 2, 32)]
    assert outs[0] == outs[1] == outs[2]


def test_tournament_local_filter_bounds_survivors(spark):
    # the stage-1 filter must keep at most 2k rows per (source, slice) —
    # the property that bounds every stage-2 partition at 2kS rows
    rows = [("s", i, f"text {i} " * (i % 11 + 1)) for i in range(500)]
    d = _docs(spark, rows)
    from mini_flink_spark.functions import text as T
    from pyspark.sql import Window

    k, salt = 5, 8
    scored = d.select("source", "doc_id", T.quality_score("text").alias("q"))
    slc = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(salt))
    wt = Window.partitionBy("source", "_slc").orderBy(F.desc("q"), F.asc("doc_id"))
    wb = Window.partitionBy("source", "_slc").orderBy(F.asc("q"), F.desc("doc_id"))
    surv = (
        scored.withColumn("_slc", slc)
        .select(
            "source",
            "_slc",
            F.row_number().over(wt).alias("rt"),
            F.row_number().over(wb).alias("rb"),
        )
        .filter((F.col("rt") <= k) | (F.col("rb") <= k))
        .groupBy("source", "_slc")
        .count()
    )
    assert surv.agg(F.max("count")).first()[0] <= 2 * k


def test_fast_seeded_hash_range_and_independence(spark):
    # the at-scale swap must stay drop-in: same 56-bit non-negative range
    # as portable_hash64, deterministic, and seed-independent families
    from mini_flink_spark.functions.hashing import HASH_MOD, fast_seeded_hash

    df = spark.createDataFrame([(f"tok{i}",) for i in range(1000)], "s string")
    out = df.select(
        fast_seeded_hash("s", 0).alias("h0"), fast_seeded_hash("s", 1).alias("h1")
    )
    agg = out.agg(
        F.min("h0"), F.max("h0"), F.count(F.when(F.col("h0") == F.col("h1"), 1))
    ).first()
    assert agg[0] >= 0 and agg[1] < HASH_MOD
    assert agg[2] <= 1  # different seeds give a different family
    a = out.orderBy("h0").collect()
    b = out.orderBy("h0").collect()
    assert a == b  # deterministic across evaluations


def test_c4_line_filters_reject_reasons(spark):
    # every planted pathology must actually reject lines at sf0.001:
    # unterminated lines (no '.'), lorem plants, brace plants, short lines
    from mini_flink_spark.queries import QUERIES

    df = QUERIES["c4_line_filters"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert all(r.n_kept <= r.n_lines for r in rows)
    assert any(r.n_kept < r.n_lines for r in rows)  # something was filtered
    # concrete planted-pathology pin (ADVICE r8: the old disjunction was a
    # tautology): the sf0.001 plants push 81/500 docs under the 3-kept-line
    # C4 floor — assert the failure mode actually fires, with headroom.
    n_fail = sum(1 for r in rows if not r.pass_c4)
    assert n_fail >= 10
    assert all(r.pass_c4 == (r.n_kept >= 3) for r in rows)


def test_gopher_repetition_modal_gram_tiebreak(spark):
    # two grams with the same max count -> the lexicographically smaller
    # one must win on the Spark side (matches ORDER BY c DESC, g ASC)
    import mini_flink_spark.queries  # noqa: F401 (registration order — import contract)
    from mini_flink_spark.queries_ext import _RUN_FOLD

    df = spark.createDataFrame(
        [(["b b", "a a", "b b", "a a", "c c"],)], "g2 array<string>"
    ).select(F.expr("array_sort(g2)").alias("g2"))
    top = df.select(F.expr(_RUN_FOLD.format(arr="g2")).alias("t")).first().t
    assert top.cnt == 2 and top.gram == "a a"


def test_gopher_dup_fold_counts_all_occurrences(spark):
    # value seen c >= 2 times contributes ALL c occurrences (and c*len
    # chars), matching sum(c) FILTER (c >= 2) on the oracle side
    import mini_flink_spark.queries  # noqa: F401 (registration order — import contract)
    from mini_flink_spark.queries_ext import _DUP_FOLD

    df = spark.createDataFrame(
        [(["x", "y", "x", "x", "zz"],)], "ls array<string>"
    ).select(F.expr("array_sort(ls)").alias("ls"))
    d = df.select(F.expr(_DUP_FOLD.format(arr="ls")).alias("d")).first().d
    assert d.dl == 3  # the three 'x' occurrences; y/zz are singletons
    assert d.dc == 3  # 3 * len('x')


def test_md5_prefix_cumsum_equals_single_window(spark):
    # the two-phase distributed prefix sum must be bit-identical to the
    # naive single-window running sum — including md5-prefix slice
    # boundaries and docs whose md5 shares a slice prefix
    from mini_flink_spark.queries_pipeline import _md5_prefix_cumsum

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b", (i * 7) % 11 + 1) for i in range(500)],
        "doc_id bigint, lang string, tok bigint",
    )
    naive = _md5_prefix_cumsum(df, "tok", prefix_len=0).select("doc_id", "cum")
    two = _md5_prefix_cumsum(df, "tok", prefix_len=2).select("doc_id", "cum")
    assert {(r.doc_id, r.cum) for r in naive.collect()} == {
        (r.doc_id, r.cum) for r in two.collect()
    }
    # the per-stratum max cum must equal the stratum total (the last prefix)
    tot = {r.lang: r.s for r in df.groupBy("lang").agg(F.sum("tok").alias("s")).collect()}
    mx = {
        r.lang: r.m
        for r in _md5_prefix_cumsum(df, "tok")
        .groupBy("lang")
        .agg(F.max("cum").alias("m"))
        .collect()
    }
    assert mx == tot


def test_md5_prefix_cumsum_negative_values(spark):
    # ADVICE r8: slice totals were max(_lcum), which is only the slice's
    # last running-sum value for NON-NEGATIVE val_col — with negative
    # deltas the max sits mid-slice and every later slice's offset is
    # wrong. The fix (sum(val_col) per slice) must be bit-identical to the
    # naive single window for an arbitrary-signed column.
    from mini_flink_spark.queries_pipeline import _md5_prefix_cumsum

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b", ((i * 13) % 21) - 10) for i in range(400)],
        "doc_id bigint, lang string, delta bigint",
    )
    naive = {
        (r.doc_id, r.cum)
        for r in _md5_prefix_cumsum(df, "delta", prefix_len=0).collect()
    }
    two = {
        (r.doc_id, r.cum)
        for r in _md5_prefix_cumsum(df, "delta", prefix_len=2).collect()
    }
    assert naive == two
    # sanity: the planted deltas really do go negative mid-scan
    assert any(c < 0 for _, c in naive)
