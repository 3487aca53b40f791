"""Round-3 operators: SemDeDup semantic dedup and greedy k-center coreset.

Oracle parity for both is covered by test_oracle_parity (they are registered
queries); these tests pin the *semantic invariants* the oracle hash alone
doesn't state explicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.functions import clustering as C


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from mini_flink_spark.session import read_table

    return read_table(spark, sf_dir, "embeddings")


class TestSemDeDup:
    @pytest.fixture(scope="class")
    def result(self, emb):
        return C.semdedup(emb, "embedding", "vec_id", k=4, iters=2, tau=0.3).cache()

    def test_one_row_per_vector(self, result, emb):
        assert result.count() == emb.count()
        assert result.select("vec_id").distinct().count() == emb.count()

    def test_dup_of_is_a_lower_id_cluster_mate(self, result):
        dup = result.where(~F.col("kept")).alias("d")
        joined = dup.join(
            result.alias("r"), F.col("d.dup_of") == F.col("r.vec_id")
        )
        assert joined.where(F.col("d.dup_of") >= F.col("d.vec_id")).count() == 0
        assert joined.where(F.col("d.cid") != F.col("r.cid")).count() == 0

    def test_kept_iff_dup_of_null(self, result):
        assert result.where(F.col("kept") != F.col("dup_of").isNull()).count() == 0

    def test_lowest_id_always_kept(self, result):
        # the globally lowest id has no lower-id cluster mate by construction
        low = result.orderBy("vec_id").limit(1).collect()[0]
        assert low.kept

    def test_expr_and_arrow_verify_agree(self, emb):
        # the Arrow fold replays the expression fold's IEEE op order, so the
        # dup decisions are identical row-for-row
        e = C.semdedup(emb, "embedding", "vec_id", k=4, iters=2, tau=0.3,
                       verify="expr")
        a = C.semdedup(emb, "embedding", "vec_id", k=4, iters=2, tau=0.3,
                       verify="arrow")
        assert e.exceptAll(a).count() == 0 and a.exceptAll(e).count() == 0

    def test_tau_monotonicity(self, emb):
        # raising tau can only keep more: dup sets shrink as the bar rises
        loose = C.semdedup(emb, "embedding", "vec_id", k=4, iters=2, tau=0.2)
        tight = C.semdedup(emb, "embedding", "vec_id", k=4, iters=2, tau=0.4)
        n_loose = loose.where("kept").count()
        n_tight = tight.where("kept").count()
        assert n_tight >= n_loose


class TestKCenter:
    @pytest.fixture(scope="class")
    def picks(self, emb):
        return C.kcenter_select(emb, "embedding", "vec_id", k=6).collect()

    def test_seed_is_lowest_id(self, picks, emb):
        lowest = emb.agg(F.min("vec_id")).collect()[0][0]
        assert picks[0].vec_id == lowest
        assert picks[0].min_dist == 0.0

    def test_selection_order_and_distinct(self, picks):
        assert [p.sel_rank for p in picks] == list(range(len(picks)))
        assert len({p.vec_id for p in picks}) == len(picks)

    def test_min_dist_nonincreasing(self, picks):
        # farthest-point traversal: each pick's distance to the selected set
        # can only shrink as the set grows
        ds = [p.min_dist for p in picks[1:]]
        assert all(a >= b for a, b in zip(ds, ds[1:]))

    def test_k_exceeding_rows_degrades(self, spark):
        tiny = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [2.0, 0.0])],
            "vec_id bigint, embedding array<double>",
        )
        out = C.kcenter_select(tiny, "embedding", "vec_id", k=10).collect()
        assert len(out) == 3

    def test_empty_input_yields_empty_coreset(self, spark):
        # ADVICE r3: the seed collect must not IndexError on an empty frame
        empty = spark.createDataFrame(
            [], "vec_id bigint, embedding array<double>"
        )
        out = C.kcenter_select(empty, "embedding", "vec_id", k=4)
        assert out.count() == 0
        assert out.columns == ["sel_rank", "vec_id", "min_dist"]


class TestBpeEncode:
    def test_unit_count_bounds_and_monotonicity(self, spark, sf_dir):
        from mini_flink_spark.functions import bpe as B
        from mini_flink_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents")
        r0 = B.bpe_encode_counts(docs, docs, rounds=0).toPandas().set_index("doc_id")
        r3 = B.bpe_encode_counts(docs, docs, rounds=3).toPandas().set_index("doc_id")
        # with zero merges every unit is a character; merges only shrink
        assert (r3.n_units <= r0.n_units).all()
        # a word is never fewer than one unit
        assert (r3.n_units >= r3.n_words).all()
        assert (r0.n_words == r3.n_words).all()


class TestDriftKL:
    def test_kl_nonnegative_and_identical_dist_zero(self, spark):
        from mini_flink_spark.queries import QUERIES

        # KL >= 0 up to per-term nano rounding (each term rounds before the
        # sum, so the floor is -vocab_size nanos, not exactly 0)
        df = QUERIES["source_drift_kl"].fn(spark, "/root/testdata/sf0.001").toPandas()
        assert (df.kl_nanos > -1000).all()
        assert (df.kl_nanos > 0).any()


class TestCooccurrence:
    def test_pairs_ordered_and_bounded(self, spark):
        from mini_flink_spark.queries import QUERIES

        df = (
            QUERIES["item_cooccurrence_lift"]
            .fn(spark, "/root/testdata/sf0.001")
            .toPandas()
        )
        assert len(df) <= 50
        assert (df.item_a < df.item_b).all()
        assert (df.n_co.values[:-1] >= df.n_co.values[1:]).all()
        assert (df.lift_micros > 0).all()


class TestTimeseriesOps:
    def test_gapfill_preserves_total_and_densifies(self, spark, sf_dir):
        from mini_flink_spark.queries import QUERIES
        from mini_flink_spark.session import read_table

        out = QUERIES["timeseries_gapfill"].fn(spark, sf_dir).toPandas()
        ev = read_table(spark, sf_dir, "events")
        assert out.n.sum() == ev.count()  # zero-fill adds no phantom events
        # dense grid: every type has the identical full hour spine
        spine_sizes = out.groupby("event_type")["hour"].nunique()
        assert spine_sizes.nunique() == 1

    def test_ewma_constant_series_is_constant(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        df = spark.createDataFrame(
            [(i, 5.0) for i in range(10)], "t int, n double"
        )
        w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        pre = df.withColumn("xs", F.collect_list("n").over(w))
        ewma = F.aggregate(
            F.slice(F.col("xs"), F.lit(2), F.greatest(F.size("xs") - 1, F.lit(0))),
            F.element_at("xs", 1),
            lambda acc, x: x * F.lit(0.5) + acc * F.lit(0.5),
        )
        vals = [r[0] for r in pre.select(F.round(ewma, 6)).collect()]
        assert vals == [5.0] * 10  # smoother is exact on a constant series

    def test_scd2_intervals_partition_the_event_log(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from mini_flink_spark.queries import QUERIES
        from mini_flink_spark.session import read_table

        out = QUERIES["scd2_user_state_history"].fn(spark, sf_dir).cache()
        ev = read_table(spark, sf_dir, "events")
        # every event is in exactly one segment
        assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
        # exactly one open (current) interval per user
        open_per_user = out.where(F.col("valid_to").isNull()).groupBy("user_id").count()
        assert open_per_user.where(F.col("count") != 1).count() == 0
        # intervals chain: valid_to of a row equals the next valid_from
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id").orderBy("valid_from")
        chained = out.withColumn("nxt", F.lead("valid_from").over(w))
        bad = chained.where(
            F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("nxt"))
        )
        assert bad.count() == 0


class TestPipelineSpec:
    def test_unknown_stage_raises(self, spark, sf_dir):
        from mini_flink_spark.pipeline_spec import run_pipeline
        from mini_flink_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown pipeline stage"):
            run_pipeline(docs, [{"op": "nonexistent"}])

    def test_spec_equals_handwritten(self, spark, sf_dir):
        from mini_flink_spark.queries import QUERIES

        a = QUERIES["curation_pipeline_v2"].fn(spark, sf_dir)
        b = QUERIES["curation_pipeline_spec"].fn(spark, sf_dir)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ---------------------------------------------------------------- URL dedup


class TestCanonicalUrl:
    CASES = [
        # (raw, canonical) — one per normalization rule + combinations
        ("https://example.com/a", "https://example.com/a"),
        ("HTTPS://Example.COM/a", "https://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:8080/a", "https://example.com:8080/a"),
        ("https://example.com/a/", "https://example.com/a"),
        ("https://example.com/a#sec2", "https://example.com/a"),
        ("https://example.com/a?utm_source=x", "https://example.com/a"),
        ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
        (
            "HTTPS://WWW.Ex.COM:443/p/?z=9&utm_campaign=c&gclid=g1&a=1#f",
            "https://www.ex.com/p?a=1&z=9",
        ),
        # path case is preserved (only scheme/host lowercase)
        ("https://example.com/CaseSensitive", "https://example.com/CaseSensitive"),
    ]

    def test_spark_rules(self, spark):
        from mini_flink_spark.functions.text import canonical_url

        df = spark.createDataFrame(
            [(r,) for r, _ in self.CASES], "url string"
        ).select(canonical_url("url").alias("c"))
        got = [r.c for r in df.collect()]
        assert got == [c for _, c in self.CASES]

    def test_duckdb_twin_matches(self):
        import duckdb

        from mini_flink_spark.functions.text import canonical_url_sql

        con = duckdb.connect()
        for raw, want in self.CASES:
            # the twin interpolates `expr` several times -> bind it once
            got = con.execute(
                f"SELECT {canonical_url_sql('url')} FROM (VALUES (?)) t(url)",
                [raw],
            ).fetchone()[0]
            assert got == want, raw


# ------------------------------------------------------------- winnowing


class TestWinnowing:
    def test_guarantee_shared_run_shares_fingerprint(self, spark):
        """Any duplicate run of >= w+k-1 tokens must share a fingerprint —
        the winnowing correctness guarantee (SIGMOD 2003, Thm. on coverage)."""
        from mini_flink_spark.functions.dedup import winnow_fingerprints
        from mini_flink_spark.functions.text import tokens

        k, w = 5, 4
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
        a = "one two three " + shared + " four five"
        b = "nine eight " + shared + " seven six ten"
        df = spark.createDataFrame([(1, a), (2, b)], "id long, text string")
        fps = df.select(
            "id", winnow_fingerprints(tokens("text"), k, w).alias("fp")
        ).collect()
        sets = {r.id: set(r.fp) for r in fps}
        assert sets[1] & sets[2], "shared run produced no shared fingerprint"

    def test_short_doc_empty(self, spark):
        from mini_flink_spark.functions.dedup import winnow_fingerprints
        from mini_flink_spark.functions.text import tokens

        df = spark.createDataFrame(
            [(1, "only three tokens"), (2, "")], "id long, text string"
        )
        rows = df.select(
            winnow_fingerprints(tokens("text"), 5, 4).alias("fp")
        ).collect()
        assert all(r.fp == [] for r in rows)

    def test_barrier_path_equals_expression_path(self, spark, sf_dir):
        """The production Generate-barrier rendering must select the exact
        same fingerprints as the single-expression reference form."""
        from mini_flink_spark.functions.dedup import (
            span_hash_array,
            winnow_fingerprints,
            winnow_select,
        )
        from mini_flink_spark.functions.text import tokens
        from mini_flink_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents").limit(40)
        ref = docs.select(
            "doc_id", winnow_fingerprints(tokens("text"), 5, 4).alias("fp")
        )
        fast = docs.select(
            "doc_id",
            F.explode(F.array(span_hash_array(tokens("text"), 5))).alias("hs"),
        ).select("doc_id", winnow_select(F.col("hs"), 4).alias("fp"))
        assert ref.exceptAll(fast).count() == 0
        assert fast.exceptAll(ref).count() == 0

    def test_density_below_full_hash_set(self, spark, sf_dir):
        """Fingerprint count per doc stays well under the rolling-hash count
        (the ~2/(w+1) density claim, loosely bounded)."""
        from mini_flink_spark.functions.dedup import span_hash_array, winnow_select
        from mini_flink_spark.functions.text import tokens
        from mini_flink_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents").limit(100)
        r = (
            docs.select(
                F.explode(F.array(span_hash_array(tokens("text"), 5))).alias(
                    "hs"
                )
            )
            .select(
                F.array_size("hs").alias("n_h"),
                F.array_size(winnow_select(F.col("hs"), 4)).alias("n_fp"),
            )
            .where(F.col("n_h") >= 20)
            .agg(F.avg(F.col("n_fp") / F.col("n_h")).alias("density"))
            .collect()[0]
        )
        assert r.density < 0.8  # distinctly sparser than the full set


# ------------------------------------------------- paragraph boilerplate


class TestParagraphBoilerplate:
    def test_blank_doc_gets_zero_row(self, spark, sf_dir):
        """ADVICE r2 regression shape: explode-based consumers must not drop
        docs with no paragraphs."""
        from mini_flink_spark.queries import all_queries

        q = all_queries()["paragraph_boilerplate"]
        out = q(spark, sf_dir)
        from mini_flink_spark.session import read_table

        n_docs = read_table(spark, sf_dir, "documents").count()
        assert out.count() == n_docs

    def test_planted_boilerplate_detected(self, spark):
        from mini_flink_spark.functions.dedup import paragraph_hashes
        from mini_flink_spark.functions.text import tokens

        footer = " ".join(f"legal{i}" for i in range(12))  # one exact chunk
        body = lambda i: " ".join(f"w{i}x{j}" for j in range(12))
        rows = [(i, body(i) + " " + footer) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ph = df.select(
            "doc_id", F.explode(paragraph_hashes(tokens("text"), 12)).alias("h")
        )
        df_counts = (
            ph.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
        )
        boiler = df_counts.where(F.col("df") >= 2)
        # exactly the footer chunk recurs across all five docs
        assert boiler.count() == 1
        assert boiler.collect()[0].df == 5


# ------------------------------------------------- stats moments battery


class TestStatsMoments:
    def test_matches_native_aggregates(self, spark, sf_dir):
        """The exact-sum derivations must agree with Spark's native
        corr/var_pop/covar_pop/stddev_pop to float tolerance."""
        from mini_flink_spark.queries import all_queries
        from mini_flink_spark.session import read_table

        got = {
            r.l_returnflag: r
            for r in all_queries()["stats_moments_battery"](spark, sf_dir).collect()
        }
        native = {
            r.l_returnflag: r
            for r in read_table(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.avg("l_quantity").alias("mean_qty"),
                F.var_pop("l_quantity").alias("var_pop_qty"),
                F.var_samp("l_quantity").alias("var_samp_qty"),
                F.stddev_pop("l_extendedprice").alias("stddev_pop_price"),
                F.covar_pop("l_quantity", "l_extendedprice").alias("covar_pop"),
                F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
            )
            .collect()
        }
        assert set(got) == set(native)
        for k in got:
            for fld in (
                "mean_qty",
                "var_pop_qty",
                "var_samp_qty",
                "stddev_pop_price",
                "covar_pop",
                "corr_qty_price",
            ):
                g, n = got[k][fld], native[k][fld]
                assert abs(g - n) <= max(1e-6, 1e-9 * abs(n)), (k, fld, g, n)


def test_neardup_pairs_expr_arrow_parity(spark, sf_dir):
    """The blocked pair graph must be identical under both verify paths —
    the license for graded queries to use the faster Arrow fold."""
    from mini_flink_spark.functions import similarity as S
    from mini_flink_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    e = S.embedding_neardup_pairs(emb, threshold=0.4, blocked=True, verify="expr")
    a = S.embedding_neardup_pairs(emb, threshold=0.4, blocked=True, verify="arrow")
    assert e.exceptAll(a).count() == 0 and a.exceptAll(e).count() == 0


def test_canonical_url_idempotent_and_twin_on_random_urls(spark):
    """Canonicalization must be idempotent (canonical(canonical(u)) ==
    canonical(u)) and engine-identical on a seeded random URL corpus —
    the property the URL-dedup group key silently depends on."""
    import random

    import duckdb

    from mini_flink_spark.functions.text import canonical_url, canonical_url_sql

    rng = random.Random(20260814)
    schemes = ["http", "HTTPS", "https", "HTTP"]
    hosts = ["Example.COM", "www.ex.com", "A.B.example.org", "ex.com"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b/", "/CaseSensitive/path", "/p%20q"]
    params = ["", "a=1", "b=2", "utm_source=x", "gclid=g", "z=9&a=1", "a=1&utm_campaign=c&b=2"]
    frags = ["", "#top", "#sec2"]
    urls = [
        f"{rng.choice(schemes)}://{rng.choice(hosts)}{rng.choice(ports)}"
        f"{rng.choice(paths)}"
        + (f"?{p}" if (p := rng.choice(params)) else "")
        + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, f"not idempotent: {r.url} -> {r.c1} -> {r.c2}"
    con = duckdb.connect()
    got = dict(
        con.execute(
            f"SELECT url, {canonical_url_sql('url')} FROM (SELECT unnest(?) AS url)",
            [urls],
        ).fetchall()
    )
    for r in rows:
        assert got[r.url] == r.c1, f"engine mismatch: {r.url}"
