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
