"""Round-4 operators: semantic decontamination, tokenizer fertility, and the
dedup-impact cluster-size report.

Oracle parity is covered by test_oracle_parity (all three are registered
queries); these tests pin the semantic invariants the oracle hash alone
doesn't state explicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.functions import similarity as S


class TestSemanticDecontam:
    def test_planted_leak_found_with_cos_1(self, spark):
        # vec_id 100 (train) is an exact copy of eval vec_id 37 -> must be
        # flagged at cosine 1.0; vec_id 200 is orthogonal -> must not.
        rows = [
            (37, [1.0, 0.0, 0.0, 0.0]),   # eval (37 % 37 == 0)
            (74, [0.0, 1.0, 0.0, 0.0]),   # eval
            (100, [1.0, 0.0, 0.0, 0.0]),  # train, identical to eval 37
            (200, [0.0, 0.0, 1.0, 0.0]),  # train, orthogonal to both
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        got = {
            (r.train_id, r.eval_id): r.cos
            for r in S.semantic_decontam_pairs(
                df, "vec_id % 37 = 0", tau=0.5
            ).collect()
        }
        assert got == {(100, 37): 1.0}

    def test_empty_eval_set_is_empty_result(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id bigint, embedding array<float>"
        )
        out = S.semantic_decontam_pairs(df, "vec_id < 0", tau=0.5)
        assert out.columns == ["train_id", "eval_id", "cos"]
        assert out.count() == 0

    def test_literal_and_arrow_paths_agree(self, spark, sf_dir):
        # The large-|eval| Arrow rendering replays the same left-to-right
        # fold: identical pair sets (and cosines) on the fixture corpus.
        from mini_flink_spark.session import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        lit = {
            (r.train_id, r.eval_id, r.cos)
            for r in S.semantic_decontam_pairs(
                emb, "vec_id % 37 = 0", tau=0.3, path="literal"
            ).collect()
        }
        arr = {
            (r.train_id, r.eval_id, r.cos)
            for r in S.semantic_decontam_pairs(
                emb, "vec_id % 37 = 0", tau=0.3, path="arrow"
            ).collect()
        }
        assert lit == arr
        assert len(lit) > 0

    def test_plan_has_no_exchange(self, spark, sf_dir):
        # Recall-1.0 decontamination must stay a single linear scan: the eval
        # set rides a literal, so the plan contains NO shuffle exchange.
        from mini_flink_spark.queries import QUERIES

        plan = (
            QUERIES["semantic_decontamination"]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestArrowBuckets:
    def test_bucket_expr_arrow_parity(self, spark, sf_dir):
        # the Arrow bucket projection must emit the EXACT key arrays the
        # interpreted expression emits (same plane dots, same signs)
        from mini_flink_spark.session import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        expr_keys = {
            r.vec_id: list(r.b)
            for r in emb.select(
                "vec_id",
                S.multi_table_buckets_expr("embedding").alias("b"),
            ).collect()
        }
        arrow_keys = {
            r.vec_id: list(r.b)
            for r in emb.select(
                "vec_id",
                S.multi_table_buckets_arrow(F.col("embedding")).alias("b"),
            ).collect()
        }
        assert arrow_keys == expr_keys

    def test_nan_vector_bucket_parity(self, spark):
        # NaN dots must SET the sign bit on both paths (Spark's `d > 0` is
        # true for NaN; the arrow path uses ~(dot <= 0) to match)
        rows = [(1, [float("nan")] + [0.0] * 63), (2, [1.0] * 64)]
        df = spark.createDataFrame(rows, "vec_id bigint, v array<float>")
        e = {
            r.vec_id: list(r.b)
            for r in df.select(
                "vec_id", S.multi_table_buckets_expr("v").alias("b")
            ).collect()
        }
        a = {
            r.vec_id: list(r.b)
            for r in df.select(
                "vec_id", S.multi_table_buckets_arrow(F.col("v")).alias("b")
            ).collect()
        }
        assert a == e

    def test_neardup_pairs_bucket_paths_agree(self, spark, sf_dir):
        from mini_flink_spark.session import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        kw = dict(threshold=0.4, blocked=True)
        expr_pairs = {
            (r.a, r.b, r.cos)
            for r in S.embedding_neardup_pairs(emb, buckets="expr", **kw).collect()
        }
        arrow_pairs = {
            (r.a, r.b, r.cos)
            for r in S.embedding_neardup_pairs(emb, buckets="arrow", **kw).collect()
        }
        assert arrow_pairs == expr_pairs
        assert len(expr_pairs) > 0


class TestStreamingSemanticDecontam:
    def test_converges_to_batch_result(self, spark, sf_dir):
        from mini_flink_spark.queries import QUERIES

        batch = {
            (r.train_id, r.eval_id, r.cos)
            for r in QUERIES["semantic_decontamination"].fn(spark, sf_dir).collect()
        }
        streamed = {
            (r.train_id, r.eval_id, r.cos)
            for r in QUERIES["streaming_semantic_decontam"].fn(spark, sf_dir).collect()
        }
        assert streamed == batch
        assert len(streamed) > 0


    def test_nan_vector_flagged_on_both_paths(self, spark):
        # Spark orders NaN above every numeric, so `cos >= tau` is TRUE for
        # a NaN cosine on the literal path — the arrow path must emit the
        # same (conservative) verdict, not numpy's all-comparisons-False.
        import math

        rows = [
            (37, [1.0, 0.0]),                 # eval
            (100, [float("nan"), 1.0]),       # train, NaN cosine to eval
            (200, [1.0, 0.0]),                # train, cos 1.0
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        out = {}
        for path in ("literal", "arrow"):
            got = {
                (r.train_id, r.eval_id): r.cos
                for r in S.semantic_decontam_pairs(
                    df, "vec_id % 37 = 0", tau=0.5, path=path
                ).collect()
            }
            assert set(got) == {(100, 37), (200, 37)}, path
            assert math.isnan(got[(100, 37)]) and got[(200, 37)] == 1.0, path
            out[path] = set(got)
        assert out["literal"] == out["arrow"]

    def test_empty_eval_on_stream_raises(self, spark):
        # an empty eval set can't degrade to a batch empty relation when the
        # corpus is a stream — the gate must fail loudly instead
        stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        empty_eval = spark.createDataFrame(
            [], "vec_id bigint, embedding array<float>"
        )
        with pytest.raises(ValueError, match="non-empty eval"):
            S.semantic_decontam_pairs(stream, "vec_id < 0", eval_source=empty_eval)


class TestTokenizerFertility:
    @pytest.fixture(scope="class")
    def result(self, spark, sf_dir):
        from mini_flink_spark.queries import QUERIES

        return QUERIES["tokenizer_fertility"].fn(spark, sf_dir).collect()

    def test_covers_every_source_once(self, result, spark, sf_dir):
        from mini_flink_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents")
        per_source = {
            r.source: r.n
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert {r.source: r.n_docs for r in result} == per_source

    def test_fertility_bounds(self, result):
        # >= 1 unit per word always; merges only ever shrink the unit count,
        # and a unit is at least one char, so chars/unit >= 1 too (n_chars
        # counts separators, pushing it strictly above 1 on this corpus).
        for r in result:
            assert r.fertility >= 1.0, r
            assert r.chars_per_unit >= 1.0, r
            assert r.n_units >= r.n_words


class TestDedupClusterStats:
    @pytest.fixture(scope="class")
    def result(self, spark, sf_dir):
        from mini_flink_spark.queries import QUERIES

        return QUERIES["dedup_cluster_stats"].fn(spark, sf_dir).collect()

    def test_histogram_identities(self, result):
        for r in result:
            # every CC node comes from a pair -> no singleton clusters
            assert r.cluster_size >= 2, r
            assert r.n_docs == r.cluster_size * r.n_clusters
            assert r.n_removable == r.n_docs - r.n_clusters

    def test_mass_matches_component_labels(self, result, spark, sf_dir):
        from mini_flink_spark.functions import dedup as D
        from mini_flink_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents")
        pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.4)
        n_nodes = D.connected_components(pairs).count()
        assert sum(r.n_docs for r in result) == n_nodes


class TestDedupReviewFixes:
    """Round-4 review findings on functions/dedup.py."""

    def test_simhash_oracle_keeps_zero_token_docs(self, spark):
        import duckdb

        from mini_flink_spark.functions import dedup as D

        rows = [(1, "hello world"), (2, "!!! ..."), (3, "")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r.id: r.simhash for r in D.simhash(df, "doc_id", "text").collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        oracle = {
            r[0]: r[1]
            for r in con.execute(D.simhash_sql("doc_id", "text")).fetchall()
        }
        # both engines must emit ALL THREE docs; zero-token docs hash to 0
        assert set(got) == set(oracle) == {1, 2, 3}
        assert got == oracle
        assert got[2] == 0 and got[3] == 0

    def test_connected_components_raises_on_nonconvergence(self, spark):
        import pytest as _pytest

        from mini_flink_spark.functions import dedup as D

        chain = [(i, i + 1) for i in range(29)]  # diameter 29 > max_iter 3
        pairs = spark.createDataFrame(chain, "a bigint, b bigint")
        with _pytest.raises(RuntimeError, match="did not converge"):
            D.connected_components(pairs, max_iter=3)
        # and with budget it converges to component 0 for every node
        comp = {
            r.id: r.component
            for r in D.connected_components(pairs, max_iter=40).collect()
        }
        assert set(comp.values()) == {0}

    def test_incremental_dedup_null_pred_rows_are_old(self, spark):
        from mini_flink_spark.functions import dedup as D

        text = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, text, None),  # NULL ingest_ts -> must count as OLD
            (2, text, 9),     # new arrival, duplicate of doc 1
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, ingest int")
        pairs = D.minhash_incremental_pairs(
            df, "doc_id", "text", new_pred="ingest >= 5", threshold=0.5
        ).collect()
        assert [(r.a, r.b) for r in pairs] == [(1, 2)]
