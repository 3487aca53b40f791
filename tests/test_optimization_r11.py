"""Round-11 optimization-phase tests: internals changed for speed must be
pinned value-identical to the shapes they replaced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.functions import sketches as K


@pytest.fixture(scope="module")
def spark():
    from mini_flink_spark.session import get_spark

    return get_spark(app_name="test-optimization-r11")


class TestWeightedCmsBuild:
    def test_weighted_build_matches_stream_build(self, spark):
        """cms_build_weighted over (value, count) must produce the IDENTICAL
        counter table to cms_build over the raw occurrence stream — the
        contract that lets sketch_count_min hash per distinct token instead
        of per occurrence."""
        vals = ["alpha", "beta", "gamma", "alpha", "alpha", "beta", "delta"] * 13
        raw = spark.createDataFrame([(v,) for v in vals], "tok string")
        agg = raw.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        t_stream = sorted(
            tuple(r) for r in K.cms_build(raw, "tok").collect()
        )
        t_weighted = sorted(
            tuple(r) for r in K.cms_build_weighted(agg, "tok", "cnt").collect()
        )
        assert t_stream == t_weighted
        # counters sum to d * stream length (every occurrence lands once per row)
        assert sum(c for _, _, c in t_weighted) == K.CMS_D * len(vals)

    def test_sketch_count_min_heavy_hitter_contract(self, spark, tmp_path):
        """The broadcast-total heavy-hitter filter inside sketch_count_min
        must keep heavy_hitters()'s exact contract: value kept iff
        cnt * k > N."""
        vals = ["hot"] * 60 + ["warm"] * 30 + [f"cold{i}" for i in range(10)]
        raw = spark.createDataFrame([(v,) for v in vals], "tok string")
        tok_counts = raw.groupBy("tok").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        total = tok_counts.agg(F.sum("cnt").cast("bigint").alias("__n_items"))
        k = 4  # threshold N/k = 25
        hh = (
            tok_counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * k > F.col("__n_items"))
            .select("tok", "cnt")
        )
        got = {(r.tok, r.cnt) for r in hh.collect()}
        expect = {(r.tok, r.cnt) for r in K.heavy_hitters(raw, "tok", k).collect()}
        assert got == expect == {("hot", 60), ("warm", 30)}


class TestSpanRemovalMaterialization:
    def test_span_removal_plan_reuses_checkpoints(self, spark):
        """remove_duplicate_spans materializes the token stream and the
        (id, pos, hash) stream (r11): the final plan must consume those
        checkpoints (ExistingRDD scans) instead of re-inlining the tokenizer
        chain per consumer — the duplicated-subtree shape it replaced ran
        the tokenizer 3x per query."""
        from mini_flink_spark.functions import dedup as D

        df = spark.createDataFrame(
            [(i, "alpha beta gamma " * 20) for i in range(6)],
            "doc_id bigint, text string",
        )
        out = D.remove_duplicate_spans(df, "doc_id", "text", w=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # tokenizer (regexp_replace) must not appear downstream of the
        # checkpoints; the reconstruction join reads the materialized RDDs
        assert "regexp_replace" not in plan
        assert plan.count("ExistingRDD") >= 2
        # and the operator still removes the planted duplicate spans
        rows = out.collect()
        assert all(r.clean_text == "" and r.n_removed == r.n_tokens for r in rows)


class TestFusedInitConnectedComponents:
    def test_fused_init_equals_identity_round(self, spark):
        """The r11 fused init (comp = least(u, min neighbor id) as one
        aggregation) must equal one textbook min-label round over identity
        labels — pinned on a graph whose fused init is NOT yet converged
        (path 1-2-3-4-5 plus an isolated pair), so the loop still runs."""
        from mini_flink_spark.functions import dedup as D

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a bigint, b bigint"
        )
        got = {r.id: r.component for r in D.connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


class TestTfidfSinglePass:
    def test_df_and_n_derived_from_tf(self, spark):
        """tfidf's df/n_docs now derive from the tf aggregate (r11): pinned
        equal to the direct token-stream definitions on a frame with
        repeated tokens and a token-less doc shape."""
        from pyspark.sql import functions as F
        from mini_flink_spark.functions.text import tokens

        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "b c"), (3, "c c c")], "doc_id bigint, text string"
        )
        toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
        df_direct = {
            (r.tok, r.df)
            for r in toks.groupBy("tok")
            .agg(F.countDistinct("doc_id").alias("df"))
            .collect()
        }
        df_derived = {
            (r.tok, r.df)
            for r in tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).collect()
        }
        assert df_direct == df_derived
        n_direct = toks.agg(F.countDistinct("doc_id")).collect()[0][0]
        n_derived = tf.agg(F.countDistinct("doc_id")).collect()[0][0]
        assert n_direct == n_derived == 3


class TestBpeVocabEncode:
    def test_vocab_encode_matches_occurrence_encode(self, spark):
        """bpe_encode_counts' per-distinct-word unit table joined back to the
        occurrence stream must give the same per-doc counts as encoding each
        occurrence (r11) — pinned on a frame with heavy word repetition."""
        from mini_flink_spark.functions import bpe as B

        docs = spark.createDataFrame(
            [(i, "hello world hello hello") for i in range(4)],
            "doc_id bigint, text string",
        )
        out = {
            r.doc_id: (r.n_words, r.n_units)
            for r in B.bpe_encode_counts(docs, docs, "doc_id", "text", rounds=2).collect()
        }
        # 'hello' = 5 chars, 'world' = 5 chars; 2 merges learned on the corpus
        # shrink the top pair twice -> every doc identical
        assert len(out) == 4 and len(set(out.values())) == 1
        n_words, n_units = next(iter(out.values()))
        assert n_words == 4
        # 2 merges applied => unit count strictly below the 20-char seed
        assert n_units < 20


class TestLangidFromTokens:
    def test_from_tokens_matches_from_text(self, spark):
        """langid_from_tokens over materialized tokens must equal langid over
        the raw text on mixed-language rows including a tie (empty doc)."""
        from pyspark.sql import functions as F
        from mini_flink_spark.functions import text as T

        docs = spark.createDataFrame(
            [
                (1, "the cat and the dog is in the house"),
                (2, "der hund ist nicht auf der couch und das ist gut"),
                (3, "le chat est dans la maison pour que"),
                (4, ""),
            ],
            "doc_id bigint, text string",
        )
        a = {r.doc_id: r.p for r in docs.select("doc_id", T.langid("text").alias("p")).collect()}
        b = {
            r.doc_id: r.p
            for r in docs.select("doc_id", T.tokens("text").alias("t"))
            .select("doc_id", T.langid_from_tokens(F.col("t")).alias("p"))
            .collect()
        }
        assert a == b
        assert a[1] == "en" and a[2] == "de" and a[3] == "fr"


class TestStreamingStatePartitionDefault:
    def test_drain_freezes_four_state_partitions(self, spark):
        """§14: the run_stream_to_memory default state-partition count is 4
        (state-store instances per microbatch track keyed-state volume, not
        core count), asserted from the drained query's OWN runtime progress,
        and the session's shuffle-partition conf is restored afterwards."""
        from mini_flink_spark.streaming.wordcount import (
            LAST_PROGRESS,
            run_stream_to_memory,
            wordcount_stream_update,
        )

        prev = spark.conf.get("spark.sql.shuffle.partitions")
        import json
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            src = f"{d}/src"
            spark.createDataFrame(
                [("hello world",), ("hello spark",)], "line string"
            ).write.parquet(src)
            stream = (
                spark.readStream.format("parquet").schema("line string").load(src)
            )
            LAST_PROGRESS.clear()
            out = run_stream_to_memory(
                wordcount_stream_update(stream), spark, "update"
            )
            assert {(r.word, r["count"]) for r in out.collect()} == {
                ("hello", 2),
                ("world", 1),
                ("spark", 1),
            }
        prog = next(reversed(LAST_PROGRESS.values()))
        ops = prog.get("stateOperators") or []
        assert ops, "no stateful operators in progress"
        assert ops[0]["numShufflePartitions"] == 4, json.dumps(ops[0])
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev
