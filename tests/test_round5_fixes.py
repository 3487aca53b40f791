"""Round-5 ADVICE fixes: NULL-predicate rows must land in the decontamination
TRAIN split, and connected_components must accept graphs that converge exactly
on round max_iter (the probe round distinguishes "final change" from "still
moving").
"""

from __future__ import annotations

import duckdb
import pytest

from mini_flink_spark.functions import dedup as D
from mini_flink_spark.functions import similarity as S


class TestDecontamNullPredicate:
    ROWS = [
        (37, [1.0, 0.0, 0.0], 1),     # eval (tag = 1)
        (100, [1.0, 0.0, 0.0], 0),    # train copy of eval 37 -> must be hit
        (200, [1.0, 0.0, 0.0], None), # NULL tag: must be TRAIN, hit too
        (300, [0.0, 1.0, 0.0], None), # NULL tag, orthogonal: train, no hit
    ]
    SCHEMA = "vec_id bigint, embedding array<float>, tag int"

    def test_null_pred_rows_are_train(self, spark):
        df = spark.createDataFrame(self.ROWS, self.SCHEMA)
        got = {
            (r.train_id, r.eval_id)
            for r in S.semantic_decontam_pairs(df, "tag = 1", tau=0.5).collect()
        }
        # before the fix, vec 200 vanished from BOTH splits (~NULL is NULL)
        assert got == {(100, 37), (200, 37)}

    def test_sql_twin_matches(self, spark):
        df = spark.createDataFrame(self.ROWS, self.SCHEMA)
        got = sorted(
            (r.train_id, r.eval_id, r.cos)
            for r in S.semantic_decontam_pairs(df, "tag = 1", tau=0.5).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[], tag INT)"
        )
        con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", self.ROWS)
        oracle = sorted(
            (r[0], r[1], r[2])
            for r in con.execute(
                S.semantic_decontam_pairs_sql("{T}.tag = 1", tau=0.5)
            ).fetchall()
        )
        assert got == oracle


class TestLitArray:
    # adversarial doubles: shortest-repr round-trip, subnormals, exponents,
    # signed zero, non-finite
    VALS = [
        0.0, -0.0, 1.0, -1.5, 1/3, 0.1, 1e-300, 5e-324, 1.7976931348623157e308,
        -2.2250738585072014e-308, 1e20, 123456789.123456789, -7.895e-7,
        float("nan"), float("inf"), float("-inf"),
    ]

    def test_double_array_bit_identical_to_lit(self, spark):
        from pyspark.sql import functions as F

        from mini_flink_spark.functions.litarray import double_array_lit

        df = spark.range(1)
        got = df.select(double_array_lit(self.VALS).alias("a")).first().a
        ref = df.select(
            F.array(*[F.lit(float(x)) for x in self.VALS]).alias("a")
        ).first().a
        import struct

        bits = lambda xs: [struct.pack(">d", x) for x in xs]
        assert bits(got) == bits(ref)

    def test_matrix_and_bigint_and_rounded(self, spark):
        from pyspark.sql import functions as F

        from mini_flink_spark.functions.litarray import (
            bigint_array_lit,
            double_matrix_lit,
            rounded_double_array_lit,
        )

        df = spark.range(1)
        finite = [x for x in self.VALS if x == x and abs(x) != float("inf")]
        m = df.select(double_matrix_lit([finite, finite[::-1]]).alias("m")).first().m
        assert m == [finite, finite[::-1]]
        ids = [0, -1, 2**63 - 1, -(2**63)]
        assert df.select(bigint_array_lit(ids).alias("i")).first().i == ids
        # engine-side HALF_UP rounding, same as F.round(F.lit(x), 6)
        vals = [1.2345675, -1.2345675, 2.5e-6]
        got = df.select(rounded_double_array_lit(vals, 6).alias("r")).first().r
        ref = df.select(
            F.array(*[F.round(F.lit(v), 6) for v in vals]).alias("r")
        ).first().r
        assert got == ref


class TestLitArrayProperty:
    def test_random_doubles_round_trip(self, spark):
        # hypothesis-driven: ANY finite double must survive the repr->parse
        # round trip bit-exactly (one Spark job over many drawn examples —
        # drawing inside @given would pay session latency per example)
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        collected = []

        @settings(
            max_examples=200,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(st.floats(allow_nan=False, width=64))
        def draw(x):
            collected.append(x)

        draw()
        import struct

        from mini_flink_spark.functions.litarray import double_array_lit

        got = spark.range(1).select(double_array_lit(collected).alias("a")).first().a
        assert [struct.pack(">d", x) for x in got] == [
            struct.pack(">d", x) for x in collected
        ]


class TestCCBoundaryConvergence:
    def test_converges_exactly_on_max_iter_round(self, spark):
        # Min-label propagation moves label 0 one hop per round: a 5-edge
        # chain needs exactly 5 updating rounds. max_iter=5 must therefore
        # SUCCEED (the old code raised because round 5 still changed labels);
        # the extra round is verification-only.
        chain = [(i, i + 1) for i in range(5)]
        pairs = spark.createDataFrame(chain, "a bigint, b bigint")
        comp = {
            r.id: r.component
            for r in D.connected_components(pairs, max_iter=5).collect()
        }
        assert comp == {i: 0 for i in range(6)}

    def test_still_raises_when_budget_truly_short(self, spark):
        chain = [(i, i + 1) for i in range(7)]  # needs 7 rounds > 5
        pairs = spark.createDataFrame(chain, "a bigint, b bigint")
        with pytest.raises(RuntimeError, match="did not converge"):
            D.connected_components(pairs, max_iter=5)
