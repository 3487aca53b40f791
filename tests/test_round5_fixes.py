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
