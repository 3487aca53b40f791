"""Pre-built keyed aggregators — the reference's SUM / MIN / MAX / MINBY / MAXBY.

Reference: SumAggregator.java:33-72 (+ SumFunction.java:34-108 type-dispatched
adders), ComparableAggregator.java:31-93 with AggregationType enum
{SUM, MIN, MAX, MINBY, MAXBY} (AggregationFunction.java:33-35). MINBY/MAXBY
return the *whole record* holding the extremal field; the reference's `first`
flag picks the earliest-arrived record on ties (ComparableAggregator.java:78-86).

Spark rendering: sum/min/max are built-in aggregates (with map-side partial
aggregation — a combiner the reference lacked). MINBY/MAXBY use
``min_by/max_by(payload_struct, comparator_struct)`` where the comparator is
(field, arrival-order) — a unique sort key, so the tie-break is deterministic
in one single-pass aggregation (no window sort; survives 100 TB: it's a
hash-aggregate over the keys, partials on the map side).

The arrival-order column is explicit because Spark is set-oriented while the
reference is arrival-ordered (SURVEY.md §4 'honest list' item 3).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _agg_record(
    df: DataFrame,
    keys: Sequence[Column],
    field: str,
    order_col: str,
    *,
    minimal: bool,
    first: bool,
) -> DataFrame:
    """Single-pass whole-record extremal aggregation with deterministic ties."""
    payload = F.struct(*[F.col(c) for c in df.columns])
    # Comparator (field, ±order): for min we want the smallest field, and on
    # ties first=True -> smallest order wins => minimize (field, order).
    # For max we want the largest field, and on ties first=True -> smallest
    # order wins => maximize (field, -order).
    if minimal:
        order_term = F.col(order_col) if first else -F.col(order_col)
        agg = F.min_by(payload, F.struct(F.col(field), order_term))
    else:
        order_term = -F.col(order_col) if first else F.col(order_col)
        agg = F.max_by(payload, F.struct(F.col(field), order_term))
    return df.groupBy(*keys).agg(agg.alias("__rec__")).select("__rec__.*")


def min_by_record(df, keys, field, order_col, first=True) -> DataFrame:
    """MINBY (ComparableAggregator.java:78-86): whole record with minimal
    `field`; `first` picks earliest vs latest arrival on ties."""
    return _agg_record(df, keys, field, order_col, minimal=True, first=first)


def max_by_record(df, keys, field, order_col, first=True) -> DataFrame:
    """MAXBY: whole record with maximal `field`."""
    return _agg_record(df, keys, field, order_col, minimal=False, first=first)


def keyed_aggregates(df: DataFrame, keys: Sequence[Column], field: str) -> DataFrame:
    """SUM/MIN/MAX/COUNT in one pass (one shuffle, map-side partials)."""
    return df.groupBy(*keys).agg(
        F.sum(field).alias(f"sum_{field}"),
        F.min(field).alias(f"min_{field}"),
        F.max(field).alias(f"max_{field}"),
        F.count(F.lit(1)).alias("cnt"),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    field: str,
    n_salts: int = 16,
    sum_cast: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof SUM/MIN/MAX/COUNT: aggregate on (keys, salt) first,
    then merge per key.

    Spark's map-side partial aggregation already absorbs most key skew; the
    residual failure mode at 100 TB is a reduce-side hot key whose partials
    from thousands of map tasks still converge on one reducer. Salting splits
    that key across `n_salts` reducers and merges the (tiny) salted partials
    in a second, uniform aggregation. Result is bit-identical for these
    decomposable aggregates (sums re-associate over integer/decimal types;
    use DECIMAL accumulation for money — see queries.dsum).

    AQE's skew-join splitting does NOT cover aggregation skew — this is the
    manual strategy for it, worth its extra (cheap) shuffle only on skewed
    keyspaces.
    """
    sum_col = F.col(field).cast(sum_cast) if sum_cast else F.col(field)
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(sum_col).alias("_s"),
        F.min(field).alias("_mn"),
        F.max(field).alias("_mx"),
        F.count(F.lit(1)).alias("_c"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_s").alias(f"sum_{field}"),
        F.min("_mn").alias(f"min_{field}"),
        F.max("_mx").alias(f"max_{field}"),
        F.sum("_c").alias("cnt"),
    )
