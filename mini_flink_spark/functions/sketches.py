"""Bounded-state heavy hitters: per-partition Misra-Gries + exact re-count.

The scale problem: "which tokens appear more than N/k times in a 100 TB
corpus" via a plain groupBy shuffles EVERY distinct token (billions of keys)
to count items of which at most k matter. The classic two-phase answer keeps
state bounded:

1. **Candidate phase** — each partition runs a Misra-Gries summary with k
   counters over its local stream (Arrow-batched `mapInPandas`, O(k) memory
   per task, no shuffle). Pigeonhole guarantee: any item with global count
   > N/k exceeds n_p/k in at least one partition, so the union of
   per-partition candidates is a superset of the true heavy hitters
   (<= k * partitions small strings total).
2. **Exact phase** — broadcast the candidate set back over the corpus and
   count ONLY candidates (map-side partial agg on <= k*P keys). Exact counts
   kill Misra-Gries' false positives, so the result is exact — and therefore
   oracle-checkable — while the full-cardinality shuffle never happens.

Complements the estimate-only sketches already in the engine
(`approx_count_distinct` HLL++, `percentile_approx` GK): those trade accuracy
for one pass; this trades a second (cheap, filtered) pass for exactness.

Reference parity note: the reference has no sketch operators; this extends
its keyed-aggregation surface (StreamGroupedReduce.java:35-56) with the
bounded-memory formulation a 100 TB key-space requires.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: <= k candidate values per task.

    Streaming one-pass with k counters: increment if present, insert if room,
    else decrement all (implemented batched: subtract the k+1-th largest
    weight, drop non-positives — equivalent summary, vectorized per Arrow
    batch instead of per row).

    Besides the candidate values, each task emits one `part_n` row carrying
    its item count (the `col` field NULL), so the caller gets N from the
    same pass instead of re-scanning the stream to count it.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        n_items = 0
        for b in batches:
            vals = b[col].dropna()
            n_items += len(vals)
            counters.update(Counter(vals))
            if len(counters) > k:
                # batched decrement: keep the top-k by residual weight,
                # subtracting the (k+1)-th weight from all survivors
                top = counters.most_common(k + 1)
                cut = top[k][1]
                counters = Counter(
                    {v: c - cut for v, c in top[:k] if c - cut > 0}
                )
        yield pd.DataFrame(
            {
                col: list(counters.keys()) + [None],
                "part_n": [None] * len(counters) + [n_items],
            }
        )

    return df.select(col).mapInPandas(summarize, f"{col} string, part_n bigint")


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact values of `col` with count > N/k, computed with O(k * partitions)
    intermediate state instead of a full-cardinality shuffle.

    Returns (value, cnt) — exact, so a plain GROUP BY / HAVING oracle matches.

    Two scans of the item stream total — the algorithm's minimum: the
    candidate pass also carries per-partition item counts, so N needs no
    third scan. No checkpoint on purpose: materializing the full item stream
    (e.g. every token of a 100 TB corpus) to executor disk would cost more
    than re-running the cheap projection that produces it.
    """
    summary = misra_gries_candidates(df, col, k).localCheckpoint(eager=False)
    candidates = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    total = summary.agg(F.sum("part_n").alias("n"))
    counted = (
        df.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(col, "cnt")
    )


def heavy_hitters_sql(
    inner_sql: str, col: str, k: int
) -> str:
    """Exact oracle: GROUP BY + HAVING against the same item stream."""
    return f"""
WITH items AS ({inner_sql})
SELECT {col}, count(*)::BIGINT AS cnt
FROM items
GROUP BY {col}
HAVING count(*) * {k} > (SELECT count(*) FROM items)
"""


# ------------------------------------------------------------ Bloom filter
#
# An explicit, engine-portable Bloom filter (vs the *planner-injected*
# runtime bloom pruning pinned in test_plans): build the bit set over a key
# column with a seeded portable-hash family, probe another column, and report
# hits — including the false positives, which are DETERMINISTIC here because
# the hash family is fixed, so the DuckDB twin reproduces them bit-for-bit.
#
# Scale: the built filter is m bits (a few KB) independent of build-side
# cardinality — it broadcasts anywhere; the probe is a per-row expression.
# This is the manual form of what a 100 TB fact⋈selective-dim join wants
# when the dim side is computed in a previous job (persist the bit set,
# broadcast it into the next query).

BLOOM_M = 8192  # bits (~0.5% FP at ~500 build keys, k=3)
BLOOM_K = 3  # hash functions


def _bloom_positions(col: Column | str, m: int = BLOOM_M, k: int = BLOOM_K):
    from mini_flink_spark.functions.hashing import seeded_hash

    c = F.col(col) if isinstance(col, str) else col
    return [F.pmod(seeded_hash(c.cast("string"), i), F.lit(m)) for i in range(k)]


def bloom_build(df: DataFrame, col: str, m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """1-row DataFrame (bits array<bigint>) — the sorted distinct set bit
    positions. Array-of-positions instead of a packed bitmap keeps the value
    engine-portable; at m=8192 it is bounded by 8192 longs either way."""
    pos = df.select(F.explode(F.array(*_bloom_positions(col, m, k))).alias("p"))
    return pos.groupBy().agg(F.array_sort(F.collect_set("p")).alias("bits"))


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """probe columns + `bloom_hit` boolean: true iff every hash position of
    the probe key is set. `bloom` broadcasts (1 row)."""
    # the filter column joins in under a __bloom_ sentinel so a probe frame
    # that already carries a `bits` column can't collide (ADVICE r2)
    hit = None
    for p in _bloom_positions(col, m, k):
        term = F.array_contains(F.col("__bloom_bits"), p)
        hit = term if hit is None else (hit & term)
    return (
        probe.crossJoin(F.broadcast(bloom.withColumnRenamed("bits", "__bloom_bits")))
        .withColumn("bloom_hit", hit)
        .drop("__bloom_bits")
    )


def bloom_sql_positions(expr: str, m: int = BLOOM_M, k: int = BLOOM_K) -> list[str]:
    from mini_flink_spark.functions.hashing import seeded_hash_sql

    return [f"(({seeded_hash_sql(f'({expr})::VARCHAR', i)}) % {m} + {m}) % {m}" for i in range(k)]


# -------------------------------------------------------- Count-Min sketch

CMS_D = 4  # hash rows
CMS_W = 2048  # counters per row


def _cms_positions(col: Column | str, w: int = CMS_W, d: int = CMS_D):
    from mini_flink_spark.functions.hashing import seeded_hash

    c = F.col(col) if isinstance(col, str) else col
    # seeds offset by 100 so the family is independent of the Bloom filter's
    return [F.pmod(seeded_hash(c.cast("string"), 100 + i), F.lit(w)) for i in range(d)]


def cms_build(df: DataFrame, col: str, w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """(row, pos, c) counter table of the Count-Min sketch over the item
    stream — d*w bounded rows regardless of stream cardinality (the mergeable
    form: sketches of two corpora ADD, which is why CMS is the streaming /
    multi-datacenter counter of choice). Map-side partial aggs absorb the
    Zipf head before the (row, pos)-keyed exchange."""
    pos = _cms_positions(col, w, d)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), p.alias("pos"))
                    for i, p in enumerate(pos)
                ]
            )
        ).alias("rp")
    )
    return (
        rows.select(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_build_weighted(
    df: DataFrame, col: str, weight_col: str, w: int = CMS_W, d: int = CMS_D
) -> DataFrame:
    """cms_build over a PRE-AGGREGATED (value, count) frame: each distinct
    value adds `weight_col` to its d counters — identical integers to
    cms_build over the raw stream (sum of per-value counts == count of
    occurrences), at d hash evaluations per DISTINCT value instead of per
    OCCURRENCE. On a Zipf token stream that is orders of magnitude less
    hashing and explode volume; the input frame is vocabulary-sized, which a
    plain wordcount-shaped groupBy (map-side partials) produces scalably at
    any corpus size."""
    pos = _cms_positions(col, w, d)
    rows = df.select(
        F.col(weight_col).alias("__cms_w"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), p.alias("pos"))
                    for i, p in enumerate(pos)
                ]
            )
        ).alias("rp"),
    )
    return (
        rows.select(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"), "__cms_w")
        .groupBy("row", "pos")
        .agg(F.sum("__cms_w").cast("bigint").alias("c"))
    )


def cms_estimate(
    items: DataFrame, cms: DataFrame, col: str, w: int = CMS_W, d: int = CMS_D
) -> DataFrame:
    """items + `cms_est` = min over the d counters each item hashes to.
    The d*w counter table broadcasts (bounded KBs)."""
    # internal join/accumulator columns carry a __cms_ sentinel so a probe
    # frame that already has pos0/c0/... columns can't collide (ADVICE r2)
    est = None
    for i, p in enumerate(_cms_positions(col, w, d)):
        ci = cms.filter(F.col("row") == i).select(
            F.col("pos").alias(f"__cms_pos{i}"), F.col("c").alias(f"__cms_c{i}")
        )
        items = items.join(
            F.broadcast(ci), p == F.col(f"__cms_pos{i}"), "left"
        ).drop(f"__cms_pos{i}")
        term = F.coalesce(F.col(f"__cms_c{i}"), F.lit(0))
        est = term if est is None else F.least(est, term)
        items = items.withColumn("__cms_est_acc", est).drop(f"__cms_c{i}")
        est = F.col("__cms_est_acc")
    return items.withColumnRenamed("__cms_est_acc", "cms_est")


def cms_sql_positions(expr: str, w: int = CMS_W, d: int = CMS_D) -> list[str]:
    from mini_flink_spark.functions.hashing import seeded_hash_sql

    return [
        f"(({seeded_hash_sql(f'({expr})::VARCHAR', 100 + i)}) % {w} + {w}) % {w}"
        for i in range(d)
    ]


# ------------------------------------- portable histogram quantile sketch

HIST_LO = 0.0
HIST_HI = 500.0
HIST_BINS = 1000


def histogram_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Approximate quantiles from a FIXED equi-width histogram — the
    engine-portable member of the quantile-sketch family (t-digest / GK
    summaries are implementation-specific, so `sketch_value_percentiles`
    can only be rows-checked; this one's estimates hash-match the oracle,
    collisions of binning included).

    Estimate for q: with n total rows and t = ceil(q·n), find the first
    bin whose cumulative count reaches t, then interpolate linearly inside
    it: lo + width·bin + width·(t - cum_before)/bin_count. All inputs to
    the arithmetic are integers plus the fixed bin edges, so both engines
    compute identical doubles (rounded to 6 dp for the compare).

    Scale: one groupBy on the bin index — the shuffle carries at most
    `bins` rows per partition (map-side partials), the fold runs over the
    ≤`bins`-element collected list. Error is bounded by the bin width, the
    standard fixed-histogram tradeoff; values outside [lo, hi) clamp to
    the edge bins."""
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width).cast("int")),
    )
    hist = (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("bin", "c"))).alias("h"))
    )
    # per-quantile fold over the sorted (bin, count) list: carry cumulative
    # count; once it reaches t, record the bin and the pre-bin cumulative
    out = hist
    cols = []
    for i, q in enumerate(qs):
        t = f"cast(ceil({q!r}D * aggregate(h, 0L, (a, x) -> a + x.c)) as bigint)"
        fold = (
            "aggregate(h,"
            " named_struct('cum', 0L, 'bin', -1, 'before', 0L),"
            " (acc, x) -> IF(acc.bin >= 0, acc,"
            f"   IF(acc.cum + x.c >= {t},"
            "      named_struct('cum', acc.cum + x.c, 'bin', x.bin, 'before', acc.cum),"
            "      named_struct('cum', acc.cum + x.c, 'bin', -1, 'before', 0L))))"
        )
        out = out.withColumn(f"__r{i}", F.expr(fold))
        cols.append(
            F.expr(
                f"named_struct('q', {q!r}D, 'est',"
                f" round({lo!r}D + {width!r}D * __r{i}.bin"
                f" + {width!r}D * (cast({t} - __r{i}.before as double)"
                f" / cast(__r{i}.cum - __r{i}.before as double)), 6))"
            )
        )
    return (
        out.select(F.explode(F.array(*cols)).alias("z"))
        .select(F.col("z.q").alias("q"), F.col("z.est").alias("est"))
    )


def histogram_quantiles_sql(
    inner_sql: str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    bins: int = HIST_BINS,
) -> str:
    """DuckDB twin: same binning, cumulative window over the ≤bins rows,
    first bin reaching each target, identical interpolation."""
    width = (hi - lo) / bins
    q_rows = ", ".join(f"({q!r})" for q in qs)
    return f"""
WITH items AS ({inner_sql}),
hist AS (
  SELECT least({bins - 1}, greatest(0, floor(({col} - {lo!r}) / {width!r})::INT)) AS bin,
         count(*)::BIGINT AS c
  FROM items GROUP BY 1
),
cum AS (
  SELECT bin, c,
         sum(c) OVER (ORDER BY bin) AS cum,
         sum(c) OVER (ORDER BY bin) - c AS before
  FROM hist
),
qs(q) AS (VALUES {q_rows}),
tot AS (SELECT sum(c)::BIGINT AS n FROM hist),
hit AS (
  SELECT q, min(bin) AS bin FROM qs, cum, tot
  WHERE cum >= ceil(q * n)::BIGINT GROUP BY q
)
SELECT q, round({lo!r} + {width!r} * h.bin
       + {width!r} * ((ceil(q * n)::BIGINT - c2.before)::DOUBLE
                      / (c2.cum - c2.before)::DOUBLE), 6) AS est
FROM hit h JOIN cum c2 ON c2.bin = h.bin CROSS JOIN tot
"""
