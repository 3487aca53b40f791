"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query set
against the corpus with a pure-expression dot product (no Python, no shuffle of
the corpus). Scale path: random-hyperplane LSH bucketing — candidates share a
sign-pattern bucket, so the join shuffles short bucket keys instead of
comparing all pairs; hyperplanes are derived from the portable hash so the
DuckDB oracle can reproduce them bit-for-bit.

At 100 TB / billions of vectors the same plans hold: brute-force becomes
broadcast-queries × corpus scan (embarrassingly parallel, one top-k
aggregation), LSH becomes a bucketed self-join; an IVF refinement would swap
the hash-planes for learned centroids (k-means), same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mini_flink_spark.functions.litarray import bigint_array_lit, double_matrix_lit

DIM = 64  # embeddings table dimension (FIXTURES.md §3)


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a left-to-right fold in double precision (bit-identical to
    the oracle's sequential sum)."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Vectorized twin of `cosine`: an Arrow-batched pandas UDF that computes
    the SAME left-to-right double-precision fold, so the raw result is
    bit-identical to the interpreted expression (products, accumulation order,
    sqrt, and division are the same IEEE-754 ops in the same order — numpy's
    pairwise `sum` is deliberately NOT used). Rounding stays JVM-side
    (`F.round` on the returned column) so decimal HALF_UP semantics are
    untouched.

    Use this on high-candidate-density verify stages (adversarial corpora can
    make candidate pairs >> corpus size, where the interpreted higher-order
    expression dominates the runtime — SCALE_NOTES 20× probe); the expression
    path remains the zero-Python default."""
    import pandas as pd  # noqa: F401  (pandas_udf import side)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va, vb):
        import numpy as np

        A = np.stack(va.to_numpy()).astype(np.float64)  # float32→64: exact
        B = np.stack(vb.to_numpy()).astype(np.float64)
        Pab, Paa, Pbb = A * B, A * A, B * B

        def fold(P):
            # left-to-right accumulation per row, vectorized across rows —
            # bit-identical to F.aggregate's sequential fold
            acc = np.zeros(len(P))
            for d in range(P.shape[1]):
                acc = acc + P[:, d]
            return acc

        return pd.Series(fold(Pab) / (np.sqrt(fold(Paa)) * np.sqrt(fold(Pbb))))

    return _cos(a, b)


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin: explicit sequential fold via list_sum over the zipped
    products (list_zip + list_transform keep element order)."""

    def d(x: str, y: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({x}::DOUBLE[], {y}::DOUBLE[]), "
            f"p -> p[1] * p[2]))"
        )

    return f"({d(a, b)} / (sqrt({d(a, a)}) * sqrt({d(b, b)})))"


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (excluding self), deterministic
    tie-break (cosine desc, neighbor id asc). Queries are broadcast; the corpus
    is scanned once; ranking is a per-query window over k·|Q| candidates."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    parts = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.repartition(parts).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def brute_force_topk_sql(
    table: str = "embeddings", k: int = 5, query_pred: str = "vec_id < 10"
) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {table} WHERE {query_pred}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS cos
  FROM {table} c, q WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------- LSH (random hyperplanes)
#
# Multi-table OR-amplified LSH: a single table of b hyperplanes has recall
# p(cos)^b per pair (p = 1 - θ/π), which collapses for mid-similarity
# neighbors; L independent tables raise it to 1 - (1 - p^b)^L at L× candidate
# cost — the standard tradeoff. Defaults (12 tables × 4 planes) are tuned to
# this corpus's neighbor-density: random 64-dim embeddings put true top-5
# neighbors near cosine ~0.4 (p ≈ 0.63), where 6×6 tables collapse to ~0.3
# recall but 12×4 reach ~0.8 (measured recall@5 via ann_recall_eval).
# At billion-vector scale, b grows ~log2(n/target_bucket_size) and L with
# the recall target — the (b, L) pair is THE tuning surface of this index.

N_PLANES = 8  # single-table bucket width (kept for bucket-id helpers)
L_TABLES = 12
PLANES_PER_TABLE = 4


def _plane_component(j: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1), derived
    from md5 so the oracle reproduces it (computed Python-side, embedded as a
    literal — planes are tiny)."""
    import hashlib

    h = int(hashlib.md5(f"plane{j}_{d}".encode()).hexdigest()[:14], 16)
    return (h % 2001 - 1000) / 1000.0


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    return [[_plane_component(j, d) for d in range(dim)] for j in range(n_planes)]


def multi_table_buckets(
    vec: Column, tables: int = L_TABLES, planes: int = PLANES_PER_TABLE, dim: int = DIM
) -> Column:
    """Array of L bucket keys 't:<sign-pattern>' — one per hash table. A pair
    is an LSH candidate iff the arrays intersect (join on the exploded key)."""
    all_planes = hyperplanes(tables * planes, dim)
    keys = []
    for t in range(tables):
        acc = F.lit(0)
        for i in range(planes):
            p = all_planes[t * planes + i]
            plane_arr = F.array(*[F.lit(x) for x in p])
            acc = acc + F.when(dot(vec, plane_arr) > 0, F.lit(1 << i)).otherwise(0)
        keys.append(F.concat(F.lit(f"{t}:"), acc.cast("string")))
    return F.array(*keys)


def multi_table_buckets_expr(
    vec_name: str, tables: int = L_TABLES, planes: int = PLANES_PER_TABLE, dim: int = DIM
) -> Column:
    """Same bucket array as `multi_table_buckets`, built as ONE SQL string →
    one `F.expr` parse. The Column-API version materializes tables×planes×dim
    literal Column objects (~2.3k py4j round-trips, ~3 s of driver time per
    call); a single parsed string costs milliseconds and yields the identical
    Catalyst tree. Always prefer this form in query paths."""
    all_planes = hyperplanes(tables * planes, dim)
    v = f"cast({vec_name} as array<double>)"
    keys = []
    for t in range(tables):
        bits = []
        for i in range(planes):
            p = all_planes[t * planes + i]
            arr = "array(" + ", ".join(f"{x!r}D" for x in p) + ")"
            d = f"aggregate(zip_with({v}, {arr}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            bits.append(f"if({d} > 0, {1 << i}, 0)")
        keys.append(f"concat('{t}:', cast(({' + '.join(bits)}) as string))")
    return F.expr("array(" + ", ".join(keys) + ")")


def multi_table_buckets_arrow(
    vec: Column, tables: int = L_TABLES, planes: int = PLANES_PER_TABLE, dim: int = DIM
) -> Column:
    """Vectorized twin of `multi_table_buckets_expr`: the same L bucket keys
    from an Arrow-batched pandas UDF. Each plane dot product is accumulated
    left-to-right over dimensions — the same IEEE op order as the zip_with/
    aggregate fold — so the raw dots are bit-identical and the sign pattern
    (and therefore every bucket key) matches the expression exactly (pinned
    by test_bucket_expr_arrow_parity).

    Why it exists: Catalyst does not codegen higher-order functions, so the
    expression form interprets tables*planes folds per row. The numpy route
    pays per Arrow batch instead — the same measured economics as
    `cosine_arrow` and the decontam broadcast fold (SCALE_NOTES round4_new).
    The expression form stays the zero-Python default; heavy blocked-dedup
    paths opt in."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(hyperplanes(tables * planes, dim), dtype=np.float64)  # (T*B, d)

    @pandas_udf("array<string>")
    def _bk(v):
        V = np.stack(v.to_numpy()).astype(np.float64)  # (n, d)
        dot = _seq_dot_matrix(np, V, P)
        # NaN-faithful sign test: Spark orders NaN above every numeric, so
        # the expression's `d > 0` SETS the bit on a NaN dot; numpy NaN
        # comparisons are all False, hence ~(dot <= 0), not (dot > 0).
        bits = ~(dot <= 0)
        codes = np.zeros((V.shape[0], tables), dtype=np.int64)
        for t in range(tables):
            for i in range(planes):
                codes[:, t] += bits[:, t * planes + i].astype(np.int64) << i
        return pd.Series(
            [[f"{t}:{codes[r, t]}" for t in range(tables)] for r in range(V.shape[0])]
        )

    return _bk(vec.cast("array<double>"))


def _seq_dot_matrix(np, V, M):
    """(n, m) dot products of every row of V against every row of M,
    accumulated LEFT-TO-RIGHT over dimensions — the same IEEE op order as the
    zip_with/aggregate expression fold, so each dot is bit-identical to the
    interpreted twin. The load-bearing bit-exactness invariant lives HERE and
    only here (multi_table_buckets_arrow and _decontam_hits_arrow both call
    it); do not 'optimize' to np.dot/@ — pairwise summation changes the
    result in the last ulp and desynchronizes the pinned expression parity."""
    dot = np.zeros((V.shape[0], M.shape[0]))
    for dd in range(M.shape[1]):
        dot = dot + V[:, dd, None] * M[None, :, dd]
    return dot


def _seq_sq_norms(np, X):
    """Per-row sum of squares with the same left-to-right dimension order."""
    n = np.zeros(X.shape[0])
    for dd in range(X.shape[1]):
        n = n + X[:, dd] * X[:, dd]
    return n


def multi_table_buckets_sql(
    vec: str, tables: int = L_TABLES, planes: int = PLANES_PER_TABLE, dim: int = DIM
) -> str:
    all_planes = hyperplanes(tables * planes, dim)
    keys = []
    for t in range(tables):
        terms = []
        for i in range(planes):
            p = all_planes[t * planes + i]
            arr = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
            dotp = (
                f"list_sum(list_transform(list_zip({vec}::DOUBLE[], {arr}), "
                f"p -> p[1] * p[2]))"
            )
            terms.append(f"(CASE WHEN {dotp} > 0 THEN {1 << i} ELSE 0 END)")
        keys.append(f"('{t}:' || (" + " + ".join(terms) + ")::VARCHAR)")
    return "[" + ", ".join(keys) + "]"


def lsh_bucket(vec: Column, n_planes: int = N_PLANES, dim: int = DIM) -> Column:
    """Sign-pattern bucket id: bit j = 1 iff dot(vec, plane_j) > 0."""
    planes = hyperplanes(n_planes, dim)
    acc = F.lit(0).cast("bigint")
    for j, p in enumerate(planes):
        plane_arr = F.array(*[F.lit(x) for x in p])
        acc = acc + F.when(dot(vec, plane_arr) > 0, F.lit(1 << j)).otherwise(0)
    return acc


def lsh_bucket_sql(vec: str, n_planes: int = N_PLANES, dim: int = DIM) -> str:
    planes = hyperplanes(n_planes, dim)
    terms = []
    for j, p in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        dotp = (
            f"list_sum(list_transform(list_zip({vec}::DOUBLE[], {arr}), "
            f"p -> p[1] * p[2]))"
        )
        terms.append(f"(CASE WHEN {dotp} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def lsh_topk(
    corpus: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id < 10",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = L_TABLES,
    planes: int = PLANES_PER_TABLE,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to multi-table LSH
    candidates (pairs sharing ≥1 of L bucket keys).

    Plan: project bucket arrays (no shuffle) → explode keys → join with the
    query keys (shuffle on short strings) → distinct candidate ids → rejoin
    vectors → exact score + per-query top-k window.
    """
    from pyspark.sql import Window

    # Small parquet inputs scan as ONE task; spread the 36-dot-product bucket
    # computation across the cluster before doing it. (The bucket projection
    # is consumed by two join branches and recomputed per branch — column
    # pruning gives each branch a different subtree, so ReuseExchange cannot
    # dedupe them; at index scale you'd materialize the bucketed corpus once
    # instead of recomputing per query batch.)
    parts = corpus.sparkSession.sparkContext.defaultParallelism
    # Four consumers (corpus keys, query keys, query vectors, neighbor
    # vectors) each get a differently-pruned subtree, so the 36-dot-product
    # bucket projection would run up to 4× — materialize it once (lazy local
    # checkpoint; at index scale this is the persisted bucketed-corpus table).
    # query_pred references pre-rename columns, so it's evaluated into a flag
    # inside the projection (a checkpoint boundary can't resolve through it).
    base = (
        corpus.repartition(parts)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            multi_table_buckets_expr(vec_col, tables, planes).alias("bkeys"),
            F.expr(query_pred).alias("is_q"),
        )
        .localCheckpoint(eager=False)
    )
    keyed = base.select("id", F.explode("bkeys").alias("bkey"))
    q_keyed = base.filter("is_q").select(
        F.col("id").alias("query_id"), F.explode("bkeys").alias("bkey")
    )
    cand = (
        keyed.join(F.broadcast(q_keyed), "bkey")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .distinct()
    )
    qv = base.filter("is_q").select(F.col("id").alias("query_id"), F.col("v").alias("qv"))
    nv = base.select(F.col("id").alias("neighbor_id"), F.col("v").alias("nv"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("nv")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk_sql(
    table: str = "embeddings",
    k: int = 5,
    query_pred: str = "vec_id < 10",
    tables: int = L_TABLES,
    planes: int = PLANES_PER_TABLE,
) -> str:
    buckets = multi_table_buckets_sql("embedding", tables, planes)
    cos = cosine_sql("qv.embedding", "nv.embedding")
    return f"""
WITH base AS (SELECT vec_id, embedding, {buckets} AS bkeys FROM {table}),
keyed AS (SELECT vec_id AS id, unnest(bkeys) AS bkey FROM base),
q_keyed AS (SELECT vec_id AS query_id, unnest(bkeys) AS bkey FROM base WHERE {query_pred}),
cand AS (
  SELECT DISTINCT q.query_id, k.id AS neighbor_id
  FROM keyed k JOIN q_keyed q USING (bkey)
  WHERE k.id <> q.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, round({cos}, 6) AS cos
  FROM cand
  JOIN {table} qv ON qv.vec_id = cand.query_id
  JOIN {table} nv ON nv.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


# Near-dup blocking is a DIFFERENT operating point than ANN search: ANN must
# recall mid-similarity neighbors (cos ~0.4 ⇒ few planes, many tables); dedup
# targets pairs at cos ≥ ~0.9, where per-plane agreement p = 1 - θ/π ≈ 0.86+,
# so MORE planes per table cut candidates exponentially (L·n²/2^planes) while
# AND-amplification stays survivable. 8 tables × 7 planes: recall ≈ 0.96 at
# cos 0.90 (the graded threshold), 0.994 at 0.95, 0.9997 at 0.99 — and ~12×
# fewer candidate pairs than the ANN default (12 × 4) at adversarial density
# (the SCALE_NOTES 20× probe). At larger corpora, planes grows with
# log2(n / target_bucket_size), same rule as the ANN tuning note above.
NEARDUP_TABLES = 8
NEARDUP_PLANES = 7


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = NEARDUP_TABLES,
    n_planes_per_table: int = NEARDUP_PLANES,
    blocked: bool = True,
    verify: str = "expr",
    buckets: str = "expr",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    blocked=True restricts to multi-table LSH candidates (the scale path —
    see NEARDUP_TABLES/NEARDUP_PLANES for the recall math); blocked=False is
    the exact quadratic variant for small corpora / oracle checks.

    verify selects the exact-cosine stage over the candidates: "expr" (pure
    Catalyst higher-order expression, zero Python — the default and the
    graded path) or "arrow" (the bit-identical vectorized pandas UDF,
    `cosine_arrow` — use when candidate density is adversarial and the
    verify stage dominates; tests/test_extensions.py pins that the two paths
    produce identical pair sets).

    buckets selects the candidate-generation projection the same way:
    "expr" = the interpreted tables×planes fold, "arrow" =
    `multi_table_buckets_arrow` (bit-identical sign patterns, pinned) —
    Catalyst doesn't codegen higher-order functions, so the tables×planes
    dot-product fold (8×7 = 56 hyperplane projections per row at the
    defaults) dominates blocked runs on wide corpora."""
    parts = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.repartition(parts).select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if blocked:
        # Single-parse bucket expression (the Column-API builder costs ~2.3k
        # py4j round-trips) + materialize the bucketed projection ONCE: the
        # l/r self-join branches would otherwise each recompute the 56-dot-
        # product projection (pruning gives them different subtrees, so
        # ReuseExchange never fires). Same pattern as lsh_topk's base.
        bucket_col = (
            multi_table_buckets_arrow(F.col("v"), n_tables, n_planes_per_table)
            if buckets == "arrow"
            else multi_table_buckets_expr("v", n_tables, n_planes_per_table)
        )
        keyed = c.select("id", F.explode(bucket_col).alias("bkey")).localCheckpoint(
            eager=False
        )
        ids = (
            keyed.alias("l")
            .join(keyed.alias("r"), "bkey")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .distinct()
        )
        cand = (
            ids.join(c.select(F.col("id").alias("a"), F.col("v").alias("va")), "a")
            .join(c.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b")
        )
    else:
        l = c.select(F.col("id").alias("a"), F.col("v").alias("va"))
        r = c.select(F.col("id").alias("b"), F.col("v").alias("vb"))
        cand = l.join(r, F.col("a") < F.col("b"))
    cos_fn = cosine_arrow if verify == "arrow" else cosine
    return (
        cand.withColumn("cos", F.round(cos_fn(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def embedding_neardup_pairs_sql(
    table: str = "embeddings", threshold: float = 0.95, blocked: bool = True,
    n_tables: int = NEARDUP_TABLES, n_planes_per_table: int = NEARDUP_PLANES,
    source_sql: str | None = None,
) -> str:
    """DuckDB twin of embedding_neardup_pairs. source_sql, when given, is a
    SELECT producing (vec_id, embedding) that replaces the raw table as the
    corpus (structured CTE, not textual splicing) — used by the graded
    dedup_embedding_cosine row to plant deterministic duplicates so the
    sf0.01 check constrains actual values instead of certifying an empty set."""
    ctes = []
    if source_sql is not None:
        ctes.append(f"src AS (\n{source_sql}\n)")
        table = "src"
    cos = cosine_sql("x.embedding", "y.embedding")
    if blocked:
        buckets = multi_table_buckets_sql("embedding", n_tables, n_planes_per_table)
        ctes.append(f"""keyed AS (
  SELECT vec_id AS id, unnest({buckets}) AS bkey FROM {table}
)""")
        ctes.append("""cand AS (
  SELECT DISTINCT l.id AS a, r.id AS b
  FROM keyed l JOIN keyed r USING (bkey) WHERE l.id < r.id
)""")
        return f"""
WITH {", ".join(ctes)}
SELECT a, b, round({cos}, 6) AS cos
FROM cand JOIN {table} x ON x.vec_id = a JOIN {table} y ON y.vec_id = b
WHERE round({cos}, 6) >= {threshold}
"""
    cos_lr = cosine_sql("l.embedding", "r.embedding")
    prefix = f"WITH {', '.join(ctes)}\n" if ctes else ""
    return f"""
{prefix}SELECT l.vec_id AS a, r.vec_id AS b, round({cos_lr}, 6) AS cos
FROM {table} l JOIN {table} r ON l.vec_id < r.vec_id
WHERE round({cos_lr}, 6) >= {threshold}
"""


# ---------------------------------------------------------- IVF (inverted file)
#
# The other standard ANN scale path: partition the corpus into Voronoi cells
# around centroids, search only the nprobe cells nearest each query. Cells are
# disjoint (vs LSH's overlapping buckets), so the index is a plain partitioned
# table — at 100 TB this becomes `PARTITIONED BY (cell)` parquet and a probe
# is partition pruning, which is why IVF is the warehouse-native choice.
#
# Centroids here are deterministic (the first `n_cells` corpus vectors by id)
# rather than k-means-trained: identical search plan and contract, and the
# DuckDB oracle can reproduce the index bit-for-bit. Swap in pyspark.ml
# KMeans(seed=...) centroids for production recall without touching the plan.

IVF_CELLS = 16
IVF_NPROBE = 3


def _assign_cells(
    vecs: DataFrame, centroids: DataFrame, n: int, id_out: str,
    vec_col: str = "v", rank_col: str = "crank",
) -> DataFrame:
    """Rank centroids per vector by cosine (desc, centroid id asc) and keep the
    top n — cell assignment (n=1) and query probing (n=nprobe) are the same op."""
    from pyspark.sql import Window

    scored = vecs.join(F.broadcast(centroids), how="cross").withColumn(
        "ccos", F.round(cosine(F.col(vec_col), F.col("cv")), 6)
    )
    w = Window.partitionBy(id_out).orderBy(F.desc("ccos"), F.asc("cell"))
    return (
        scored.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
        .drop("cv", "ccos")
    )


def ivf_topk(
    corpus: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id < 10",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the nprobe
    nearest cells of each query.

    `centroids` (cell:int, cv:array) overrides the deterministic first-k
    stand-in — pass `clustering.kmeans_fit` output (via `kmeans_centroids_df`)
    for a trained Voronoi layout with balanced cells and better recall.

    Plan: broadcast the (tiny) centroid set → assign every corpus vector to
    its nearest cell (one broadcast-join pass, no shuffle of the corpus) →
    probe-join queries to their nprobe cells → equi-join on cell → exact
    score + per-query top-k window. The corpus-side shuffle is on the cell
    key only; at rest the assignment is precomputed once per index build.
    """
    from pyspark.sql import Window

    parts = corpus.sparkSession.sparkContext.defaultParallelism
    base = corpus.repartition(parts).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    if centroids is None:
        centroids = (
            corpus.filter(F.col(id_col) < n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
        )
    assigned = _assign_cells(base, centroids, 1, "id").select("id", "v", "cell")
    probes = _assign_cells(
        base.filter(query_pred).select(F.col("id").alias("query_id"), F.col("v").alias("qv")),
        centroids, nprobe, "query_id", vec_col="qv",
    ).select("query_id", "qv", "cell")
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
        .select("query_id", F.col("id").alias("neighbor_id"), "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk_sql(
    table: str = "embeddings",
    k: int = 5,
    query_pred: str = "vec_id < 10",
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
) -> str:
    asg_cos = cosine_sql("b.embedding", "c.embedding")
    q_cos = cosine_sql("q.embedding", "c.embedding")
    cos = cosine_sql("qv.embedding", "nv.embedding")
    return f"""
WITH centroids AS (
  SELECT vec_id AS cell, embedding FROM {table} WHERE vec_id < {n_cells}
),
assigned AS (
  SELECT id, cell FROM (
    SELECT b.vec_id AS id, c.cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY round({asg_cos}, 6) DESC, c.cell ASC) AS crank
    FROM {table} b, centroids c
  ) WHERE crank = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.vec_id AS query_id, c.cell,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round({q_cos}, 6) DESC, c.cell ASC) AS crank
    FROM {table} q, centroids c WHERE {query_pred}
  ) WHERE crank <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.id AS neighbor_id, round({cos}, 6) AS cos
  FROM assigned a JOIN probes p USING (cell)
  JOIN {table} qv ON qv.vec_id = p.query_id
  JOIN {table} nv ON nv.vec_id = a.id
  WHERE a.id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------- IVF as a partitioned table
#
# The persisted form the module docstring promises: at warehouse scale the
# IVF index IS a `PARTITIONED BY (cell)` parquet table, and a probe is
# partition pruning — the nprobe cells of a query batch prune to nprobe/
# n_cells of the corpus at the FILE level before a single row is read.


def ivf_persist(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    centroids: DataFrame | None = None,
) -> None:
    """Build and persist the IVF index: assign every vector to its nearest
    cell (one broadcast pass, same determinism as `ivf_topk`) and write
    `PARTITIONED BY (cell)` parquet. Distributed write — no driver data."""
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cell"), F.col(vec_col).alias("cv")
        )
    assigned = _assign_cells(base, centroids, 1, "id").select("id", "v", "cell")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_probe_persisted(
    spark,
    path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Top-k against the persisted index. The probe cells (|Q| x nprobe ints
    — model-bounded, like the centroids themselves) become a partition
    filter, so the scan prunes to the probed cells at the directory level:
    `PartitionFilters: [cell IN (...)]` in the plan, ~nprobe/n_cells of the
    index bytes read. Scoring is then the same exact-cosine + per-query
    window as `ivf_topk`."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probes = _assign_cells(q, centroids, nprobe, "query_id", vec_col="qv").select(
        "query_id", "qv", "cell"
    )
    # driver-side cell list: |Q| * nprobe ints — the partition-pruning key
    cells = sorted({int(r.cell) for r in probes.select("cell").distinct().collect()})
    idx = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    scored = (
        idx.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
        .select("query_id", F.col("id").alias("neighbor_id"), "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ------------------------------------------------- semantic decontamination
#
# The embedding-level sibling of the n-gram decontamination check
# (queries_pipeline.q_decontamination_check): paraphrased benchmark leakage
# that shares no 13-gram still lands next to the eval point in embedding
# space, so production curation runs BOTH. Recall here must be 1.0 — a missed
# contaminated document poisons the benchmark — which is why the production
# shape is an EXACT scan against the (small) eval set, not an ANN index.


def semantic_decontam_pairs(
    corpus: DataFrame,
    eval_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.3,
    path: str = "auto",
    eval_source: DataFrame | None = None,
) -> DataFrame:
    """(train_id, eval_id, cos) for every train vector whose cosine to some
    eval vector is >= tau. `eval_pred` is a SQL predicate selecting the eval
    split; train = NOT eval.

    Scale shape: the eval set is collected to the driver (eval benchmarks are
    KBs against a multi-TB train corpus — the same bounded-broadcast class as
    the trigram eval set and the kmeans centroid literal) and re-attached
    executor-side, so the check is ONE linear train scan computing |eval|
    cosine folds per row — zero joins, zero shuffles, exact recall.

    path="auto" routes like `clustering.assign_clusters`: |eval|*dim <=
    LITERAL_KD_MAX -> codegen literal (zero Python, oracle-exact, the graded
    path); larger eval sets ship as a Spark broadcast consumed by an
    Arrow-batched pandas UDF replaying the SAME left-to-right dimension fold
    (bit-identical raw cosines; only the 6-dp round differs in mechanism —
    floor(x*1e6+0.5) vs JVM HALF_UP — which can only matter within ~1e-6 of
    tau). "literal"/"arrow" force a path (tests pin their agreement).

    eval_source: where to read the eval split from, when `corpus` itself
    cannot be collected — the STREAMING rendering passes the static table
    here and the stream as `corpus`, making the whole check a stateless
    per-record projection (gate-at-ingest)."""
    if corpus.isStreaming and eval_source is None:
        raise ValueError(
            "semantic_decontam_pairs: a streaming corpus cannot be collected "
            "for the eval split — pass the static table as eval_source"
        )
    ev = (eval_source if eval_source is not None else corpus).filter(
        F.expr(eval_pred)
    ).select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    rows = sorted((int(r[0]), [float(x) for x in r[1]]) for r in ev.collect())
    if not rows:
        if corpus.isStreaming:
            # a batch empty relation can't stand in for a streaming plan;
            # an empty eval set on the gate path is a caller bug, not data
            raise ValueError(
                "semantic_decontam_pairs: eval_pred selected no rows from "
                "eval_source; a streaming gate needs a non-empty eval set"
            )
        return corpus.sparkSession.createDataFrame(
            [], "train_id bigint, eval_id bigint, cos double"
        )
    # NULL-predicate rows must land in TRAIN, not vanish: a bare ~pred is
    # NULL for them, so filter would drop such docs from BOTH splits and
    # they'd silently escape the recall-1.0 scan (same class as the
    # minhash_incremental is_new fix)
    train = corpus.filter(~F.coalesce(F.expr(eval_pred), F.lit(False)))
    if path == "arrow" or (
        path == "auto" and len(rows) * len(rows[0][1]) > _literal_kd_max()
    ):
        hits = _decontam_hits_arrow(train, rows, vec_col, tau)
    else:
        # single-parse literals: |eval|·(dim+1) F.lit round-trips would put
        # seconds of py4j latency inside the query-construction window
        ids_lit = bigint_array_lit([i for i, _ in rows])
        vecs_lit = double_matrix_lit([v for _, v in rows])
        hits = F.filter(
            F.zip_with(
                ids_lit,
                vecs_lit,
                lambda i, v: F.struct(
                    i.alias("eval_id"),
                    F.round(cosine(F.col(vec_col), v), 6).alias("cos"),
                ),
            ),
            lambda s: s["cos"] >= F.lit(tau),
        )
    return (
        train.select(F.col(id_col).alias("train_id"), F.explode(hits).alias("h"))
        .select(
            "train_id",
            F.col("h.eval_id").alias("eval_id"),
            # Arrow serialization coerces a NaN inside the struct list to
            # null (pandas' nan==missing convention); a null cos cannot
            # otherwise occur here, so restore the literal path's NaN for
            # exact path parity on garbage-float inputs
            F.coalesce(F.col("h.cos"), F.lit(float("nan"))).alias("cos"),
        )
    )


def _literal_kd_max() -> int:
    from mini_flink_spark.functions.clustering import LITERAL_KD_MAX

    return LITERAL_KD_MAX


def _decontam_hits_arrow(
    train: DataFrame, rows: list, vec_col: str, tau: float
) -> Column:
    """Large-|eval| rendering of the per-row hit list: eval matrix as a Spark
    broadcast, one Arrow-batched pandas UDF computing every eval cosine per
    train row with the SAME sequential per-dimension fold as the `cosine`
    expression (products and accumulation left-to-right over dims, sqrt then
    divide — bit-identical raw values; numpy pairwise summation deliberately
    NOT used). Plan size is constant in |eval| — the broadcast rides outside
    the expression tree."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ids = [i for i, _ in rows]
    E = np.asarray([v for _, v in rows], dtype=np.float64)  # (m, d)
    bc = train.sparkSession.sparkContext.broadcast((ids, E))

    @pandas_udf("array<struct<eval_id:bigint,cos:double>>")
    def _hits(v):
        eids, EM = bc.value
        V = np.stack(v.to_numpy()).astype(np.float64)  # (n, d)
        # the sequential-fold bit-exactness invariant lives in the shared
        # helpers — see _seq_dot_matrix's warning before touching this
        dot = _seq_dot_matrix(np, V, EM)
        nt = _seq_sq_norms(np, V)
        ne = _seq_sq_norms(np, EM)
        cos = dot / (np.sqrt(nt)[:, None] * np.sqrt(ne)[None, :])
        cos = np.floor(cos * 1e6 + 0.5) / 1e6
        out = []
        for r in range(V.shape[0]):
            # NaN-faithful: Spark's `cos >= tau` is TRUE for NaN (NaN sorts
            # above every numeric), so a NaN cosine must be EMITTED — the
            # conservative call for a recall-1.0 contract. numpy NaN
            # comparisons are all False, hence ~(cos < tau).
            idx = np.nonzero(~(cos[r] < tau))[0]
            out.append(
                [{"eval_id": int(eids[j]), "cos": float(cos[r, j])} for j in idx]
            )
        return pd.Series(out)

    return _hits(F.col(vec_col).cast("array<double>"))


def semantic_decontam_pairs_sql(
    eval_pred: str,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.3,
) -> str:
    """DuckDB twin: the exact eval x train comparison as a join — semantics
    identical to the literal-broadcast plan because the Spark side is exact
    (no blocking to replicate). `eval_pred` here uses the `{T}` placeholder
    for the table alias (e.g. "{T}.vec_id % 37 = 0") so both join sides
    render unambiguously."""
    cos = cosine_sql(f"t.{vec_col}", f"e.{vec_col}")
    return f"""
SELECT t.{id_col} AS train_id, e.{id_col} AS eval_id, round({cos}, 6) AS cos
FROM {table} t JOIN {table} e
  ON NOT coalesce({eval_pred.format(T="t")}, FALSE) AND {eval_pred.format(T="e")}
WHERE round({cos}, 6) >= {tau}
"""
