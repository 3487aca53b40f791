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
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
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

N_PLANES = 8  # bucket space 2^8; tune per corpus density


def _plane_component(j: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1), derived
    from md5 so the oracle reproduces it (computed Python-side, embedded as a
    literal — planes are tiny)."""
    import hashlib

    h = int(hashlib.md5(f"plane{j}_{d}".encode()).hexdigest()[:14], 16)
    return (h % 2001 - 1000) / 1000.0


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    return [[_plane_component(j, d) for d in range(dim)] for j in range(n_planes)]


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
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to same-bucket
    candidates. Recall trades off with n_planes; multi-probe (flipping one
    bit) would raise recall at 2× candidate cost."""
    from pyspark.sql import Window

    with_bucket = corpus.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), n_planes).alias("bucket")
    )
    q = with_bucket.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("bucket").alias("qb"),
    )
    scored = (
        with_bucket.alias("c")
        .join(F.broadcast(q), (F.col("bucket") == F.col("qb")) & (F.col(id_col) != F.col("query_id")))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col(vec_col)), 6))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos")
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
    n_planes: int = N_PLANES,
) -> str:
    bucket = lsh_bucket_sql("embedding", n_planes)
    cos = cosine_sql("q.qv", "c.embedding")
    return f"""
WITH wb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM {table}),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qb FROM wb WHERE {query_pred}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS cos
  FROM wb c JOIN q ON c.bucket = q.qb AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    blocked: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    blocked=True restricts to same-LSH-bucket candidates (the scale path —
    high-cosine pairs almost always share all hyperplane signs); blocked=False
    is the exact quadratic variant for small corpora / oracle checks.
    """
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if blocked:
        c = c.withColumn("bucket", lsh_bucket(F.col("v"), n_planes))
        l, r = c.alias("l"), c.alias("r")
        cand = l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
    else:
        l, r = c.alias("l"), c.alias("r")
        cand = l.join(r, F.col("l.id") < F.col("r.id"))
    return (
        cand.withColumn("cos", F.round(cosine(F.col("l.v"), F.col("r.v")), 6))
        .filter(F.col("cos") >= threshold)
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), "cos")
    )


def embedding_neardup_pairs_sql(
    table: str = "embeddings", threshold: float = 0.95, blocked: bool = True,
    n_planes: int = N_PLANES,
) -> str:
    cos = cosine_sql("l.embedding", "r.embedding")
    if blocked:
        bucket = lsh_bucket_sql("embedding", n_planes)
        return f"""
WITH wb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM {table})
SELECT l.vec_id AS a, r.vec_id AS b, round({cos.replace('l.embedding','l.embedding').replace('r.embedding','r.embedding')}, 6) AS cos
FROM wb l JOIN wb r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round({cos}, 6) >= {threshold}
"""
    return f"""
SELECT l.vec_id AS a, r.vec_id AS b, round({cos}, 6) AS cos
FROM {table} l JOIN {table} r ON l.vec_id < r.vec_id
WHERE round({cos}, 6) >= {threshold}
"""
