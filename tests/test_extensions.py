"""Behavioral tests for the LLM-data-pipeline layer: planted near-duplicates
are found, LSH recall is sane vs brute force, multimodal plumbing has the
right shapes. (Cross-engine value parity is covered by test_oracle_parity.)"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mini_flink_spark.functions import dedup as D
from mini_flink_spark.functions import multimodal as M
from mini_flink_spark.functions import similarity as S
from mini_flink_spark.functions import text as T


# --------------------------------------------------------------------- text
def test_token_count_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {r.doc_id: r.n for r in docs.select("doc_id", T.token_count("text").alias("n")).collect()}
    import re

    for r in docs.collect():
        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", r.text.lower())).strip()
        assert got[r.doc_id] == len(norm.split(" "))


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(T.quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 100.0


# -------------------------------------------------------------------- dedup
@pytest.fixture(scope="module")
def docs_with_planted_dups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base = docs.limit(5).collect()
    planted = []
    for i, r in enumerate(base):
        # exact copy and a near-copy (one token changed)
        planted.append((100000 + i, r.text))
        planted.append((200000 + i, r.text.replace(" ", " ", 1) + " zzz"))
    extra = spark.createDataFrame(planted, "doc_id bigint, text string")
    return docs.union(extra)


def test_exact_dedup_groups_planted_copies(spark, docs_with_planted_dups):
    out = D.exact_dedup(docs_with_planted_dups, "doc_id", "text")
    dup_groups = out.filter(F.col("n_dups") >= 2)
    assert dup_groups.count() >= 5  # the 5 exact copies collapse
    # representative is the min doc_id (the original, not the 100k clone)
    assert dup_groups.filter(F.col("keep_id") >= 100000).count() == 0


def test_minhash_finds_planted_neardups(spark, docs_with_planted_dups):
    pairs = D.minhash_lsh_pairs(
        docs_with_planted_dups, "doc_id", "text", threshold=0.8
    ).collect()
    found = {(r.a, r.b) for r in pairs}
    # each original (id < 500) must pair with its exact clone (100000+i)
    exact_clone_pairs = sum(1 for a, b in found if b == a + 100000 or (b >= 100000 and b < 200000))
    assert exact_clone_pairs >= 5
    # near-copies (one appended token) are also ≥0.8 jaccard on 3-shingles
    near = [p for p in pairs if p.b >= 200000]
    assert len(near) >= 4


def test_simhash_identical_docs_distance_zero(spark, docs_with_planted_dups):
    sim = D.simhash(docs_with_planted_dups, "doc_id", "text")
    pairs = D.simhash_pairs(sim, max_hamming=3)
    found = {(r.a, r.b): r.hamming for r in pairs.collect()}
    # original (a < 500) vs its exact clone (a + 100000): identical simhash
    zero_pairs = [h for (a, b), h in found.items() if a < 500 and b == a + 100000]
    assert zero_pairs and all(h == 0 for h in zero_pairs)


def test_ngram_jaccard_on_planted(spark, docs_with_planted_dups):
    pairs = D.ngram_jaccard_pairs(
        docs_with_planted_dups, "doc_id", "text", threshold=0.9, max_df=400
    ).collect()
    exact = [p for p in pairs if p.a < 500 and p.b == p.a + 100000]
    assert exact and all(p.jaccard == 1.0 for p in exact)


# --------------------------------------------------------------- similarity
def test_lsh_finds_planted_near_neighbors(spark, sf_dir):
    # On uniform random vectors, true top-k neighbors are barely closer than
    # the bulk — no LSH can beat that (it's a data property, not a bug). The
    # behavioral guarantee worth testing: genuinely-near vectors (planted
    # perturbed clones, cos ≈ 0.99) are recalled with high probability.
    import random

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rng = random.Random(42)
    base = emb.filter("vec_id < 20").collect()
    planted = [
        (10000 + r.vec_id, [x + rng.uniform(-0.02, 0.02) for x in r.embedding], r.label)
        for r in base
    ]
    aug = emb.union(
        spark.createDataFrame(planted, "vec_id bigint, embedding array<float>, label int")
    )
    approx = S.lsh_topk(aug, k=5, query_pred="vec_id < 20").collect()
    top1 = {r.query_id: r.neighbor_id for r in approx if r.rank == 1}
    hits = sum(1 for qid, nid in top1.items() if nid == qid + 10000)
    assert hits >= 16, f"only {hits}/20 planted near-neighbors recalled at rank 1"


def test_embedding_neardup_blocked_subset_of_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    blocked = {(r.a, r.b) for r in S.embedding_neardup_pairs(emb, 0.9, blocked=True).collect()}
    exact = {(r.a, r.b) for r in S.embedding_neardup_pairs(emb, 0.9, blocked=False).collect()}
    assert blocked <= exact


def test_embedding_neardup_arrow_verify_bit_identical(spark, sf_dir):
    # The Arrow verify path must agree with the interpreted-expression path
    # not just on the pair set but on every rounded cosine: cosine_arrow
    # replays the same sequential double fold, so the raw values are
    # bit-identical BEFORE the JVM-side round. Use a low threshold so many
    # borderline values are compared, blocked=False so the candidate set is
    # identical by construction.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter("vec_id < 120")
    expr = {
        (r.a, r.b): r.cos
        for r in S.embedding_neardup_pairs(emb, -1.0, blocked=False, verify="expr").collect()
    }
    arrow = {
        (r.a, r.b): r.cos
        for r in S.embedding_neardup_pairs(emb, -1.0, blocked=False, verify="arrow").collect()
    }
    assert expr.keys() == arrow.keys()
    diff = [(k, expr[k], arrow[k]) for k in expr if expr[k] != arrow[k]]
    assert not diff, f"{len(diff)} rounded cosines differ, e.g. {diff[:3]}"


# --------------------------------------------------------------- multimodal
def test_media_struct_and_meta(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = M.text_as_media(docs, "text", kind="image")
    meta = M.media_meta_table(media)
    rows = meta.collect()
    assert {r.kind for r in rows} == {"image"}
    for r in rows:
        assert r.byte_len > 0 and len(r.sha256) == 64


def test_decode_image_is_explicit_stub(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    media = M.text_as_media(docs, "text")
    with pytest.raises(Exception) as ei:
        M.decode_image(media).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_fake_image_features_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = M.text_as_media(docs, "text")
    f1 = {r.doc_id: r.features for r in M.fake_image_features(media).collect()}
    f2 = {r.doc_id: r.features for r in M.fake_image_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 and all(-1 <= x <= 1 for x in v) for v in f1.values())


def test_frame_sample_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    media = M.text_as_media(docs, "text", kind="video")
    frames = M.frame_sample_stub(media, every_n=1)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_no"}
    assert (pdf.groupby("doc_id").size() >= 1).all()


def test_ivf_finds_planted_near_neighbors(spark, sf_dir):
    # same planted-clone protocol as the LSH test: a perturbed copy at
    # cos ≈ 0.99 must be recalled at rank 1 for most queries (IVF assigns
    # clone and original to the same Voronoi cell with high probability)
    import random

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rng = random.Random(7)
    base = emb.filter("vec_id >= 20 AND vec_id < 40").collect()
    planted = [
        (10000 + r.vec_id, [x + rng.uniform(-0.02, 0.02) for x in r.embedding], r.label)
        for r in base
    ]
    aug = emb.union(
        spark.createDataFrame(planted, "vec_id bigint, embedding array<float>, label int")
    )
    approx = S.ivf_topk(aug, k=5, query_pred="vec_id >= 20 AND vec_id < 40").collect()
    top1 = {r.query_id: r.neighbor_id for r in approx if r.rank == 1}
    hits = sum(1 for qid, nid in top1.items() if nid == qid + 10000)
    assert hits >= 16, f"only {hits}/20 planted near-neighbors recalled at rank 1"


def test_connected_components_known_graph(spark):
    # chain 1-2-3-4 (diameter > 1 exercises multi-round propagation),
    # triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a bigint, b bigint",
    )
    got = {r.id: r.component for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


# ---------------------------------------------------------------- sketches


def test_sketch_distinct_within_rsd(spark, sf_dir):
    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.session import read_table
    from pyspark.sql import functions as F

    # independent check: recompute the HLL estimate with the registered
    # params and validate it against the exact distinct counts
    approx = {
        r["event_type"]: r["approx_users"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.06 * n), (et, approx[et], n)
    # and the GRADED row's in-engine rendering of the same bound holds
    for r in QUERIES["sketch_distinct_users"].fn(spark, sf_dir).collect():
        assert r["sketch_ok"], r
        assert r["n_exact"] == exact[r["event_type"]]


def test_sketch_percentiles_close_to_exact(spark, sf_dir):
    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.session import read_table
    from pyspark.sql import functions as F

    # independent check: recompute the sketch with the registered params and
    # validate the GK *rank* guarantee against the exact value lists — the
    # returned value's quantile rank must be within eps (+ order-statistic
    # granularity 1/n) of the requested quantile
    pa = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    approx = {
        r["event_type"]: r["pcts"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(pa.alias("pcts"))
        .collect()
    }
    vals = {
        r["event_type"]: sorted(v["value"] for v in r["vs"])
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.collect_list(F.struct("value")).alias("vs"))
        .collect()
    }
    for et, data in vals.items():
        n = len(data)
        for a, q in zip(approx[et], (0.5, 0.95, 0.99)):
            rank = sum(1 for v in data if v <= a) / n
            assert abs(rank - q) <= 0.02 + 2.0 / n, (et, q, a, rank)
    # and the GRADED row's in-engine rendering of the same bound holds
    for r in QUERIES["sketch_value_percentiles"].fn(spark, sf_dir).collect():
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], r
        assert r["n"] == len(vals[r["event_type"]])


def test_simhash_expr_matches_batch_simhash(spark, sf_dir):
    # the streaming-safe per-row fold must produce bit-identical signatures
    # to the batch explode+groupBy formulation for every document
    from mini_flink_spark.functions import dedup as D
    from mini_flink_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    batch = {r.id: r.simhash for r in D.simhash(docs, "doc_id", "text").collect()}
    inline = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", D.simhash_expr("text").alias("sh")).collect()
    }
    assert batch == inline


# ---------------------------------------------------------------- KMeans


def test_kmeans_partitions_all_points(spark, sf_dir):
    from mini_flink_spark.functions.clustering import kmeans_clusters
    from mini_flink_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    total = emb.count()
    rows = kmeans_clusters(emb, "embedding", "vec_id", k=4, iters=2).collect()
    assert sum(r.n for r in rows) == total
    assert all(0 <= r.cid < 4 for r in rows)


def test_kmeans_wcss_non_increasing(spark, sf_dir):
    # Lloyd's invariant: within-cluster sum of squares never increases
    from pyspark.sql import functions as F

    from mini_flink_spark.functions.clustering import (
        assign_clusters,
        kmeans_fit,
        sq_dist,
    )
    from mini_flink_spark.session import read_table

    base = read_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    def wcss(cents):
        a = assign_clusters(base, cents, "v")
        lit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
        return a.select(
            F.sum(sq_dist(F.col("v"), F.element_at(lit, (F.col("cid") + 1).cast("int")))).alias("s")
        ).collect()[0].s

    scores = [
        wcss(kmeans_fit(base, "v", "id", k=4, iters=i)) for i in (0, 1, 3)
    ]
    # tiny epsilon: the 6-dp-rounded argmin and rounded centroid means can
    # perturb exact Lloyd monotonicity near convergence
    eps = 1e-6 * max(scores)
    assert scores[0] >= scores[1] - eps >= scores[2] - 2 * eps


def test_ivf_with_kmeans_centroids_recall(spark, sf_dir):
    # the trained-centroid path through ivf_topk: recall@5 must stay high and
    # every Voronoi cell must be populated (balanced probe cost is the point)
    from pyspark.sql import functions as F

    from mini_flink_spark.functions import similarity as S
    from mini_flink_spark.functions.clustering import (
        kmeans_centroids_df,
        kmeans_fit,
    )
    from mini_flink_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = kmeans_fit(base, "v", "id", k=S.IVF_CELLS, iters=3)
    trained = S.ivf_topk(
        emb, k=5, query_pred="vec_id < 10",
        centroids=kmeans_centroids_df(spark, cents),
    )
    gt = S.brute_force_topk(emb, emb.filter("vec_id < 10"), k=5)
    g = {(r[0], r[1]) for r in gt.select("query_id", "neighbor_id").collect()}
    a = {(r[0], r[1]) for r in trained.select("query_id", "neighbor_id").collect()}
    assert len(g & a) / len(g) >= 0.8


# ------------------------------------------------------- Heavy hitters (MG)


def test_misra_gries_candidates_superset_of_true_heavy_hitters(spark):
    # pigeonhole guarantee: every value with global count > N/k survives at
    # least one partition's k-counter summary — even on adversarial skew
    from mini_flink_spark.functions.sketches import heavy_hitters, misra_gries_candidates

    # 3 hot values in a sea of uniques, scattered across 8 partitions
    rows = [(f"hot{i % 3}",) for i in range(3000)] + [
        (f"cold{i}",) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    k = 10  # threshold N/k = 800; each hot value has 1000
    cand = {r.tok for r in misra_gries_candidates(df, "tok", k).collect()}
    assert {"hot0", "hot1", "hot2"} <= cand

    hh = {(r.tok, r.cnt) for r in heavy_hitters(df, "tok", k).collect()}
    assert hh == {("hot0", 1000), ("hot1", 1000), ("hot2", 1000)}


def test_pq_codes_quantization_error_beats_random_assignment(spark, sf_dir):
    # trained codebooks must reconstruct better than code 0 for everything —
    # and every code must be a valid codebook index
    from pyspark.sql import functions as F

    from mini_flink_spark.functions.clustering import pq_encode, pq_fit, sq_dist
    from mini_flink_spark.session import read_table

    base = read_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    m, k = 4, 8
    books = pq_fit(base, "v", "id", m=m, k=k, iters=2)
    assert len(books) == m and all(len(b) == k for b in books)

    codes = pq_encode(base, books, "v", "id")
    rows = codes.collect()
    assert all(0 <= c < k for r in rows for c in r.codes)

    def recon_err(code_picker):
        dsub = len(books[0][0])
        err = F.lit(0.0)
        for s in range(m):
            sub = F.slice(F.col("v"), s * dsub + 1, dsub)
            cents = F.array(
                *[F.array(*[F.lit(x) for x in c]) for c in books[s]]
            )
            err = err + sq_dist(sub, F.element_at(cents, code_picker(s)))
        return base.join(codes, "id").select(F.sum(err).alias("e")).collect()[0].e

    trained = recon_err(lambda s: (F.element_at("codes", s + 1) + 1).cast("int"))
    fixed = recon_err(lambda s: F.lit(1))
    assert trained < fixed


def test_pq_adc_recall_floor(spark, sf_dir):
    # ADC over 4x8 codebooks is coarse, but the true NN set must still be
    # substantially recovered — pin a floor so codebook regressions surface
    from pyspark.sql import functions as F

    from mini_flink_spark.functions import similarity as S
    from mini_flink_spark.functions.clustering import pq_adc_topk, pq_encode, pq_fit
    from mini_flink_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    books = pq_fit(base, "v", "id", m=4, k=8, iters=2)
    codes = pq_encode(base, books, "v", "id")
    qv = [float(x) for x in base.filter(F.col("id") == 0).first()[1]]
    adc = {r.id for r in pq_adc_topk(codes, books, qv, k_top=50, exclude_id=0).collect()}

    # exact L2 ground truth (ADC approximates L2, not cosine)
    from mini_flink_spark.functions.clustering import sq_dist

    qlit = F.array(*[F.lit(x) for x in qv])
    true10 = {
        r.id
        for r in base.filter(F.col("id") != 0)
        .select("id", sq_dist(F.col("v"), qlit).alias("d2"))
        .orderBy(F.asc("d2"), F.asc("id"))
        .limit(10)
        .collect()
    }
    # PQ's production role is CANDIDATE GENERATION: fetch top-R by ADC,
    # then re-rank the R exactly. Pin that the top-50 candidate set recovers
    # at least half the exact top-10 even on uniform random vectors (PQ's
    # worst case — no cluster structure; chance would recover ~1)
    assert len(true10 & adc) >= 4, (true10, adc)


def test_assign_clusters_broadcast_matches_literal(spark, sf_dir):
    """The large-k broadcast+Arrow assignment path must agree with the
    literal-expression path row for row (same sequential fold, same
    first-min tie-break). Run the SAME centroids through both by calling the
    internal paths directly."""
    from mini_flink_spark.functions import clustering as C

    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("id"),
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
    )
    cents = C.kmeans_fit(base, "v", "id", k=8, iters=2)
    lit = C.assign_clusters(base, cents, "v").select("id", "cid")
    bc = C._assign_clusters_broadcast(base, cents, "v", "cid").select("id", "cid")
    l = {r.id: r.cid for r in lit.collect()}
    b = {r.id: r.cid for r in bc.collect()}
    assert l == b


def test_assign_clusters_large_k_routes_to_broadcast(spark, sf_dir):
    """k*d above LITERAL_KD_MAX must not build a k*d-literal plan: the
    analyzed plan stays small (a single pythonUDF call), and the assignment
    still partitions every row."""
    from mini_flink_spark.functions import clustering as C

    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("id"),
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
    )
    k = C.LITERAL_KD_MAX // 64 + 8  # first k over the literal threshold at d=64
    cents = [r[0] for r in base.select("v").orderBy("id").limit(k).collect()]
    assigned = C.assign_clusters(base, cents, "v")
    plan = assigned._jdf.queryExecution().analyzed().toString()
    assert "pythonUDF" in plan or "_cid" in plan, plan[:500]
    n = base.count()
    assert assigned.filter(f"cid >= 0 and cid < {k}").count() == n


def test_containment_catches_doc_inside_doc(spark, sf_dir):
    """A short doc quoted wholesale inside a long doc: containment ≈ 1 in the
    short→long direction even though Jaccard is far below any dedup
    threshold — the case the symmetric operator structurally misses."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    long_doc = docs.filter("doc_id = 0").collect()[0].text
    short = " ".join(long_doc.split()[:8])  # first 8 tokens of doc 0
    aug = docs.union(
        spark.createDataFrame([(900000, short)], "doc_id bigint, text string")
    )
    cont = {(r.a, r.b): r.containment
            for r in D.ngram_containment_pairs(aug, "doc_id", "text", threshold=0.9).collect()}
    assert (900000, 0) in cont and cont[(900000, 0)] == 1.0
    jac = {(r.a, r.b)
           for r in D.ngram_jaccard_pairs(aug, "doc_id", "text", threshold=0.5).collect()}
    assert (900000, 0) not in jac  # Jaccard misses it


def test_minhash_persisted_index_matches_inline_incremental(spark, sf_dir):
    """Probing the persisted band/shingle index must produce exactly the
    pairs the inline incremental operator computes over the same old/new
    split — the persisted layout changes WHERE the index lives, not what
    matches."""
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    old = docs.filter("doc_id < 450")
    new = docs.filter("doc_id >= 450")
    path = tempfile.mkdtemp(prefix="mh_idx_")
    D.minhash_index_persist(old, path, "doc_id", "text")
    persisted = {
        (r.a, r.b): r.jaccard
        for r in D.minhash_probe_persisted(
            spark, path, new, "doc_id", "text", threshold=0.3
        ).collect()
    }
    inline = {
        (r.a, r.b): r.jaccard
        for r in D.minhash_incremental_pairs(
            docs, "doc_id", "text", "doc_id >= 450", threshold=0.3
        ).collect()
    }
    assert persisted == inline


def test_sketch_percentile_rank_interval_survives_heavy_ties(spark):
    """The graded GK booleans must not flip false on a CORRECT sketch when
    the data is massively tied at the returned quantile (ADVICE r6): 60% of
    the mass below is one constant, so the <=-count rank at the median
    overshoots to 1.0 — but the element's possible-rank interval
    [count(<p)+1, count(<=p)] still contains q*n, which is what the GK
    guarantee actually bounds."""
    from pyspark.sql import functions as F

    vals = [5.0] * 600 + [float(i) / 400.0 for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    p50 = df.agg(F.percentile_approx("value", 0.5, 10000)).first()[0]
    assert p50 == 5.0  # median rank 500 lands inside the tie block
    n = len(vals)
    le = sum(1 for v in vals if v <= p50)
    lt = sum(1 for v in vals if v < p50)
    tol = 0.02 + 2.0 / n
    # the old <=-count check flips false on this correct sketch...
    assert abs(le / n - 0.5) > tol
    # ...the rank-interval check holds
    assert (lt + 1) <= (0.5 + tol) * n and le >= (0.5 - tol) * n
    # and stays SENSITIVE: a genuinely wrong value (the true p10, whose
    # rank interval [101,101] sits far below the q=0.5 band — note any
    # value INSIDE the tie block is legitimately p50 here, ranks 401-1000)
    wrong = sorted(vals)[int(0.1 * n)]
    le_w = sum(1 for v in vals if v <= wrong)
    lt_w = sum(1 for v in vals if v < wrong)
    assert not ((lt_w + 1) <= (0.5 + tol) * n and le_w >= (0.5 - tol) * n)


# ------------------------------------------------- perceptual hash (round 7)
def test_phash_banding_matches_bruteforce(spark, sf_dir):
    """Pigeonhole guarantee: 4 bands x 14 bits loses NO pair within Hamming 3,
    so the banded plan must equal the O(n^2) definition exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ph = M.phash_table(M.text_as_media(docs, "text", kind="image"))
    hashes = {r.id: r.phash for r in ph.collect()}
    ids = sorted(hashes)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    banded = D.simhash_pairs(
        ph.withColumnRenamed("phash", "simhash"), max_hamming=3, n_blocks=4
    )
    got = {(r.a, r.b) for r in banded.collect()}
    assert got == brute


def test_phash_identical_payloads_collide(spark):
    df = spark.createDataFrame(
        [(1, "the same exact payload bytes here"), (2, "the same exact payload bytes here")],
        "doc_id bigint, text string",
    )
    ph = M.phash_table(M.text_as_media(df, "text"))
    rows = {r.id: r.phash for r in ph.collect()}
    assert rows[1] == rows[2] != 0


def test_phash_short_payload_is_zero(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id bigint, text string")
    ph = M.phash_table(M.text_as_media(df, "text"))
    assert ph.collect()[0].phash == 0


# ------------------------------------------- shard manifest + compaction (r7)
def test_epoch_manifest_shape_and_determinism(spark, sf_dir):
    from mini_flink_spark.queries import all_queries

    q = all_queries()["epoch_shard_manifest"]
    a = q(spark, sf_dir).collect()
    b = q(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for e in (0, 1):
        rows = [r for r in a if r.epoch == e]
        assert sum(r.n_docs for r in rows) == n_docs_total
        assert all(0 <= r.shard < 8 for r in rows)
    # epoch reshuffle actually reshuffles: the two epochs' manifests differ
    assert {(r.shard, r.checksum) for r in a if r.epoch == 0} != {
        (r.shard, r.checksum) for r in a if r.epoch == 1
    }


def test_compaction_writer_contract(spark, sf_dir):
    """Measured files per partition == ceil(rows / maxRecordsPerFile) — the
    contract the oracle predicts, asserted here without the oracle."""
    import math

    from mini_flink_spark.queries import all_queries

    rows = all_queries()["compaction_small_files"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_files == math.ceil(r.n_rows / 2000.0), r


def test_simhash_pairs_identical_signature_collapse(spark):
    """50 copies of one payload: the band join sees ONE distinct signature
    (no hot bucket), while the expansion emits all C(50,2) distance-0 pairs."""
    rows = [(i, 777 << 20) for i in range(50)] + [(100, (777 << 20) ^ 3)]
    sim = spark.createDataFrame(rows, "id bigint, simhash bigint")
    got = D.simhash_pairs(sim, max_hamming=3, n_blocks=4).collect()
    zero = [(r.a, r.b) for r in got if r.hamming == 0]
    assert len(zero) == 50 * 49 // 2
    # the hamming-2 neighbor pairs with every copy through the value join
    assert sum(1 for r in got if r.hamming == 2) == 50


def test_simhash_pairs_bucket_cap_fires_and_is_inactive(spark):
    """An adversarial family of near-identical signatures sharing three band
    slices: the cap drops the hot buckets (pairs lost, by policy); with the
    cap off — or buckets under the cap — the pairs survive."""
    fam = [(i, i << 14) for i in range(1, 21)]  # bands 0,2,3 all zero-valued
    sim = spark.createDataFrame(fam, "id bigint, simhash bigint")
    uncapped = D.simhash_pairs(sim, max_hamming=3, n_blocks=4, max_bucket=None)
    assert uncapped.count() > 0
    capped = D.simhash_pairs(sim, max_hamming=3, n_blocks=4, max_bucket=10)
    assert capped.count() == 0  # every shared band value exceeds the cap
    under = D.simhash_pairs(sim, max_hamming=3, n_blocks=4, max_bucket=100)
    assert under.count() == uncapped.count()


def test_preference_pairs_structure(spark, sf_dir):
    """Chosen strictly outscores rejected; k-th best pairs with k-th worst;
    at most 5 pairs per source; no doc appears as both sides of one pair."""
    from mini_flink_spark.queries import all_queries

    rows = all_queries()["preference_pairs"](spark, sf_dir).collect()
    assert rows
    from collections import Counter

    per_source = Counter(r.source for r in rows)
    assert all(c <= 5 for c in per_source.values())
    for r in rows:
        assert r.margin > 0
        assert r.chosen_id != r.rejected_id
        assert 1 <= r.pair_rank <= 5
