"""Adversarial-density scale probe (the SCALE_NOTES protocol, reproducible).

Builds the 20× synthetic corpus from the sf0.1 driver data — each base row
replicated R times with small per-replica perturbations, so every vector/doc
gains R-1 planted NEAR-duplicates (real corpora carry ~1% dups; this one
~95%) — and times the requested operators end-to-end on local[32].

Usage:
    python tools/stress_probe.py embedding_cosine      # expr vs arrow verify
    python tools/stress_probe.py kmeans_largek         # k=256 broadcast path
    python tools/stress_probe.py all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def get_spark():
    from mini_flink_spark.session import get_spark as g

    return g()


def dense_embeddings(spark, sf_dir="/root/testdata/sf0.1", replicas=20):
    """40k vectors: 2k base × `replicas`, replica r of vector v perturbed by
    a deterministic per-(v, r, dim) jitter — near-dups, not exact dups.
    Built distributively (explode + expression jitter), no driver data."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        base.select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep"),
        )
        .select(
            (F.col("vec_id") * replicas + F.col("rep")).alias("vec_id"),
            F.expr(
                # ±0.005 deterministic jitter per (vec, rep, dim) — cosine vs
                # the base stays ≥ ~0.99, so all replica pairs are true
                # near-dups at threshold 0.95
                "transform(embedding, (x, i) -> cast(x + "
                "((pmod(hash(vec_id, rep, i), 1000) - 500) / 100000.0) as float))"
            ).alias("embedding"),
        )
    )


def probe_embedding_cosine(spark):
    from mini_flink_spark.functions import similarity as S

    emb = dense_embeddings(spark).localCheckpoint()  # exclude build from timing
    n = emb.count()
    out = {}
    for verify in ("expr", "arrow"):
        t0 = time.time()
        pairs = S.embedding_neardup_pairs(emb, 0.95, blocked=True, verify=verify)
        rows = pairs.count()
        out[verify] = (time.time() - t0, rows)
        print(f"embedding_cosine verify={verify}: {out[verify][0]:.1f}s "
              f"{rows} pairs over {n} vectors", flush=True)
    assert out["expr"][1] == out["arrow"][1], "verify paths disagree on pair count"
    return out


def probe_kmeans_largek(spark):
    from mini_flink_spark.functions import clustering as C

    emb = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(
            F.col("vec_id").alias("id"),
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
    )
    for k in (8, 256):
        t0 = time.time()
        cents = C.kmeans_fit(emb, k=k, iters=3)
        dt = time.time() - t0
        path = "literal" if k * len(cents[0]) <= C.LITERAL_KD_MAX else "broadcast"
        print(f"kmeans k={k} ({path}): {dt:.1f}s, {len(cents)} centroids", flush=True)


def probe_streaming_state(spark):
    """Bounded-state demonstration (VERDICT r2 next-round #7): a file stream
    of 10 waves x 20k UNIQUE keys (200k distinct keys total), event time
    advancing 20 min per wave, deduped via dropDuplicatesWithinWatermark
    under a 10-min watermark with the RocksDB state store enabled. If state
    were unbounded it would grow to 200k rows; with watermark expiry the
    per-batch `numRowsTotal` state metric must stay ~one wave (20k), flat
    across waves."""
    import datetime
    import os
    import tempfile

    for k, v in __import__(
        "mini_flink_spark.session", fromlist=["rocksdb_state_conf"]
    ).rocksdb_state_conf().items():
        spark.conf.set(k, v)

    waves, per_wave = 10, 20_000
    src = tempfile.mkdtemp(prefix="probe_state_src_")
    base = datetime.datetime(2026, 1, 1)
    stamped: set[str] = set()
    for i in range(waves):
        ts = base + datetime.timedelta(minutes=20 * i)
        (
            spark.range(i * per_wave, (i + 1) * per_wave)
            .selectExpr("id AS key", f"timestamp'{ts:%Y-%m-%d %H:%M:%S}' AS ts")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        # file-stream batch order follows modification time: stamp each
        # wave's new files with an ascending mtime
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in stamped:
                os.utime(os.path.join(src, f), (1_000_000 + i, 1_000_000 + i))
                stamped.add(f)

    stream = (
        spark.readStream.format("parquet")
        .schema("key bigint, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["key"]
    )
    ckpt = tempfile.mkdtemp(prefix="probe_state_ckpt_")
    q = (
        deduped.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    rows_per_batch = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    q.stop()
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    print(
        f"streaming_state rocksdb={'RocksDB' in provider} "
        f"distinct_keys={waves * per_wave} state_rows_per_batch={rows_per_batch}",
        flush=True,
    )
    peak = max(rows_per_batch)
    assert peak <= 3 * per_wave, (
        f"state grew to {peak} rows — watermark expiry is not bounding it"
    )


def probe_semdedup(spark):
    """SemDeDup at the 20× adversarial corpus (40k vectors, every vector 19
    planted near-dups): the cluster-confined pairwise prune must stay
    output-bound — k scales with n so the mean cluster size stays constant."""
    from mini_flink_spark.functions import clustering as C

    emb = dense_embeddings(spark).localCheckpoint()
    n = emb.count()
    # k sized so mean cluster ~150 vectors (k ≈ n/256): intra-cluster pairs
    # stay output-bound; k=64 included as the too-coarse comparison point
    for k, verify in ((64, "arrow"), (256, "arrow")):
        t0 = time.time()
        out = C.semdedup(emb, "embedding", "vec_id", k=k, iters=2, tau=0.95,
                         verify=verify)
        kept = out.where("kept").count()
        print(
            f"semdedup k={k} verify={verify}: {time.time() - t0:.1f}s, "
            f"kept {kept}/{n}",
            flush=True,
        )


def dense_events(spark, sf_dir="/root/testdata/sf0.1", replicas=20):
    """2M events: 100k base × `replicas`; replica r shifts users into a
    disjoint id block and jitters ts by r seconds so per-user histories stay
    realistic (20× users, same per-user interaction density). Built
    distributively."""
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
        )
        .select(
            (F.col("event_id") * replicas + F.col("rep")).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=F.col("rep"))).alias("ts"),
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )


def probe_round3_events(spark):
    """Round-3 event operators at 20× (2M events, 20× user cardinality):
    every op must scale with its shuffle key's cardinality, not blow up."""
    import os
    import tempfile

    from mini_flink_spark.queries import QUERIES

    path = tempfile.mkdtemp(prefix="ev20x_") + "/events.parquet"
    dense_events(spark).write.mode("overwrite").parquet(path)
    sf_dir = os.path.dirname(path)
    # reuse the real graded query fns against the 20× table by pointing the
    # read at the probe dir (the other tables aren't touched by these ops)
    for name in (
        "scd2_user_state_history",
        "timeseries_gapfill",
        "ewma_hourly_rate",
        "pit_purchase_features",
        "event_path_trigrams",
        "item_cooccurrence_lift",
        "pagerank_item_graph",
    ):
        t0 = time.time()
        n = QUERIES[name].fn(spark, sf_dir).count()
        print(f"{name}: {time.time() - t0:.1f}s, {n} rows", flush=True)


def probe_round3_docs(spark):
    """Round-3 document operators at 20× (100k docs, 20 replicas per base doc
    with a per-replica token prefix so replicas are near- not exact dups)."""
    import os
    import tempfile

    from mini_flink_spark.queries import QUERIES

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    dense = (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep")
        )
        .select(
            (F.col("doc_id") * 20 + F.col("rep")).alias("doc_id"),
            F.concat(F.lit("rep"), F.col("rep").cast("string"), F.lit(" "), F.col("text")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 6).alias("n_chars"),
        )
    )
    d = tempfile.mkdtemp(prefix="docs20x_")
    dense.write.mode("overwrite").parquet(d + "/documents.parquet")
    for name in (
        "bpe_encode_docs",
        "vocab_oov_rate",
        "source_drift_kl",
        "cross_source_duplicates",
        "length_matched_sample",
        "text_search_bm25_persisted",
        "curation_pipeline_spec",
    ):
        t0 = time.time()
        n = QUERIES[name].fn(spark, d).count()
        print(f"{name}: {time.time() - t0:.1f}s, {n} rows", flush=True)


def probe_round3_late(spark):
    """Late round-3 operators at 20×: URL dedup / winnowing / paragraph
    boilerplate on 100k near-dup docs (same fixture as round3_docs — every
    base doc gains 19 prefixed replicas, so paragraph boilerplate sees ~95%
    recurring chunks, the adversarial case), and the stats battery on a
    1.2M-row lineitem (20 jittered replicas per row — exact integer sums
    must hold at 20× the magnitude)."""
    import tempfile

    from mini_flink_spark.queries import QUERIES

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    dense = (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep")
        )
        .select(
            (F.col("doc_id") * 20 + F.col("rep")).alias("doc_id"),
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"), F.lit(" "), F.col("text")
            ).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 6).alias("n_chars"),
        )
    )
    d = tempfile.mkdtemp(prefix="late20x_")
    dense.write.mode("overwrite").parquet(d + "/documents.parquet")
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    dense_li = (
        li.select("*", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep"))
        .select(
            (F.col("l_orderkey") * 20 + F.col("rep")).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            # vary magnitude with the replica so the exact-sum battery sees
            # 20x the row count AND wider value spread
            (F.col("l_quantity") + F.col("rep") % 7).alias("l_quantity"),
            (F.col("l_extendedprice") * (1 + F.col("rep") / 100.0)).alias(
                "l_extendedprice"
            ),
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
    )
    dense_li.write.mode("overwrite").parquet(d + "/lineitem.parquet")
    for name in (
        "url_canonical_dedup",
        "winnowing_fingerprints",
        "paragraph_boilerplate",
        "stats_moments_battery",
    ):
        t0 = time.time()
        n = QUERIES[name].fn(spark, d).count()
        print(f"{name}: {time.time() - t0:.1f}s, {n} rows", flush=True)


def _stage_metrics_total(spark):
    """Sum shuffle read/write and spill bytes over all completed stages, via
    the UI REST API (the probe session runs with spark.ui.enabled=true).
    Snapshot before/after an operator and diff to attribute bytes to it."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    apps = _json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = _json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    )
    tot = {"shuffle_read": 0, "shuffle_write": 0, "mem_spill": 0, "disk_spill": 0}
    for s in stages:
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
    return tot


def _family_docs(spark, families: int, sf_dir="/root/testdata/sf0.1"):
    """`families`×5 replicas per base doc, REALISTIC dup density: each family
    is 5 mutual near-dups (1-token member prefix), and families are pushed
    apart by replacing every 3rd token with a family-id marker — the marker
    positions are the SAME for every family, so every 3-token shingle
    contains a marker and cross-family Jaccard collapses to ~0 for every
    family pair (no positional aliasing at any family count).
    Near-dup groups stay size-5 at EVERY scale, so pair output grows linearly
    with the corpus instead of quadratically with the replica count — the 100×
    probe then measures the engine's scaling, not an output explosion no real
    corpus exhibits. Built distributively (explode + expressions)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = families * 5
    return (
        base.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep"),
        )
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.concat(
                F.lit("m"),
                (F.col("rep") % 5).cast("string"),
                F.lit(" "),
                F.array_join(
                    F.expr(
                        "transform(split(text, ' '), (t, i) -> "
                        "IF(pmod(i, 3) = 0, "
                        "concat('fam', cast(int(rep / 5) as string)), t))"
                    ),
                    " ",
                ),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )


def probe_dedup_100x(spark):
    """VERDICT r3 #4: push the flagship dedup path one scale decade past the
    20× comfort zone — MinHash-LSH pair generation and span-level dedup +
    removal at 20× (100k docs) and 100× (500k docs) of sf0.1, with per-op
    shuffle/spill bytes recorded from the stage metrics. The claim under
    test: wall time and shuffle bytes grow ~linearly (5×) from 20× to 100×
    because near-dup group size (and so pair output per doc) is constant —
    the density real corpora have. Spills are expected to stay at zero on
    this substrate; a nonzero disk spill at 100× is the first sign partition
    sizing needs attention before a real 1000-executor run."""
    import tempfile

    from mini_flink_spark.queries import QUERIES

    results = {}
    for families, label in ((4, "20x"), (20, "100x")):
        d = tempfile.mkdtemp(prefix=f"dedup{label}_")
        _family_docs(spark, families).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        n_docs = spark.read.parquet(d + "/documents.parquet").count()
        for name in (
            "dedup_minhash_lsh",
            "dedup_duplicate_spans",
            "dedup_span_removal",
        ):
            before = _stage_metrics_total(spark)
            t0 = time.time()
            # noop sink, not count(): count() lets Catalyst prune every
            # expensive output column (span_removal's reconstruction ran in
            # 0.5s with 0 shuffle — it wasn't running at all); the noop sink
            # forces full materialization, same as bench.py.
            out = QUERIES[name].fn(spark, d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_metrics_total(spark)
            # rows counted OUTSIDE the clock and the stage-metric window —
            # count() re-executes the operator, and including that second
            # run inflated both wall and shuffle deltas (ADVICE r4); trends
            # in older SCALE_NOTES entries are unaffected (both scales were
            # measured the same way), absolute walls there read ~2x high.
            rows = out.count()
            delta = {k: after[k] - before[k] for k in after}
            results[(label, name)] = (dt, rows, delta)
            print(
                f"{label} ({n_docs} docs) {name}: {dt:.1f}s, {rows} rows, "
                f"shuffle_w={delta['shuffle_write'] / 1e6:.0f}MB "
                f"shuffle_r={delta['shuffle_read'] / 1e6:.0f}MB "
                f"spill_mem={delta['mem_spill'] / 1e6:.0f}MB "
                f"spill_disk={delta['disk_spill'] / 1e6:.0f}MB",
                flush=True,
            )
    for name in ("dedup_minhash_lsh", "dedup_duplicate_spans", "dedup_span_removal"):
        t20, r20, _ = results[("20x", name)]
        t100, r100, _ = results[("100x", name)]
        print(
            f"trend {name}: rows x{r100 / max(r20, 1):.1f}, "
            f"wall x{t100 / max(t20, 0.001):.1f} (linear target ~5x)",
            flush=True,
        )


def probe_curation_100x(spark):
    """Round-4 additions at 20×/100× sf0.1 (100k / 500k docs, the dedup_100x
    corpus generator): the hashed-linear classifier fold and the blocklist
    broadcast join are pure scan ops, so the claim under test is the
    strongest one — wall grows ~linearly and NOTHING crosses an exchange
    (shuffle read/write stay ~0; the blocklist broadcast is not shuffle).
    gopher_quality_flags rides along as the established scan-op baseline."""
    import tempfile

    from mini_flink_spark.queries import QUERIES

    ops = (
        "quality_classifier_linear",
        "domain_blocklist_filter",
        "gopher_quality_flags",
    )
    results = {}
    for families, label in ((4, "20x"), (20, "100x")):
        d = tempfile.mkdtemp(prefix=f"cur{label}_")
        _family_docs(spark, families).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        n_docs = spark.read.parquet(d + "/documents.parquet").count()
        for name in ops:
            before = _stage_metrics_total(spark)
            t0 = time.time()
            out = QUERIES[name].fn(spark, d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_metrics_total(spark)
            # rows counted OUTSIDE the clock and the stage-metric window —
            # count() re-executes the operator, and including that second
            # run inflated both wall and shuffle deltas (ADVICE r4); trends
            # in older SCALE_NOTES entries are unaffected (both scales were
            # measured the same way), absolute walls there read ~2x high.
            rows = out.count()
            delta = {k: after[k] - before[k] for k in after}
            results[(label, name)] = (dt, rows)
            print(
                f"{label} ({n_docs} docs) {name}: {dt:.1f}s, {rows} rows, "
                f"shuffle_w={delta['shuffle_write'] / 1e6:.1f}MB "
                f"spill_disk={delta['disk_spill'] / 1e6:.0f}MB",
                flush=True,
            )
    for name in ops:
        t20, _ = results[("20x", name)]
        t100, _ = results[("100x", name)]
        print(
            f"trend {name}: wall x{t100 / max(t20, 0.001):.1f} (linear target ~5x)",
            flush=True,
        )


def probe_round5_lm(spark):
    """Round-5 two-pass perplexity/DSIR at 20×/100× sf0.1 (100k / 500k docs,
    the dedup_100x corpus generator). The change under test: the trigram
    models are checkpointed (and DSIR's raw+target counts fused into ONE
    corpus pass), so each query is exactly two corpus scans regardless of
    scale. Claims: (a) wall grows ≤ linearly 20×→100×, (b) shuffle grows
    exactly linearly with docs and consists ONLY of the per-doc integer-NLL
    agg rows (8-byte doc ids + longs — the minimal payload; the trigram
    MODEL's shuffle is alphabet³-capped and vanishes in the total),
    (c) zero disk spill. Measured (2026-08-15): wall ×1.5-3.1 at ×5 data
    (fixed overhead amortizing), shuffle ×5.0 on the nose, spill 0."""
    import tempfile

    from mini_flink_spark.queries import QUERIES

    ops = (
        "lm_perplexity_score",
        "ccnet_perplexity_buckets",
        "dsir_importance_weights",
    )
    results = {}
    for families, label in ((4, "20x"), (20, "100x")):
        d = tempfile.mkdtemp(prefix=f"lm{label}_")
        _family_docs(spark, families).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        n_docs = spark.read.parquet(d + "/documents.parquet").count()
        for name in ops:
            before = _stage_metrics_total(spark)
            t0 = time.time()
            out = QUERIES[name].fn(spark, d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_metrics_total(spark)
            rows = out.count()  # outside the clock/metric window
            delta = {k: after[k] - before[k] for k in after}
            results[(label, name)] = (dt, rows, delta)
            print(
                f"{label} ({n_docs} docs) {name}: {dt:.1f}s, {rows} rows, "
                f"shuffle_w={delta['shuffle_write'] / 1e6:.1f}MB "
                f"spill_disk={delta['disk_spill'] / 1e6:.0f}MB",
                flush=True,
            )
    for name in ops:
        t20, _, d20 = results[("20x", name)]
        t100, _, d100 = results[("100x", name)]
        print(
            f"trend {name}: wall x{t100 / max(t20, 0.001):.1f} "
            f"(linear target ~5x), shuffle_w x"
            f"{d100['shuffle_write'] / max(d20['shuffle_write'], 1):.1f}",
            flush=True,
        )


def probe_round5_fineweb(spark):
    """The fineweb pipeline (gate → MinHash clusters → quality reps →
    shards) at 20×/100× sf0.1 (100k / 500k docs, dedup_100x corpus). Claims:
    wall ≤ linear (the pair graph + CC dominate and near-dup groups stay
    size-5 by construction), shuffle ~linear (band keys + signature rows),
    zero spill — i.e. the composed pipeline inherits the already-probed
    economics of its stages rather than multiplying them."""
    import tempfile

    from mini_flink_spark.queries import QUERIES

    results = {}
    for families, label in ((4, "20x"), (20, "100x")):
        d = tempfile.mkdtemp(prefix=f"fw{label}_")
        _family_docs(spark, families).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        n_docs = spark.read.parquet(d + "/documents.parquet").count()
        before = _stage_metrics_total(spark)
        t0 = time.time()
        out = QUERIES["curation_pipeline_fineweb"].fn(spark, d)
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        after = _stage_metrics_total(spark)
        rows = out.count()  # outside the clock/metric window
        delta = {k: after[k] - before[k] for k in after}
        results[label] = (dt, rows, delta)
        print(
            f"{label} ({n_docs} docs) curation_pipeline_fineweb: {dt:.1f}s, "
            f"{rows} rows, shuffle_w={delta['shuffle_write'] / 1e6:.1f}MB "
            f"spill_disk={delta['disk_spill'] / 1e6:.0f}MB",
            flush=True,
        )
    t20, r20, d20 = results["20x"]
    t100, r100, d100 = results["100x"]
    print(
        f"trend: rows x{r100 / max(r20, 1):.1f}, wall x{t100 / max(t20, 0.001):.1f} "
        f"(linear target ~5x), shuffle_w x"
        f"{d100['shuffle_write'] / max(d20['shuffle_write'], 1):.1f}",
        flush=True,
    )


def probe_round6_fineweb_max(spark):
    """Round-6 (VERDICT r5 #6): push the fineweb pipeline to the corpus the
    100× probe couldn't certify — 200× (1,000,000 docs) — PLUS a planted
    3,000-copy boilerplate block that forces the MAX_BAND_BUCKET hot-bucket
    cap to actually ENGAGE (identical texts → identical signatures → every
    band bucket holds 3,000 > 1,000 members). Claims under test:
    (a) the cap drops the pathological buckets, so the block emits ZERO
        candidate pairs instead of ~4.5M (3000²/2) — the O(b²) guard rail;
    (b) each planted doc then survives as its own singleton representative
        (the documented tradeoff: capped buckets skip near-dup detection);
    (c) wall/shuffle stay on the 20×→100× linear trend and spill stays 0."""
    import tempfile

    from mini_flink_spark.functions import dedup as D
    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.queries_ext import gopher_flags, gopher_metrics
    from mini_flink_spark.functions import text as T

    # one gate-passing text, replicated 3000× with distinct ids above the
    # family id range — the "boilerplate page crawled 3000 times" shape
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    mx = gopher_metrics(T.tokens("text"))
    f1, f2, f3, f4 = gopher_flags(
        mx["n_tokens"], mx["n_chars"], mx["sw_hits"], mx["n_distinct"]
    )
    boiler = (
        base.filter(f1 & f2 & f3 & f4)
        .orderBy("doc_id")
        .limit(1)
        .select("text", "lang", "source", "n_chars")
    )
    planted = (
        boiler.select(
            F.explode(F.sequence(F.lit(0), F.lit(2999))).alias("i"),
            "text", "lang", "source", "n_chars",
        )
        .select((F.lit(10_000_000_000) + F.col("i")).alias("doc_id"),
                "text", "lang", "source", "n_chars")
    )

    # (a) the cap engages: the block alone yields hot buckets and 0 pairs
    n_pairs = D.minhash_lsh_pairs(planted, "doc_id", "text", threshold=0.5).count()
    print(f"planted block (3000 identical docs): capped pair count = {n_pairs} "
          f"(uncapped would be ~{3000 * 2999 // 2})", flush=True)
    assert n_pairs == 0, n_pairs

    d = tempfile.mkdtemp(prefix="fw200x_")
    corpus = _family_docs(spark, 40).unionByName(planted)  # 1,000,000 + 3,000
    corpus.write.mode("overwrite").parquet(d + "/documents.parquet")
    n_docs = spark.read.parquet(d + "/documents.parquet").count()

    before = _stage_metrics_total(spark)
    t0 = time.time()
    out = QUERIES["curation_pipeline_fineweb"].fn(spark, d)
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    after = _stage_metrics_total(spark)
    delta = {k: after[k] - before[k] for k in after}

    # (b) planted docs come out as 3000 singleton reps (outside the clock;
    # ONE aggregation pass — out is uncached, so separate counts would each
    # re-execute the full 1M-doc LSH/CC pipeline)
    planted_rep = F.col("keep_id") >= 10_000_000_000
    stats = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(planted_rep.cast("long")).alias("n_singles"),
        F.sum((planted_rep & (F.col("n_dups") > 1)).cast("long")).alias("n_multi"),
    ).first()
    rows, n_singles, n_multi = stats.rows, stats.n_singles, stats.n_multi
    print(
        f"200x+hot ({n_docs} docs) curation_pipeline_fineweb: {dt:.1f}s, "
        f"{rows} rows, shuffle_w={delta['shuffle_write'] / 1e6:.1f}MB "
        f"spill_disk={delta['disk_spill'] / 1e6:.0f}MB; planted singleton "
        f"reps={n_singles} (expect 3000), planted multi-dup reps={n_multi} "
        f"(expect 0)",
        flush=True,
    )
    assert n_singles == 3000 and n_multi == 0, (n_singles, n_multi)


def probe_round6_join_state(spark):
    """Stream-stream interval-join STATE boundedness — the eviction claim
    behind the now-driver-graded `streaming_stream_join` ("both sides
    watermarked, join condition time-bounded on both ends so state evicts"),
    demonstrated rather than asserted from the plan. 10 waves × (5k clicks +
    5k purchases) with event time advancing 20 min per wave, 10-min
    watermarks, purchases joined within [0, 5 min] of their click. If
    eviction worked, per-batch join-state `numRowsTotal` stays ~a wave or
    two; if the time bounds were missing (the classic unbounded stream-join
    bug) state would ratchet up toward all 100k buffered rows."""
    import datetime
    import os
    import tempfile

    waves, per_wave = 10, 5_000
    src = tempfile.mkdtemp(prefix="probe_jstate_src_")
    base = datetime.datetime(2026, 1, 1)
    stamped: set[str] = set()
    for i in range(waves):
        ts = base + datetime.timedelta(minutes=20 * i)
        (
            spark.range(i * per_wave, (i + 1) * per_wave)
            .selectExpr(
                "id AS user_id",
                f"timestamp'{ts:%Y-%m-%d %H:%M:%S}' AS c_ts",
                # the matching purchase lands 2 min after its click
                f"timestamp'{ts:%Y-%m-%d %H:%M:%S}' + interval 2 minutes AS p_ts",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in stamped:
                os.utime(os.path.join(src, f), (1_000_000 + i, 1_000_000 + i))
                stamped.add(f)

    schema = "user_id bigint, c_ts timestamp, p_ts timestamp"

    def reader():
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )

    clicks = (
        reader().select("user_id", "c_ts").withWatermark("c_ts", "10 minutes").alias("c")
    )
    purchases = (
        reader().select("user_id", "p_ts").withWatermark("p_ts", "10 minutes").alias("p")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c.user_id = p.user_id AND p_ts >= c_ts "
            "AND p_ts <= c_ts + interval 5 minutes"
        ),
    )
    ckpt = tempfile.mkdtemp(prefix="probe_jstate_ckpt_")
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    rows_per_batch = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    out_rows = sum(
        p.get("sink", {}).get("numOutputRows", 0) or 0 for p in q.recentProgress
    )
    q.stop()
    print(
        f"join_state buffered_input={waves * per_wave * 2} "
        f"matches={out_rows} state_rows_per_batch={rows_per_batch}",
        flush=True,
    )
    peak = max(rows_per_batch)
    # both sides of ~2 waves may be resident before the watermark crosses;
    # anything near the 100k total means eviction is broken
    assert peak <= 6 * per_wave, (
        f"join state grew to {peak} rows — time bounds are not evicting"
    )
    assert out_rows == waves * per_wave, out_rows


def probe_round6_skew_join(spark):
    """AQE skew-join under a planted hot key — the brief's 'skewed keys
    hurt' scenario, measured rather than asserted. Fact: 5M rows with 30%
    on ONE key (the power-law head every real event/log corpus has), dim:
    200k rows (autoBroadcastJoinThreshold disabled so the join actually
    shuffles — at 100 TB the dim side won't broadcast either). A/B on
    spark.sql.adaptive.skewJoin.enabled: ON must split the hot partition so
    the stage's max task duration collapses toward the median; OFF strands
    the hot key's 1.5M rows in one oversized partition whose task dominates
    the stage.

    Two measurement traps this probe explicitly handles (both observed):
    - warm-up bias: the first execution pays JIT/codegen/page-cache costs
      that uniformly inflate whichever flag goes first by 2-3× — so an
      untimed warm-up runs first and flags alternate, best run per flag;
    - threshold scale: AQE marks a partition skewed only past
      skewedPartitionThresholdInBytes (default 256 MB) AND factor×median.
      The fixture's hot partition is ~24 MB, so at fixture scale the probe
      scales the THRESHOLD to the data (8 MB / advisory 4 MB) rather than
      the data to the threshold — at 100 TB the hot key's partition is
      hundreds of GB and the stock defaults fire on their own.
    Claims: (a) identical results both ways, (b) skew-ON splits the hot
    partition (strictly more join tasks — the deterministic certificate)
    and max task duration falls well below skew-OFF's."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl

    def _join_stage_summary(app, seen_stages):
        stages = _json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
        )
        new = [s for s in stages if s["stageId"] not in seen_stages]
        # the join stage = largest shuffle READ among this run's new stages
        s = max(new, key=lambda s: s.get("shuffleReadBytes", 0))
        q = _json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        )
        med, mx = q["executorRunTime"]
        return s["stageId"], s.get("numCompleteTasks", 0), med, mx

    apps = _json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]

    fact = spark.range(0, 5_000_000).selectExpr(
        "IF(pmod(id, 10) < 3, 0L, pmod(hash(id), 100000) + 1) AS k",
        "pmod(id, 997) AS v",
    )
    dim = spark.range(0, 200_000).selectExpr("id AS k", "pmod(id, 31) AS grp")

    def run():
        return (
            fact.join(dim, "k")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .orderBy("grp")
            .collect()
        )

    probe_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    }
    prev = {k: spark.conf.get(k) for k in probe_confs}
    results: dict = {}
    try:
        for k, v in probe_confs.items():
            spark.conf.set(k, v)
        run()  # warm-up: JIT, codegen cache, shuffle-service pages
        for flag in ("true", "false", "true", "false"):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
            seen = {
                s["stageId"]
                for s in _json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app}/stages"
                    )
                )
            }
            t0 = time.time()
            agg = run()
            dt = time.time() - t0
            sid, ntasks, med, mx = _join_stage_summary(app, seen)
            print(
                f"skewJoin={flag}: wall {dt:.1f}s, join stage {sid} "
                f"({ntasks} tasks) task runtime median {med:.0f}ms "
                f"max {mx:.0f}ms",
                flush=True,
            )
            best = results.get(flag)
            if best is None or mx < best[2]:
                results[flag] = (dt, agg, mx, med, ntasks)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert results["false"][1] == results["true"][1], "results differ under skew-join!"
    wall_off, _, mx_off, med_off, nt_off = results["false"]
    wall_on, _, mx_on, med_on, nt_on = results["true"]
    print(
        f"trend: identical results; best-per-flag max task {mx_on:.0f}ms (on, "
        f"med {med_on:.0f}, {nt_on} tasks) vs {mx_off:.0f}ms (off, med "
        f"{med_off:.0f}, {nt_off} tasks) — {mx_off / max(mx_on, 1):.1f}x; "
        f"wall {wall_on:.1f}s vs {wall_off:.1f}s",
        flush=True,
    )
    # the structural claim is deterministic (AQE split the hot partition into
    # extra tasks); the timing claim gets a noise margin — tasks are a few
    # hundred ms here, so the 0.5× the sizes imply bounces around run-to-run
    assert nt_on > nt_off, "skew-ON did not split the hot partition"
    assert mx_on < 0.7 * mx_off, (mx_on, mx_off)


def probe_round4_new(spark):
    """Round-4 additions at scale.

    semantic_decontamination: replicate the sf0.1 embeddings 50x/250x (100k /
    500k vectors) against a FIXED-size eval split (the production shape: the
    benchmark does not grow with the corpus). Claims under test: ZERO shuffle
    at any scale (the eval set rides a literal or broadcast, never a join),
    wall ~linear in the corpus (x5 target), and the |eval|*d > LITERAL_KD_MAX
    Arrow route costs about the same as the literal route it replaces (both
    are one linear scan).

    tokenizer_fertility + dedup_cluster_stats ride the dedup_100x family
    corpus at 20x/100x (100k / 500k docs): fertility is the BPE encode scan +
    a source-keyed rollup (shuffle bounded by |sources|); cluster_stats adds
    two tiny aggs on top of the CC labeling, so its cost IS the pair-graph +
    CC cost already probed — the histogram must not add data-sized work."""
    import tempfile

    from mini_flink_spark.functions import similarity as S
    from mini_flink_spark.queries import QUERIES

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    results = {}
    for reps, label in ((50, "50x"), (250, "250x")):
        repl = (
            base.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
            )
            .select(
                (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
                "embedding",
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)  # measure the scan, not the generator
        )
        n = repl.count()
        # ~54 eval vecs -> 54*64 <= 4096: literal path; ~181 -> Arrow path.
        for pred, plabel in (
            (f"vec_id % {37 * reps} = 0", "literal54"),
            (f"vec_id % {11 * reps} = 0", "arrow181"),
        ):
            before = _stage_metrics_total(spark)
            t0 = time.time()
            out = S.semantic_decontam_pairs(repl, pred, tau=0.3)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_metrics_total(spark)
            # rows counted OUTSIDE the clock and the stage-metric window —
            # count() re-executes the operator, and including that second
            # run inflated both wall and shuffle deltas (ADVICE r4); trends
            # in older SCALE_NOTES entries are unaffected (both scales were
            # measured the same way), absolute walls there read ~2x high.
            rows = out.count()
            sw = (after["shuffle_write"] - before["shuffle_write"]) / 1e6
            sp = (after["disk_spill"] - before["disk_spill"]) / 1e6
            results[(label, plabel)] = (dt, rows)
            print(
                f"{label} ({n} vecs) decontam[{plabel}]: {dt:.1f}s, {rows} rows, "
                f"shuffle_w={sw:.1f}MB spill_disk={sp:.0f}MB",
                flush=True,
            )
    for plabel in ("literal54", "arrow181"):
        t50, _ = results[("50x", plabel)]
        t250, _ = results[("250x", plabel)]
        print(
            f"trend decontam[{plabel}]: wall x{t250 / max(t50, 0.001):.1f} "
            f"(linear target ~5x)",
            flush=True,
        )

        # A/B the LSH bucket projection itself at this scale: higher-order
        # folds are interpreted (no codegen), so the 36-fold expression pays
        # per (row x table x plane x dim) — the Arrow twin pays per batch.
        if plabel == "arrow181":  # repl still bound to the 250x corpus
            c = repl.select("vec_id", F.col("embedding").alias("v"))
            for bpath, col in (
                ("expr", S.multi_table_buckets_expr("v")),
                ("arrow", S.multi_table_buckets_arrow(F.col("v"))),
            ):
                t0 = time.time()
                c.select("vec_id", F.explode(col).alias("bkey")).write.format(
                    "noop"
                ).mode("overwrite").save()
                print(
                    f"{label} ({n} vecs) bucket_projection[{bpath}]: "
                    f"{time.time() - t0:.1f}s",
                    flush=True,
                )

    for families, label in ((4, "20x"), (20, "100x")):
        d = tempfile.mkdtemp(prefix=f"r4new{label}_")
        _family_docs(spark, families).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        n_docs = spark.read.parquet(d + "/documents.parquet").count()
        for name in ("tokenizer_fertility", "dedup_cluster_stats"):
            before = _stage_metrics_total(spark)
            t0 = time.time()
            out = QUERIES[name].fn(spark, d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_metrics_total(spark)
            # rows counted OUTSIDE the clock and the stage-metric window —
            # count() re-executes the operator, and including that second
            # run inflated both wall and shuffle deltas (ADVICE r4); trends
            # in older SCALE_NOTES entries are unaffected (both scales were
            # measured the same way), absolute walls there read ~2x high.
            rows = out.count()
            sw = (after["shuffle_write"] - before["shuffle_write"]) / 1e6
            sp = (after["disk_spill"] - before["disk_spill"]) / 1e6
            results[(label, name)] = (dt, rows)
            print(
                f"{label} ({n_docs} docs) {name}: {dt:.1f}s, {rows} rows, "
                f"shuffle_w={sw:.1f}MB spill_disk={sp:.0f}MB",
                flush=True,
            )
    for name in ("tokenizer_fertility", "dedup_cluster_stats"):
        t20, _ = results[("20x", name)]
        t100, _ = results[("100x", name)]
        print(
            f"trend {name}: wall x{t100 / max(t20, 0.001):.1f} (linear target ~5x)",
            flush=True,
        )


def probe_round7_linkage(spark):
    """Round-7 (VERDICT r6 #5): prove the MAX_LINKAGE_BLOCK cap engages on
    REAL data, the way round 6 proved MinHash's MAX_BAND_BUCKET — until now
    the cap-fires case was pinned only by a monkeypatched unit test.

    Corpus: the sf0.1 customer table scaled 110×. 100 replicas per customer
    spread over 100 synthetic nation keys (blocks stay ~120 rows — the
    discriminative-blocking regime linkage is designed for), plus 300
    planted TWINS (one-char name edits of a rep-0 replica, same block: the
    recall signal the probe must NOT lose), plus ONE planted
    non-discriminative block — 150,000 rows sharing a single
    (nation, segment), i.e. > MAX_LINKAGE_BLOCK — the "blocking key stopped
    discriminating here" failure mode. Claims:
    (a) exactly that one block exceeds the cap and is dropped BEFORE the
        self-join: zero result pairs touch its custkey range, and the
        ~1.1e10 would-be within-block comparisons (150k²/2) never run;
    (b) all 300 planted twin pairs survive in the allowed blocks (the cap
        removes pathology, not recall);
    (c) wall/shuffle recorded, spill stays 0."""
    import tempfile

    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.queries_pipeline import MAX_LINKAGE_BLOCK

    base = (
        spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    )
    reps = base.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep"),
    )
    # per-(customer, replica) 8-hex suffix: names inside a block differ in
    # several characters, so cross-replica distances stay > 2 (real-corpus
    # shape: blocks hold mostly non-matches)
    suffix = F.substring(
        F.md5(F.concat_ws("|", F.col("c_custkey"), F.col("rep"))), 1, 8
    )
    replicas = reps.select(
        (F.col("c_custkey") * 100 + F.col("rep")).cast("long").alias("c_custkey"),
        F.concat_ws("-", "c_name", suffix).alias("c_name"),
        (F.col("c_nationkey") + 25 * F.col("rep")).cast("long").alias("c_nationkey"),
        "c_mktsegment",
    )
    twin_src = reps.filter((F.col("rep") == 0) & (F.col("c_custkey") % 50 == 0))
    twins = twin_src.select(
        (F.col("c_custkey") * 100 + 10_000_000_000).cast("long").alias("c_custkey"),
        F.concat(F.concat_ws("-", "c_name", suffix), F.lit("x")).alias("c_name"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_mktsegment",
    )
    n_twins = twins.count()
    hot_rows = 150_000
    hot = spark.range(hot_rows).select(
        (F.col("id") + 20_000_000_000).alias("c_custkey"),
        F.concat(F.lit("HOT-"), F.md5(F.col("id").cast("string"))).alias("c_name"),
        F.lit(999_999).cast("long").alias("c_nationkey"),
        F.lit("AUTOMOBILE").alias("c_mktsegment"),
    )
    d = tempfile.mkdtemp(prefix="probe_linkage_")
    corpus = replicas.unionByName(twins).unionByName(hot)
    corpus.write.mode("overwrite").parquet(d + "/customer.parquet")
    n_rows = spark.read.parquet(d + "/customer.parquet").count()

    over_cap = (
        spark.read.parquet(d + "/customer.parquet")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("bc"))
        .filter(F.col("bc") > MAX_LINKAGE_BLOCK)
        .count()
    )
    assert over_cap == 1, over_cap  # exactly the planted block

    before = _stage_metrics_total(spark)
    t0 = time.time()
    out = QUERIES["record_linkage_customers"].fn(spark, d)
    hot_involved = (F.col("a") >= 20_000_000_000) | (F.col("b") >= 20_000_000_000)
    is_twin = (F.col("b") - F.col("a")) == 10_000_000_000
    stats = out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(hot_involved.cast("long")).alias("hot_pairs"),
        F.sum(is_twin.cast("long")).alias("twin_pairs"),
    ).first()
    dt = time.time() - t0
    after = _stage_metrics_total(spark)
    delta = {k: after[k] - before[k] for k in after}

    print(
        f"linkage 110x ({n_rows} rows, 1 block of {hot_rows} > cap "
        f"{MAX_LINKAGE_BLOCK}): {dt:.1f}s, {stats.pairs} pairs, "
        f"hot-block pairs={stats.hot_pairs} (uncapped would compare "
        f"~{hot_rows * (hot_rows - 1) // 2:.2e}), planted twins found="
        f"{stats.twin_pairs}/{n_twins}, "
        f"shuffle_w={delta['shuffle_write'] / 1e6:.1f}MB "
        f"spill_disk={delta['disk_spill'] / 1e6:.0f}MB",
        flush=True,
    )
    assert stats.hot_pairs == 0, stats.hot_pairs
    assert stats.twin_pairs == n_twins, (stats.twin_pairs, n_twins)
    assert delta["disk_spill"] == 0, delta

    # Shape A/B (kept as the regression guard for the hint this probe
    # motivated): unhinted, Catalyst picked BHJ BuildRight on the 1.5M-row
    # side here (under-threshold size estimate on the anti-join output) and
    # the serialized broadcast build cost 373s vs 21s shuffled — so
    # q_record_linkage_customers now carries hint("merge") and both legs
    # should time alike. Forcing broadcast OFF pins the at-scale plan.
    restore = {}
    for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        try:
            restore[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf key
            restore[k] = None
        spark.conf.set(k, "-1")
    try:
        before = _stage_metrics_total(spark)
        t0 = time.time()
        out2 = QUERIES["record_linkage_customers"].fn(spark, d)
        stats2 = out2.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(hot_involved.cast("long")).alias("hot_pairs"),
            F.sum(is_twin.cast("long")).alias("twin_pairs"),
        ).first()
        dt2 = time.time() - t0
        delta2 = {k: v - before[k] for k, v in _stage_metrics_total(spark).items()}
    finally:
        for k, v in restore.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    print(
        f"linkage 110x SHUFFLED-join shape (100 TB plan): {dt2:.1f}s, "
        f"{stats2.pairs} pairs, hot-block pairs={stats2.hot_pairs}, twins="
        f"{stats2.twin_pairs}/{n_twins}, "
        f"shuffle_w={delta2['shuffle_write'] / 1e6:.1f}MB "
        f"spill_disk={delta2['disk_spill'] / 1e6:.0f}MB",
        flush=True,
    )
    assert (stats2.pairs, stats2.hot_pairs, stats2.twin_pairs) == (
        stats.pairs,
        stats.hot_pairs,
        stats.twin_pairs,
    )
    assert delta2["disk_spill"] == 0, delta2




def _phash_doc_level_pairs(sim, max_hamming=3, n_blocks=4):
    """The PRE-round-7 simhash_pairs shape (doc-level banding, no collapse,
    no cap) — kept here only as the A/B baseline for probe_round7_phash."""
    from pyspark.sql import functions as F

    SIMHASH_BITS = 56
    width = SIMHASH_BITS // n_blocks
    mask = (1 << width) - 1
    banded = sim.select(
        "id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), j -> "
                f"concat(cast(j as string), ':', "
                f"cast((shiftright(simhash, j * {width}) & {mask}) as string)))"
            )
        ).alias("band"),
    )
    return (
        banded.alias("l")
        .join(banded.alias("r"), "band")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def probe_round7_phash(spark):
    """Round-7 media near-dup (multimodal_phash_neardup) at 20x/100x sf0.1
    with a planted 2,000-copy boilerplate payload — the mass-duplicated
    banner/logo every crawl corpus contains. Three claims under test:

    1. The distinct-signature collapse absorbs mass duplication: the plant
       contributes ONE banded row per band instead of 2,000, so the band
       join never sees a hot bucket from identical content (its C(2000,2)
       pairs are semantic OUTPUT and ride the per-signature equi-join).
    2. A/B vs the doc-level banding this round replaced: same corpus, same
       pair set, but the old shape pushes 4 x C(2000,2) candidate rows
       through the band join + distinct.
    3. Cap headroom at 500k docs: the largest DISTINCT-signature band
       bucket vs MAX_BAND_BUCKET=1000 (md5-uniform signatures should sit
       orders of magnitude under it; the cap is for adversarial
       near-identical signature families, not this corpus)."""
    import tempfile

    from pyspark.sql import functions as F

    from mini_flink_spark.functions.dedup import simhash_pairs
    from mini_flink_spark.functions.multimodal import phash_table, text_as_media

    for families, plant_n, label, ab in (
        (4, 2000, "20x/plant2k", True),
        (4, 20000, "20x/plant20k", True),
        (20, 2000, "100x/plant2k", False),
    ):
        d = tempfile.mkdtemp(prefix="phash_")
        base = _family_docs(spark, families)
        plant = spark.range(plant_n).select(
            (F.lit(10_000_000) + F.col("id")).alias("doc_id"),
            F.lit("boilerplate banner image payload served on every page").alias(
                "text"
            ),
            F.lit("en").alias("lang"),
            F.lit("plant").alias("source"),
            F.lit(54).cast("bigint").alias("n_chars"),
        )
        base.unionByName(plant).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        docs = spark.read.parquet(d + "/documents.parquet")
        n_docs = docs.count()
        media = text_as_media(docs, "text", kind="image")
        # hash once (outside the join A/B); repartition by ROWS first — the
        # parquet reader sizes partitions by BYTES, which leaves a CPU-bound
        # per-row fold running ~20 fat tasks on 32 cores (observed: a 2-min
        # straggler tail at 500k docs on the byte-sized layout)
        t0 = time.time()
        ph = phash_table(media.repartition(128)).localCheckpoint()
        print(f"{label}: phash fold over {n_docs} docs: "
              f"{time.time() - t0:.1f}s", flush=True)

        runs = [("new(collapse+cap)", lambda: simhash_pairs(
            ph.withColumnRenamed("phash", "simhash"), max_hamming=3, n_blocks=4
        ))]
        if ab:
            runs.append(("old(doc-banding)", lambda: _phash_doc_level_pairs(
                ph.withColumnRenamed("phash", "simhash"), max_hamming=3, n_blocks=4
            )))
        for name, mk in runs:
            before = _stage_metrics_total(spark)
            t0 = time.time()
            out = mk()
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_metrics_total(spark)
            rows = out.count()  # outside the clock (ADVICE r4)
            delta = {k: after[k] - before[k] for k in after}
            print(
                f"{label} ({n_docs} docs, plant={plant_n}) {name}: {dt:.1f}s, "
                f"{rows} pairs, "
                f"shuffle_w={delta['shuffle_write'] / 1e6:.0f}MB "
                f"shuffle_r={delta['shuffle_read'] / 1e6:.0f}MB "
                f"spill_disk={delta['disk_spill'] / 1e6:.0f}MB",
                flush=True,
            )
        if label.startswith("100x"):
            width = 56 // 4
            mask = (1 << width) - 1
            buckets = (
                ph.select(F.col("phash").alias("simhash"))
                .distinct()
                .select(
                    F.explode(
                        F.expr(
                            f"transform(sequence(0, 3), j -> concat(cast(j as string), ':', "
                            f"cast((shiftright(simhash, j * {width}) & {mask}) as string)))"
                        )
                    ).alias("band")
                )
                .groupBy("band")
                .agg(F.count(F.lit(1)).alias("c"))
                .agg(F.max("c").alias("max_bucket"), F.avg("c").alias("avg"))
                .collect()[0]
            )
            print(
                f"100x distinct-sig band buckets: max={buckets.max_bucket} "
                f"avg={buckets.avg:.1f} (cap=1000)",
                flush=True,
            )


def probe_round7_compaction(spark):
    """The compaction_small_files writer contract at 20x: 2M events,
    repartition(event_type) + partitionBy + maxRecordsPerFile=2000. The
    graded query pins ceil(rows/cap) at sf0.01/0.1; this verifies the
    contract survives AQE partition coalescing and real multi-file task
    inputs at 20x, and records the cost of the clustered write."""
    import math
    import tempfile

    from pyspark.sql import functions as F

    ev = dense_events(spark)  # 20x sf0.1 = 2M rows
    d = tempfile.mkdtemp(prefix="compact20x_") + "/events"
    t0 = time.time()
    (
        ev.select("event_id", "event_type", "user_id", "value")
        .repartition("event_type")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 2000)
        .partitionBy("event_type")
        .parquet(d)
    )
    wall = time.time() - t0
    got = (
        spark.read.parquet(d)
        .select("event_type", F.input_file_name().alias("f"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("f").alias("n_files"),
        )
        .collect()
    )
    bad = [r for r in got if r.n_files != math.ceil(r.n_rows / 2000.0)]
    total_files = sum(r.n_files for r in got)
    total_rows = sum(r.n_rows for r in got)
    print(
        f"20x compaction: {total_rows} rows -> {total_files} files across "
        f"{len(got)} partitions in {wall:.1f}s; contract violations: {len(bad)}"
        + (f" {bad}" if bad else ""),
        flush=True,
    )
    assert not bad

def _skewed_docs(spark, replicas: int, hot_frac: int = 9, sf_dir="/root/testdata/sf0.1"):
    """`replicas`× the sf0.1 documents table with a planted hot stratum:
    hot_frac/10 of all rows land in source='hot_source', the rest keep their
    original source — the one-source-holds-90% shape VERDICT r7 #5 asked to
    probe (the per-source window sort is the only single-task risk in the
    preference_pairs plan). Built distributively (explode + expressions)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
        )
        .select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            # vary text per replica so q isn't constant inside the hot
            # stratum (a constant-q stratum would make the sort trivially
            # cheap and the probe vacuous)
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias(
                "text"
            ),
            F.when(
                F.pmod(F.xxhash64("doc_id", "rep"), F.lit(10)) < F.lit(hot_frac),
                F.lit("hot_source"),
            )
            .otherwise(F.col("source"))
            .alias("source"),
        )
    )


def probe_round8_pref_skew(spark):
    """preference_pairs under a 90%-hot stratum at 20× (100k docs, ~90k in
    one source; VERDICT r7 #5): the per-source window sort puts the whole
    hot stratum through ONE task — this measures whether that single-task
    sort (rank + count window over ~90k scored rows) is the bottleneck and
    whether it spills. The scorer itself is partition-parallel (it runs
    BELOW the stratum exchange); only the rank/count window serializes."""
    import time as _t

    from mini_flink_spark.queries_pipeline import preference_pairs_plan

    print("== round8_pref_skew: preference_pairs, 20x docs, 90% one source ==")
    docs = _skewed_docs(spark, replicas=20).localCheckpoint()  # isolate build cost
    n = docs.count()
    hot = docs.filter(F.col("source") == "hot_source").count()
    results = {}
    for label, salt in (("full_sort(salt=None)", None), ("tournament(salt=32)", 32)):
        before = _stage_metrics_total(spark)
        t0 = _t.time()
        out = preference_pairs_plan(docs, salt=salt)
        rows = out.count()
        wall = _t.time() - t0
        after = _stage_metrics_total(spark)
        d = {k: after[k] - before[k] for k in after}
        results[label] = rows
        print(
            f"  {label}: pairs={rows} wall={wall:.1f}s "
            f"shuffle_read={d['shuffle_read']/1e6:.1f}MB "
            f"write={d['shuffle_write']/1e6:.1f}MB "
            f"spill_mem={d['mem_spill']/1e6:.1f}MB disk={d['disk_spill']/1e6:.1f}MB"
        )
    vals = set(results.values())
    print(
        f"  corpus={n} hot_stratum={hot} ({100*hot//n}%) "
        f"outputs_identical={len(vals) == 1}"
    )
    # exactness, not just counts: the two paths must emit the same pairs
    a = preference_pairs_plan(docs, salt=None)
    b = preference_pairs_plan(docs, salt=32)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print("  pair-set equality verified (exceptAll both ways == 0)")


def probe_round8_manifest(spark):
    """epoch_shard_manifest at 20× and 100× (VERDICT r7 #5): expect exactly
    linear scan cost, ONE exchange carrying only the partial-aggregated
    (epoch, shard) rows (map-side combine makes shuffle bytes ~constant in
    corpus size — the property that matters at 100 TB), zero spill."""
    import time as _t

    print("== round8_manifest: epoch_shard_manifest scan scaling ==")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    from mini_flink_spark.functions.hashing import portable_hash64

    for reps in (20, 100):
        docs = base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
        ).select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"), "text"
        )
        before = _stage_metrics_total(spark)
        t0 = _t.time()
        epochs = docs.select(
            "*", F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch")
        )
        tok = F.size(F.split("text", " ")).cast("bigint")
        out = (
            epochs.select(
                "epoch",
                F.pmod(
                    portable_hash64(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit("#epoch"),
                            F.col("epoch").cast("string"),
                        )
                    ),
                    F.lit(8),
                ).alias("shard"),
                tok.alias("tok"),
                portable_hash64(
                    F.concat(F.col("doc_id").cast("string"), F.lit("#ck"))
                ).alias("ck"),
            )
            .groupBy("epoch", "shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("tok").alias("n_tokens"),
                F.expr("bit_xor(ck)").alias("checksum"),
            )
        )
        cells = out.count()
        wall = _t.time() - t0
        after = _stage_metrics_total(spark)
        d = {k: after[k] - before[k] for k in after}
        print(
            f"  {reps}x: rows={reps*5000} cells={cells} wall={wall:.1f}s "
            f"shuffle_write={d['shuffle_write']/1e3:.0f}KB "
            f"spill={d['disk_spill']/1e6:.1f}MB"
        )


def probe_round8_xxhash(spark):
    """The documented hash lever, measured (VERDICT r7 #6): MinHash
    signatures (k=64 seeded hashes per shingle — the heaviest hash consumer
    in the repo) at 20× docs, portable md5 hash vs fast_seeded_hash
    (xxhash64). Graded paths keep the portable hash (oracle-checkable);
    this records what the one-line swap buys at deployment scale."""
    import time as _t

    from mini_flink_spark.functions.dedup import MINHASH_K, shingled
    from mini_flink_spark.functions.hashing import fast_seeded_hash, seeded_hash

    print("== round8_xxhash: minhash signature stage, md5 vs xxhash64, 20x ==")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep")
    ).select((F.col("doc_id") * 20 + F.col("rep")).alias("doc_id"), "text")
    sh = shingled(docs, "doc_id", "text").localCheckpoint()  # shared preamble
    sh_rows = sh.select("id", F.explode("sh").alias("s"))
    results = {}
    for name, fam in (("md5_portable", seeded_hash), ("xxhash64", fast_seeded_hash)):
        hash_cols = [fam(F.col("s"), i).alias(f"h{i}") for i in range(MINHASH_K)]
        sig = (
            sh_rows.select("id", *hash_cols)
            .groupBy("id")
            .agg(F.array(*[F.min(f"h{i}") for i in range(MINHASH_K)]).alias("sig"))
        )
        # force every hash: fold the signature into one checksum (XOR — sum
        # overflows int64 under ANSI with 100k docs of 56-bit values)
        t0 = _t.time()
        sig.select(
            F.expr("aggregate(sig, 0L, (a, x) -> a ^ x)").alias("x")
        ).agg(F.expr("bit_xor(x)")).collect()
        results[name] = _t.time() - t0
        print(f"  {name}: {results[name]:.1f}s")
    print(
        f"  speedup: {results['md5_portable'] / results['xxhash64']:.2f}x "
        f"(100k docs x {MINHASH_K} hashes/shingle)"
    )


def probe_round8_lines(spark):
    """The line-filter family (c4_line_filters / gopher_repetition_suite) at
    20× and 100×: both are per-row array folds, so the claim to verify is
    exact linearity with ZERO hash-exchange bytes (the only exchange is the
    round-robin spread; the oracle shape would shuffle the corpus per
    metric). 500k docs ≈ 5M synthesized lines / ~30M grams."""
    import time as _t

    from pyspark.sql import functions as F

    from mini_flink_spark.queries import QUERIES

    print("== round8_lines: C4 + Gopher-repetition scan scaling ==")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for reps in (20, 100):
        docs = (
            base.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
            )
            .select(
                (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"), F.col("rep").cast("string"))
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            .localCheckpoint()  # isolate build cost from the measured scan
        )
        import tempfile

        d = tempfile.mkdtemp(prefix=f"lines{reps}x_")
        # the queries read <sf_dir>/documents.parquet — materialize the
        # replicated table under that exact layout
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        for q in ("c4_line_filters", "gopher_repetition_suite"):
            before = _stage_metrics_total(spark)
            t0 = _t.time()
            out = QUERIES[q].fn(spark, d)
            n = out.count()
            wall = _t.time() - t0
            after = _stage_metrics_total(spark)
            delta = {k: after[k] - before[k] for k in after}
            print(
                f"  {reps}x {q}: rows={n} wall={wall:.1f}s "
                f"hash_shuffle_write={delta['shuffle_write']/1e6:.1f}MB "
                f"spill={delta['disk_spill']/1e6:.1f}MB"
            )


def probe_round8_sink(spark):
    """The user-sink trade, quantified: the Python DataSource V2 JSONL sink
    (row-at-a-time json.dumps per task — the addSink analogue) vs Spark's
    native JVM json writer on the same 20× corpus (100k docs). The sink
    docstring claims row-at-a-time is acceptable on the write boundary;
    this records exactly what the claim costs, and the break-even guidance
    (arbitrary per-record user code -> Python sink; plain serialization ->
    native writer / foreachBatch around a JVM write)."""
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from mini_flink_spark.sources.python_sink import SINK_NAME, register_jsonl_sink

    print("== round8_sink: Python V2 sink vs native json writer, 20x ==")
    register_jsonl_sink(spark)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs = (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep")
        )
        .select(
            (F.col("doc_id") * 20 + F.col("rep")).alias("doc_id"),
            "lang",
            "source",
            "text",
        )
        .localCheckpoint()
    )
    n = docs.count()
    d = tempfile.mkdtemp(prefix="sink20x_")
    t0 = _t.time()
    docs.write.format(SINK_NAME).mode("overwrite").option(
        "path", f"{d}/pysink"
    ).save()
    py_wall = _t.time() - t0
    t0 = _t.time()
    docs.write.mode("overwrite").json(f"{d}/native")
    jvm_wall = _t.time() - t0
    back = spark.read.schema("doc_id bigint, lang string, source string, text string")
    n_py = back.json(f"{d}/pysink").count()
    n_jvm = back.json(f"{d}/native").count()
    assert n_py == n_jvm == n, (n, n_py, n_jvm)
    print(
        f"  rows={n}: python_v2_sink={py_wall:.1f}s "
        f"({n/py_wall/1e3:.0f}k rows/s), native_json={jvm_wall:.1f}s "
        f"({n/jvm_wall/1e3:.0f}k rows/s), ratio={py_wall/jvm_wall:.1f}x "
        f"— roundtrip row counts identical"
    )


def probe_round8_cumsum(spark):
    """The cumsum family under a 90%-hot stratum at 20× (100k docs):
    single-window per-lang running sum (one task sorts the hot lang) vs the
    two-phase md5-prefix scan (`_md5_prefix_cumsum`) — outputs must be
    IDENTICAL; the win is the bounded sort shape, same as the
    preference-pairs tournament."""
    import time as _t

    from pyspark.sql import functions as F

    from mini_flink_spark.queries_pipeline import _md5_prefix_cumsum

    print("== round8_cumsum: per-stratum running sum, naive vs two-phase ==")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs = (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep")
        )
        .select(
            (F.col("doc_id") * 20 + F.col("rep")).alias("doc_id"),
            F.when(
                F.pmod(F.xxhash64("doc_id", "rep"), F.lit(10)) < 9, F.lit("hotlang")
            )
            .otherwise(F.col("lang"))
            .alias("lang"),
            (F.length("text") + F.col("rep")).cast("bigint").alias("tok"),
        )
        .localCheckpoint()
    )
    n = docs.count()
    hot = docs.filter(F.col("lang") == "hotlang").count()
    outs = {}
    for label, plen in (("naive(1 window)", 0), ("two_phase(256 slices)", 2)):
        before = _stage_metrics_total(spark)
        t0 = _t.time()
        out = _md5_prefix_cumsum(docs, "tok", prefix_len=plen)
        chk = out.agg(
            F.expr("bit_xor(cum)").alias("x"), F.sum("cum").alias("s")
        ).first()
        wall = _t.time() - t0
        after = _stage_metrics_total(spark)
        d = {k: after[k] - before[k] for k in after}
        outs[label] = (chk.x, chk.s)
        print(
            f"  {label}: wall={wall:.1f}s checksum={chk.x} "
            f"spill_mem={d['mem_spill']/1e6:.0f}MB disk={d['disk_spill']/1e6:.0f}MB"
        )
    assert outs["naive(1 window)"] == outs["two_phase(256 slices)"]
    print(
        f"  corpus={n} hot_stratum={hot} ({100*hot//n}%) — cum checksums identical"
    )


def _hot_user_events(spark, replicas=20, hot_frac=9, sf_dir="/root/testdata/sf0.1"):
    """`replicas`× the sf0.1 events table with a planted hot USER: hot_frac/10
    of all rows collapse onto user_id=0 (one pathological account — a bot or
    an ingestion artifact), the rest shift into disjoint per-replica id
    blocks. ts jitters by rep so the hot history is a real ordered sequence,
    not one repeated instant. Built distributively."""
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
        )
        .select(
            (F.col("event_id") * replicas + F.col("rep")).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=F.col("rep"))).alias("ts"),
            F.when(
                F.pmod(F.xxhash64("event_id", "rep"), F.lit(10)) < F.lit(hot_frac),
                F.lit(0),
            )
            .otherwise(F.col("user_id") + F.col("rep") * 1_000_000)
            .cast("long")
            .alias("user_id"),
            "event_type",
            "value",
        )
    )


def probe_round9_events(spark):
    """event_transition_matrix / event_path_trigrams under a single 90%-hot
    user at 20× (2M events, ~1.8M on user_id=0; VERDICT r8 #8). Two distinct
    exposures: the transition matrix's per-user LEAD window sorts the hot
    history in one task (CPU-bound single sort, small rows); the path
    trigrams' collect_list materializes the hot history in ONE aggregation
    buffer (~1.8M structs — the classic hot-key OOM shape at corpus scale).
    The probe measures both against the same corpus with a uniform-user
    control, so the delta attributes to skew alone."""
    import time as _t

    import mini_flink_spark.queries  # noqa: F401 (registry import contract)
    from mini_flink_spark.queries_ext import transition_matrix_plan
    from mini_flink_spark.queries_pipeline import path_trigrams_plan

    print("== round9_events: per-user sequence ops, 20x events, 90% one user ==")
    for label, hot in (("uniform(control)", 0), ("hot_user(90%)", 9)):
        ev = _hot_user_events(spark, replicas=20, hot_frac=hot).localCheckpoint()
        n = ev.count()
        nhot = ev.filter(F.col("user_id") == 0).count()
        for op, plan in (
            ("transition_matrix", transition_matrix_plan),
            ("path_trigrams", path_trigrams_plan),
        ):
            outs = {}
            for shape, slices in (("naive", None), ("sliced64", 64)):
                before = _stage_metrics_total(spark)
                t0 = _t.time()
                out = plan(ev, slices=slices).collect()
                wall = _t.time() - t0
                after = _stage_metrics_total(spark)
                d = {k: after[k] - before[k] for k in after}
                outs[shape] = sorted(map(tuple, out))
                print(
                    f"  {label} {op}[{shape}]: wall={wall:.1f}s rows={len(out)} "
                    f"shuffle_read={d['shuffle_read']/1e6:.1f}MB "
                    f"spill_mem={d['mem_spill']/1e6:.0f}MB "
                    f"disk={d['disk_spill']/1e6:.0f}MB "
                    f"(corpus={n}, hot_user_rows={nhot})"
                )
            assert outs["naive"] == outs["sliced64"], f"{label}/{op} diverged"
        ev.unpersist()


def probe_round9_rank(spark):
    """The range-sliced exact rank vs the naive full-stratum window at 20×
    with a 90%-hot stratum (the ccnet/ntile shape; VERDICT r8 #2). Both
    must agree bit-exactly (xor/sum checksums over rank); the two-phase
    shape bounds every sort task to ~stratum/64 rows."""
    import time as _t

    from mini_flink_spark.queries_pipeline import _range_sliced_rank

    print("== round9_rank: per-stratum exact rank, naive vs range-sliced ==")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for reps in (20, 200, 1000):
        docs = (
            base.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
            )
            .select(
                (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
                F.when(
                    F.pmod(F.xxhash64("doc_id", "rep"), F.lit(10)) < 9,
                    F.lit("hotlang"),
                )
                .otherwise(F.col("lang"))
                .alias("lang"),
                (F.length("text") + F.col("rep")).cast("double").alias("v"),
            )
            .localCheckpoint()
        )
        n = docs.count()
        hot = docs.filter(F.col("lang") == "hotlang").count()
        outs = {}
        for label, ns in (("naive(1 window)", 1), ("range_sliced(256)", 256)):
            before = _stage_metrics_total(spark)
            t0 = _t.time()
            ranked = _range_sliced_rank(
                docs, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["lang"], n_slices=ns
            )
            chk = ranked.agg(
                F.expr("bit_xor(rank * doc_id)").alias("x"), F.sum("rank").alias("s")
            ).first()
            wall = _t.time() - t0
            after = _stage_metrics_total(spark)
            d = {k: after[k] - before[k] for k in after}
            outs[label] = (chk.x, chk.s)
            print(
                f"  {reps}x {label}: wall={wall:.1f}s checksum={chk.x} "
                f"spill_mem={d['mem_spill']/1e6:.0f}MB disk={d['disk_spill']/1e6:.0f}MB"
            )
        assert outs["naive(1 window)"] == outs["range_sliced(256)"]
        print(
            f"  {reps}x corpus={n} hot_stratum={hot} ({100*hot//n}%) — checksums identical"
        )
        docs.unpersist()


def probe_round10_funnel(spark):
    """Funnel chain (round-10 default) vs the retired collect_list fold
    under a single 90%-hot user at 20x (2M events, ~1.8M on user_id=0 —
    VERDICT r9 #1). The fold materializes the hot user's whole funnel
    timeline in ONE aggregation buffer; the chain's buffers are a single
    min(ts) each, so its hot-user cost is streaming row count only. Both
    must agree exactly."""
    import time as _t

    import mini_flink_spark.queries  # noqa: F401 (registry import contract)
    from mini_flink_spark.queries_ext import _funnel_stages

    print("== round10_funnel: chain vs fold, 20x events, 90% one user ==")
    for label, hot in (("uniform(control)", 0), ("hot_user(90%)", 9)):
        ev = _hot_user_events(spark, replicas=20, hot_frac=hot).localCheckpoint()
        n = ev.count()
        nhot = ev.filter(F.col("user_id") == 0).count()
        outs = {}
        for shape, naive in (("chain", False), ("fold(naive)", True)):
            before = _stage_metrics_total(spark)
            t0 = _t.time()
            out = {r["stage"]: r["n_users"] for r in _funnel_stages(ev, naive=naive).collect()}
            wall = _t.time() - t0
            after = _stage_metrics_total(spark)
            d = {k: after[k] - before[k] for k in after}
            outs[shape] = out
            print(
                f"  {label} {shape}: wall={wall:.1f}s stages={out} "
                f"shuffle_read={d['shuffle_read']/1e6:.1f}MB "
                f"spill_mem={d['mem_spill']/1e6:.0f}MB "
                f"disk={d['disk_spill']/1e6:.0f}MB "
                f"(corpus={n}, hot_user_rows={nhot})"
            )
        assert outs["chain"] == outs["fold(naive)"], f"{label} diverged"
        ev.unpersist()


def probe_round10_baskets(spark):
    """MAX_BASKET guard engagement (VERDICT r9 #1): a planted bot account
    with 50k distinct purchased items among 100k normal ~10-item users.
    Uncapped, the bot alone contributes |b|^2/2 = 1.25e9 pairs (two orders
    of magnitude more than the whole rest of the corpus); with the cap the
    broadcast anti-join drops it before any basket is collected, so wall
    time tracks the bot-free control and the bot's items never appear."""
    import time as _t

    import mini_flink_spark.queries  # noqa: F401 (registry import contract)
    from mini_flink_spark.queries_pipeline import _cooccurrence_lift

    print("== round10_baskets: co-occurrence bot guard, 100k users + 50k-item bot ==")
    users, per_user, bot_items = 100_000, 10, 50_000
    normal = spark.range(users * per_user).selectExpr(
        f"cast(id div {per_user} + 1 as string) AS user_id",
        "'purchase' AS event_type",
        # ~2k-item catalogue, per-user items pseudo-random but deterministic
        """concat('{"k": ', cast(pmod(xxhash64(id), 2000) as string), '}') AS props""",
    )
    bot = spark.range(bot_items).selectExpr(
        "'0' AS user_id",
        "'purchase' AS event_type",
        """concat('{"k": ', cast(id + 10000 as string), '}') AS props""",
    )
    walls = {}
    for label, ev in (("control(no bot)", normal), ("bot planted", normal.unionAll(bot))):
        t0 = _t.time()
        out = _cooccurrence_lift(ev).collect()
        walls[label] = _t.time() - t0
        top = [(r["item_a"], r["item_b"]) for r in out]
        bot_leak = [p for p in top if p[0] >= 10_000 or p[1] >= 10_000]
        print(
            f"  {label}: wall={walls[label]:.1f}s pairs_out={len(out)} "
            f"bot_items_in_output={len(bot_leak)} "
            f"(bot would add {bot_items * (bot_items - 1) // 2:.2e} pairs uncapped)"
        )
        assert not bot_leak
    assert walls["bot planted"] < 3 * walls["control(no bot)"] + 10, walls


def probe_round10_nslices(spark):
    """n_slices sensitivity for the range-sliced rank at the 4.5M-row hot
    stratum (VERDICT r9 #6): the per-row slice cost is O(1) codegen
    arithmetic (width_bucket), so 64 / 256 / 1024 should be within noise of
    each other — the knob trades nothing on this axis and only bounds the
    per-task sort at n/k. Checksums must agree across all three."""
    import time as _t

    from mini_flink_spark.queries_pipeline import _range_sliced_rank

    print("== round10_nslices: 1000x docs, 90% hot stratum, n_slices sweep ==")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = 1000
    docs = (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
        )
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.when(
                F.pmod(F.xxhash64("doc_id", "rep"), F.lit(10)) < 9,
                F.lit("hotlang"),
            )
            .otherwise(F.col("lang"))
            .alias("lang"),
            (F.length("text") + F.col("rep")).cast("double").alias("v"),
        )
        .localCheckpoint()
    )
    n, hot = docs.count(), docs.filter(F.col("lang") == "hotlang").count()
    chks = {}
    for ns in (64, 256, 1024):
        before = _stage_metrics_total(spark)
        t0 = _t.time()
        ranked = _range_sliced_rank(
            docs, [F.asc("v"), F.asc("doc_id")], F.col("v"), ["lang"], n_slices=ns
        )
        chk = ranked.agg(
            F.expr("bit_xor(rank * doc_id)").alias("x"), F.sum("rank").alias("s")
        ).first()
        wall = _t.time() - t0
        after = _stage_metrics_total(spark)
        d = {k: after[k] - before[k] for k in after}
        chks[ns] = (chk.x, chk.s)
        print(
            f"  n_slices={ns}: wall={wall:.1f}s "
            f"spill_mem={d['mem_spill']/1e6:.0f}MB disk={d['disk_spill']/1e6:.0f}MB "
            f"(corpus={n}, hot_stratum={hot})"
        )
    assert len(set(chks.values())) == 1, chks
    docs.unpersist()


def probe_round10_stream_hot(spark):
    """Streaming state under a 90%-HOT key at ~20x the r3 probe volume
    (VERDICT r9 #5) — the streaming twin of the batch skew probes. Two
    stateful shapes, RocksDB provider, per-batch numRowsTotal recorded:

    - session windows: the hot user's flood of events must MERGE into one
      open session per wave (state scales with distinct open sessions, not
      rows), and watermark expiry must keep the per-batch state flat;
    - stream-stream interval join: buffered state is time-bounded rows, so
      the hot key inflates MATCH OUTPUT (quadratic in its per-wave rows —
      inherent to the query's semantics) but state must still evict to ~a
      wave or two, never ratcheting toward the full input."""
    import datetime
    import os
    import tempfile

    for k, v in __import__(
        "mini_flink_spark.session", fromlist=["rocksdb_state_conf"]
    ).rocksdb_state_conf().items():
        spark.conf.set(k, v)

    waves, per_wave, hot_frac = 10, 40_000, 0.9
    hot_rows = int(per_wave * hot_frac)
    src = tempfile.mkdtemp(prefix="probe_r10_hot_src_")
    base = datetime.datetime(2026, 1, 1)
    stamped: set[str] = set()
    for i in range(waves):
        ts = base + datetime.timedelta(minutes=20 * i)
        (
            spark.range(per_wave)
            .selectExpr(
                # 90% of each wave's rows collapse onto user 0
                f"CASE WHEN id < {hot_rows} THEN 0 ELSE id + {i} * {per_wave} END AS user_id",
                # events spread over 4 minutes inside the wave (gap < 5 min
                # -> the hot user's wave merges into ONE session)
                f"timestamp'{ts:%Y-%m-%d %H:%M:%S}' + make_interval(0,0,0,0,0,0, id % 240) AS ts",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in stamped:
                os.utime(os.path.join(src, f), (1_000_000 + i, 1_000_000 + i))
                stamped.add(f)

    # -- shape 1: session windows --------------------------------------
    stream = (
        spark.readStream.format("parquet")
        .schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sess = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="probe_r10_sess_ckpt_")
    q = (
        sess.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    sess_state = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    q.stop()
    uniq_per_wave = per_wave - hot_rows + 1
    print(
        f"  session_windows hot90: input={waves * per_wave} "
        f"open_sessions_per_wave~{uniq_per_wave} state_rows_per_batch={sess_state}",
        flush=True,
    )
    peak = max(sess_state)
    # state must track open sessions (~2 waves of distinct users while the
    # watermark lags), NEVER per-row volume: the hot user's 36k rows/wave
    # must be ONE session row
    assert peak <= 3 * uniq_per_wave, (
        f"session state grew to {peak} rows (~rows, not sessions) — "
        f"the hot user's events are not merging/evicting"
    )

    # -- shape 2: stream-stream interval join under the hot key ---------
    # smaller waves: the hot key's matches are quadratic BY SEMANTICS
    # (hot_clicks x hot_purchases within the interval); the probe sizes
    # that to ~1M output while keeping per-batch state observable
    jwaves, jper, jhot = 6, 1_000, 400
    jsrc = tempfile.mkdtemp(prefix="probe_r10_join_src_")
    stamped = set()
    for i in range(jwaves):
        ts = base + datetime.timedelta(minutes=20 * i)
        (
            spark.range(jper)
            .selectExpr(
                f"CASE WHEN id < {jhot} THEN 0 ELSE id + {i} * {jper} END AS user_id",
                f"timestamp'{ts:%Y-%m-%d %H:%M:%S}' AS c_ts",
                f"timestamp'{ts:%Y-%m-%d %H:%M:%S}' + interval 2 minutes AS p_ts",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(jsrc)
        )
        for f in os.listdir(jsrc):
            if f.endswith(".parquet") and f not in stamped:
                os.utime(os.path.join(jsrc, f), (1_000_000 + i, 1_000_000 + i))
                stamped.add(f)

    schema = "user_id bigint, c_ts timestamp, p_ts timestamp"

    def reader():
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(jsrc)
        )

    clicks = (
        reader().select("user_id", "c_ts").withWatermark("c_ts", "10 minutes").alias("c")
    )
    purchases = (
        reader().select("user_id", "p_ts").withWatermark("p_ts", "10 minutes").alias("p")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c.user_id = p.user_id AND p_ts >= c_ts "
            "AND p_ts <= c_ts + interval 5 minutes"
        ),
    )
    ckpt = tempfile.mkdtemp(prefix="probe_r10_join_ckpt_")
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    join_state = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    out_rows = sum(
        p.get("sink", {}).get("numOutputRows", 0) or 0 for p in q.recentProgress
    )
    q.stop()
    expect_matches = jwaves * (jhot * jhot + (jper - jhot))
    print(
        f"  stream_join hot90ish: input={jwaves * jper * 2} matches={out_rows} "
        f"(semantic quadratic: expected {expect_matches}) "
        f"state_rows_per_batch={join_state}",
        flush=True,
    )
    assert out_rows == expect_matches, (out_rows, expect_matches)
    peak = max(join_state)
    # both sides of ~2 waves resident before the watermark crosses; the hot
    # key must not keep state from evicting
    assert peak <= 6 * jper, (
        f"join state grew to {peak} rows under the hot key — eviction broken"
    )


def probe_round11_pagerank(spark):
    """VERDICT r10 #1 closure evidence: the degree fold vs the retired
    per-iteration `broadcast(deg)`. Both shapes run on the same 20× event
    corpus (2M events, 20× user cardinality); ranks must be IDENTICAL
    (integer micro-units — no float tolerance), and the fold must not pay
    more shuffle or wall. The point at 100 TB isn't this wall delta — it's
    that the old shape builds a node-count-sized broadcast ON THE DRIVER
    three times per run (multi-GB at 10⁸ items) while the new shape ships
    the degree inside the already-partitioned edge rows."""
    import os
    import tempfile

    import mini_flink_spark.queries  # noqa: F401 (registry import contract)
    from mini_flink_spark.queries_pipeline import (
        _item_copurchase_edges,
        pagerank_plan,
    )

    print("== round11_pagerank: degree fold vs per-iteration broadcast(deg), 20x ==")
    path = tempfile.mkdtemp(prefix="pr20x_") + "/events.parquet"
    dense_events(spark).write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)

    def old_shape():
        # the retired r10 shape, reconstructed: separate deg frame, forced
        # node-sized broadcast every iteration
        edges = _item_copurchase_edges(ev).drop("d")
        deg = edges.groupBy("src").agg(
            F.count(F.lit(1)).cast("bigint").alias("d")
        )
        n_nodes = deg.count()
        ranks = deg.select(
            F.col("src").alias("item"),
            F.lit(1000000 // n_nodes).cast("bigint").alias("r"),
        )
        base = (1000000 - 850000) // n_nodes
        for _ in range(3):
            ranks = (
                edges.join(ranks.withColumnRenamed("item", "src"), "src")
                .join(F.broadcast(deg), "src")
                .select("dst", F.expr("r div d").alias("contrib"))
                .groupBy("dst")
                .agg(F.sum("contrib").cast("bigint").alias("s"))
                .select(
                    F.col("dst").alias("item"),
                    (F.lit(base) + F.expr("(85 * s) div 100"))
                    .cast("bigint")
                    .alias("r"),
                )
            )
        return ranks.select("item", F.col("r").alias("rank_micros"))

    results, stats = {}, {}
    for label, build in (("old broadcast(deg)", old_shape),
                         ("new degree column", lambda: pagerank_plan(ev))):
        before = _stage_metrics_total(spark)
        t0 = time.time()
        rows = build().collect()
        dt = time.time() - t0
        after = _stage_metrics_total(spark)
        results[label] = {r["item"]: r["rank_micros"] for r in rows}
        stats[label] = {
            "wall": dt,
            "shuffle": after["shuffle_write"] - before["shuffle_write"],
            "spill": after["disk_spill"] - before["disk_spill"],
        }
        print(
            f"  {label}: wall={dt:.1f}s nodes={len(rows)} "
            f"shuffle_write={stats[label]['shuffle'] / 1e6:.1f}MB "
            f"spill={stats[label]['spill']}",
            flush=True,
        )
    assert results["old broadcast(deg)"] == results["new degree column"], (
        "rank maps diverged between the shapes"
    )
    assert stats["new degree column"]["wall"] < 2 * stats["old broadcast(deg)"]["wall"] + 10
    os.system(f"rm -rf {os.path.dirname(path)}")


def probe_round11_fineweb_1000x(spark):
    """VERDICT r10 #4: re-certify the fineweb flagship's linear-scaling
    claim on the CURRENT plan and push one step further: 200× (1M docs)
    then 1000× (5M docs) in one session, with per-step shuffle/spill
    deltas.

    Both legs run with the broadcast threshold DISABLED. The first cut of
    this probe compared default-config legs and "found" shuffle ×16.7 at
    ×5 docs — a regime mix, not super-linearity: at ≤2M gated docs every
    join in the pipeline fits under the 64 MB broadcast threshold (0.31 GB
    total shuffle, all-BHJ), at 5M they flip to sort-merge and both sides
    shuffle. At 100 TB nothing corpus-derived broadcasts, so the SMJ
    regime IS the plan whose scaling matters — forcing it at both points
    measures that plan's slope and surfaced two real defects on the way:
    the forced broadcast(comp) (now unhinted) and the string-payload
    band/verify exchanges (now 8-byte hashes; −40% shuffle, spill → 0,
    A/B in SCALE_NOTES r11). Linear means ~5× shuffle and wall for the
    5× corpus, zero spill at both points."""
    import shutil
    import tempfile

    from mini_flink_spark.queries import QUERIES

    print("== round11_fineweb_1000x: fineweb at 1M and 5M docs, SMJ regime ==")
    prev = {}
    for key in ("spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold"):
        try:
            prev[key] = spark.conf.get(key)
        except Exception:  # noqa: BLE001 — unset conf
            prev[key] = None
        spark.conf.set(key, "-1")
    out = {}
    try:
        for families, label in ((40, "200x/1M"), (200, "1000x/5M")):
            d = tempfile.mkdtemp(prefix=f"fw{families}_")
            _family_docs(spark, families).write.mode("overwrite").parquet(
                d + "/documents.parquet"
            )
            n_docs = spark.read.parquet(d + "/documents.parquet").count()
            before = _stage_metrics_total(spark)
            t0 = time.time()
            QUERIES["curation_pipeline_fineweb"].fn(spark, d).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_metrics_total(spark)
            out[label] = {
                "docs": n_docs,
                "wall": dt,
                "shuffle": after["shuffle_write"] - before["shuffle_write"],
                "spill": after["disk_spill"] - before["disk_spill"],
            }
            print(
                f"  {label}: docs={n_docs} wall={dt:.1f}s "
                f"shuffle_write={out[label]['shuffle'] / 1e9:.2f}GB "
                f"disk_spill={out[label]['spill']}",
                flush=True,
            )
            shutil.rmtree(d, ignore_errors=True)
    finally:
        for key, val in prev.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
    ratio_w = out["1000x/5M"]["wall"] / out["200x/1M"]["wall"]
    ratio_s = out["1000x/5M"]["shuffle"] / max(out["200x/1M"]["shuffle"], 1)
    print(f"  5x corpus -> wall x{ratio_w:.2f}, shuffle x{ratio_s:.2f}", flush=True)
    assert out["1000x/5M"]["spill"] == 0, "1000x run spilled to disk"
    # linear band: shuffle must track the corpus (5x +/- 30%); wall gets a
    # wider band (ambient load) but must stay clearly sub-quadratic
    assert 3.5 <= ratio_s <= 6.5, ratio_s
    assert ratio_w <= 10, ratio_w


PROBES = {
    "round11_pagerank": probe_round11_pagerank,
    "round11_fineweb_1000x": probe_round11_fineweb_1000x,
    "round10_funnel": probe_round10_funnel,
    "round10_baskets": probe_round10_baskets,
    "round10_nslices": probe_round10_nslices,
    "round10_stream_hot": probe_round10_stream_hot,
    "round9_events": probe_round9_events,
    "round9_rank": probe_round9_rank,
    "round8_cumsum": probe_round8_cumsum,
    "round8_sink": probe_round8_sink,
    "round8_lines": probe_round8_lines,
    "round8_pref_skew": probe_round8_pref_skew,
    "round8_manifest": probe_round8_manifest,
    "round8_xxhash": probe_round8_xxhash,
    "embedding_cosine": probe_embedding_cosine,
    "curation_100x": probe_curation_100x,
    "kmeans_largek": probe_kmeans_largek,
    "streaming_state": probe_streaming_state,
    "semdedup": probe_semdedup,
    "round3_events": probe_round3_events,
    "round3_docs": probe_round3_docs,
    "round3_late": probe_round3_late,
    "dedup_100x": probe_dedup_100x,
    "round4_new": probe_round4_new,
    "round5_lm": probe_round5_lm,
    "round5_fineweb": probe_round5_fineweb,
    "round6_fineweb_max": probe_round6_fineweb_max,
    "round6_skew_join": probe_round6_skew_join,
    "round6_join_state": probe_round6_join_state,
    "round7_linkage": probe_round7_linkage,
    "round7_phash": probe_round7_phash,
    "round7_compaction": probe_round7_compaction,
}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # UI enabled: the dedup_100x probe reads per-stage shuffle/spill metrics
    # from the REST status API; harmless for the other probes.
    from mini_flink_spark.session import get_spark as _g

    spark = _g(extra_conf={"spark.ui.enabled": "true"})
    for name, fn in PROBES.items():
        if which in (name, "all"):
            fn(spark)
