"""Driver-side query-CONSTRUCTION latency audit.

BENCH_r04's pq_adc_topk outlier (12.7 s driver-recorded vs 2.9 s quiet) was
pure construction cost: literal arrays built one py4j round-trip per element
amplify with machine load. This tool times `fn(spark, sf_dir)` for every
registered query WITHOUT executing the returned plan, separating driver-side
build latency from executor work. Iterative trainers (kmeans/PQ/BPE/coreset/
CC-based queries) legitimately run jobs during construction — they are
reported in their own section, not mixed into the pure-build ranking.

Usage: python tools/construction_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

# queries whose construction intentionally RUNS Spark jobs (model fitting /
# index builds / convergence loops / eager persists) — build time here is
# execution, not py4j
EXECUTES_ON_BUILD = {
    "kmeans_clusters",
    "pq_codes",
    "pq_adc_topk",
    "ivf_recall_eval",
    "ann_topk_ivf",
    "ann_topk_ivf_persisted",
    "bpe_learn_merges",
    "bpe_encode_docs",
    "tokenizer_fertility",
    "coreset_kcenter",
    "cluster_representatives",
    "cluster_label_purity",
    "dedup_semantic_semdedup",
    "semantic_decontamination",
    "dedup_representatives",
    "dedup_components",
    "dedup_cluster_stats",
    "dedup_embedding_components",
    "dedup_impact_report",
    "curation_pipeline_fineweb",
    "text_search_bm25_persisted",
    "mixture_weights",
    "mixture_weights_temperature",
    "dsir_importance_weights",
    "curriculum_global_rank",
    "warc_ingest_roundtrip",  # writes the WARC fixture (1-row barrier) at build
    "jsonl_ingest_roundtrip",  # writes the JSONL fixture at build
    "csv_ingest_roundtrip",  # writes the CSV fixture at build
    "compaction_small_files",  # writes the partitioned layout at build
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.session import get_spark

    spark = get_spark("construction-audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # session warm

    # two passes: the first absorbs one-time session costs (conf apply,
    # parquet schema reads, codegen of fit jobs); the SECOND build is the
    # steady-state construction latency a bench/timed pass actually pays.
    names = [n for n in QUERIES if "streaming" not in n]
    for name in names:
        try:
            QUERIES[name].fn(spark, args.sf)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {exc}", file=sys.stderr)

    pure: dict[str, float] = {}
    execs: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            QUERIES[name].fn(spark, args.sf)
        except Exception:  # noqa: BLE001
            continue
        dt = (time.perf_counter() - t0) * 1000
        (execs if name in EXECUTES_ON_BUILD else pure)[name] = dt

    print(f"\npure-build construction, top {args.top} (ms, sf={args.sf}):")
    for n, ms in sorted(pure.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {n:36s} {ms:8.1f}")
    p = sorted(pure.values())
    print(
        f"  [n={len(p)} median={p[len(p)//2]:.1f} p90={p[int(len(p)*0.9)]:.1f} "
        f"max={p[-1]:.1f}]"
    )
    print(f"\nexecutes-on-build (fit/index during construction), top {args.top}:")
    for n, ms in sorted(execs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {n:36s} {ms:8.1f}")


if __name__ == "__main__":
    main()
