#!/usr/bin/env python
"""Round-12 profiler: name the 2M-doc forced-SMJ wall in the MinHash pair
pipeline (VERDICT r11 next-round #1).

Reconstructs minhash_lsh_pairs phase by phase on the 1000x-probe family
corpus (80 families = 2M docs by default) with the broadcast threshold
disabled (the 100 TB regime), materializing each phase through the noop
sink and diffing UI REST stage metrics between phases:

  A base    - tokenize + shingle + hash-array materialization (checkpoint)
  B sig     - explode shingles -> k=16 seeded md5 hashes -> per-doc min fold
  C cand    - band explode + hot-bucket cap + band self-join + distinct
  D verify  - cand JOIN base(a) JOIN base(b) + array_intersect + threshold

Phases share the phase-A checkpoint exactly as the real operator does, so
B/C/D measure only their own increment. Per-phase: wall, executorRunTime,
executorCpuTime (runTime-cpuTime gap = fetch wait/spill/IO), shuffle
read/write bytes, spill. Usage:

    python tools/profile_minhash.py [families] [--xxhash]

--xxhash swaps seeded_hash for the documented at-scale fast_seeded_hash in
phase B only (NOT oracle-portable; a bound-measurement, not a product path).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def stage_metrics(spark):
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE"
        )
    )
    tot = {
        "run_ms": 0,
        "cpu_ms": 0,
        "shuffle_read": 0,
        "shuffle_write": 0,
        "disk_spill": 0,
        "mem_spill": 0,
        "fetch_wait_ms": 0,
        "write_time_ms": 0,
    }
    for s in stages:
        tot["run_ms"] += s.get("executorRunTime", 0)
        tot["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["fetch_wait_ms"] += s.get("shuffleFetchWaitTime", 0)
        tot["write_time_ms"] += s.get("shuffleWriteTime", 0) // 1_000_000
    return tot


def main() -> None:
    families = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 80
    use_xxhash = "--xxhash" in sys.argv

    from mini_flink_spark.functions.dedup import (
        LSH_BANDS,
        MAX_BAND_BUCKET,
        MINHASH_K,
        minhash_bands,
        shingled,
    )
    from mini_flink_spark.functions.hashing import (
        fast_seeded_hash,
        portable_hash64,
        seeded_hash,
    )
    from mini_flink_spark.session import get_spark

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from stress_probe import _family_docs  # noqa: E402

    spark = get_spark(
        app_name=f"profile-minhash-{families}f",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for key in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(key, "-1")

    import tempfile

    d = tempfile.mkdtemp(prefix=f"mh_prof_{families}_")
    _family_docs(spark, families).write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )
    docs = spark.read.parquet(d + "/documents.parquet")
    n_docs = docs.count()
    print(f"== minhash profile: families={families} docs={n_docs} "
          f"xxhash={use_xxhash} ==", flush=True)

    k, bands, threshold = MINHASH_K, LSH_BANDS, 0.5
    seeder = fast_seeded_hash if use_xxhash else seeded_hash

    phases: dict[str, dict] = {}

    def run_phase(label: str, build) -> "DataFrame":
        # `build` is a THUNK: under AQE, localCheckpoint(eager=False) already
        # materializes every upstream shuffle stage at *definition* time
        # (AdaptiveSparkPlanExec.getFinalPhysicalPlan), so construction must
        # sit inside the timed region or the phase attribution lies.
        spark.sparkContext.setJobDescription(f"minhash-profile:{label}")
        before = stage_metrics(spark)
        t0 = time.time()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        after = stage_metrics(spark)
        phases[label] = {"wall": round(wall, 1)} | {
            key: after[key] - before[key] for key in before
        }
        p = phases[label]
        print(
            f"  {label:7s} wall={p['wall']:7.1f}s run={p['run_ms']/1e3:8.1f}s "
            f"cpu={p['cpu_ms']/1e3:8.1f}s fetchwait={p['fetch_wait_ms']/1e3:6.1f}s "
            f"sh_rd={p['shuffle_read']/1e9:6.2f}GB sh_wr={p['shuffle_write']/1e9:6.2f}GB "
            f"spill={p['disk_spill']/1e9:5.2f}GB",
            flush=True,
        )
        return df

    # --- phase A: base materialization (the shared checkpoint) ---
    def build_base():
        return (
            shingled(docs, "doc_id", "text", 3)
            .withColumn(
                "sh_h",
                F.array_distinct(F.transform("sh", lambda s: portable_hash64(s))),
            )
            .withColumn("n_sh", F.array_size("sh_h"))
            .localCheckpoint(eager=False)
        )

    base = run_phase("A:base", build_base)

    # --- phase B: signature (increment: explode + k seeded hashes + min fold)
    def build_sig():
        sh_rows = base.select("id", F.explode("sh").alias("s"))
        hash_cols = [seeder(F.col("s"), i).alias(f"h{i}") for i in range(k)]
        return (
            sh_rows.select("id", *hash_cols)
            .groupBy("id")
            .agg(F.array(*[F.min(f"h{i}") for i in range(k)]).alias("sig"))
            .localCheckpoint(eager=False)
        )

    sig = run_phase("B:sig", build_sig)

    # --- phase C: banding + cap + self-join + distinct pairs ---
    def build_cand():
        banded = sig.select(
            "id", F.explode(minhash_bands(F.col("sig"), k, bands)).alias("band_s")
        ).select("id", portable_hash64(F.col("band_s")).alias("band"))
        banded = banded.localCheckpoint(eager=False)
        hot = (
            banded.groupBy("band")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > MAX_BAND_BUCKET)
            .select("band")
        )
        banded = banded.join(F.broadcast(hot), "band", "left_anti")
        return (
            banded.alias("l")
            .join(banded.alias("r"), on="band")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    cand = run_phase("C:cand", build_cand)
    n_cand = cand.count()
    print(f"  candidates: {n_cand}", flush=True)

    # --- phase D: verify joins + intersect + threshold ---
    def build_verified():
        lhs = base.select(
            F.col("id").alias("a"),
            F.col("sh_h").alias("sh_a"),
            F.col("n_sh").alias("na"),
        )
        rhs = base.select(
            F.col("id").alias("b"),
            F.col("sh_h").alias("sh_b"),
            F.col("n_sh").alias("nb"),
        )
        return (
            cand.join(lhs, "a")
            .join(rhs, "b")
            .withColumn("inter", F.array_size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )

    verified = run_phase("D:verify", build_verified)
    n_pairs = verified.count()
    print(f"  pairs: {n_pairs}", flush=True)

    total_wall = sum(p["wall"] for p in phases.values())
    print(f"  TOTAL wall={total_wall:.1f}s  breakdown:", flush=True)
    for label, p in phases.items():
        print(
            f"    {label:7s} {p['wall']:7.1f}s ({100*p['wall']/total_wall:4.1f}%) "
            f"cpu-bound={'yes' if p['cpu_ms'] > 0.8*p['run_ms'] else 'no '} "
            f"(cpu/run={p['cpu_ms']/max(p['run_ms'],1):.2f})",
            flush=True,
        )

    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
