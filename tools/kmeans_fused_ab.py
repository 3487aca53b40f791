#!/usr/bin/env python
"""Round-12 experiment (VERDICT r11 #3 adjudication evidence): fuse kmeans_fit's per-iteration collect round-trips
into one Spark action (chained one-row broadcast aggregates), verify
identical centroids, count jobs and time both shapes."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mini_flink_spark.functions.clustering import (
    _centroid_lit,
    assign_clusters,
    kmeans_fit,
    sq_dist,
)
from mini_flink_spark.session import get_spark


def kmeans_fit_fused(df, vec_col="v", id_col="id", k=8, iters=3):
    cents = [r[0] for r in df.select(vec_col).orderBy(id_col).limit(k).collect()]
    if not cents:
        raise ValueError("kmeans_fit: input DataFrame is empty")
    k = min(k, len(cents))
    d = len(cents[0])
    if iters <= 0:
        return cents
    base = df.select(F.col(vec_col).alias("v"))
    cents_col = _centroid_lit(cents)  # round-1 centroids (literal)
    cur = base
    one_row = None
    for t in range(iters):
        dists = F.transform(cents_col, lambda c: F.round(sq_dist(F.col("v"), c), 6))
        assigned = cur.withColumn("cid", F.array_position(dists, F.array_min(dists)) - 1)
        means = assigned.groupBy("cid").agg(
            F.array(*[F.round(F.avg(F.col("v")[i]), 12) for i in range(d)]).alias("cent")
        )
        mrow = means.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("cid").cast("int"), "cent"))
            ).alias(f"m{t}")
        )
        prev = cents_col
        mcol = F.col(f"m{t}")
        cents_col = F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.coalesce(mcol[i.cast("int")], F.element_at(prev, i.cast("int") + 1)),
        )
        one_row = mrow if one_row is None else one_row.crossJoin(F.broadcast(mrow))
        cur = cur.crossJoin(F.broadcast(mrow))
    final = one_row.select(cents_col.alias("cents")).collect()[0][0]
    return [[float(x) for x in c] for c in final]


def job_count(spark):
    import json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{apps[0]['id']}/jobs")
    )
    return len(jobs)


def main():
    spark = get_spark(app_name="kmeans-ab", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)
    print("rows:", base.count())

    # warm both paths once
    kmeans_fit(base, "v", "id", 8, 3)
    kmeans_fit_fused(base, "v", "id", 8, 3)

    for label, fn in (("old", kmeans_fit), ("fused", kmeans_fit_fused)) * 3:
        j0, t0 = job_count(spark), time.time()
        cents = fn(base, "v", "id", 8, 3)
        dt, dj = time.time() - t0, job_count(spark) - j0
        print(f"{label:6s} wall={dt:6.3f}s jobs={dj}")

    a = kmeans_fit(base, "v", "id", 8, 3)
    b = kmeans_fit_fused(base, "v", "id", 8, 3)
    print("centroids identical:", a == b)
    if a != b:
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print("  first diff at cid", i)
                print("   old:", x[:4])
                print("   new:", y[:4])
                break


if __name__ == "__main__":
    main()
