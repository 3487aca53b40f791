"""Isolated mover adjudication: fresh session, warm each named query at
sf0.001 (codegen outside the clock), then time it at sf0.1 through the noop
sink — the bench's methodology minus the 211-query sweep's session state.

Usage: python tools/isolated_rerun.py name1 name2 ... [--n 2]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.session import get_spark

    spark = get_spark(app_name="isolated-rerun")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        gc.collect()
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"timed:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            gc.collect()
        print(f"{name:35s} {runs}", flush=True)


if __name__ == "__main__":
    main()
