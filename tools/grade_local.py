"""Local mimic of the driver's correctness pass: run every registered query
at sf0.01, run its DuckDB oracle, compare (rows / schema-ish / sorted-value
equality), and — the point — TIME both sides so slow queries surface before
the driver's budget does.

Usage:
    python tools/grade_local.py [--sf /root/testdata/sf0.01] [--only name ...]
    python tools/grade_local.py --timings-only   # skip value compare (fast)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import duckdb
import pandas as pd


def oracle_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Match the DRIVER's canonicalizer exactly: sort columns by name, then
    sort rows with plain pandas sort_values and let it RAISE on unsortable
    cells (lists/maps). Round 5 learned the hard way that a list->tuple
    leniency here silently certifies queries the driver cannot grade
    (CORRECTNESS_r05 pq_codes: "unhashable type: 'list'") — the graded
    contract is scalar-only columns, pinned by tests/test_graded_shapes.py."""
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                import numpy as np

                # rtol matters: big DECIMAL sums cast to DOUBLE carry ulp
                # (~1e-16 relative) noise from decimal-cast boundaries; a
                # pure-absolute tolerance flags 1e9-magnitude sums spuriously
                if not np.allclose(
                    av.astype(float),
                    bv.astype(float),
                    rtol=1e-12,
                    atol=1e-9,
                    equal_nan=True,
                ):
                    return False
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    return False
        except Exception:
            if not av.astype(str).equals(bv.astype(str)):
                return False
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--timings-only", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from mini_flink_spark.queries import all_oracles, all_queries
    from mini_flink_spark.session import get_spark

    # progress bars rewrite the current line with \r and can clobber result
    # lines (a MISMATCH flag overwritten by a stage bar reads as a pass)
    spark = get_spark(
        "grade-local", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs, oracles = all_queries(), all_oracles()
    names = args.only or list(qs)
    con = oracle_conn(args.sf)

    results: dict[str, dict] = {}
    t_total0 = time.time()
    for name in names:
        row: dict = {}
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spdf = sdf.toPandas()
            row["spark_s"] = round(time.time() - t0, 2)
            row["spark_rows"] = len(spdf)
        except Exception as exc:  # noqa: BLE001
            row["spark_s"] = round(time.time() - t0, 2)
            row["err"] = f"spark: {type(exc).__name__}: {exc}"[:300]
            results[name] = row
            print(f"{name:35s} SPARK-ERR {row['spark_s']:7.1f}s  {row['err'][:80]}")
            continue
        osql = oracles.get(name)
        if osql is None:
            results[name] = row
            print(f"{name:35s} rows={row['spark_rows']:<7} spark={row['spark_s']:6.1f}s  (no oracle)")
            continue
        t1 = time.time()
        try:
            odf = con.execute(osql).df()
            row["oracle_s"] = round(time.time() - t1, 2)
            row["oracle_rows"] = len(odf)
        except Exception as exc:  # noqa: BLE001
            row["oracle_s"] = round(time.time() - t1, 2)
            row["err"] = f"oracle: {type(exc).__name__}: {exc}"[:300]
            results[name] = row
            print(f"{name:35s} ORACLE-ERR {row['oracle_s']:6.1f}s  {row['err'][:80]}")
            continue
        row["rows_match"] = row["spark_rows"] == row["oracle_rows"]
        if not args.timings_only:
            try:
                row["values_match"] = values_equal(normalize(spdf), normalize(odf))
            except Exception as exc:  # noqa: BLE001
                row["values_match"] = False
                row["cmp_err"] = str(exc)[:200]
        results[name] = row
        flag = "" if row.get("values_match", row["rows_match"]) else "  <-- MISMATCH"
        print(
            f"{name:35s} rows={row['spark_rows']:<7} spark={row['spark_s']:6.1f}s "
            f"oracle={row.get('oracle_s', 0):6.1f}s{flag}"
        )

    total = round(time.time() - t_total0, 1)
    print(f"\nTOTAL {total}s for {len(names)} queries")
    slow = sorted(
        results.items(),
        key=lambda kv: -(kv[1].get("spark_s", 0) + kv[1].get("oracle_s", 0)),
    )[:15]
    print("slowest:")
    for n, r in slow:
        print(f"  {n:35s} spark={r.get('spark_s', 0):6.1f}s oracle={r.get('oracle_s', 0):6.1f}s")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"total_s": total, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
