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


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class — the granularity at which the DRIVER's
    canonicalized value-hash is representation-sensitive (int64 `1085`
    hashes differently from float64 `1085.0`; float32 vs float64 of the
    same value render identically once both print as floats)."""
    t = pd.api.types
    if t.is_bool_dtype(s):
        return "bool"
    if t.is_integer_dtype(s):
        return "int"
    if t.is_float_dtype(s):
        return "float"
    if t.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str | None]:
    """STRICT mirror of the driver comparator: (match, why_not).

    Dtype CLASSES must agree per column before any value comparison — the
    round-6 lesson (`priority_shipping_counts`): an int-vs-float pairing
    routed through np.allclose "matched" locally while the driver's
    representation-sensitive hash diverged on `1085` vs `1085.0`. This was
    the second masking leniency in two rounds (round 5: list->tuple); the
    tolerance branch is now reserved for float-vs-float ONLY."""
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False, "columns/rows differ"
    for c in a.columns:
        av, bv = a[c], b[c]
        ca, cb = dtype_class(av), dtype_class(bv)
        if ca != cb:
            return False, f"dtype class of {c!r}: spark={ca} vs oracle={cb}"
        if ca == "float":
            import numpy as np

            # rtol matters: big DECIMAL sums cast to DOUBLE carry ulp
            # (~1e-16 relative) noise from decimal-cast boundaries; a
            # pure-absolute tolerance flags 1e9-magnitude sums spuriously
            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-12, atol=1e-9, equal_nan=True
            ):
                return False, f"float values of {c!r} differ"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                return False, f"values of {c!r} differ"
    return True, None


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
                ns, no = normalize(spdf), normalize(odf)
                # dtype classes recorded per query so rotation
                # pre-certification catches representation drift mechanically
                # (VERDICT r6 #2) — tests/test_grade_artifact.py sweeps these
                row["spark_dtypes"] = {c: dtype_class(ns[c]) for c in ns.columns}
                row["oracle_dtypes"] = {c: dtype_class(no[c]) for c in no.columns}
                row["values_match"], row["why"] = values_equal(ns, no)
                if row["why"] is None:
                    del row["why"]
            except Exception as exc:  # noqa: BLE001
                row["values_match"] = False
                row["cmp_err"] = str(exc)[:200]
        results[name] = row
        flag = "" if row.get("values_match", row["rows_match"]) else f"  <-- MISMATCH {row.get('why', row.get('cmp_err', ''))}"
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
