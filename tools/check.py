"""Local oracle-parity harness mimicking the driver's t2 gate.

Runs every registered query on Spark AND its DuckDB oracle twin on the
same parquet, compares row count, column-name set, and an
order-insensitive multiset of canonicalized rows (columns sorted by
name — same convention as the driver).  Exact equality required; float
near-misses are reported with max-abs-diff to speed diagnosis.

Usage:
    python tools/check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    try:  # Decimal -> float for cross-engine comparison
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def near(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isclose(a, b, rel_tol=tol, abs_tol=tol):
            return abs(a - float(b))
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        diffs = [near(x, y, tol) for x, y in zip(a, b)]
        if all(d is not None for d in diffs):
            return max(diffs, default=0.0)
    return 0.0 if a == b else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--driver-default",
        action="store_true",
        help="run under a PLAIN SparkSession.builder session (Spark-4 "
        "defaults: ANSI on, unknown timezone/conf state) — the gate "
        "proving every query normalizes any session it is handed",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from mo_etl_spark.session import get_spark
    from mo_etl_spark.tables import TABLES

    if args.driver_default:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("check-dd").getOrCreate()
    else:
        spark = get_spark(app_name="check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            status = "ROWS " if len(srows) >= 0 else "FAIL"
            print(f"{status} {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            cs, cd = canon_rows(scols, srows), canon_rows(dcols, drows)
            if cs != cd:
                maxdiff, first = None, None
                for i, (a, b) in enumerate(zip(cs, cd)):
                    if a != b:
                        d = near(a, b, tol=1e-6)
                        if d is None:
                            first = first or (i, a, b)
                            maxdiff = None
                            break
                        maxdiff = max(maxdiff or 0.0, d)
                if maxdiff is not None:
                    problems.append(f"float near-miss max_abs_diff={maxdiff:.3g}")
                else:
                    i, a, b = first or (0, cs[0], cd[0])
                    problems.append(f"value mismatch at sorted-row {i}:\n  spark : {a!r}\n  duckdb: {b!r}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS  {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail of {len(names)}")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
