"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() twin on
DuckDB at sf0.01, compare row count + column names + order-insensitive
values. Usage: python scripts/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from searty_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cpus=8, shuffle_partitions=8, driver_memory="6g", app_name="check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, osql = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in osql:
            print(f"{name:24s} rows-only  n={len(srows)}")
            continue
        res = con.sql(osql[name])
        dcols = res.columns
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        ok_vals = ok_cols and canon(srows, scols) == canon(drows, dcols)
        status = "OK" if (ok_cols and ok_n and ok_vals) else "FAIL"
        print(f"{name:24s} {status}  n_spark={len(srows)} n_duck={len(drows)} cols={'=' if ok_cols else f'{scols} vs {dcols}'}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols:
                a, b = canon(srows, scols), canon(drows, dcols)
                sa, sb = set(a), set(b)
                for x in list(sa - sb)[:3]:
                    print("   spark-only:", x)
                for x in list(sb - sa)[:3]:
                    print("   duck-only :", x)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
