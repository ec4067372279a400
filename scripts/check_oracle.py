"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark at sf0.01 and the matching oracle_sql() on DuckDB, compare
row-count + schema + order-insensitive values.

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:]
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = [c.lower() for c in scols] == [c.lower() for c in ocols]
        ok_count = len(srows) == len(orows)
        sn, on = norm(srows), norm(orows)
        ok_vals = sn == on
        status = "OK  " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)}"
            f" cols={'ok' if ok_cols else (scols, ocols)}"
            f" vals={'ok' if ok_vals else 'MISMATCH'} [{time.time()-t0:.1f}s]"
        )
        if not (ok_cols and ok_count and ok_vals):
            failures.append(name)
            if ok_count and not ok_vals:
                diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
                for a, b in diffs:
                    print(f"    spark={a}\n    duck ={b}")
    print("\nFAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
