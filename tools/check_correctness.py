"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and order-insensitive values.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from buzz_rust_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df) -> list[tuple]:
    """Order-insensitive canonical form of a pandas DataFrame."""
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.9g}")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                vals.append(str([f"{x:.9g}" if isinstance(x, float) else str(x) for x in v]))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            status = "ROWS-ONLY"
            print(f"{status:9s} {name}: {len(sdf)} rows ({elapsed:.1f}s)")
            if len(sdf) == 0 and name not in ("z01_simhash",):
                print(f"  WARNING: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        ok = True
        if len(sdf) != len(odf):
            ok = False
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            print(
                f"FAIL  {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            )
        if ok:
            cs, co = canon(sdf), canon(odf)
            if cs != co:
                ok = False
                diff = [i for i, (a, b) in enumerate(zip(cs, co)) if a != b][:3]
                print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
                for i in diff:
                    print(f"   spark : {cs[i]}")
                    print(f"   oracle: {co[i]}")
        if ok:
            print(f"OK        {name}: {len(sdf)} rows ({elapsed:.1f}s)")
        else:
            failures.append(name)
    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
