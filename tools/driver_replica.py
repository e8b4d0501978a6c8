"""Replicate the correctness driver locally: run every registered query on a
VANILLA SparkSession (no session.py confs — the driver builds its own) and
compare against the DuckDB oracle at sf0.01 with the same canonicalization
the driver uses (sort columns by name, sort rows, value compare).

Usage:  python tools/driver_replica.py [sf_dir] [only_name ...]
Exit 0 iff every checked query matches.
"""

from __future__ import annotations

import json
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(pdf):
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    every column, index reset."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def _values_match(a, b) -> bool:
    if a is b:
        return True
    if a is None or b is None:
        return a is None and b is None
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def _type_class(dtype) -> str:
    k = dtype.kind  # i,u,f,O,M,b
    return {"i": "int", "u": "int", "f": "float", "M": "ts", "b": "bool"}.get(k, "obj")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import pandas as pd  # noqa: F401
    from pyspark.sql import SparkSession

    # Vanilla session on purpose: queries must be self-sufficient (the real
    # driver does NOT use buzz_rust_spark.session.get_spark()).
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .appName("driver_replica")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from buzz_rust_spark.queries.registry import all_queries

    qs = all_queries()
    checked = sorted(qs)[:50]
    results: dict[str, dict] = {}
    n_fail = 0
    for name in checked:
        if only and name not in only:
            continue
        q = qs[name]
        row = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = _canon(q.fn(spark, sf_dir).toPandas())
            if q.oracle is None:
                row["spark_rows"] = len(sdf)
                row["err"] = "no_oracle"
                results[name] = row
                print(f"{name:28s} rows-only spark_rows={len(sdf)}")
                continue
            odf = _canon(con.execute(q.oracle).df())
            row["spark_rows"], row["oracle_rows"] = len(sdf), len(odf)
            row["rows_match"] = len(sdf) == len(odf)
            row["schema_match"] = list(sdf.columns) == list(odf.columns)
            mismatch = None
            if row["rows_match"] and row["schema_match"]:
                ok = True
                for c in sdf.columns:
                    tc_s, tc_o = _type_class(sdf[c].dtype), _type_class(odf[c].dtype)
                    if tc_s != tc_o:
                        ok = False
                        mismatch = f"dtype {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                        break
                    sv, ov = sdf[c].tolist(), odf[c].tolist()
                    for i, (a, b) in enumerate(zip(sv, ov)):
                        if not _values_match(a, b):
                            ok = False
                            mismatch = f"value {c}[{i}]: spark={a!r} oracle={b!r}"
                            break
                    if not ok:
                        break
                row["hash_match"] = ok
            status = (
                "PASS"
                if row["rows_match"] and row["schema_match"] and row["hash_match"]
                else "FAIL"
            )
            if status == "FAIL":
                n_fail += 1
            print(
                f"{name:28s} {status} rows={row['spark_rows']}/{row['oracle_rows']} "
                f"schema={row['schema_match']} hash={row['hash_match']}"
                + (f"  [{mismatch}]" if mismatch else "")
            )
        except Exception:
            row["err"] = traceback.format_exc(limit=3)
            n_fail += 1
            print(f"{name:28s} ERR\n{row['err']}")
        results[name] = row

    with open("/tmp/driver_replica.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\nchecked={len(results)} failures={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
