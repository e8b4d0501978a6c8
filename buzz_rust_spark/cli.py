"""Command-line entry point: run a BuzzQuery JSON file and print the result.

Mirrors the reference's user surface (a JSON query posted to the fuse Lambda →
pretty-printed table, fuse_service.rs:130-135):

    python -m buzz_rust_spark.cli examples/query_two_step.json
    python -m buzz_rust_spark.cli examples/query_two_step.json --strict --explain

Catalog uris of type ``ParquetDir`` may use ``$SF_DIR`` which expands to
``--sf-dir`` (default /root/testdata/sf0.001), so the example queries run on
any scale factor.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from .engine import BuzzEngine
from .errors import BuzzError
from .models import BuzzQuery
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Run a BuzzQuery JSON file")
    parser.add_argument("query_file")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    parser.add_argument(
        "--strict",
        action="store_true",
        help="enforce reference step-shape rules (exactly [HBee, HComb], one source)",
    )
    parser.add_argument("--explain", action="store_true")
    parser.add_argument("--limit", type=int, default=50)
    args = parser.parse_args(argv)

    try:
        with open(args.query_file) as fh:
            raw = fh.read().replace("$SF_DIR", args.sf_dir)
    except OSError as exc:
        print(f"error: cannot read query file: {exc}", file=sys.stderr)
        return 1

    spark = get_spark(app_name="buzz-cli")
    spark.sparkContext.setLogLevel("ERROR")
    engine = BuzzEngine(spark, strict=args.strict)
    t0 = time.perf_counter()
    try:
        query = BuzzQuery.from_json(raw)
        df = engine.run(query)
        if args.explain:
            df.explain("formatted")
        # route the action through engine.execute: runtime task failures
        # surface as the typed BuzzExecutionError with the root cause, not
        # a raw multi-hundred-line Py4J stack (FAIL-action parity)
        rows = engine.execute(df.limit(args.limit))
        df.sparkSession.createDataFrame(rows, df.schema).show(
            args.limit, truncate=False
        )
    except BuzzError as exc:
        print(f"error: {type(exc).__name__}: {exc}", file=sys.stderr)
        return 1
    # timing log parity: fuse_service.rs:136-144 logs per-phase ms
    print(f"[query took {time.perf_counter() - t0:.2f}s]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
