"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

``--sf 1`` runs the same suite at a 10x sf0.1 dataset, generated once (seeded,
distribution-preserving — see tools/gen_sf.py) under .data/sf1; this is the
scale gate BENCH.md's sf1 table records each round.

Queries run warm (after a session-wide warmup pass) in k INTERLEAVED passes
with rotated order; the recorded per-query number is the MEDIAN of the k
samples and the per-query [min, max] spread ships in the JSON — one loaded
host window can move at most one sample per query, not the recorded total.
Timing is to completion of a noop-sink action that forces full evaluation
without driver-side materialization of the result set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from buzz_rust_spark.queries import all_queries
from buzz_rust_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=None,
        choices=["0.1", "1"],
        help="scale factor: 0.1 (default, driver parquet) or 1 "
        "(10x local dataset, generated on first use); other values are an "
        "error rather than silently running the env-default dataset",
    )
    ap.add_argument(
        "--runs",
        type=int,
        default=None,
        help="interleaved passes; per-query stat is the MEDIAN of N samples "
        "(default: env SPARK_GRAFT_BENCH_RUNS or 5)",
    )
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args.sf == "1":
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        from gen_sf import ensure_dataset

        sf_dir = ensure_dataset()
        sf = "1"
    else:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="buzz-rust-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {
        name: q for name, q in sorted(all_queries().items()) if q.headline
    }

    # Warm the JVM (codegen/JIT), Python workers, and file listing by running
    # every headline query once at the smallest scale factor — per-query
    # numbers then measure steady-state throughput, the reference's
    # warm-container comparison point (README.md:122; BASELINE.md methodology).
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name, q in queries.items():
        try:
            q.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup is best-effort; the measured run surfaces real errors

    # Per-query MEDIAN over k INTERLEAVED passes (pass-major order, rotated
    # each pass), not best-of-run: a loaded host window now lands on at most
    # one sample of each query instead of every sample of whichever queries
    # ran inside it, so one busy minute cannot move the recorded total by
    # ±35% (rounds 4 and 5 both needed a jitter adjudication; best-of-n hid
    # the spread, median-of-interleaved bounds it).  The per-query
    # [min, max] spread is reported alongside so a contended run is visible
    # in the artifact itself.
    import statistics

    # Contention telemetry (round 13, additions only): the round-12 PERF
    # comparison was unadjudicable because the JSON carried no evidence of
    # host load — record loadavg at launch/end and a wall-clock timestamp at
    # the start of every pass so a contended window is machine-readable in
    # the artifact itself (VERDICT r12 "what's wrong" #1).
    def _loadavg() -> list[float]:
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:  # platform without getloadavg
            return []

    load_at_launch = _loadavg()
    pass_walls: list[float] = []

    n_runs = args.runs or int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    names = list(queries)
    samples: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    for i in range(n_runs):
        pass_walls.append(round(time.time(), 1))
        # rotate the start point so pass position is decorrelated from query
        # identity (a slow first pass or a GC pause hits different queries
        # in different passes)
        order = names[i % len(names):] + names[: i % len(names)]
        for name in order:
            if name in errors:
                continue
            try:
                # Drop relations the previous run persisted (the dedup/ANN
                # operators cache intermediates): leftover cached blocks both
                # distort the next run and build executor memory pressure
                # whose GC pauses land on an arbitrary later query.
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = queries[name].fn(spark, sf_dir)
                # noop sink forces full evaluation of every column without
                # driver-side materialization (count() alone would let
                # Catalyst prune).
                df.write.format("noop").mode("overwrite").save()
                samples[name].append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — one bad query must not
                # zero out the whole benchmark (round 2 lost its numbers to
                # a single AnalysisException); record it and keep measuring.
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    timings = {
        n: round(statistics.median(s), 3) for n, s in samples.items() if s
    }
    spread = {
        n: [round(min(s), 3), round(max(s), 3)]
        for n, s in samples.items()
        if s
    }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        # Sum of per-query minima: the statistic rounds 1-5 recorded
        # (best-of-run), kept alongside the median so round-over-round
        # comparisons against historical numbers stay apples-to-apples.
        "total_min": round(
            sum(min(s) for s in samples.values() if s), 3
        ),
        "runs": n_runs,
        "stat": "median",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # telemetry (see above): 1/5/15-min loadavg at launch and at the end,
        # plus the wall-clock start of each interleaved pass — lets a reader
        # correlate a fat per-query spread with an external load window
        # instead of guessing.
        "loadavg_launch": load_at_launch,
        "loadavg_end": _loadavg(),
        "pass_start_unix": pass_walls,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
