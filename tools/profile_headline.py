"""Profile the headline queries: per-query build/exec wall time plus a
per-job / per-stage breakdown parsed from the Spark event log.

Usage: python tools/profile_headline.py [--runs N] [query ...]

Writes a JSON report to /tmp/profile_headline.json and prints a summary.
Methodology matches bench.py (warm pass first, clearCache between runs,
noop sink) so numbers are comparable; the event log adds the *where* —
job/stage durations, task counts, shuffle bytes — that wall time alone
cannot give (guide §1.1 empirical loop, §7.2).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from buzz_rust_spark.queries import all_queries
from buzz_rust_spark.session import get_spark

EVENT_DIR = "/tmp/spark-events-r12"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import shutil

    shutil.rmtree(EVENT_DIR, ignore_errors=True)
    os.makedirs(EVENT_DIR, exist_ok=True)

    spark = get_spark(
        app_name="profile-headline",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    queries = {
        name: q
        for name, q in sorted(all_queries().items())
        if (args.queries and name in args.queries)
        or (not args.queries and q.headline)
    }

    # warm pass (JIT, codegen, Python workers)
    for name, q in queries.items():
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"WARM FAIL {name}: {exc}", file=sys.stderr)

    results: dict[str, dict] = {}
    for name, q in queries.items():
        builds, execs = [], []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"run{i}:{name}")
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        results[name] = {
            "build_med": round(statistics.median(builds), 3),
            "exec_med": round(statistics.median(execs), 3),
            "total_med": round(
                statistics.median([b + e for b, e in zip(builds, execs)]), 3
            ),
        }
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse the event log ------------------------------------------------
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    # Spark 4 rolling event logs: appstatus marker + events_* files inside a
    # per-app directory; plain single-file logs are also accepted.
    paths = [
        p
        for p in glob.glob(EVENT_DIR + "/*") + glob.glob(EVENT_DIR + "/*/events_*")
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    jobs[jid] = {
                        "desc": ev.get("Properties", {}).get(
                            "spark.job.description", ""
                        ),
                        "t0": ev["Submission Time"],
                        "stages": [
                            s["Stage ID"] for s in ev.get("Stage Infos", [])
                        ],
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    stages[sid] = {
                        "name": si.get("Stage Name", "")[:80],
                        "ms": (comp - sub) if sub and comp else None,
                        "tasks": si.get("Number of Tasks"),
                    }

    per_query: dict[str, dict] = {}
    for jid, j in sorted(jobs.items()):
        desc = j.get("desc") or ""
        if ":" not in desc:
            continue
        phase, qname = desc.split(":", 1)
        if phase == "warm" or "t1" not in j:
            continue
        pq = per_query.setdefault(qname, {"jobs": [], "n_jobs": 0})
        stage_rows = [
            {
                "id": sid,
                **stages.get(sid, {}),
            }
            for sid in j["stages"]
            if sid in stages
        ]
        pq["jobs"].append(
            {
                "job": jid,
                "run": phase,
                "ms": j["t1"] - j["t0"],
                "stages": stage_rows,
            }
        )
        pq["n_jobs"] += 1

    report = {"wall": results, "jobs": per_query}
    with open("/tmp/profile_headline.json", "w") as fh:
        json.dump(report, fh, indent=1)

    print(f"{'query':28s} {'build':>7s} {'exec':>7s} {'total':>7s} jobs/run")
    nruns = args.runs
    for name, r in results.items():
        njobs = per_query.get(name, {}).get("n_jobs", 0) / max(nruns, 1)
        print(
            f"{name:28s} {r['build_med']:7.3f} {r['exec_med']:7.3f}"
            f" {r['total_med']:7.3f} {njobs:5.1f}"
        )
    print("\ndetail: /tmp/profile_headline.json")


if __name__ == "__main__":
    main()
