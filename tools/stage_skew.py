"""Per-stage task-skew report from a Spark event log directory.

Usage: python tools/stage_skew.py [EVENT_DIR] [--min-ms N]

For every completed stage: wall duration, task count, task-duration
min/median/max (guide §2.5: max/median ≳ 5-10× = skew worth fixing), and
shuffle read/write bytes.  Read-only analysis — pairs with
tools/profile_headline.py, which writes the event log this parses.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("event_dir", nargs="?", default="/tmp/spark-events-r12")
    ap.add_argument("--min-ms", type=int, default=200,
                    help="hide stages shorter than this wall duration")
    args = ap.parse_args()

    stages: dict[int, dict] = {}
    tasks: dict[int, list[dict]] = {}
    paths = [
        p
        for p in glob.glob(args.event_dir + "/*")
        + glob.glob(args.event_dir + "/*/events_*")
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
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", "")[:60],
                        "ms": (comp - sub) if sub and comp else None,
                        "n": si.get("Number of Tasks"),
                    }
                elif e == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    tm = ev.get("Task Metrics") or {}
                    srm = tm.get("Shuffle Read Metrics") or {}
                    swm = tm.get("Shuffle Write Metrics") or {}
                    tasks.setdefault(ev["Stage ID"], []).append(
                        {
                            "ms": ti.get("Finish Time", 0) - ti.get("Launch Time", 0),
                            "sr": srm.get("Local Bytes Read", 0)
                            + srm.get("Remote Bytes Read", 0),
                            "srr": srm.get("Total Records Read", 0),
                            "sw": swm.get("Shuffle Bytes Written", 0),
                            "swr": swm.get("Shuffle Records Written", 0),
                            "spill": tm.get("Disk Bytes Spilled", 0),
                        }
                    )

    print(
        f"{'stage':>5s} {'wall ms':>8s} {'n':>4s} {'task min':>9s} "
        f"{'med':>7s} {'max':>8s} {'max/med':>7s} {'shuf R MB':>10s} "
        f"{'R Mrows':>8s} {'shuf W MB':>10s} {'W Mrows':>8s} "
        f"{'spill MB':>9s}  name"
    )
    for sid in sorted(stages):
        st = stages[sid]
        if st["ms"] is None or st["ms"] < args.min_ms:
            continue
        ts = tasks.get(sid, [])
        if not ts:
            continue
        durs = sorted(t["ms"] for t in ts)
        med = statistics.median(durs)
        ratio = durs[-1] / med if med else float("inf")
        sr = sum(t["sr"] for t in ts) / 1e6
        sw = sum(t["sw"] for t in ts) / 1e6
        srr = sum(t["srr"] for t in ts) / 1e6
        swr = sum(t["swr"] for t in ts) / 1e6
        spill = sum(t["spill"] for t in ts) / 1e6
        print(
            f"{sid:5d} {st['ms']:8d} {len(ts):4d} {durs[0]:9d} "
            f"{med:7.0f} {durs[-1]:8d} {ratio:7.1f} {sr:10.1f} "
            f"{srr:8.1f} {sw:10.1f} {swr:8.1f} {spill:9.1f}  {st['name']}"
        )


if __name__ == "__main__":
    main()
