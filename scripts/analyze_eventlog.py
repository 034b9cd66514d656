"""Driver-gap / utilization analysis over a Spark event log.

The 8-core replay shows a ~6-13% utilization gap (r3/r4 VERDICT): wall
time not covered by any running job ("driver gaps": py4j round trips,
Catalyst analysis, manifest commits, lineage writes) plus intra-job task
waves. This script attributes both from the standard event log:

    LMKC_EVENTLOG=/tmp/elog taskset -c 0-7 python scripts/replay_worker.py \
        8 <events> <snapshot> <n_events>
    python scripts/analyze_eventlog.py /tmp/elog/<app-id>

Prints: per-job wall + task-time + parallelism-efficiency, the top
inter-job gaps (driver-only time, with the *next* job's first stage name
so the gap is attributable to whoever planned it), and totals.

Stdlib-only; handles plain and .inprogress logs (JSON lines).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def load(path: str) -> list[dict]:
    import os

    # Spark 4 rolling logs: eventlog_v2_<app>/events_<n>_<app>[.inprogress]
    if os.path.isdir(path):
        entries = sorted(
            (f for f in os.listdir(path) if f.startswith("events_")),
            key=lambda f: int(f.split("_")[1]),
        )
        files = [os.path.join(path, f) for f in entries]
    else:
        files = [path]
    events = []
    for fp in files:
        if fp.endswith(".zstd"):  # spark.eventLog.compress=true logs
            import subprocess

            text = subprocess.run(
                ["zstd", "-dc", fp], capture_output=True, text=True, check=True
            ).stdout.splitlines()
        else:
            with open(fp, "r", errors="replace") as f:
                text = f.read().splitlines()
        for line in text:
            line = line.strip()
            if not line:
                continue
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(e, dict):
                events.append(e)
    return events


def analyze(path: str, top_gaps: int = 12) -> dict:
    evs = load(path)
    jobs: dict[int, dict] = {}
    stage_of_job: dict[int, int] = {}
    stage_names: dict[int, str] = {}
    task_time_ms: dict[int, float] = defaultdict(float)  # per job
    task_spans: dict[int, list[tuple[int, int]]] = defaultdict(list)

    for e in evs:
        k = e.get("Event")
        if k == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobs[jid] = {"start": e["Submission Time"], "end": None, "stages": []}
            for s in e.get("Stage Infos", []):
                stage_of_job[s["Stage ID"]] = jid
                stage_names[s["Stage ID"]] = s.get("Stage Name", "?")
                jobs[jid]["stages"].append(s["Stage ID"])
        elif k == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif k == "SparkListenerTaskEnd":
            sid = e.get("Stage ID")
            jid = stage_of_job.get(sid)
            info = e.get("Task Info", {})
            if jid is not None and info.get("Finish Time") and info.get("Launch Time"):
                dur = info["Finish Time"] - info["Launch Time"]
                task_time_ms[jid] += dur
                task_spans[jid].append((info["Launch Time"], info["Finish Time"]))

    done = sorted(
        ((jid, j) for jid, j in jobs.items() if j["end"]), key=lambda x: x[1]["start"]
    )
    if not done:
        print("no completed jobs in log")
        return {}

    t0 = done[0][1]["start"]
    t_end = max(j["end"] for _, j in done)
    wall_s = (t_end - t0) / 1e3

    # wall covered by >=1 running job (merge overlapping [start,end) spans)
    spans = sorted((j["start"], j["end"]) for _, j in done)
    covered = 0
    cur_lo, cur_hi = spans[0]
    for lo, hi in spans[1:]:
        if lo <= cur_hi:
            cur_hi = max(cur_hi, hi)
        else:
            covered += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
    covered += cur_hi - cur_lo

    # inter-job gaps: periods with zero running jobs, attributed to the
    # job that starts when the gap closes
    gaps = []
    cur_hi = done[0][1]["end"]
    for jid, j in done[1:]:
        if j["start"] > cur_hi:
            first_stage = j["stages"][0] if j["stages"] else None
            gaps.append(
                {
                    "gap_s": round((j["start"] - cur_hi) / 1e3, 3),
                    "next_job": jid,
                    "next_stage": (stage_names.get(first_stage, "?") or "?")[:90],
                }
            )
        cur_hi = max(cur_hi, j["end"])

    print(f"jobs: {len(done)}   wall {wall_s:.1f}s   "
          f"job-covered {covered/1e3:.1f}s   "
          f"driver gaps {wall_s - covered/1e3:.1f}s "
          f"({(wall_s - covered/1e3)/wall_s*100:.1f}% of wall)")
    print()
    print("top jobs by wall (eff = task-time / (wall * slots), slots from max overlap):")
    by_wall = sorted(done, key=lambda x: x[1]["end"] - x[1]["start"], reverse=True)
    for jid, j in by_wall[:10]:
        jw = (j["end"] - j["start"]) / 1e3
        tt = task_time_ms[jid] / 1e3
        # max concurrent tasks within the job = effective slot count
        pts = sorted(
            [(lo, 1) for lo, _ in task_spans[jid]] + [(hi, -1) for _, hi in task_spans[jid]]
        )
        conc = peak = 0
        for _, d in pts:
            conc += d
            peak = max(peak, conc)
        eff = tt / (jw * peak) if jw > 0 and peak else 0.0
        name = stage_names.get(j["stages"][0], "?") if j["stages"] else "?"
        print(f"  job {jid:>4}  wall {jw:7.2f}s  task-time {tt:8.1f}s  "
              f"peak-conc {peak:>3}  wave-eff {eff:4.2f}  {name[:70]}")
    print()
    print(f"top {top_gaps} driver gaps (time with zero running jobs):")
    for g in sorted(gaps, key=lambda g: -g["gap_s"])[:top_gaps]:
        print(f"  {g['gap_s']:6.2f}s before job {g['next_job']:>4}  -> {g['next_stage']}")
    total_gap = sum(g["gap_s"] for g in gaps)
    print(f"  ({len(gaps)} gaps total, {total_gap:.1f}s)")
    return {"wall_s": wall_s, "gap_s": wall_s - covered / 1e3, "gaps": gaps}


if __name__ == "__main__":
    analyze(sys.argv[1], top_gaps=int(sys.argv[2]) if len(sys.argv) > 2 else 12)
