"""Parse a Spark event log: per-stage task-time totals, stage wall spans,
and inter-stage driver gaps — finds where non-parallel time goes.

Usage: python tools/analyze_eventlog.py <eventlog-file-or-dir>
"""

from __future__ import annotations

import json
import os
import sys


def main():
    path = sys.argv[1]
    if os.path.isdir(path):
        files = sorted(
            (os.path.join(path, f) for f in os.listdir(path)),
            key=os.path.getmtime,
        )
        path = files[-1]
    stages = {}  # id -> dict
    app_start = app_end = None
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev.get("Timestamp")
        elif e == "SparkListenerApplicationEnd":
            app_end = ev.get("Timestamp")
        elif e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages.setdefault(si["Stage ID"], {}).update(
                name=si["Stage Name"], submitted=si.get("Submission Time"), n_tasks=si["Number of Tasks"]
            )
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            s = stages.setdefault(si["Stage ID"], {})
            s["name"] = si["Stage Name"]
            s["submitted"] = si.get("Submission Time")
            s["completed"] = si.get("Completion Time")
            s["n_tasks"] = si["Number of Tasks"]
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            s = stages.setdefault(sid, {})
            ti = ev.get("Task Info", {})
            dur = (ti.get("Finish Time", 0) or 0) - (ti.get("Launch Time", 0) or 0)
            s["task_ms"] = s.get("task_ms", 0) + dur
            s["max_task_ms"] = max(s.get("max_task_ms", 0), dur)

    rows = []
    for sid, s in sorted(stages.items()):
        if "submitted" not in s or s.get("completed") is None:
            continue
        wall = s["completed"] - s["submitted"]
        rows.append(
            (sid, wall, s.get("task_ms", 0), s.get("max_task_ms", 0), s.get("n_tasks", 0), s.get("name", "?")[:60])
        )
    total_wall = sum(r[1] for r in rows)
    print(f"{'sid':>4} {'wall_s':>7} {'task_s':>8} {'maxtask':>8} {'ntask':>5}  name")
    for sid, wall, task_ms, max_ms, n, name in sorted(rows, key=lambda r: -r[1])[:25]:
        print(f"{sid:>4} {wall/1000:>7.1f} {task_ms/1000:>8.1f} {max_ms/1000:>8.1f} {n:>5}  {name}")
    if app_start and app_end:
        print(f"app wall: {(app_end-app_start)/1000:.1f}s; sum stage wall: {total_wall/1000:.1f}s")
        # gaps: periods not covered by any running stage
        spans = sorted((s["submitted"], s["completed"]) for s in stages.values() if s.get("submitted") and s.get("completed"))
        merged = []
        for a, b in spans:
            if merged and a <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        covered = sum(b - a for a, b in merged)
        print(f"stage-covered: {covered/1000:.1f}s → driver/scheduler gaps: {(app_end-app_start-covered)/1000:.1f}s")


if __name__ == "__main__":
    main()
