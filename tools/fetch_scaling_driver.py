"""Alternated best-of-N fetch-stage scaling driver (the r4 protocol,
re-runnable): calls `tools/bench_scaling.py fetch <cpus>` in fresh JVMs,
alternating levels (1,4,1,4,...) so a noisy-neighbor burst hits both
levels alike, and records best-of per level + the scaling efficiency.

Usage: [BRINK_SCALE=xbench] [BRINK_LEVELS=1,4] [BRINK_REPEATS=3]
       python tools/fetch_scaling_driver.py BENCH/fetch_scaling_rN.json
The template must already exist (bench_scaling.prepare())."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = tuple(int(x) for x in os.environ.get("BRINK_LEVELS", "1,4").split(","))
REPEATS = int(os.environ.get("BRINK_REPEATS", "3"))


_SUBMIT_ZIP: list[str] = []  # built once on first use


def _cmd(cpus: int) -> tuple[list[str], dict]:
    """Plain-python launch, or the literal spark-submit --py-files deploy
    shape when BRINK_SUBMIT=1 (the north rule's wording)."""
    env = dict(os.environ)
    if os.environ.get("BRINK_SUBMIT") == "1":
        if not _SUBMIT_ZIP:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import make_pyfiles
            import shutil as _sh

            _SUBMIT_ZIP.append(
                make_pyfiles.build("/dev/shm/brink_fetch_submit.zip")
            )
            _SUBMIT_ZIP.append(_sh.which("spark-submit") or "")
            if not _SUBMIT_ZIP[1]:
                raise SystemExit("BRINK_SUBMIT=1 but no spark-submit on PATH")
        env["BRINK_UNDER_SUBMIT"] = "1"
        return (
            [
                _SUBMIT_ZIP[1],
                "--master", f"local[{cpus}]",
                "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "8g"),
                "--py-files", _SUBMIT_ZIP[0],
                os.path.join(REPO, "tools/bench_scaling.py"),
                "fetch", str(cpus),
            ],
            env,
        )
    return (
        [
            sys.executable,
            os.path.join(REPO, "tools/bench_scaling.py"),
            "fetch", str(cpus),
        ],
        env,
    )


def run_one(cpus: int) -> dict:
    cmd, env = _cmd(cpus)
    proc = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(proc.stdout, proc.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"fetch level {cpus} failed")
    return json.loads(lines[-1])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/fetch_scaling_new.json"
    all_runs: list[dict] = []
    best: dict[int, dict] = {}
    for rep in range(REPEATS):
        for cpus in LEVELS:
            r = run_one(cpus)
            all_runs.append(r)
            print(f"# rep {rep} local[{cpus}]: wall={r['wall_sec']}s "
                  f"({r['urls_per_sec']}/s)", file=sys.stderr)
            if cpus not in best or r["wall_sec"] < best[cpus]["wall_sec"]:
                best[cpus] = r
    lo, hi = LEVELS
    eff = best[hi]["urls_per_sec"] / ((hi // lo) * best[lo]["urls_per_sec"])
    scale = os.environ.get("BRINK_SCALE", "bench")
    report = {
        "workload": f"fetch/parse stage only, {scale} fixture "
        f"({best[lo]['fetched']:,} attempts / {best[lo]['ok']:,} parses)",
        "protocol": f"alternated best-of-{REPEATS} per level "
        f"({','.join(str(l) for l in LEVELS * REPEATS)}), fresh JVM per run",
        "levels": {str(c): best[c] for c in LEVELS},
        "all_runs": all_runs,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
