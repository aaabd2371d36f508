"""CLI end-to-end (cmd/main.go equivalent, SURVEY.md §3.1): run the binary
on the tiny fixture, assert per-wave JSON log lines + summary, then resume
with more waves from the committed snapshot."""

import json
import subprocess
import sys


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "brink_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=480,
    )


def test_cli_run_and_resume(tmp_path):
    store = str(tmp_path / "store")
    out = str(tmp_path / "crawl.log")
    r = _run(
        ["--fixture", "tiny", "--store", store, "--max-waves", "3",
         "-out", out, "--master", "local[4]"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in open(out).read().splitlines() if l.strip()]
    waves = [json.loads(l) for l in lines if l.startswith("{")]
    assert [w["wave"] for w in waves] == [0, 1, 2]
    assert waves[0]["n_frontier"] > 0
    assert lines[-1].startswith("waves=3 ")

    # resume continues from the committed snapshot without reseeding
    r2 = _run(
        ["--fixture", "tiny", "--store", store, "--max-waves", "5",
         "--resume", "-out", out, "--master", "local[4]"]
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    lines2 = [l for l in open(out).read().splitlines() if l.strip()]
    waves2 = [json.loads(l)["wave"] for l in lines2 if l.startswith("{")]
    assert waves2 == [0, 1, 2, 3, 4]
    assert lines2[-1].startswith("waves=5 ")
