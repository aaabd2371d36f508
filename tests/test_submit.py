"""Executable spark-submit --py-files evidence (north rule deploy shape).

Packages brink_spark into the deterministic zip, then launches a REAL
``spark-submit`` from an empty working directory — the package resolves
only from ``--py-files``, exactly like a cluster deploy — and runs a
2-wave crawl through the CLI driver with ``--master inherit`` (the
session factory must not override the master spark-submit chose).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_pyfiles_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_pyfiles

    a = make_pyfiles.build(str(tmp_path / "a.zip"))
    b = make_pyfiles.build(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on host")
def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_pyfiles

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = make_pyfiles.build(str(tmp_path / "brink_spark.zip"))
    # driver script copied OUT of the repo: the package must come from the zip
    driver = tmp_path / "driver.py"
    shutil.copyfile(os.path.join(repo, "brink_spark", "cli.py"), driver)
    store = tmp_path / "store"
    log = tmp_path / "crawl.log"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            str(driver),
            "--master",
            "inherit",
            "--fixture",
            "tiny",
            "--store",
            str(store),
            "--max-waves",
            "2",
            "-out",
            str(log),
        ],
        cwd=tmp_path,  # empty cwd: no accidental repo import
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # wave metrics were logged and the store committed both waves
    lines = [
        json.loads(ln)
        for ln in log.read_text().splitlines()
        if ln.startswith("{")
    ]
    assert [m["wave"] for m in lines] == [0, 1]
    assert lines[0]["n_ok"] > 0
    manifest = json.loads((store / "manifest.json").read_text())
    assert manifest["last_wave"] == 1
    for table in ("visited", "results", "frontier", "fetchlog"):
        assert (store / table).exists()
