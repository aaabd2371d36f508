"""Build the spark-submit --py-files artifact for the crawl engine.

The north rule runs the engine via ``spark-submit --py-files`` on a
multi-executor cluster; this packages ``brink_spark/`` into a single
deterministic zip (sorted entries, fixed timestamps — byte-identical for
identical sources, so cluster deploy caches/dedup see one artifact).

Usage:
  python tools/make_pyfiles.py [out.zip]        # default dist/brink_spark.zip
then:
  spark-submit --master <cluster> --py-files dist/brink_spark.zip \
      path/to/cli.py --master inherit -conf crawl.toml --store <uri>
(`--master inherit` tells the engine's session factory NOT to override
the master spark-submit already chose.)
"""

from __future__ import annotations

import os
import sys
import zipfile

# 1980-01-01: the zip epoch — a fixed stamp keeps the archive reproducible
_ZIP_DATE = (1980, 1, 1, 0, 0, 0)


def build(out_path: str, pkg_dir: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = pkg_dir or os.path.join(repo, "brink_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                arc = os.path.relpath(full, os.path.dirname(pkg_dir))
                entries.append((arc, full))
    entries.sort()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=_ZIP_DATE)
            info.external_attr = 0o644 << 16
            z.writestr(info, data, zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/brink_spark.zip"
    print(build(out))
