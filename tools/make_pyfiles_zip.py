"""Build the `--py-files` artifact for cluster submission (north rule:
`spark-submit --py-files gitnexus_spark.zip jobs/run_pipeline.py ...`).

Zips the gitnexus_spark package (source only, no caches) with
deterministic member order and timestamps, so re-builds of the same tree
are byte-identical — the artifact can be content-addressed by the
deploy pipeline.

Usage: python tools/make_pyfiles_zip.py [out_zip]   (default dist/gitnexus_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str) -> str:
    pkg = os.path.join(REPO, "gitnexus_spark")
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    members = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "gitnexus_spark.zip")
    print(build(out))
