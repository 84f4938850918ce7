"""CLI smoke for jobs/build_profiles.py: rebuild then fold, JSON report
contract, snapshot history advances."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*extra):
    cmd = [sys.executable, os.path.join(REPO, "jobs", "build_profiles.py"),
           "--input", "/root/testdata/sf0.001/documents.parquet",
           "--group", "lang", "--distinct-col", "text",
           "--quantile-col", "n_chars", "--master", "local[4]", *extra]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])

def test_rebuild_then_fold(tmp_path):
    out_dir = str(tmp_path / "profiles")
    rep1 = _run("--output", out_dir)
    assert rep1["distinct"]["snapshot_id"] == 1
    assert rep1["distinct"]["n_groups"] >= 1
    assert rep1["quantiles"]["global"]["q_0_5"] > 0
    rep2 = _run("--output", out_dir, "--mode", "fold")
    assert rep2["distinct"]["snapshot_id"] == 2
    # folding the same corpus again adds no new distinct values beyond
    # sketch-estimate wobble
    assert abs(rep2["distinct"]["global_estimate"]
               - rep1["distinct"]["global_estimate"]) \
        <= 0.05 * rep1["distinct"]["global_estimate"] + 2
