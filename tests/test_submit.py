"""End-to-end `spark-submit --py-files` deployment test (north_rule: the
pipeline runs via spark-submit --py-files on multi-executor clusters).

The entry scripts are COPIED out of the repo into a temp dir and run with
PYTHONPATH stripped, so the only way `import dlkp_spark` can succeed — on
the driver AND in executor Python workers — is through the packaged zip
handed to `--py-files`. A broken zip, a module missing from package.py's
walk, or a submit script that only works because the repo happens to be
on sys.path all fail this test.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    cand = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not on PATH")


def _run(cmd: list[str], cwd: str) -> str:
    env = os.environ.copy()
    env.pop("PYTHONPATH", None)  # imports must come from --py-files only
    env.pop("SPARK_GRAFT_MASTER", None)  # --master must win (session.py)
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=cwd,
                       env=env, timeout=600)
    assert r.returncode == 0, f"{cmd[:3]}... failed:\n{r.stderr[-4000:]}"
    return r.stdout


def test_spark_submit_py_files_build_and_query(tmp_path):
    submit = _spark_submit()

    # package the distribution zip exactly as a cluster user would
    zip_out = _run([sys.executable, os.path.join(REPO, "scripts", "package.py")],
                   cwd=str(tmp_path)).strip().splitlines()[-1]
    assert zip_out.endswith("dlkp_spark.zip") and os.path.exists(zip_out)

    for script in ("submit_build_index.py", "submit_query.py"):
        shutil.copy(os.path.join(REPO, "scripts", script), tmp_path / script)
    idx = tmp_path / "idx"

    out = _run([submit, "--master", "local[4]", "--py-files", zip_out,
                str(tmp_path / "submit_build_index.py"),
                "--generate", "300", "--output", str(idx),
                "--shards", "2", "--segment-docs", "64"],
               cwd=str(tmp_path))
    metrics = json.loads(out.strip().splitlines()[-1])
    assert metrics["n_docs"] == 300
    assert len(metrics["shards"]) == 2
    assert all(s["status"] == "committed" for s in metrics["shards"])
    assert os.path.exists(os.path.join(str(idx), "stats.json"))

    out = _run([submit, "--master", "local[4]", "--py-files", zip_out,
                str(tmp_path / "submit_query.py"),
                "--index", str(idx), "--terms", "w0006", "compression",
                "--k", "5", "--mode", "wand"],
               cwd=str(tmp_path))
    hits = json.loads(out.strip().splitlines()[-1])
    assert [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
    assert 0 < len(hits) <= 5
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert all(h["score"] > 0 for h in hits)
