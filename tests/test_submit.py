"""The spark-submit --py-files shipping contract (north_star: "the whole job
ships as spark-submit --py-files"): the packaged zip must be self-sufficient
— a spark-submit from a foreign cwd with only the zip on --py-files builds an
index and retrieves from it."""

import json
import os
import subprocess
import sys
import tempfile

import pytest


def test_spark_submit_pyfiles_smoke():
    import pyspark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from package_pyfiles import make_zip

    zip_path = make_zip(os.path.join(tempfile.mkdtemp(prefix="pyf_"), "engine.zip"))
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out = subprocess.run(
        [submit, "--master", "local[4]", "--driver-memory", "4g",
         "--py-files", zip_path, os.path.join(repo, "tools", "submit_job.py"),
         "smoke", "800"],
        capture_output=True, text=True, timeout=420,
        cwd=tempfile.mkdtemp(prefix="submit_cwd_"),  # foreign cwd: zip must carry the engine
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON output; stderr tail: {out.stderr[-1500:]}"
    res = json.loads(lines[-1])
    assert res["ok"] and res["result_rows"] == 20
