"""End-to-end launch via ``spark-submit --py-files`` — the north-rule
launch shape (BASELINE.json: "run via spark-submit --py-files on a
multi-executor cluster"). The package ships as a zip, the runner
executes in a fresh driver JVM whose master comes from ``--master``
(get_spark must NOT override it — see session.py's under_submit guard),
and the verdicts written by the submitted job must exactly match an
in-process ValidationSuite run over the same input.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(tmp: str) -> str:
    """The deployment artifact: zip -r autoprepad_spark.zip autoprepad_spark."""
    zpath = os.path.join(tmp, "autoprepad_spark.zip")
    pkg = os.path.join(REPO, "autoprepad_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_launch(spark, tokens_df, dim_df, tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit not on this host")

    tmp = str(tmp_path)
    inp, dimp, out = f"{tmp}/tok.parquet", f"{tmp}/dim.parquet", f"{tmp}/out"
    tokens_df.write.parquet(inp)
    dim_df.write.parquet(dimp)

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # The zip must be the ONLY source of the package in the submitted
    # job: strip inherited paths and run from a neutral cwd (spark-submit
    # adds only the primary script's own directory to sys.path).
    env.pop("PYTHONPATH", None)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)

    cmd = [
        spark_submit,
        "--master", "local[4]",
        "--py-files", _zip_package(tmp),
        os.path.join(REPO, "autoprepad_spark", "runner.py"),
        "--input", inp,
        "--dim", dimp,
        "--output", out,
        "--run-id", "submit1",
    ]
    p = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=tmp, timeout=600
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no summary line\nstdout: {p.stdout[-2000:]}\nstderr: {p.stderr[-2000:]}"
    summary = json.loads(lines[-1])
    # datagen injects violations, so some checks fail -> runner exits 2
    assert p.returncode == 2, (p.returncode, p.stderr[-2000:])
    assert summary["rows"] == tokens_df.count()
    assert summary["failed_checks"] > 0

    # verdicts written by the submitted job == in-process suite verdicts
    from autoprepad_spark.plans.suite import ValidationSuite

    got = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/verdicts")
        .select("part", "check_name", "status", "violation_count")
        .collect()
    }
    res = ValidationSuite().run(tokens_df, dim=dim_df)
    want = {
        tuple(r)
        for r in res.verdicts
        .select("part", "check_name", "status", "violation_count")
        .collect()
    }
    res.unpersist()
    assert got == want
