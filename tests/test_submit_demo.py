"""The north-rule packaging contract, exercised end-to-end: the library
ships as a ``spark-submit --py-files sketchlib.zip`` package and the
demo job must import sketchlib ONLY from the shipped zip (BASELINE.json
north_rule: "run via spark-submit --py-files").

The subprocess runs from a temp cwd with the repo stripped from
PYTHONPATH, so a passing run proves the zip is self-contained (code +
the HLL++ bias tables .npz resource)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.modules["pyspark"].__file__)
    if "pyspark" in sys.modules
    else "",
    "bin",
    "spark-submit",
)


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit binary not available",
)
def test_spark_submit_pyfiles_zip_is_self_contained(tmp_path):
    zip_path = str(tmp_path / "sketchlib.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"), zip_path],
        check=True,
        capture_output=True,
    )
    assert os.path.getsize(zip_path) > 10_000

    env = dict(os.environ)
    # strip every repo reference: imports must resolve from --py-files
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    demo = os.path.join(REPO, "tools", "submit_demo.py")
    with tempfile.TemporaryDirectory() as cwd:
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master",
                "local[2]",
                "--conf",
                "spark.sql.shuffle.partitions=4",
                "--py-files",
                zip_path,
                demo,
                "2000",
            ],
            env=env,
            cwd=cwd,
            capture_output=True,
            text=True,
            timeout=300,
        )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK:" in out.stdout, out.stdout[-2000:]
    # every source row printed an estimate (the demo asserts rows exist;
    # this asserts the estimates came through the zip-shipped kernels)
    assert "distinct_tokens=" in out.stdout
