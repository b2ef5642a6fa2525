"""True ``spark-submit --py-files`` delivery-path smoke test.

The north rule ships the engine via ``spark-submit --py-files`` on a
cluster; this runs the REAL binary (/opt/spark/bin/spark-submit) in a
subprocess with the package zipped, from a working directory where
``bigquery_delta_plugins_spark`` is NOT importable — the zip is the
only way the driver and executors can see the code.  gen -> apply ->
show round-trip, plus idempotent re-apply, mirroring test_cli.py's
in-process version."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(dest: str) -> str:
    pkg = os.path.join(REPO, "bigquery_delta_plugins_spark")
    zpath = os.path.join(dest, "bdps.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(cwd: str, zpath: str, shim: str, args: list[str]) -> dict:
    env = {**os.environ}
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            shim,
            "--shuffle-partitions", "4",
            *args,
        ],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    work = str(tmp_path)  # NOT the repo: package unimportable from here
    zpath = _build_zip(work)
    shim = os.path.join(work, "bdps_submit.py")
    shutil.copy(os.path.join(REPO, "bdps_submit.py"), shim)
    events, wh = os.path.join(work, "events"), os.path.join(work, "wh")

    out = _submit(work, zpath, shim, [
        "gen", "--events", events, "--n-events", "1000", "--n-urls", "50",
        "--batch-size", "500",
    ])
    assert out["n_events"] == 1000

    out = _submit(work, zpath, shim, [
        "apply", "--events", events, "--warehouse", wh,
        "--table", "web.pages", "--num-buckets", "2",
    ])
    assert out["applied_batches"] == 2 and out["skipped_batches"] == 0
    rows = out["final_rows"]
    assert rows > 0

    # resubmit from the same checkpoint: exactly-once skip, state stable
    out = _submit(work, zpath, shim, [
        "apply", "--events", events, "--warehouse", wh,
        "--table", "web.pages", "--num-buckets", "2",
    ])
    assert out["applied_batches"] == 0 and out["final_rows"] == rows

    out = _submit(work, zpath, shim, [
        "show", "--warehouse", wh, "--table", "web.pages",
    ])
    assert out["rows"] == rows
