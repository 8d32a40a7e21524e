"""Real spark-submit --py-files smoke test: the north-rule deployment shape.

Proves the packaged zip is importable OUTSIDE the repo working directory
(the classic --py-files failure: a module that works from the checkout but
not from the shipped archive), the CLI entrypoint runs the full checkpointed
flagship job, and a re-submit with the same run-id resumes (skips committed
sinks) instead of reprocessing.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(tmpdir: str) -> str:
    zpath = os.path.join(tmpdir, "loongcollector_spark.zip")
    pkg = os.path.join(REPO, "loongcollector_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_roundtrip(spark, tmp_path):
    from loongcollector_spark.synth import ensure_sequences

    input_path = ensure_sequences(2000)
    zpath = _build_zip(str(tmp_path))
    out_root = str(tmp_path / "sinks")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def submit(run_id: str) -> dict:
        proc = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--py-files", zpath,
                os.path.join(REPO, "tools", "run_job_cli.py"),
                input_path, out_root, run_id,
            ],
            # cwd OUTSIDE the repo: the zip must be the only import source
            cwd=str(tmp_path),
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = submit("smoke1")
    assert not first["resumed"]
    assert first["n_seq"] == 2000
    # fixture counts (seed=42, 2000 rows) — same as the verify recipe
    assert first["counts"]["sink_nginx"]["n_rows"] == 1403
    assert first["counts"]["sink_apsara"]["n_rows"] == 259

    second = submit("smoke1")
    assert second["resumed"]  # committed checkpoint honored across processes
    assert second["counts"] == first["counts"]
