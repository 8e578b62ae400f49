"""The spark-submit job surface (north rule: 'ships as a spark-submit
--py-files job'): run jobs/dedup_job.py as a fresh subprocess the way
spark-submit's driver would, and check its outputs."""

import json
import os
import subprocess
import sys


def test_dedup_job_subprocess(tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "jobs", "dedup_job.py"),
            "--synthesize",
            "600",
            "--output",
            out,
            "--checkpoint",
            ckpt,
            "--cores",
            "4",
            "--survivors",
        ],
        cwd=repo,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-3000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json_lines, proc.stdout[-2000:]
    metrics = json.loads(json_lines[-1])
    assert metrics.get("n_docs") == 600 or metrics, metrics
    assert os.path.isdir(os.path.join(out, "clusters"))
    assert os.path.isdir(os.path.join(out, "edges"))
    assert os.path.isdir(os.path.join(out, "survivors"))
    assert 0 < metrics["survivors"] <= metrics["docs"]
