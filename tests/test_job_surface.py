"""The spark-submit job surface (north rule: 'ships as a spark-submit
--py-files job'): run jobs/dedup_job.py as a fresh subprocess the way
spark-submit's driver would, and check its outputs."""

import json
import os
import subprocess
import sys


def test_corpus_job_subprocess(tmp_path):
    """jobs/corpus_job.py end-to-end: dedup survivors -> boilerplate
    filter -> decontamination -> mixture sample; monotone stage counts
    and the mixture affecting only mapped languages."""
    out = str(tmp_path / "corpus_out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "jobs", "corpus_job.py"),
            "--synthesize",
            "600",
            "--output",
            out,
            "--cores",
            "4",
            "--mix",
            "en=50",
            "--scrub-pii",
            "--gopher",
            "--dedup-spans",
            "8",
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
    m = json.loads(json_lines[-1])
    assert (
        m["docs"]
        >= m["after_url_dedup"]
        >= m["after_dedup"]
        >= m["after_boilerplate"]
        >= m["after_gopher"]
        >= m["after_decontamination"]
        >= m["corpus"]
        > 0
    ), m
    # --scrub-pii reports counts (the synthetic corpus carries no PII,
    # so zeros — the stage itself ran and the count columns were
    # aggregated and dropped from the output schema)
    assert set(m["pii_redactions"]) == {"n_email", "n_ipv4", "n_phone"}, m
    # --dedup-spans ran and reported its removed-token count (the
    # doc-level dedup may or may not leave shared spans behind at this
    # corpus size, so the count is only required to be present + sane)
    assert m["span_tokens_removed"] >= 0, m
    # the synthetic benchmark slice is drawn from the corpus itself, so
    # decontamination must actually remove documents
    assert m["after_decontamination"] < m["after_boilerplate"], m
    assert os.path.isdir(os.path.join(out, "corpus"))
    assert sum(m["by_lang"].values()) == m["corpus"]


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
