"""The spark-submit entry's --query mode: every registry operator is
cluster-submittable, with parquet/jsonl sinks."""

import json
import subprocess
import sys


def test_run_job_query_mode(tmp_path):
    r = subprocess.run(
        [
            sys.executable, "/root/repo/scripts/run_job.py",
            "--query", "length_percentiles",
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(tmp_path),
            "--format", "jsonl",
            "--cores", "4",
        ],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 20 and out["format"] == "jsonl"
    outdir = tmp_path / "length_percentiles"
    files = list(outdir.glob("part-*.json"))
    # under heavy parallel VM load this has flaked with an empty glob even
    # though the job reported rows=20 — if it recurs, the listing below
    # says what WAS written (see round-4 memory: known under-load flake)
    assert files, sorted(p.name for p in outdir.glob("*"))
    row = json.loads(files[0].read_text().splitlines()[0])
    assert {"source", "n_docs", "p50", "p90", "p99"} <= set(row)


def test_run_job_query_mode_rejects_unknown():
    r = subprocess.run(
        [
            sys.executable, "/root/repo/scripts/run_job.py",
            "--query", "no_such_query", "--output", "/tmp/x",
        ],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode != 0
    assert "unknown query" in r.stderr
