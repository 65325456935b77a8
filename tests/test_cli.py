"""scripts/run_flagship.py — the `ray job submit` entry point contract:
fresh run succeeds and prints one JSON line; re-submission resumes (all
partitions skipped); --no-resume starts over. Runs in a subprocess with its
own Ray session (the script owns ray.init per the repo contract)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    from sts_opentelemetry_collector_ray.sources import generate_transcripts

    out = str(tmp_path_factory.mktemp("cli_corpus"))
    generate_transcripts(out, n_turns=4000, seed=7, rows_per_file=2048)
    return out


def _run(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "scripts/run_flagship.py", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def test_cli_run_and_resume(cli_corpus, tmp_path):
    out = str(tmp_path / "cli_out")
    r1 = _run("--input", cli_corpus, "--out", out, "--partitions", "2")
    assert r1["partitions_total"] == 2 and r1["partitions_skipped"] == 0
    assert r1["routed_rows"] > 0
    # re-submitting the same job resumes idempotently
    r2 = _run("--input", cli_corpus, "--out", out, "--partitions", "2")
    assert r2["partitions_skipped"] == 2
    assert r2["routed_rows"] == r1["routed_rows"]
    # --no-resume clears and recomputes to the same totals
    r3 = _run("--input", cli_corpus, "--out", out, "--partitions", "2", "--no-resume")
    assert r3["partitions_skipped"] == 0
    assert r3["routed_rows"] == r1["routed_rows"]
