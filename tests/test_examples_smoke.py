"""Every documented example run line, executed exactly as documented.

The examples are the "switch from the reference" on-ramp (the reference
ships summingbird-example as a runnable artifact, not just source — e.g.
ExampleJob.scala's README run line); a pipeline that only works when
imported by tests is not runnable documentation. Each case below is the
literal command from the example's module docstring, subprocess-run at
sf0.001 against its own throwaway workdir, asserting a zero exit.

These spawn their own SparkSession per process (that IS the documented
interface), so they cost real JVM startups — kept at the smallest SF.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(cmd, extra_env=None):
    env = dict(os.environ)
    env.update(extra_env or {})
    proc = subprocess.run(
        cmd,
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        timeout=420,
    )
    tail = proc.stdout.decode(errors="replace")[-3000:]
    assert proc.returncode == 0, f"{' '.join(cmd)} failed:\n{tail}"
    return tail


def test_example_hybrid_wordcount(tmp_path):
    out = _run(
        [sys.executable, "examples/hybrid_wordcount.py", str(tmp_path / "wc")],
    )
    # the script's own end-to-end check: serving == one-shot aggregation
    assert "matches one-shot truth: True" in out


def test_example_curation_and_retrieval():
    _run([sys.executable, "examples/curation_and_retrieval.py", SF])


def test_example_llm_corpus_pipeline(tmp_path):
    _run(
        [
            sys.executable,
            "examples/llm_corpus_pipeline.py",
            SF,
            str(tmp_path / "corpus"),
        ],
    )


def test_example_sketch_analytics():
    _run([sys.executable, "examples/sketch_analytics.py", SF])


def test_example_streaming_temporal_joins():
    _run([sys.executable, "examples/streaming_temporal_joins.py", SF])


def test_example_events_daily_totals_cli(tmp_path):
    # both documented run lines verbatim, in the documented order:
    # --through-time bootstraps the commit ledger, --batches 5 rolls
    # forward from it (a fresh store correctly refuses --batches without
    # a starting point).
    env = {
        "SPARK_GRAFT_SF_DIR": SF,
        "SUMMINGBIRD_OUT": str(tmp_path / "out"),
    }
    cli = [sys.executable, "-m", "summingbird_spark.cli",
           "--job", "examples.events_daily_totals:build"]
    _run(cli + ["--through-time", "2024-01-20"], extra_env=env)
    _run(cli + ["--batches", "5"], extra_env=env)


def test_example_state_migration(tmp_path):
    out = _run(
        [sys.executable, "examples/state_migration.py",
         str(tmp_path / "mig")],
    )
    # the script's own checks: guard refusal + replay-free equality
    assert "guard refused the re-size in place" in out
    assert "migrated state matches one-shot truth: True" in out


def test_example_online_semantic_dedup(tmp_path):
    out = _run(
        [sys.executable, "examples/online_semantic_dedup.py", SF,
         str(tmp_path / "w")],
    )
    # the script's own end-to-end check: batch->stream handoff == one-shot
    assert "handoff matches one-shot truth: True" in out
    assert "dropped against a HISTORICAL resident" in out
