"""CLI executor (scalding/Executor.scala analog)."""

import json
import os

from summingbird_spark.cli import main


def test_cli_runs_job_and_advances_batches(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("SUMMINGBIRD_OUT", str(tmp_path))
    rc = main([
        "--job", "examples.events_daily_totals:build",
        "--through-time", "2024-01-10",
    ])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["store_rows"] > 0

    rc = main([
        "--job", "examples.events_daily_totals:build",
        "--batches", "5",
    ])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["committed_through"] == out1["committed_through"] + 5
