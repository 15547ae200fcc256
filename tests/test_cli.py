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


def test_cli_lint_plan_text(tmp_path, capsys):
    """--lint-plan lints a captured explain text with no SparkSession:
    exit 1 + the finding on a cartesian plan, exit 0 on a clean one."""
    from summingbird_spark.cli import main

    bad = tmp_path / "bad.txt"
    bad.write_text("*(2) CartesianProduct\n+- Scan parquet [a#1]\n")
    rc = main(["--lint-plan", str(bad)])
    out = capsys.readouterr().out
    assert rc == 1 and "cartesian" in out

    good = tmp_path / "good.txt"
    good.write_text(
        "*(2) HashAggregate(keys=[k#1], functions=[sum(v#2)])\n"
        "+- Exchange hashpartitioning(k#1, 32)\n"
        "   +- *(1) HashAggregate(keys=[k#1], functions=[partial_sum(v#2)])\n"
        "      +- Scan parquet [k#1, v#2] PushedFilters: [IsNotNull(k)]\n"
    )
    rc = main(["--lint-plan", str(good)])
    out = capsys.readouterr().out
    assert rc == 0 and "shuffles" in out
