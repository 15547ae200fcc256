"""Job executor CLI — the reference's Executor/builder surface.

Reference: ``scalding/Executor.scala:43-105`` parses ``--start-time`` /
``--batches`` and drives WaitingState runs; the builder module wraps this
for job authors.

Contract: ``--job package.module:build`` names a function
``build(spark) -> dict`` with keys:

* ``deltas``   — event DataFrame (must carry ``__time__`` or pass ``time_col``)
* ``store``    — a VersionedBatchStore
* ``batcher``  — a Batcher
* ``state``    — CheckpointState path (str) or instance
* optional ``time_col``, ``value_col``

Then::

    python -m summingbird_spark.cli --job myjobs:build --batches 3
    python -m summingbird_spark.cli --job myjobs:build --through-time 2024-01-31
"""

from __future__ import annotations

import argparse
import datetime as dt
import importlib
import json
import sys


def _load_build(spec: str):
    mod_name, _, attr = spec.partition(":")
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as e:
        raise SystemExit(f"error: cannot import job module {mod_name!r}: {e}")
    try:
        return getattr(mod, attr or "build")
    except AttributeError:
        raise SystemExit(f"error: {mod_name!r} has no attribute {attr or 'build'!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="summingbird_spark.cli")
    ap.add_argument("--job", help="module:build_fn")
    ap.add_argument("--batches", type=int, help="advance N batches past the committed bound")
    ap.add_argument("--through-time", help="ISO date/time upper bound (exclusive batch computed)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", default="32")
    ap.add_argument(
        "--lint-plan", metavar="FILE",
        help="scale-lint a captured physical-plan text ('-' = stdin) and "
        "exit 1 on error-level findings; no SparkSession needed",
    )
    args = ap.parse_args(argv)
    if args.lint_plan is not None:
        from .lint import lint_plan

        if args.lint_plan == "-":
            text = sys.stdin.read()
        else:
            with open(args.lint_plan, encoding="utf-8") as fh:
                text = fh.read()
        findings = lint_plan(None, plan=text)
        for f in findings:
            print(f)
        return 1 if any(f.level == "error" for f in findings) else 0
    if args.job is None:
        ap.error("--job is required (or use --lint-plan)")
    if (args.batches is None) == (args.through_time is None):
        ap.error("exactly one of --batches / --through-time")

    from pyspark.sql import SparkSession, functions as F

    from .batch.state import CheckpointState, run_batch_job
    from .core.graph import TIME_COL

    preexisting = SparkSession.getActiveSession() is not None
    spark = (
        SparkSession.builder.master(args.master)
        .appName("summingbird-spark-job")
        .config("spark.sql.shuffle.partitions", args.shuffle_partitions)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        job = _load_build(args.job)(spark)
        deltas, store, batcher = job["deltas"], job["store"], job["batcher"]
        state = job["state"]
        if isinstance(state, str):
            state = CheckpointState(state)
        if "time_col" in job and job["time_col"] != TIME_COL:
            deltas = deltas.withColumn(TIME_COL, F.col(job["time_col"]).cast("timestamp"))

        if args.through_time:
            t = dt.datetime.fromisoformat(args.through_time)
            # exclusive upper bound: only fully elapsed batches commit.
            # batch_of(t) is the batch CONTAINING t — committing it
            # mid-batch would freeze a partial batch that rollforward
            # never recomputes (it only plans batches past the bound).
            through = batcher.batch_of(t) - 1
            if through < 0:
                raise SystemExit(
                    f"--through-time {args.through_time}: no batch has fully "
                    "elapsed before this instant"
                )
        else:
            last = state.committed_through()
            if last is None:
                raise SystemExit("--batches needs a committed starting point; use --through-time first")
            through = last + args.batches

        snap = run_batch_job(
            spark, store, deltas, batcher, through, state,
            value_col=job.get("value_col", "value"),
        )
        print(json.dumps({
            "committed_through": state.committed_through(),
            "store_rows": snap.count(),
            "store_path": store.path,
        }))
        return 0
    finally:
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
