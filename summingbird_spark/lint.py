"""Plan scale-linter: inspect a DataFrame's physical plan for the
hazards that are invisible at test scale and fatal at 100 TB.

``tests/test_plan_quality.py`` hand-asserts these invariants for the
repo's own queries; this module generalizes them into a user-facing
tool, so a pipeline author can gate THEIR composition the same way::

    from summingbird_spark.lint import lint_plan, assert_scalable

    findings = lint_plan(df)          # [] or [Finding, ...]
    assert_scalable(df)               # raises PlanScaleError on errors

Checks (each names its finding ``code``):

* ``cartesian``        — ``CartesianProduct`` / non-broadcast
  ``BroadcastNestedLoopJoin``: Θ(n·m) pairwise work. ERROR.
* ``python-udf``       — row-at-a-time ``BatchEvalPython`` (a plain
  ``F.udf``): pickled per-row transfer, 10-100× slower than Arrow.
  ERROR (``ArrowEvalPython`` / pandas-UDF stages pass).
* ``global-window``    — an ``Exchange SinglePartition`` feeding a
  Window/Sort: the whole dataset serializes through ONE task (the
  classic unpartitioned ``Window.orderBy``). ERROR.
* ``single-partition`` — any other ``Exchange SinglePartition`` that is
  not a scalar aggregate's final reduce. WARN (legitimate for driver-
  bound metadata; deadly mid-pipeline).
* ``pushdown``         — a parquet scan whose ``PushedFilters`` is empty
  while a ``Filter`` sits directly above it: the predicate is evaluated
  AFTER reading every row. WARN (some predicates are genuinely
  un-pushable; at 100 TB most should not be).
* ``shuffles``         — informational count of ``Exchange`` nodes.

The linter reads ``explain``-style plan text, so it works on any
DataFrame (batch or a streaming micro-batch plan) without private
Catalyst APIs beyond ``queryExecution``. With AQE enabled the
pre-execution physical plan is still the complete operator tree —
AQE only re-optimizes exchanges at runtime, which can IMPROVE on what
the lint sees, never add a cartesian or a Python UDF.

Reference analog: Summingbird's options system (summingbird-core
Options.scala) let authors pin per-node parallelism because its
planners could not introspect cost; Spark plans are inspectable, so
the engine can *audit* instead of requiring hand-tuning.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = [
    "Finding", "PlanScaleError", "lint_plan", "assert_scalable",
    "streaming_plan_text", "lint_streaming_query",
    "attach_streaming_lint",
]

ERROR = "error"
WARN = "warn"
INFO = "info"


@dataclass(frozen=True)
class Finding:
    level: str  # error | warn | info
    code: str
    message: str

    def __str__(self) -> str:  # readable in assertion output / logs
        return f"[{self.level}] {self.code}: {self.message}"


class PlanScaleError(AssertionError):
    """Raised by assert_scalable when the plan has error-level findings."""

    def __init__(self, findings: list[Finding]):
        self.findings = findings
        super().__init__(
            "plan has scale hazards:\n  " + "\n  ".join(map(str, findings))
        )


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _indent(line: str) -> int:
    """Tree depth proxy: count of leading plan-art characters."""
    return len(line) - len(line.lstrip(" :+-*("))


def streaming_plan_text(query) -> str:
    """The last EXECUTED micro-batch physical plan of a
    ``StreamingQuery`` as explain text — the plan that actually ran
    inside the trigger, stateful operators, state-store exchanges and
    all. Works on a terminated query too (an ``availableNow`` run that
    already drained), so a harness can run-then-audit::

        q = df.writeStream...start(); q.awaitTermination()
        findings = lint_plan(None, plan=streaming_plan_text(q))

    This is the plan the engine-wide batch gate CANNOT see: linting a
    stream query's post-run output table audits only the re-read scan,
    not the stateful kernel that executed inside the trigger (VERDICT
    r15 item 3). ``lint_streaming_query`` wraps the two steps."""
    return query._jsq.explainInternal(False)


def lint_streaming_query(query) -> list[Finding]:
    """``lint_plan`` over a (possibly terminated) StreamingQuery's last
    executed micro-batch plan."""
    return lint_plan(None, plan=streaming_plan_text(query))


def attach_streaming_lint(spark, on_error: str = "warn"):
    """Runtime guard: a ``StreamingQueryListener`` that lints every
    streaming query's EXECUTED micro-batch plan once, at its first
    progress event — the always-on deployment counterpart of the
    run-then-audit pattern (a long-lived job should not need a test
    harness to notice it shipped a cartesian or a row-at-a-time UDF
    into its trigger)::

        listener = attach_streaming_lint(spark)   # before .start()
        ...
        listener.findings        # {query_id: [Finding, ...]}
        spark.streams.removeListener(listener)    # detach

    ``on_error='warn'`` (default) emits a ``RuntimeWarning`` naming the
    query and its error-level findings; ``'log'`` records them in
    ``listener.findings`` only. Raising is deliberately NOT offered:
    the listener bus is asynchronous — an exception there cannot fail
    the query, only kill the listener — so the enforcement posture is
    observe-and-alarm (gate hard in CI with
    ``lint_streaming_query``/``assert_scalable`` instead). Queries too
    short-lived to emit a progress event while active (a drained
    ``availableNow`` run) are missed here — lint those post-hoc with
    ``lint_streaming_query(q)``."""
    import warnings

    from pyspark.sql.streaming import StreamingQueryListener

    if on_error not in ("warn", "log"):
        raise ValueError(f"on_error must be 'warn' or 'log'; got {on_error!r}")

    class _LintListener(StreamingQueryListener):
        def __init__(self):
            self.findings: dict = {}

        def onQueryStarted(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

        def onQueryProgress(self, event):
            qid = str(event.progress.id)
            if qid in self.findings:
                return
            try:
                q = spark.streams.get(qid)
                if q is None:
                    return
                fs = lint_streaming_query(q)
            except Exception:  # noqa: BLE001 — a lint failure must never
                return         # disturb the listener bus or the query
            self.findings[qid] = fs
            errs = [f for f in fs if f.level == ERROR]
            if errs and on_error == "warn":
                name = event.progress.name or qid
                warnings.warn(
                    f"streaming query {name!r}: micro-batch plan has scale "
                    "hazards:\n  " + "\n  ".join(map(str, errs)),
                    RuntimeWarning,
                )

    listener = _LintListener()
    spark.streams.addListener(listener)
    return listener


def lint_plan(df: DataFrame | None, plan: str | None = None) -> list[Finding]:
    """Lint ``df``'s physical plan; returns findings, worst first.

    ``plan`` overrides the plan text (for linting a captured explain
    string, e.g. from a log; ``df`` may then be None)."""
    text = plan if plan is not None else _physical_plan(df)
    lines = text.splitlines()
    findings: list[Finding] = []

    # -- cartesian / nested-loop joins --------------------------------
    def _subtree(i: int) -> list[str]:
        depth = _indent(lines[i])
        out = []
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and _indent(lines[j]) <= depth:
                break
            out.append(lines[j])
        return out

    def _broadcast_side_is_scalar(i: int) -> bool:
        """True when the BNLJ's broadcast subtree is a grand (keys=[])
        aggregate — the standard 'join every row with one scalar' plan
        (corpus stats, a bloom bitset, a model row): O(n), not O(n*m)."""
        sub = _subtree(i)
        for k, ln in enumerate(sub):
            if "BroadcastExchange" not in ln:
                continue
            depth = _indent(ln)
            inner = []
            for j in range(k + 1, len(sub)):
                if sub[j].strip() and _indent(sub[j]) <= depth:
                    break
                inner.append(sub[j])
            if any(re.search(r"Aggregate\(keys=\[\]", l) for l in inner):
                return True
        return False

    for i, ln in enumerate(lines):
        if "CartesianProduct" in ln:
            findings.append(Finding(ERROR, "cartesian",
                "CartesianProduct: every row pairs with every row — "
                "O(n*m) work and a single-stage shuffle explosion. Add an "
                "equi-join key, or block/bucket the pairing (see "
                "functions.dedup's banded LSH for the pattern)."))
        elif "BroadcastNestedLoopJoin" in ln:
            if _broadcast_side_is_scalar(i):
                findings.append(Finding(INFO, "scalar-broadcast",
                    "BroadcastNestedLoopJoin against a scalar aggregate "
                    "— O(n) per-row constant attach; fine at any scale."))
            else:
                # BNLJ on a genuinely tiny broadcast side is sometimes
                # intentional (a bounded query set); still O(n*|small|),
                # and the lint cannot see that the side is bounded —
                # acknowledge deliberate uses via assert_scalable(allow=)
                findings.append(Finding(ERROR, "cartesian",
                    "BroadcastNestedLoopJoin: non-equi join evaluates "
                    "the predicate against every broadcast row for every "
                    "input row. Re-express with an equi-join key "
                    "(range-bucket an interval condition — see "
                    "operators/interval.py), or allow={'cartesian'} if "
                    "the broadcast side is bounded by construction."))

    # -- row-at-a-time Python UDFs ------------------------------------
    if re.search(r"\bBatchEvalPython\b", text):
        findings.append(Finding(ERROR, "python-udf",
            "BatchEvalPython: row-at-a-time Python UDF (F.udf) — pickled "
            "per-row transfer breaks codegen and runs 10-100x slower "
            "than Arrow. Use pandas_udf / mapInPandas, or better a "
            "built-in Column expression."))

    # -- single-partition exchanges -----------------------------------
    # an Exchange SinglePartition whose CONSUMER is a Window or Sort
    # means the full dataset flows through one task; one feeding a
    # final scalar HashAggregate is the normal tiny reduce.
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        consumer = ""
        my_depth = _indent(ln)
        for j in range(i - 1, -1, -1):  # nearest shallower line above
            if lines[j].strip() and _indent(lines[j]) < my_depth:
                consumer = lines[j]
                break
        # what flows INTO the one task: the next deeper line below
        child = ""
        for j in range(i + 1, len(lines)):
            if lines[j].strip():
                child = lines[j]
                break
        child_is_agg = re.search(
            r"\b(HashAggregate|SortAggregate|ObjectHashAggregate)\b", child
        )
        if re.search(r"\b(Window|Sort)\b", consumer):
            if child_is_agg:
                # grouped totals entering one task — the two-phase
                # prefix-sum offsets pattern. Bounded iff the group key
                # is (like a bucket id); flag for the author to confirm.
                findings.append(Finding(WARN, "single-partition",
                    "Exchange SinglePartition over grouped totals "
                    f"feeding {consumer.strip()[:60]!r}: fine when the "
                    "group count is bounded (e.g. prefix-sum bucket "
                    "offsets, <= n_buckets rows); a high-cardinality "
                    "group-by here is still a one-task sort."))
            else:
                findings.append(Finding(ERROR, "global-window",
                    "Exchange SinglePartition feeding "
                    f"{consumer.strip()[:60]!r}: an unpartitioned global "
                    "window/sort serializes the whole dataset through one "
                    "task. Use a two-phase prefix sum / distributed rank "
                    "(functions.packing.exclusive_prefix_sum) or add a "
                    "partitionBy."))
        elif re.search(r"\b(HashAggregate|SortAggregate|ObjectHashAggregate|"
                       r"CollectLimit|TakeOrderedAndProject)\b", consumer):
            pass  # scalar reduce / bounded top-k: rows entering are tiny
        else:
            findings.append(Finding(WARN, "single-partition",
                "Exchange SinglePartition feeding "
                f"{consumer.strip()[:60]!r}: everything downstream runs "
                "in one task. Fine for driver-bound metadata; a "
                "bottleneck mid-pipeline."))

    # -- filter pushdown ----------------------------------------------
    for i, ln in enumerate(lines):
        if "FileScan parquet" not in ln and "Scan parquet" not in ln:
            continue
        pushed = re.search(r"PushedFilters: \[(.*?)\]", ln)
        if pushed is None or pushed.group(1).strip():
            continue  # something pushed, or format lacks the field
        my_depth = _indent(ln)
        above = ""
        for j in range(i - 1, -1, -1):
            if lines[j].strip() and _indent(lines[j]) < my_depth:
                above = lines[j]
                break
        # a Filter within two plan levels of the scan (allowing the
        # ColumnarToRow shim) that pushed NOTHING down
        if re.search(r"\bFilter\b", above) or (
            "ColumnarToRow" in above
            and any(
                re.search(r"\bFilter\b", lines[k])
                for k in range(max(0, i - 3), i)
            )
        ):
            findings.append(Finding(WARN, "pushdown",
                "parquet scan with PushedFilters: [] under a Filter — "
                "the predicate is applied after reading every row. "
                "Rewrite the predicate pushably (no UDF/complex-type "
                "access on the filtered column) or pre-materialize the "
                "column."))

    # -- shuffle census -------------------------------------------------
    n_exchanges = sum(1 for ln in lines if re.search(r"\bExchange\b", ln))
    if n_exchanges:
        findings.append(Finding(INFO, "shuffles",
            f"{n_exchanges} exchange(s) in the plan — each is a full "
            "shuffle of its input at scale; verify none is avoidable "
            "(bucketed layout, broadcast, or reusing a prior "
            "partitioning)."))

    order = {ERROR: 0, WARN: 1, INFO: 2}
    findings.sort(key=lambda f: order[f.level])
    return findings


def assert_scalable(df: DataFrame, allow: set[str] | None = None) -> list[Finding]:
    """Raise ``PlanScaleError`` if ``df``'s plan has error-level findings
    (minus codes in ``allow``); returns all findings otherwise — wire it
    into a pipeline's tests exactly like tests/test_plan_quality.py."""
    findings = lint_plan(df)
    errors = [
        f for f in findings
        if f.level == ERROR and f.code not in (allow or set())
    ]
    if errors:
        raise PlanScaleError(errors)
    return findings
