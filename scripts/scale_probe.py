"""Empirical scale probe for the headline LLM-pipeline operators
(VERDICT r9 item 6): the 100 TB verdicts in SCALING.md are plan-shape
arguments; this measures them. Self-generates seeded 10x / 100x
replicas of the sf0.1 documents table under /tmp (never touching
/root/testdata), runs the four probed operators at each factor, and
prints a markdown table of wall times, per-factor scaling exponents
(log-slope; 1.0 = linear), and driver RSS.

Replica construction keeps the WORKLOAD SHAPE honest: replica i > 0
prefixes every token with "r{i}x", so replicas share no vocabulary —
near-dup structure, LSH bucket sizes, and eval-gram hit rates all scale
linearly with the factor instead of exploding (a naive text copy would
make every replica an exact dup of its original and measure a different,
quadratic-pair workload). doc_ids offset by 10M per replica; the
doc_id % 97 eval selection keeps hitting ~1% per replica.

Usage: python scripts/scale_probe.py [factors ...] (default 1 10 100)

``--stream`` probes the graded STREAMING operators instead (default
factors 1 10): replicates the events table with disjoint key spaces
(user_id/event_id offset by 10M per replica, identical timestamps, so
the corpus time span and per-key density stay constant while total rows
scale), runs stream_buffer_join and stream_sum_by_key at each factor,
and reports wall time plus the engine's own ``stateOperators`` telemetry
(peak/added state rows). The scale claim under test: the buffer join's
peak/added stays FLAT (state bounded by the watermark horizon fraction
of the corpus, not by corpus size), while the summer's peak tracks the
keyset (its state IS the online store's keyset — reference semantics).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/sbspark-scaleprobe"
PROBES = ["dedup_minhash_lsh", "dedup_clusters", "decontaminate",
          "corpus_to_shards", "pack_examples"]


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def ensure_replica(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(ROOT, f"x{factor}")
    marker = os.path.join(out, "documents.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return out
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    parts = []
    for i in range(factor):
        if i == 0:
            parts.append(docs)
            continue
        pfx = F.lit(f"r{i}x")
        parts.append(
            docs.select(
                (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
                F.array_join(
                    F.transform(F.split("text", " "), lambda t: F.concat(pfx, t)),
                    " ",
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


def ensure_events_replica(spark, factor: int) -> str:
    """factor× copy of the sf0.1 events table with DISJOINT key spaces:
    replica i offsets user_id/event_id by 10M·i but keeps ts/event_type/
    value/props verbatim, so the 30-day span, the chunk boundaries, and
    each key's event density are unchanged — only the row rate scales.
    That is the deployment shape (more users, same horizon), and it is
    the shape under which bounded state must show a flat peak/added."""
    from pyspark.sql import functions as F

    out = os.path.join(ROOT, f"x{factor}")
    marker = os.path.join(out, "events.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return out
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    parts = []
    for i in range(factor):
        if i == 0:
            parts.append(ev)
            continue
        parts.append(
            ev.select(
                (F.col("event_id") + 10_000_000 * i).alias("event_id"),
                "ts",
                (F.col("user_id") + 10_000_000 * i).alias("user_id"),
                "event_type", "value", "props",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def auto_bucket_probe(spark, sf_dir: str):
    """End-to-end probe of the DEFAULT ``summer_key_buckets='auto'`` path
    at this replica factor (VERDICT r12 item 7): plans a user_id summer
    over the replica's events with the default planner, records the
    bucket count auto CHOSE (it should track the ~10x disjoint-key
    cardinality), then runs the stream to completion and reports wall +
    peak state rows — the claim under test is that auto re-sizes so the
    exponent stays flat instead of per-bucket dicts growing 10x."""
    import shutil
    import tempfile

    import summingbird_spark as sb
    from summingbird_spark.streaming.planner import StreamPlanner, stream_source

    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    src = stream_source(os.path.join(sf_dir, "events.parquet"), schema,
                        time_col="ts")
    p = src.sum_by_key("user_id", "value", semigroup="sum",
                       batcher=sb.of_days(1))
    pl = StreamPlanner(spark)  # DEFAULT planner — 'auto' since r13
    plan = pl.plan(p)
    chosen = pl.last_auto_key_buckets
    work = tempfile.mkdtemp(prefix="sbspark-autoprobe-")
    t0 = time.perf_counter()
    q = plan.start_foreach_batch(lambda bdf, bid: bdf.write.format("noop")
                                 .mode("overwrite").save(),
                                 checkpoint=f"{work}/ckpt")
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    lp = q.lastProgress or {}
    ops = lp.get("stateOperators") or [{}]
    peak = ops[0].get("numRowsTotal")
    shutil.rmtree(work, ignore_errors=True)
    return chosen, wall, peak


def stream_main(factors: list[int]) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from summingbird_spark.queries import QUERIES, STREAM_METRICS

    spark.range(1_000_000).selectExpr("sum(id)").collect()  # codegen warmup

    # r12: the as-of family joins the probe (VERDICT r11 item 1 — its
    # bucket kernel is now vectorized across keys like the loop join's)
    # and the native-window rows (item 4 — JVM session/tumbling state,
    # expected wall-flat like the buffer join).
    # r13 (VERDICT r12 item 2): the Python-carrier summer rows join —
    # stream_moments_by_key / stream_quantile_by_key were the only graded
    # streaming family without a measured exponent, and their kernels
    # just changed (vectorized avg/moments fast-agg, bincount sketch).
    probes = ["stream_buffer_join", "stream_sum_by_key", "stream_loop_join",
              "stream_asof_running", "stream_asof_windowed",
              "stream_session_window", "stream_tumbling_window",
              "stream_moments_by_key", "stream_quantile_by_key"]
    rows: list[tuple] = []
    auto_rows: list[tuple] = []
    for f in factors:
        sf_dir = ensure_events_replica(spark, f)
        auto_rows.append((f,) + auto_bucket_probe(spark, sf_dir))
        print(f"# factor {f}: auto_key_buckets chose {auto_rows[-1][1]} "
              f"({auto_rows[-1][2]:.2f}s wall, peak state "
              f"{auto_rows[-1][3]})", flush=True)
        n = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
        print(f"# factor {f}: {n} events in {sf_dir}", flush=True)
        for name in probes:
            ts, metrics = [], None
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
                metrics = STREAM_METRICS.get(name)
            m = metrics or {}
            rows.append((name, f, min(ts), m.get("peak_state_rows"),
                         m.get("added_state_rows"), m.get("peak_over_added"),
                         m.get("stateful_addbatch_sec"), m.get("lifecycle_sec")))
            print(f"  {name}: {min(ts):.2f}s  peak/added="
                  f"{m.get('peak_over_added')}  peak={m.get('peak_state_rows')}"
                  f"  added={m.get('added_state_rows')}", flush=True)
        print(f"  driver RSS after factor {f}: {rss_mb():.0f} MiB", flush=True)

    import math

    print()
    print("| operator | factor | sec | peak state | added state | "
          "peak/added | addBatch s | lifecycle s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) if not isinstance(x, float)
                                else f"{x:.2f}" for x in r) + " |")
    for name in probes:
        sub = [r for r in rows if r[0] == name]
        if len(sub) >= 2:
            (f1, t1), (f2, t2) = (sub[-2][1], sub[-2][2]), (sub[-1][1], sub[-1][2])
            if f1 == f2:  # repeated factor = a variance re-run, no exponent
                print(f"# {name}: repeat at {f2}x — {t1:.2f}s vs {t2:.2f}s")
            else:
                exp = math.log(t2 / t1) / math.log(f2 / f1)
                print(f"# {name}: wall exponent {f1}x->{f2}x = {exp:.2f}")
    print()
    print("| auto_key_buckets (default path) | factor | chosen buckets | "
          "sec | peak state |")
    print("|---|---|---|---|---|")
    for f, chosen, wall, peak in auto_rows:
        print(f"| summer user_id sum | {f} | {chosen} | {wall:.2f} | {peak} |")
    if len(auto_rows) >= 2 and auto_rows[0][2] and auto_rows[-1][2]:
        (f1, _, t1, _), (f2, _, t2, _) = auto_rows[0], auto_rows[-1]
        if f1 != f2:
            exp = math.log(t2 / t1) / math.log(f2 / f1)
            print(f"# auto summer: wall exponent {f1}x->{f2}x = {exp:.2f}, "
                  f"buckets {auto_rows[0][1]} -> {auto_rows[-1][1]}")
    spark.stop()


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--stream":
        stream_main([int(a) for a in argv[1:]] or [1, 10])
        return
    factors = [int(a) for a in argv] or [1, 10, 100]
    if len(set(factors)) != len(factors):
        # batch mode keys results by factor, so a repeated factor would
        # silently overwrite the first measurement; variance re-runs
        # belong in --stream mode (which prints a repeat comparison line)
        sys.exit("duplicate factors collapse in batch mode; run each once "
                 "or use --stream for variance re-runs")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from summingbird_spark.queries import QUERIES

    # warmups: codegen + python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    # decontaminate_fixed_eval: same operator, but the eval set stays the
    # 1x corpus's (~50 docs) at every factor — the deployment shape (a
    # fixed benchmark suite) vs the graded query's corpus-proportional
    # doc_id % 97 selection. Separates "eval grams grew 100x too" from
    # any real superlinearity in the probe side.
    def decontaminate_fixed_eval(spark_, sf_dir):
        from pyspark.sql import functions as F

        from summingbird_spark.functions.dedup import contamination

        docs = spark_.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        base1 = ensure_replica(spark_, 1)
        eval_set = (
            spark_.read.parquet(os.path.join(base1, "documents.parquet"))
            .where(F.col("doc_id") % 97 == 0)
        )
        return contamination(docs, eval_set, "doc_id", "text", shingle_n=3)

    probes = {name: (lambda n: lambda s, d: QUERIES[n](s, d))(name)
              for name in PROBES}
    probes["decontaminate_fixed_eval"] = decontaminate_fixed_eval

    results: dict[str, dict[int, float]] = {p: {} for p in probes}
    mem: dict[int, float] = {}
    for f in factors:
        sf_dir = ensure_replica(spark, f)
        n = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
        print(f"# factor {f}: {n} docs in {sf_dir}", flush=True)
        for name, fn in probes.items():
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            results[name][f] = min(ts)
            print(f"  {name}: {min(ts):.2f}s (runs: "
                  + ", ".join(f"{t:.2f}" for t in ts) + ")", flush=True)
        mem[f] = rss_mb()
        print(f"  driver RSS after factor {f}: {mem[f]:.0f} MiB", flush=True)

    import math

    hdr = "| operator | " + " | ".join(f"{f}x sec" for f in factors)
    hdr += " | exponent (last step) |"
    print()
    print(hdr)
    print("|" + "---|" * (len(factors) + 2))
    for name in probes:
        row = results[name]
        cells = " | ".join(f"{row[f]:.2f}" for f in factors)
        if len(factors) >= 2 and factors[-2] != factors[-1]:
            f1, f2 = factors[-2], factors[-1]
            exp = math.log(row[f2] / row[f1]) / math.log(f2 / f1)
            e = f"{exp:.2f}"
        else:
            e = "n/a"
        print(f"| {name} | {cells} | {e} |")
    print("| driver RSS MiB | "
          + " | ".join(f"{mem[f]:.0f}" for f in factors) + " | — |")
    spark.stop()


if __name__ == "__main__":
    main()
