"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
COMPACT JSON line (VERDICT r5 item 1 — the r5 line carried two 110-entry
per-query maps and overflowed the driver's tail capture, so r5 has no
official headline): stdout gets only
{"metric", "value", "unit", "timing", "n_queries", "queries": <the 8
slowest only>, "total_min3_sec", "ivf_index_build_sec", "calib_sec",
"calib_io_sec", "detail", "sf"} (~500 bytes); the FULL per-query median + min-of-3 maps
(plus the streaming `stream_metrics` telemetry) go to the
``BENCH_DETAIL.json`` sidecar at the repo root and to stderr.
``calib_sec`` (r10, VERDICT r9 item 4) times a FIXED pure-JVM workload
with the same median-of-3 discipline: divide two rounds' totals by
their calib_secs before calling a uniform drift a regression — it is
the host-noise denominator. ``calib_io_sec`` (r10) is its storage twin
— a fixed parquet write + read-back — because CPU calibration is blind
to disk-side contention: a uniform drift with calib_sec flat but
calib_io_sec inflated is storage noise (observed live this round:
+30% on every query, calib_sec unchanged).

Each query executes fully (noop sink — no driver-side result transfer), so
the timing reflects scan + shuffle + aggregation, the parts that matter at
100 TB.

Methodology (r5, VERDICT r4 item 5): every query is timed THREE times and
the MEDIAN reported — single-run numbers mixed codegen-compile and GC
variance into the signal (the r3->r4 "regression" on byte-identical code
was a 4x swing on exactly the two md5-heavy queries). Labeled steady-state:
NOT comparable to the r1/r2 single-cold-run numbers. The IVF index build,
amortized infrastructure excluded from query timings, is measured cold into
a throwaway cache and reported as its own ivf_index_build_sec figure so its
cost stays visible.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# Best quiet io-calibration ever measured on the original bench host
# (BENCH_DETAIL @ 602fbbd, r13). It is a HOST-SPECIFIC constant: trusted
# only when a committed artifact corroborates it (within CORROBORATION of
# the seed), so a repo cloned onto different storage derives its baseline
# from its own artifacts instead of a foreign machine's disk (ADVICE r14).
# SPARK_GRAFT_QUIET_IO_SEED overrides (set empty to disable seeding).
_IO_SEED = 0.629
_IO_SEED_CORROBORATION = 1.25
_IO_SEED_ENV = "SPARK_GRAFT_QUIET_IO_SEED"

# Per-query noise flagging (VERDICT r14 item 4): a row whose min-of-3
# exceeds RATIO x its committed quiet min is flagged in the compact line,
# so a single-query regression is visible even when the global
# calibration gate (which only sees host-wide noise) stays silent. The
# baseline floor skips sub-second rows that live inside scheduler noise
# (observed: wordcount 0.44->0.75s on unchanged code).
_FLAG_RATIO = 1.3
_FLAG_BASELINE_FLOOR = 0.5
_QUIET_PATH = "BENCH_QUIET.json"


def _harvest_calibrations(repo_root: str) -> tuple[list[float], list[float]]:
    """(io_vals, cpu_vals) from every committed round artifact.

    Artifacts captured at a core count other than the sidecar's
    committed width are skipped: the driver's lower-core scaling pass
    (e.g. BENCH_r16_c8.json, cpus=8) runs the single-threaded CPU
    calibration with far less scheduler interference, so its calib_sec
    (0.315 vs 0.44-0.50 at 32 cores) would become the global minimum and
    stamp every full-width capture 'contended' forever. Calibration
    baselines, like the per-query floors, are only comparable at the
    same width. Wrappers without a cpus field (pre-r16) are full-width
    rounds and are kept."""
    import glob

    io_vals: list[float] = []
    cpu_vals: list[float] = []
    width = _sidecar_cpus(repo_root)

    def _harvest(doc):
        for dest, key in ((io_vals, "calib_io_sec"), (cpu_vals, "calib_sec")):
            try:
                v = float(doc.get(key, -1.0))
            except (TypeError, ValueError):
                continue
            if v > 0:
                dest.append(v)

    paths = sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json")))
    paths.append(os.path.join(repo_root, "BENCH_DETAIL.json"))
    for path in paths:
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        # round artifacts wrap the compact stdout line under "parsed"
        # (may be null when a round's tail capture failed to parse)
        if isinstance(doc, dict):
            if "cpus" in doc and str(doc["cpus"]) != width:
                continue
            _harvest(doc.get("parsed") or doc)
    return io_vals, cpu_vals


def _seed_io_vals(harvested: list[float]) -> list[float]:
    """The pinned io seed, iff this host's artifacts corroborate it."""
    override = os.environ.get(_IO_SEED_ENV)
    if override is not None:
        try:
            v = float(override)
        except ValueError:
            return []
        return [v] if v > 0 else []
    if harvested and min(harvested) <= _IO_SEED * _IO_SEED_CORROBORATION:
        return [_IO_SEED]
    return []


def quiet_baselines(repo_root: str) -> tuple[float, float]:
    """min calib_io_sec / calib_sec over every committed artifact.

    The io list is seeded with the pinned quiet constant — the repo-root
    BENCH_DETAIL.json gets overwritten by each official capture, so a
    contended official run would otherwise erase the quiet evidence the
    gate needs — but only when corroborated on this host (see _IO_SEED).
    The cpu list is NOT seeded: in-session quiet cpu (0.467) sits far
    below every official capture (0.688-0.799 across r10-r13), so
    pinning it would fire the gate on every official run."""
    io_vals, cpu_vals = _harvest_calibrations(repo_root)
    io_vals = _seed_io_vals(io_vals) + io_vals
    # the BENCH_QUIET sidecar also ratchets calibration minimums: a
    # contended official capture OVERWRITES BENCH_DETAIL.json, and the
    # quiet evidence it erased otherwise survives only in git history
    # (observed r15: quiet cpu 0.517 lost to a 0.621 capture within one
    # session)
    try:
        with open(os.path.join(repo_root, _QUIET_PATH)) as f:
            qdoc = json.load(f)
        for dest, key in ((io_vals, "calib_io_min"), (cpu_vals, "calib_cpu_min")):
            v = float(qdoc.get(key, -1.0))
            if v > 0:
                dest.append(v)
    except (OSError, ValueError, TypeError):
        pass
    return (
        min(io_vals) if io_vals else -1.0,
        min(cpu_vals) if cpu_vals else -1.0,
    )


def quiet_query_mins(repo_root: str) -> dict[str, float]:
    """Per-query quiet baselines: element-wise min of the persistent
    BENCH_QUIET.json sidecar and the committed BENCH_DETAIL.json's
    queries_min3. The sidecar exists because BENCH_DETAIL is overwritten
    by every capture (including contended ones); the sidecar only ever
    ratchets DOWN, so one noisy committed run cannot raise a baseline.
    After an intentional slow-down (a query legitimately doing more
    work), edit or delete its entry in BENCH_QUIET.json."""
    mins: dict[str, float] = {}
    for path, key in (
        (os.path.join(repo_root, _QUIET_PATH), "queries_min3"),
        (os.path.join(repo_root, "BENCH_DETAIL.json"), "queries_min3"),
    ):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        for name, v in (doc.get(key) or {}).items():
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            if v > 0 and (name not in mins or v < mins[name]):
                mins[name] = v
    return mins


def flag_slow_rows(
    timings_min: dict[str, float],
    quiet: dict[str, float],
    ratio: float = _FLAG_RATIO,
    floor: float = _FLAG_BASELINE_FLOOR,
) -> dict[str, float]:
    """{name: min3/quiet_min} for rows slower than ratio x their quiet
    baseline — only rows whose BASELINE clears the floor (sub-second rows
    swing on scheduler noise alone). min-of-3, not median: the minimum is
    the load-resistant estimator, so a flagged row is a code/plan signal,
    not one noisy sample."""
    flagged = {}
    for name, t in timings_min.items():
        base = quiet.get(name, -1.0)
        if t > 0 and base >= floor and t > ratio * base:
            flagged[name] = round(t / base, 2)
    return flagged


#: hysteresis band for the calibration ratchet (ADVICE r15): a new
#: calibration minimum more than this factor BELOW the current quiet min
#: is a suspected fluke (warm-page-cache outlier) and must be corroborated
#: by a SECOND run within the band before adoption — otherwise one
#: anomalous sample permanently lowers the baseline and the 1.15x
#: contention gate fires on every later legitimate run.
_CALIB_BAND = 1.25


def _ratchet_calib(
    prev: float, pending: float, new: float, band: float = _CALIB_BAND
) -> tuple[float, float]:
    """(adopted_min, new_pending): monotone calibration ratchet with
    two-run corroboration for suspiciously large improvements. Modest
    improvements (within ``band`` of the current min) adopt immediately;
    a drop past the band is stashed as ``pending`` and adopted only when
    the NEXT run lands within ``band`` of it (two consecutive quiet
    samples = a real host change, e.g. faster storage). -1 = unset."""
    if new is None or new <= 0:
        return prev, pending  # unmeasured run: no evidence either way
    if prev is None or prev <= 0:
        return new, -1.0  # first evidence: nothing to corroborate against
    if new >= prev:
        return prev, -1.0  # not an improvement; drop any stale pending
    if new * band >= prev:
        return new, -1.0  # within-band improvement: ordinary ratchet
    if pending is not None and pending > 0 and (
        max(pending, new) <= min(pending, new) * band
    ):
        return min(pending, new), -1.0  # corroborated across two runs
    return prev, new  # suspected fluke: hold for corroboration


def _sidecar_cpus(repo_root: str) -> str:
    """The core count the committed quiet sidecar's floors were captured
    at. Missing field (pre-r16 sidecars) defaults to '32' — every
    committed graded artifact records cpus=32. Floors are only comparable
    and only ratchetable at the same width: overhead-bound rows run
    FASTER on fewer cores, so a scaling pass would otherwise write
    lower-core floors that flag every later full-width capture."""
    try:
        with open(os.path.join(repo_root, _QUIET_PATH)) as f:
            return str(json.load(f).get("cpus", "32"))
    except (OSError, ValueError):
        # unreadable/corrupt sidecar: return the fixed committed width,
        # NOT the current run's $SPARK_GRAFT_CPUS — echoing the run's
        # width would let a lower-core graded run count as
        # official_shape in the bootstrap path and commit lower-core
        # floors (ADVICE r16 item 1; the exact failure the r16
        # lower-core guard fixed for the non-bootstrap path)
        return "32"


def update_quiet_sidecar(
    repo_root: str,
    timings_min: dict[str, float],
    calib_io_min: float = -1.0,
    calib_cpu_min: float = -1.0,
    cpus: str = "32",
) -> None:
    """Ratchet the persistent per-query quiet mins down with this run —
    and the calibration minimums with them (with ``_ratchet_calib``'s
    two-run corroboration for outsized drops), so the gate's quiet
    baseline survives BENCH_DETAIL being overwritten by a later
    contended run without ever baselining on a one-off fluke."""
    path = os.path.join(repo_root, _QUIET_PATH)
    mins = quiet_query_mins(repo_root)
    for name, t in timings_min.items():
        if t > 0 and (name not in mins or t < mins[name]):
            mins[name] = t
    prev_io, prev_cpu = -1.0, -1.0
    pend_io, pend_cpu = -1.0, -1.0
    try:
        with open(path) as f:
            qdoc = json.load(f)
        prev_io = float(qdoc.get("calib_io_min", -1.0))
        prev_cpu = float(qdoc.get("calib_cpu_min", -1.0))
        pend_io = float(qdoc.get("calib_io_pending", -1.0))
        pend_cpu = float(qdoc.get("calib_cpu_pending", -1.0))
    except (OSError, ValueError, TypeError):
        pass
    io_min, pend_io = _ratchet_calib(prev_io, pend_io, calib_io_min)
    cpu_min, pend_cpu = _ratchet_calib(prev_cpu, pend_cpu, calib_cpu_min)
    doc = {
        "_note": (
            "per-query quiet min-of-3 baselines (sf0.1 graded runs; "
            "monotone-decreasing). bench.py flags rows >"
            f"{_FLAG_RATIO}x these in its compact line. Delete a row "
            "after an intentional slow-down. calib_*_min feed the "
            "host-noise gate's quiet baseline; calib_*_pending holds a "
            f"suspected-fluke minimum (>{_CALIB_BAND}x below the quiet "
            "min) awaiting a second corroborating run."
        ),
        "cpus": cpus,
        "calib_io_min": round(io_min, 3),
        "calib_cpu_min": round(cpu_min, 3),
        "calib_io_pending": round(pend_io, 3),
        "calib_cpu_pending": round(pend_cpu, 3),
        "queries_min3": {k: round(v, 3) for k, v in sorted(mins.items())},
    }
    try:
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
    except OSError as e:
        print(f"bench error writing {path}: {e}", file=sys.stderr)


def classify_capture(
    graded_run: bool,
    res: dict,
    noise: float,
    have_baseline: bool,
    quiet_mins: dict[str, float],
    timings_min: dict[str, float],
) -> tuple[str, float]:
    """(calib_status, quiet_ratchet_total) for the artifact's own
    attribution (VERDICT r15 item 5). Status values:

    * ``ungated``    — iteration shape: a non-graded SF, or the graded
      dir at a core count other than the sidecar's committed width (the
      driver's scaling pass) — no comparable baselines either way
    * ``unmeasured`` — a calibration row failed to sample
    * ``no-baseline``— first graded run on this host (nothing to compare)
    * ``contended``  — calibration out-of-band vs the quiet baseline even
      after the bounded re-run: the headline carries host noise
    * ``quiet``      — calibration within band; the headline is code

    ``quiet_ratchet_total`` sums the committed quiet min-of-3 baselines
    over THIS run's successfully-timed rows — the like-for-like quiet
    total a contended headline should be read against (−1 when no
    baselines cover this run's rows)."""
    covered = [
        quiet_mins[n] for n, t in timings_min.items()
        if t > 0 and n in quiet_mins
    ]
    quiet_total = round(sum(covered), 3) if covered else -1.0
    if not graded_run:
        return "ungated", quiet_total
    if res["calib_io_sec"] <= 0 or res["calib_sec"] <= 0:
        return "unmeasured", quiet_total
    if not have_baseline:
        return "no-baseline", quiet_total
    return ("contended" if noise > 1.15 else "quiet", quiet_total)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("summingbird-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesce targets shuffle BYTES; at bench scale every
        # exchange is < minPartitionSize (1m default) so CPU-bound window/
        # agg stages collapse to 1-5 tasks (measured: asof_windowed 3.9s
        # -> 1.0s). A lower floor keeps local parallelism; at 100 TB
        # partitions dwarf 1m and parallelismFirst already keeps
        # defaultParallelism, so this only affects small-corpus runs.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from summingbird_spark.queries import QUERIES

    # Warmup (excluded from timings): JVM/codegen, one parquet scan, and
    # the Python worker daemons (reused by every later mapInPandas /
    # applyInPandas stage) — session-startup cost, not query cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from summingbird_spark.sources.tables import load_table

    try:
        load_table(spark, sf_dir, "region").count()
    except Exception:
        pass
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    ivf_build_sec = -1.0
    try:
        # index build is amortized infrastructure (built once, probed by
        # every query) — pre-build it like the parquet itself, but time a
        # COLD build into a throwaway cache so the cost stays visible
        import shutil
        import tempfile

        from summingbird_spark.functions.similarity import ensure_ivf_index

        cold_root = tempfile.mkdtemp(prefix="sbspark-ivf-bench-")
        t0 = time.perf_counter()
        ensure_ivf_index(
            spark, sf_dir, k=32, n_iter=5, sample_fraction=0.5,
            cache_root=cold_root,
        )
        ivf_build_sec = round(time.perf_counter() - t0, 3)
        shutil.rmtree(cold_root, ignore_errors=True)
        # the graded query paths read the default-cache artifacts (k=32
        # for the ANN rows; k=96 for semantic_dedup_partitioned — above
        # the two-level cutoff so the cogrouped assigner engages)
        ensure_ivf_index(spark, sf_dir, k=32, n_iter=5, sample_fraction=0.5)
        ensure_ivf_index(spark, sf_dir, k=96, n_iter=4, sample_fraction=0.5)
    except Exception as e:
        print(f"bench error in ivf_index_build: {e}", file=sys.stderr)
    lsh_build_sec = -1.0
    try:
        # same treatment for the LSH bucket table (ensure_lsh_index):
        # cold build timed into a throwaway cache, then the default-cache
        # artifact is pre-built for the query runs
        import shutil
        import tempfile

        from summingbird_spark.functions.similarity import ensure_lsh_index

        cold_root = tempfile.mkdtemp(prefix="sbspark-lsh-bench-")
        t0 = time.perf_counter()
        ensure_lsh_index(spark, sf_dir, planes=6, tables=20, cache_root=cold_root)
        lsh_build_sec = round(time.perf_counter() - t0, 3)
        shutil.rmtree(cold_root, ignore_errors=True)
        ensure_lsh_index(spark, sf_dir, planes=6, tables=20)
    except Exception as e:
        print(f"bench error in lsh_index_build: {e}", file=sys.stderr)
    q8_build_sec = -1.0
    try:
        # and the int8 quantized-corpus artifact (ensure_quantized_table)
        import shutil
        import tempfile

        from summingbird_spark.functions.similarity import ensure_quantized_table

        cold_root = tempfile.mkdtemp(prefix="sbspark-q8-bench-")
        t0 = time.perf_counter()
        ensure_quantized_table(spark, sf_dir, cache_root=cold_root)
        q8_build_sec = round(time.perf_counter() - t0, 3)
        shutil.rmtree(cold_root, ignore_errors=True)
        ensure_quantized_table(spark, sf_dir)
    except Exception as e:
        print(f"bench error in q8_build: {e}", file=sys.stderr)

    stream_warmup_sec = -1.0
    try:
        # streaming warmup (VERDICT r7 item 5): the FIRST StreamingQuery
        # of a JVM pays one-time init (state-store provider classes,
        # streaming-specific codegen, checkpoint IO paths) that the
        # per-query timings otherwise charge to whichever streaming row
        # runs first. Pay it here on a two-row file stream through a
        # stateful aggregate + real checkpoint, and report the cost as
        # its own field so the three lifecycle rows show steady state.
        import shutil
        import tempfile

        warm_root = tempfile.mkdtemp(prefix="sbspark-stream-warm-")
        src = f"{warm_root}/src"
        spark.createDataFrame(
            [("k", 1.0)], "key string, value double"
        ).coalesce(1).write.parquet(src)
        t0 = time.perf_counter()
        wq = (
            spark.readStream.schema("key string, value double").parquet(src)
            .groupBy("key").count()
            .writeStream.format("noop")
            .option("checkpointLocation", f"{warm_root}/ckpt")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if wq.awaitTermination(120):
            stream_warmup_sec = round(time.perf_counter() - t0, 3)
        else:
            # a hung warmup must not keep running into the timed queries
            # (its source/checkpoint dir is rmtree'd below) nor report a
            # bogus elapsed figure — stop it and leave the -1 marker
            wq.stop()
            print("bench error in stream_warmup: timeout", file=sys.stderr)
        shutil.rmtree(warm_root, ignore_errors=True)
    except Exception as e:
        print(f"bench error in stream_warmup: {e}", file=sys.stderr)

    def run_one(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # host-noise calibration (VERDICT r9 item 4): a FIXED pure-JVM
    # workload — independent of the corpus and of this repo's code —
    # timed with the same median-of-3 discipline. Cross-round comparisons
    # divide by calib_sec first: a uniform drift that tracks the
    # calibration constant is host load, not a code regression (r9 burned
    # judge time proving a 6.7% uniform drift was noise).
    def _calibration(spark_, _sf):
        return (
            spark_.range(50_000_000)
            .selectExpr("pmod(id * 2654435761, 1024) AS k")
            .groupBy("k")
            .count()
        )

    # I/O twin of the calibration (r10): a FIXED parquet write + full
    # read-back, corpus-independent. The pure-JVM row is blind to
    # disk-side noise — observed this round: a +30% uniform drift across
    # every query (which all scan parquet and write staging/state) with
    # calib_sec FLAT. Two denominators split the attribution: CPU drift
    # moves calib_sec, storage drift moves calib_io_sec.
    _io_calib_root = tempfile.mkdtemp(prefix="bench_io_calib_")
    # rmtree'd after the passes; atexit covers abnormal exits (a killed
    # run must not leave 4M-row parquet junk skewing the next run's
    # calib_io signal on this same disk)
    import atexit

    atexit.register(shutil.rmtree, _io_calib_root, ignore_errors=True)

    def _calibration_io(spark_, _sf):
        path = os.path.join(_io_calib_root, "t")
        (
            spark_.range(4_000_000)
            .selectExpr("id", "cast(id * 2654435761 AS string) AS s")
            .write.mode("overwrite")
            .parquet(path)
        )
        return spark_.read.parquet(path).selectExpr(
            "sum(octet_length(s)) AS b"
        )

    # production-path twins: the graded minhash/simhash/jaccard queries pin
    # portable md5 hashing for cross-engine oracle parity; these time the
    # default xxhash64 path a deployment would actually run
    def _minhash_xxh(spark, sf):
        from summingbird_spark.functions.dedup import minhash_candidates
        return minhash_candidates(
            load_table(spark, sf, "documents"), "doc_id", "text",
            num_perm=8, bands=4, shingle_n=3, portable=False)

    def _jaccard_xxh(spark, sf):
        from summingbird_spark.functions.dedup import (
            minhash_candidates, ngram_jaccard_pairs)
        docs = load_table(spark, sf, "documents")
        pairs = minhash_candidates(docs, "doc_id", "text", num_perm=8,
                                   bands=4, shingle_n=3, portable=False)
        return ngram_jaccard_pairs(docs, pairs, "doc_id", "text", shingle_n=3)

    def _simhash_xxh(spark, sf):
        from summingbird_spark.functions.dedup import simhash_table
        return simhash_table(load_table(spark, sf, "documents"),
                             "doc_id", "text", portable=False)

    # cost attribution for the graded IVF row (VERDICT r6 item 6): the
    # graded embedding_ivf_topk runs the nprobe probe PLUS an in-plan
    # exact baseline (the recall contract needs both); these time each
    # half alone so a future regression bisects from BENCH_DETAIL without
    # a session
    def _ivf_probe_only(spark, sf):
        from pyspark.sql import functions as F

        from summingbird_spark.functions.similarity import ensure_ivf_index, ivf_topk
        emb = load_table(spark, sf, "embeddings")
        queries = emb.where(F.col("vec_id") < 25)
        centroids, assigned = ensure_ivf_index(
            spark, sf, k=32, n_iter=5, sample_fraction=0.5)
        return ivf_topk(emb, queries, centroids, "vec_id", "embedding",
                        k=5, nprobe=8, assigned=assigned)

    def _ivf_exact_baseline(spark, sf):
        from pyspark.sql import functions as F

        from summingbird_spark.functions.similarity import brute_force_topk
        emb = load_table(spark, sf, "embeddings")
        queries = emb.where(F.col("vec_id") < 25)
        return brute_force_topk(emb, queries, "vec_id", "embedding", k=5)

    all_queries = dict(QUERIES)
    all_queries["dedup_minhash_lsh_xxh"] = _minhash_xxh
    all_queries["ngram_jaccard_xxh"] = _jaccard_xxh
    all_queries["simhash_fingerprint_xxh"] = _simhash_xxh
    all_queries["embedding_ivf_topk_probe"] = _ivf_probe_only
    all_queries["embedding_ivf_topk_baseline"] = _ivf_exact_baseline

    import statistics

    def sweep() -> dict:
        # median of 3, INTERLEAVED: three full passes over the suite,
        # median per query across passes. The first pass's codegen-compile
        # cost lands in the discarded tail, and — unlike three back-to-back
        # runs — a multi-minute host-load burst (observed: noisy-neighbor
        # spikes inflating single queries 10-20x) hits each query's
        # samples minutes apart, so it can poison at most one of the three.
        samples: dict[str, list[float]] = {name: [] for name in all_queries}
        calib_samples: list[float] = []
        calib_io_samples: list[float] = []
        for _ in range(3):
            # calibration rides INSIDE each pass (leading it) so its three
            # samples see the same load epochs the queries do; it is NOT
            # part of the suite total — it's the denominator for comparing
            # rounds
            try:
                calib_samples.append(run_one(_calibration))
            except Exception as e:
                print(f"bench error in calibration: {e}", file=sys.stderr)
            try:
                calib_io_samples.append(run_one(_calibration_io))
            except Exception as e:
                print(f"bench error in io calibration: {e}", file=sys.stderr)
            for name, fn in all_queries.items():
                try:
                    samples[name].append(run_one(fn))
                except Exception as e:  # keep the bench line parseable
                    print(f"bench error in {name}: {e}", file=sys.stderr)
        timings = {
            name: round(statistics.median(ts), 3) if ts else -1.0
            for name, ts in samples.items()
        }
        # min-of-3 alongside the median: on a host with multi-minute
        # noisy-neighbor bursts the minimum approximates the code's true
        # cost while the median carries the environment — reporting both
        # keeps the headline honest AND diagnosable (a median >> min row
        # is load, a median ≈ min regression is code)
        timings_min = {
            name: round(min(ts), 3) if ts else -1.0
            for name, ts in samples.items()
        }
        return {
            "timings": timings,
            "timings_min": timings_min,
            "calib_sec": round(statistics.median(calib_samples), 3)
            if calib_samples else -1.0,
            "calib_min3": round(min(calib_samples), 3)
            if calib_samples else -1.0,
            "calib_io_sec": round(statistics.median(calib_io_samples), 3)
            if calib_io_samples else -1.0,
            "calib_io_min3": round(min(calib_io_samples), 3)
            if calib_io_samples else -1.0,
        }

    # host-noise gate (r13, VERDICT r12 item 4; de-ratcheted + widened in
    # r14, VERDICT r13 items 3/7): if this sweep's io OR cpu calibration
    # inflated >15% over the quiet baseline, re-run the sweep ONCE and
    # keep the quieter capture. The baseline is the MINIMUM calibration
    # across ALL committed round artifacts (BENCH_r*.json compact lines +
    # the current BENCH_DETAIL.json), not the last artifact: baselining
    # on the last capture let one committed noisy run ratchet the
    # threshold up until the gate could never fire again (r13's contended
    # 0.967 io capture would have become the baseline). Gating on BOTH
    # discriminators catches the two observed contention flavors — disk
    # (calib_io inflated, calib flat; r12) and CPU burst (calib inflated;
    # r13 showed them coexisting). Only the graded sf0.1 artifact gets
    # the gate — iteration runs at other SFs stay single-sweep.
    repo_root = os.path.dirname(os.path.abspath(__file__))
    repo_detail_path = os.path.join(repo_root, "BENCH_DETAIL.json")
    graded_run = os.path.realpath(sf_dir) == os.path.realpath(
        "/root/testdata/sf0.1"
    )
    # The quiet sidecar's floors are per (host, CORE COUNT) — a lower-core
    # run of the graded dir (the driver's scaling pass) must neither
    # ratchet them (overhead-bound rows run FASTER on fewer cores, so an
    # 8-core sweep writes 8-core floors that make every later full-width
    # capture read as contended/flagged — observed live this round) nor
    # clobber the committed full-width BENCH_DETAIL. Such runs still
    # print the full compact line; their detail lands in /tmp and their
    # calib_status reads 'ungated' like any other iteration shape.
    official_shape = graded_run and str(cpus) == _sidecar_cpus(repo_root)
    if graded_run and not official_shape:
        print(
            f"bench: graded dir at cpus={cpus} != sidecar shape "
            f"{_sidecar_cpus(repo_root)} — scaling pass: baselines, "
            "sidecar ratchet and repo-root detail are skipped",
            file=sys.stderr,
        )

    calib_io_prev, calib_cpu_prev = (
        quiet_baselines(repo_root) if official_shape else (-1.0, -1.0)
    )
    quiet_mins = quiet_query_mins(repo_root) if official_shape else {}

    def _noise_score(r):
        """max contention ratio vs the quiet baselines (1.0 = quiet)."""
        ratios = [1.0]
        if calib_io_prev > 0 and r["calib_io_sec"] > 0:
            ratios.append(r["calib_io_sec"] / calib_io_prev)
        if calib_cpu_prev > 0 and r["calib_sec"] > 0:
            ratios.append(r["calib_sec"] / calib_cpu_prev)
        return max(ratios)

    res = sweep()
    reran = False
    if official_shape and _noise_score(res) > 1.15:
        print(
            f"bench: calibration {res['calib_io_sec']}s io / "
            f"{res['calib_sec']}s cpu vs quiet baseline {calib_io_prev}/"
            f"{calib_cpu_prev} (x{_noise_score(res):.2f}) — host "
            "contention suspected, re-running sweep once",
            file=sys.stderr,
        )
        res2 = sweep()
        reran = True
        # only adopt the re-run when its OWN calibration sampled
        # successfully — an unmeasured (-1) calibration scores a vacuous
        # 1.0 and would replace the capture with one of unknown noise
        if (
            res2["calib_io_sec"] > 0
            and res2["calib_sec"] > 0
            and _noise_score(res2) < _noise_score(res)
        ):
            res = res2

    timings = res["timings"]
    timings_min = res["timings_min"]
    calib_sec = res["calib_sec"]
    calib_min3 = res["calib_min3"]
    calib_io_sec = res["calib_io_sec"]
    calib_io_min3 = res["calib_io_min3"]
    shutil.rmtree(_io_calib_root, ignore_errors=True)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_min3 = round(sum(t for t in timings_min.values() if t >= 0), 3)
    # per-query noise attribution (VERDICT r14 item 4): flag before the
    # sidecar ratchets, so this run's own values can't be their baseline
    flagged_rows = flag_slow_rows(timings_min, quiet_mins)
    # capture attribution stamped INTO the artifact (VERDICT r15 item 5):
    # when the adopted sweep's calibration is still out-of-band after the
    # bounded re-run, the headline is a CONTENDED capture — say so in the
    # compact line itself, alongside the quiet-ratchet total for the same
    # row set, so a judge/CI reads the attribution without a session
    calib_status, quiet_total = classify_capture(
        official_shape, res, _noise_score(res),
        calib_io_prev > 0 or calib_cpu_prev > 0, quiet_mins, timings_min,
    )
    if official_shape:
        # ratchet with MEDIANS (what the gate compares), not min3 — a
        # burst-minimum baseline would fire the gate on every later run
        update_quiet_sidecar(
            repo_root, timings_min,
            calib_io_min=calib_io_sec, calib_cpu_min=calib_sec,
            cpus=str(cpus),
        )
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "timing": "median_of_3_steady_state",
        "queries": timings,
        "queries_min3": timings_min,
        "total_min3_sec": total_min3,
        "ivf_index_build_sec": ivf_build_sec,
        "lsh_index_build_sec": lsh_build_sec,
        "q8_build_sec": q8_build_sec,
        "stream_warmup_sec": stream_warmup_sec,
        "calib_sec": calib_sec,
        "calib_min3_sec": calib_min3,
        "calib_io_sec": calib_io_sec,
        "calib_io_min3_sec": calib_io_min3,
        "calib_io_prev": calib_io_prev,
        "calib_cpu_prev": calib_cpu_prev,
        "reran": reran,
        "calib_status": calib_status,
        "quiet_total_min3_sec": quiet_total,
        "flagged_rows": flagged_rows,
        # named split fields (VERDICT r6 item 6) duplicating the two
        # attribution rows above for direct lookup
        "embedding_ivf_topk_probe_sec": timings.get("embedding_ivf_topk_probe", -1.0),
        "embedding_ivf_topk_baseline_sec": timings.get(
            "embedding_ivf_topk_baseline", -1.0
        ),
        "sf": sf,
    }
    # streaming telemetry published by the queries themselves (state
    # peak/added ratio, per-micro-batch lifecycle-vs-join split) — the
    # last run's values, VERDICT r9 items 2+7
    try:
        from summingbird_spark.queries import STREAM_METRICS

        if STREAM_METRICS:
            detail["stream_metrics"] = STREAM_METRICS
    except Exception as e:
        print(f"bench error reading stream metrics: {e}", file=sys.stderr)
    # the repo-root sidecar is the graded sf0.1 artifact — an iteration
    # run at another SF (SPARK_GRAFT_SF_DIR override) or at a core count
    # other than the sidecar's committed shape (the driver's scaling
    # pass) must not clobber it with numbers at the wrong scale/width;
    # those land in /tmp instead. realpath, not normpath: a symlinked or
    # relative spelling of the canonical dir is still the graded corpus
    # (ADVICE r10).
    if official_shape:
        detail_path = repo_detail_path
    else:
        tag = os.path.basename(str(sf_dir).rstrip("/")) or "custom"
        detail_path = f"/tmp/BENCH_DETAIL_{tag}_cpus{cpus}.json"
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    except OSError as e:
        print(f"bench error writing {detail_path}: {e}", file=sys.stderr)
    print(json.dumps(detail), file=sys.stderr)
    # stdout: ONE compact line the driver's tail capture always fits —
    # headline totals plus only the 8 slowest queries by median
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:8]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "timing": "median_of_3_steady_state",
                "n_queries": len(timings),
                "queries": slowest,
                "total_min3_sec": total_min3,
                "ivf_index_build_sec": ivf_build_sec,
                "lsh_index_build_sec": lsh_build_sec,
                "q8_build_sec": q8_build_sec,
                "stream_warmup_sec": stream_warmup_sec,
                "calib_sec": calib_sec,
                "calib_io_sec": calib_io_sec,
                "calib_io_prev": calib_io_prev,
                "calib_cpu_prev": calib_cpu_prev,
                "reran": reran,
                "calib_status": calib_status,
                "quiet_total_min3_sec": quiet_total,
                "flagged_rows": flagged_rows,
                "detail": detail_path if detail_path.startswith("/tmp")
                else "BENCH_DETAIL.json",
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
