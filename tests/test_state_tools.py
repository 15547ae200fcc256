"""Checkpoint state observability (streaming/state_tools.py): the
decoded state of a live summer checkpoint must equal the running totals
the summer itself would use as ``prev`` — i.e. a batch recompute over
the ingested data — for BOTH physical layouts, without stopping or
replaying anything. The skew report must reconcile with the decoded
rows exactly."""

import datetime as dt
import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark.streaming.planner import StreamPlanner, stream_source
from summingbird_spark.streaming.state_tools import (
    read_keyed_state,
    read_summer_state,
    state_skew_report,
)

SCHEMA = "ts timestamp, key string, value long"


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def _write_chunks(spark, tmp_path, chunks, schema=SCHEMA):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(chunks):
        tmp = tmp_path / f"__c{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(tmp))
        [f] = glob.glob(str(tmp / "*.parquet"))
        dst = str(src / f"chunk{i}.parquet")
        shutil.move(f, dst)
        shutil.rmtree(str(tmp))
        t = 1_700_000_000 + i
        os.utime(dst, (t, t))
    return str(src)


@pytest.fixture()
def corpus(spark, tmp_path):
    # two micro-batches; NULL key included (it is a real state resident);
    # ts spans two daily batches so (key, batch) cells multiply
    return _write_chunks(
        spark,
        tmp_path,
        [
            [(ts(i), f"k{i % 5}", i) for i in range(40)]
            + [(ts(1), None, 100)],
            [(ts(i), f"k{i % 5}", 2 * i) for i in range(40)]
            + [(ts(30), None, 7)],
        ],
    )


def _run_summer(spark, corpus, ckpt, kb):
    src = stream_source(corpus, SCHEMA, time_col="ts",
                        max_files_per_trigger=1)
    p = src.sum_by_key("key", "value", semigroup="sum_long",
                       batcher=sb.of_days(1))
    plan = StreamPlanner(spark, summer_key_buckets=kb).plan(p)
    q = plan.start_foreach_batch(
        lambda bdf, bid: bdf.write.format("noop").mode("overwrite").save(),
        checkpoint=ckpt,
    )
    q.awaitTermination(120)


def _batch_truth(spark, corpus):
    df = spark.read.schema(SCHEMA).parquet(corpus)
    b = sb.of_days(1)
    rows = (
        df.groupBy("key", b.batch_col(F.col("ts")).alias("batch_id"))
        .agg(F.sum("value").alias("value"))
        .collect()
    )
    return {(r.key, r.batch_id): r.value for r in rows}


@pytest.mark.parametrize("kb", [None, 3], ids=["per_key", "bucketed"])
def test_read_summer_state_equals_batch_truth(spark, corpus, tmp_path, kb):
    ckpt = str(tmp_path / f"ck_{kb}")
    _run_summer(spark, corpus, ckpt, kb)
    out = read_summer_state(spark, ckpt, "key string", value_type="bigint")
    got = {(r.key, r.batch_id): r.value for r in out.collect()}
    assert got == _batch_truth(spark, corpus)
    # degeneracy guard: NULL key resident, several batches, distinct totals
    assert any(k is None for k, _ in got)
    assert len({b for _, b in got}) >= 2
    assert len(set(got.values())) > 1


def test_read_summer_state_point_in_time(spark, corpus, tmp_path):
    """batchId time travel: state AS OF the first committed micro-batch
    is the first chunk's totals only."""
    ckpt = str(tmp_path / "ck_tt")
    _run_summer(spark, corpus, ckpt, 3)
    out0 = read_summer_state(spark, ckpt, "key string",
                             value_type="bigint", batch_id=0)
    got0 = {(r.key, r.batch_id): r.value for r in out0.collect()}
    df = spark.read.schema(SCHEMA).parquet(corpus)
    first = df.withColumn("f", F.input_file_name()) \
              .where(F.col("f").contains("chunk0")).drop("f")
    b = sb.of_days(1)
    want0 = {
        (r.key, r.batch_id): r.value
        for r in first.groupBy(
            "key", b.batch_col(F.col("ts")).alias("batch_id")
        ).agg(F.sum("value").alias("value")).collect()
    }
    assert got0 == want0 and got0 != _batch_truth(spark, corpus)


def test_read_summer_state_binary_keeps_carrier(spark, tmp_path):
    """value_type='binary' round-trips the pickled python carrier — the
    escape hatch for non-SQL carriers (avg tuples, sketch maps)."""
    import pickle

    src = _write_chunks(
        spark, tmp_path,
        [[(ts(0), "a", 10), (ts(1), "a", 20), (ts(2), "b", 5)]],
    )
    ckpt = str(tmp_path / "ck_bin")
    s = stream_source(src, SCHEMA, time_col="ts")
    p = s.sum_by_key("key", "value", semigroup="avg", batcher=sb.of_days(1))
    plan = StreamPlanner(spark, summer_key_buckets=2).plan(p)
    q = plan.start_foreach_batch(
        lambda bdf, bid: bdf.write.format("noop").mode("overwrite").save(),
        checkpoint=ckpt,
    )
    q.awaitTermination(120)
    out = read_summer_state(spark, ckpt, "key string", value_type="binary")
    got = {r.key: pickle.loads(bytes(r.value)) for r in out.collect()}
    # avg carrier = {'s': sum, 'n': count}
    assert got["a"] == {"s": 30, "n": 2} and got["b"] == {"s": 5, "n": 1}


def test_read_keyed_state_temporal_loop(spark, tmp_path):
    """read_keyed_state decodes the loop-join kernels' {key: running
    fold} state for both layouts; the skew report reconciles over the
    same checkpoint (temporal cells are keyed by the key tuple itself,
    a different shape than the summer's (key, batch) cells)."""
    import pickle

    src = _write_chunks(
        spark, tmp_path,
        [[(ts(0), "a", 1), (ts(1), "a", 2), (ts(2), "b", 10)],
         [(ts(3), "a", 4), (ts(4), "c", 7)]],
    )

    def run(kb, ckpt):
        s = stream_source(src, SCHEMA, time_col="ts",
                          max_files_per_trigger=1)
        svc = sb.StoreService(value="value", out_col="running",
                              semigroup="sum_long", key_buckets=kb)
        plan = StreamPlanner(spark).plan(s.left_join(svc, on="key"))
        q = plan.start_foreach_batch(
            lambda bdf, bid: bdf.write.format("noop").mode("overwrite")
            .save(),
            checkpoint=ckpt,
        )
        q.awaitTermination(120)

    for kb, tag in [(2, "b"), (None, "pk")]:
        ckpt = str(tmp_path / f"ck_loop_{tag}")
        run(kb, ckpt)
        out = read_keyed_state(spark, ckpt, "key string").collect()
        folds = {r.key: pickle.loads(bytes(r.state)) for r in out}
        # running fold after all events: a=1+2+4, b=10, c=7
        assert folds == {"a": 7, "b": 10, "c": 7}, (tag, folds)
        rep = state_skew_report(spark, ckpt).collect()
        assert sum(r.logical_keys if kb else 1 for r in rep) == 3
        assert all(r.state_bytes > 0 for r in rep)


def test_replay_free_rebucket_migration(spark, tmp_path):
    """The 100-TB migration path end-to-end: generation A runs at one
    bucket count; its state is exported re-routed under a NEW count
    (export_summer_bootstrap); generation B starts a FRESH checkpoint at
    the new count over ONLY the go-forward corpus, seeded by the export
    — no replay of A's data — and (1) its first emissions see prev =
    exactly where A stopped, (2) the final state equals a one-shot batch
    recompute over A ∪ B."""
    from summingbird_spark.streaming.state_tools import (
        export_summer_bootstrap,
    )

    def day(d, h):
        return dt.datetime(2024, 1, 1 + d, h)

    # generation A: two triggers, keys k0..k4 + NULL, two daily batches
    tmp_path.joinpath("a").mkdir()
    tmp_path.joinpath("b").mkdir()
    src_a = _write_chunks(
        spark, tmp_path.joinpath("a"),
        [
            [(day(0, i), f"k{i % 5}", i + 1) for i in range(10)]
            + [(day(0, 3), None, 50)],
            [(day(1, i), f"k{i % 5}", 2 * i) for i in range(10)],
        ],
    )
    ck_a = str(tmp_path / "ck_a")
    _run_summer(spark, src_a, ck_a, kb=5)

    boot = str(tmp_path / "boot")
    n = export_summer_bootstrap(spark, ck_a, boot, "key string",
                                new_key_buckets=3)
    truth_a = _batch_truth(spark, src_a)
    assert n == len(truth_a)  # every in-flight cell exported

    # generation B: go-forward corpus ONLY (k0/k2 continue, NULL
    # continues, k9 is new); final touch-all chunk (value 0) drives every
    # key through its bucket so the whole carried-in state materializes
    all_keys = [f"k{i}" for i in range(5)] + [None, "k9"]
    src_b = _write_chunks(
        spark, tmp_path.joinpath("b"),
        [
            [(day(1, 20), "k0", 100), (day(2, 1), "k2", 7),
             (day(2, 2), None, 11), (day(2, 3), "k9", 13)],
            [(day(2, 12), k, 0) for k in all_keys],
        ],
    )
    ck_b = str(tmp_path / "ck_b")
    out_b = str(tmp_path / "out_b")
    src = stream_source(src_b, SCHEMA, time_col="ts",
                        max_files_per_trigger=1)
    p = src.sum_by_key("key", "value", semigroup="sum_long",
                       batcher=sb.of_days(1))
    plan = StreamPlanner(spark, summer_key_buckets=3,
                         summer_bootstrap_dir=boot).plan(p)
    q = plan.start_foreach_batch(
        lambda bdf, bid: bdf.withColumn("bid", F.lit(bid))
        .write.mode("append").parquet(out_b),
        checkpoint=ck_b,
    )
    q.awaitTermination(120)

    rows_b = spark.read.parquet(out_b).collect()
    # (1) prev continuity: k0's day-1 delta in gen B folds onto gen A's
    # day-1 total — WITHOUT gen A's corpus being replayed
    day1 = [r for r in rows_b if r.key == "k0" and r.bid == 0
            and r.prev is not None]
    assert len(day1) == 1
    assert day1[0].prev == truth_a[("k0", day1[0].batch_id)]
    assert day1[0].delta == 100

    # (2) end state == one-shot truth over A ∪ B
    union_truth = {}
    for srcd in (src_a, src_b):
        for cell, v in _batch_truth(spark, srcd).items():
            union_truth[cell] = union_truth.get(cell, 0) + v
    got = {
        (r.key, r.batch_id): r.value
        for r in read_summer_state(spark, ck_b, "key string",
                                   value_type="bigint").collect()
    }
    assert got == union_truth
    # degeneracy: k3 was never in B's real events — its cells are present
    # purely via the carried-in bootstrap (truth check already above)
    assert any(k == "k3" for k, _ in got)

    # a mistyped bootstrap dir fails loudly at plan time
    with pytest.raises(ValueError, match="bootstrap_dir"):
        StreamPlanner(spark, summer_key_buckets=3,
                      summer_bootstrap_dir=str(tmp_path / "nope")).plan(p)


def test_export_bootstrap_distinguishes_nan_from_null_float_key(
    spark, tmp_path
):
    """Exporting a PER-KEY checkpoint with a float key column must carry
    the NaN-vs-NULL distinction into the synthesized bucketed cell keys
    (pandas conflates both to NaN; the companion-flag path restores
    NAN_KEY), and both must route to the SAME bucket — exactly the
    ingest-path hash normalization."""
    import math
    import pickle

    from summingbird_spark.streaming.state_tools import (
        export_summer_bootstrap,
    )
    from summingbird_spark.streaming.stateful import NAN_KEY

    sch = "ts timestamp, key double, value long"
    rows = [
        (ts(0), 1.5, 10),
        (ts(1), float("nan"), 20),
        (ts(2), None, 30),
        (ts(3), float("nan"), 2),
    ]
    src = tmp_path / "fsrc"
    src.mkdir()
    spark.createDataFrame(rows, sch).coalesce(1).write.parquet(
        str(src / "c0")
    )
    stream = stream_source(str(src / "c0"), sch, time_col="ts")
    p = stream.sum_by_key("key", "value", semigroup="sum_long",
                          batcher=sb.of_days(1))
    ck = str(tmp_path / "fck")
    plan = StreamPlanner(spark, summer_key_buckets=None).plan(p)
    q = plan.start_foreach_batch(
        lambda bdf, bid: bdf.write.format("noop").mode("overwrite").save(),
        checkpoint=ck,
    )
    q.awaitTermination(120)

    boot = str(tmp_path / "fboot")
    n = export_summer_bootstrap(spark, ck, boot, "key double",
                                new_key_buckets=4)
    assert n == 3  # 1.5, NaN, NULL — three logical keys, one batch each

    raw = spark.read.parquet(boot).collect()
    cells = {}
    for r in raw:
        kt, b = pickle.loads(bytes(r.cell))
        cells[kt] = (r["__kb__"], pickle.loads(bytes(r.total)))
    # NaN carried as the NAN_KEY sentinel, NULL as None — distinct cells
    # with the right totals, in the SAME bucket
    assert cells[(NAN_KEY,)][1] == 22 and cells[(None,)][1] == 30
    assert cells[(NAN_KEY,)][0] == cells[(None,)][0]
    assert cells[(1.5,)][1] == 10


def test_state_skew_report_reconciles(spark, corpus, tmp_path):
    ckpt = str(tmp_path / "ck_skew")
    _run_summer(spark, corpus, ckpt, 3)
    rep = state_skew_report(spark, ckpt).collect()
    decoded = read_summer_state(spark, ckpt, "key string",
                                value_type="bigint").collect()
    # entries across buckets == decoded (key, batch) cells; logical keys
    # across buckets == distinct keys (each key lives in ONE bucket)
    assert sum(r.entries for r in rep) == len(decoded)
    assert sum(r.logical_keys for r in rep) == len({d.key for d in decoded})
    assert all(r.state_bytes > 0 for r in rep)
    assert all(r.bucket is not None for r in rep)
    # per-key layout: bucket is NULL, one logical key per group
    ck2 = str(tmp_path / "ck_skew_pk")
    _run_summer(spark, corpus, ck2, None)
    rep2 = state_skew_report(spark, ck2).collect()
    assert all(r.bucket is None and r.logical_keys == 1 for r in rep2)
    assert sum(r.entries for r in rep2) == len(decoded)


def test_suggest_key_buckets_from_residency(spark, corpus, tmp_path):
    """suggest_key_buckets applies the auto clamp to MEASURED resident
    keys (not a corpus estimate) and reports the skew extremes."""
    from summingbird_spark.streaming.state_tools import suggest_key_buckets
    from summingbird_spark.streaming.stateful import AUTO_MIN_BUCKETS

    ck = str(tmp_path / "ck_sug")
    _run_summer(spark, corpus, ck, kb=3)
    rec = suggest_key_buckets(spark, ck)
    assert rec["resident_keys"] == 6  # k0..k4 + NULL
    assert rec["current_buckets"] == 3  # CONFIGURED layout (from the pin)
    assert rec["suggested_buckets"] == AUTO_MIN_BUCKETS  # floors at 8
    assert rec["max_bucket_keys"] >= 2  # 6 keys over 3 buckets
    assert rec["max_bucket_bytes"] > 0

    ck2 = str(tmp_path / "ck_sug_pk")
    _run_summer(spark, corpus, ck2, kb=None)
    rec2 = suggest_key_buckets(spark, ck2)
    assert rec2["current_buckets"] is None
    assert rec2["resident_keys"] == 6

    # sparse layout: 64 configured buckets, only ~6 populated — the
    # report must state the CONFIGURED count, not the populated one
    ck3 = str(tmp_path / "ck_sug_sparse")
    _run_summer(spark, corpus, ck3, kb=64)
    rec3 = suggest_key_buckets(spark, ck3)
    assert rec3["current_buckets"] == 64
    assert rec3["resident_keys"] == 6


def test_key_fields_parses_parameterized_types():
    """DDL parsing must survive parameterized/nested key types — a naive
    comma split turns 'decimal(10,2)' into two bogus fields."""
    from summingbird_spark.streaming.state_tools import _key_fields

    assert _key_fields("amount decimal(10,2), k string") == ["amount", "k"]
    assert _key_fields("m map<string,int>, a array<int>") == ["m", "a"]
    assert _key_fields("`key` string") == ["key"]


def test_keyed_bootstrap_migration_loop_join(spark, tmp_path):
    """Replay-free re-bucket migration for the LOOP-JOIN kernel: gen A's
    per-key running folds are exported (export_keyed_bootstrap) and a
    fresh gen-B checkpoint at a new bucket count continues them — the
    first go-forward event of a carried key observes gen A's fold as its
    prior state, with zero replay."""
    import pickle

    from summingbird_spark.streaming.state_tools import (
        export_keyed_bootstrap,
    )

    src_a = _write_chunks(
        spark, _mk(tmp_path, "la"),
        [[(ts(0), "a", 1), (ts(1), "a", 2), (ts(2), "b", 10)]],
    )
    out_a = str(tmp_path / "loop_out_a")
    ck_a = str(tmp_path / "loop_ck_a")

    def run(srcdir, kb, ckpt, out, boot=None):
        s = stream_source(srcdir, SCHEMA, time_col="ts",
                          max_files_per_trigger=1)
        svc = sb.StoreService(value="value", out_col="running",
                              semigroup="sum_long", key_buckets=kb,
                              bootstrap_dir=boot)
        plan = StreamPlanner(spark).plan(s.left_join(svc, on="key"))
        q = plan.start_foreach_batch(
            lambda bdf, bid: bdf.write.mode("append").parquet(out),
            checkpoint=ckpt,
        )
        q.awaitTermination(120)

    run(src_a, 5, ck_a, out_a)

    boot = str(tmp_path / "loop_boot")
    n = export_keyed_bootstrap(spark, ck_a, boot, "key string",
                               new_key_buckets=2)
    assert n == 2  # keys a, b

    # gen B: new events for a and a fresh key d, plus a touch-all probe
    # (value 0) that drives b through its bucket
    src_b = _write_chunks(
        spark, _mk(tmp_path, "lb"),
        [[(ts(10), "a", 4), (ts(11), "d", 9)],
         [(ts(20), "a", 0), (ts(20), "b", 0), (ts(20), "d", 0)]],
    )
    out_b = str(tmp_path / "loop_out_b")
    ck_b = str(tmp_path / "loop_ck_b")
    run(src_b, 2, ck_b, out_b, boot=boot)

    rows = {(r.key, r.ts): r.running
            for r in spark.read.parquet(out_b).collect()}
    # prior-state semantics: a's FIRST gen-B event observes gen A's fold
    assert rows[("a", ts(10))] == 3      # 1+2 carried, 4 not yet merged
    assert rows[("d", ts(11))] is None   # brand-new key: no prior
    # the touch-all probes observe the merged running totals
    assert rows[("a", ts(20))] == 7      # 3 carried + 4
    assert rows[("b", ts(20))] == 10     # carried verbatim, zero replay
    assert rows[("d", ts(20))] == 9

    # end state holds the continued folds
    out = read_keyed_state(spark, ck_b, "key string").collect()
    folds = {r.key: pickle.loads(bytes(r.state)) for r in out}
    assert folds == {"a": 7, "b": 10, "d": 9}


def _mk(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    return d


def test_keyed_bootstrap_migration_asof_latest(spark, tmp_path):
    """Replay-free migration for the AS-OF (latest) kernel: a migrated
    generation's probe of a key with NO new changelog events still sees
    the old generation's latest value — the carried kernel state, not a
    replay."""
    from summingbird_spark.streaming.state_tools import (
        export_keyed_bootstrap,
    )

    rsch = "rts timestamp, key string, rv long"

    def right_chunks(dirname, rows):
        d = _mk(tmp_path, dirname)
        src = d / "src"
        src.mkdir()
        import glob as g2
        import shutil as sh

        tmp = d / "__c"
        spark.createDataFrame(rows, rsch).coalesce(1).write.parquet(str(tmp))
        [f] = g2.glob(str(tmp / "*.parquet"))
        sh.move(f, str(src / "chunk0.parquet"))
        sh.rmtree(str(tmp))
        return str(src)

    ra = right_chunks("ra", [(ts(0), "a", 5), (ts(1), "b", 6)])

    def run(left_rows, right_dir, kb, ckpt, out, boot=None):
        lsrc = _write_chunks(spark, _mk(tmp_path, f"l{ckpt[-4:]}"),
                             [left_rows])
        left = stream_source(lsrc, SCHEMA, time_col="ts")
        svc = sb.TemporalService(
            lambda sp: sp.readStream.schema(rsch).parquet(right_dir),
            time_col="rts", mode="latest", value_cols=["rv"],
            key_buckets=kb, bootstrap_dir=boot,
        )
        plan = StreamPlanner(spark).plan(left.left_join(svc, on="key"))
        q = plan.start_foreach_batch(
            lambda bdf, bid: bdf.write.mode("append").parquet(out),
            checkpoint=ckpt,
        )
        q.awaitTermination(120)

    ck_a = str(tmp_path / "asof_ck_a")
    run([(ts(2), "a", 0)], ra, 5, ck_a, str(tmp_path / "asof_out_a"))

    boot = str(tmp_path / "asof_boot")
    n = export_keyed_bootstrap(spark, ck_a, boot, "key string",
                               new_key_buckets=3)
    assert n == 2

    # gen B: NEW changelog dir with only an unrelated key; probes of a/b
    # must still see gen A's latest values via the carried state
    rb = right_chunks("rb", [(ts(3), "zzz", 99)])
    out_b = str(tmp_path / "asof_out_b")
    run([(ts(10), "a", 0), (ts(10), "b", 0), (ts(10), "zzz", 0)],
        rb, 3, str(tmp_path / "asof_ck_b"), out_b, boot=boot)
    got = {r.key: r.rv for r in spark.read.parquet(out_b).collect()}
    assert got == {"a": 5, "b": 6, "zzz": 99}


# ---- bootstrap layout manifest (round 15) ----------------------------------


def test_bootstrap_manifest_pins_layout(spark, corpus, tmp_path, caplog):
    """r15 (VERDICT r14 #1): the export writes a ``_manifest.json``
    pinning the layout, and ``validate_bootstrap_dir`` verifies it — a
    bucket count that differs from the export's ``new_key_buckets`` seeds
    each key only where both hashes coincide (silent PARTIAL state), so
    the mismatch must raise naming both counts; kind and key-type drift
    must raise too (xxhash64 is type-sensitive); a same-type key RENAME
    routes identically, so it warns instead of refusing."""
    from summingbird_spark.streaming.state_tools import (
        export_summer_bootstrap,
        read_bootstrap_manifest,
    )
    from summingbird_spark.streaming.stateful import validate_bootstrap_dir

    ck = str(tmp_path / "ck")
    _run_summer(spark, corpus, ck, kb=5)
    boot = str(tmp_path / "boot")
    n = export_summer_bootstrap(spark, ck, boot, "key string",
                                new_key_buckets=3)

    m = read_bootstrap_manifest(spark, boot)
    assert m["new_key_buckets"] == 3
    assert m["kind"] == "summer"
    assert m["key_schema_fields"] == [["key", "string"]]
    assert m["cells"] == n
    # the sidecar must stay invisible to the parquet readers that load
    # the bootstrap cells (underscore-prefixed = ignored by Spark)
    assert spark.read.parquet(boot).count() == n

    kt = [("key", "string")]
    validate_bootstrap_dir(boot, 3, spark=spark, key_types=kt,
                           kind="summer")  # exact layout: passes
    with pytest.raises(ValueError, match=r"new_key_buckets=3 .*key_buckets=4"):
        validate_bootstrap_dir(boot, 4, spark=spark, key_types=kt,
                               kind="summer")
    with pytest.raises(ValueError, match=r"'summer' export but this is a 'keyed'"):
        validate_bootstrap_dir(boot, 3, spark=spark, key_types=kt,
                               kind="keyed")
    with pytest.raises(ValueError, match=r"type-sensitive"):
        validate_bootstrap_dir(boot, 3, spark=spark,
                               key_types=[("key", "bigint")], kind="summer")
    with caplog.at_level("WARNING",
                         logger="summingbird_spark.streaming.stateful"):
        validate_bootstrap_dir(boot, 3, spark=spark,
                               key_types=[("renamed", "string")],
                               kind="summer")
    assert any("key names" in r.getMessage() for r in caplog.records)


def test_bootstrap_manifest_guard_at_plan_time(spark, corpus, tmp_path):
    """Plan-time enforcement: a StreamPlanner pinned at the wrong count
    raises at ``plan()`` (before any trigger runs), and the 'auto'
    default + a bootstrap_dir is refused outright — auto re-measures the
    go-forward corpus and will essentially never equal the export count,
    which was the likely silent-partial-state user error."""
    from summingbird_spark.streaming.state_tools import (
        export_summer_bootstrap,
    )

    ck = str(tmp_path / "ck")
    _run_summer(spark, corpus, ck, kb=5)
    boot = str(tmp_path / "boot")
    export_summer_bootstrap(spark, ck, boot, "key string",
                            new_key_buckets=3)

    def pipe():
        src = stream_source(corpus, SCHEMA, time_col="ts",
                            max_files_per_trigger=1)
        return src.sum_by_key("key", "value", semigroup="sum_long",
                              batcher=sb.of_days(1))

    with pytest.raises(ValueError, match=r"key_buckets=3"):
        StreamPlanner(spark, summer_key_buckets=4,
                      summer_bootstrap_dir=boot).plan(pipe())
    with pytest.raises(ValueError, match=r"'auto' cannot be combined"):
        StreamPlanner(spark, summer_key_buckets="auto",
                      summer_bootstrap_dir=boot).plan(pipe())
    # the pinned-and-matching plan still compiles
    StreamPlanner(spark, summer_key_buckets=3,
                  summer_bootstrap_dir=boot).plan(pipe())


def test_bootstrap_dir_missing_legacy_corrupt(spark, tmp_path, caplog):
    """ADVICE r14: a scheme'd bootstrap_dir is existence-checked through
    the Hadoop FS API (a mistyped remote path must not read as empty
    state); a pre-manifest (r14) export warns but keeps working; a
    corrupt manifest refuses — an unverifiable layout must not seed."""
    from summingbird_spark.streaming.stateful import validate_bootstrap_dir

    kt = [("key", "string")]
    with pytest.raises(ValueError, match=r"does not exist"):
        validate_bootstrap_dir(f"file://{tmp_path}/nope", 3, spark=spark,
                               key_types=kt, kind="summer")

    legacy = tmp_path / "legacy"
    (legacy / "__kb__=0").mkdir(parents=True)
    with caplog.at_level("WARNING",
                         logger="summingbird_spark.streaming.stateful"):
        validate_bootstrap_dir(str(legacy), 3, spark=spark, key_types=kt,
                               kind="summer")
    assert any("pre-r15" in r.getMessage() for r in caplog.records)

    (legacy / "_manifest.json").write_text("{not json")
    with pytest.raises(ValueError, match=r"corrupt"):
        validate_bootstrap_dir(str(legacy), 3, spark=spark, key_types=kt,
                               kind="summer")


def test_export_per_key_int_key_guard(spark, tmp_path):
    """ADVICE r14 (medium): a per-key checkpoint whose integral key
    column has any NULL resident decodes through Arrow→pandas as
    float64, silently rounding key values at/beyond 2^53 — corrupting
    cell identity AND bucket routing. The export must refuse rather than
    write a plausible-looking poisoned bootstrap."""
    int_schema = "ts timestamp, key long, value long"
    src = _write_chunks(
        spark, tmp_path,
        [[(ts(0), 2 ** 53 + 7, 1), (ts(1), None, 2), (ts(2), 4, 3)]],
        schema=int_schema,
    )
    ck = str(tmp_path / "ck")
    # one state partition so the NULL resident and the >=2^53 key are
    # co-resident in one pandas chunk — the coercion needs both (a chunk
    # with no NULLs decodes as exact int64 and exports correctly)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        s = stream_source(src, int_schema, time_col="ts",
                          max_files_per_trigger=1)
        p = s.sum_by_key("key", "value", semigroup="sum_long",
                         batcher=sb.of_days(1))
        # per-key mode: keys never round-trip through pandas at ingest,
        # so the >=2^53 key is held EXACTLY in state — the hazard is the
        # export's pandas decode
        plan = StreamPlanner(spark, summer_key_buckets=None).plan(p)
        q = plan.start_foreach_batch(
            lambda bdf, bid: bdf.write.format("noop").mode("overwrite")
            .save(),
            checkpoint=ck,
        )
        q.awaitTermination(120)

        from summingbird_spark.streaming.state_tools import (
            export_summer_bootstrap,
        )

        with pytest.raises(Exception, match=r"2\^53"):
            export_summer_bootstrap(spark, ck, str(tmp_path / "boot"),
                                    "key bigint", new_key_buckets=3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_bootstrap_never_reseeds_after_eviction(spark, tmp_path):
    """VERDICT r14 #7: a summer with BOTH evict_before_batch and a
    bootstrap_dir must read the bootstrap only on each bucket's FIRST
    trigger. After eviction empties a bucket's dict the kernel persists
    the EMPTY dict (state.exists stays true) rather than removing state —
    pin that invariant: a later touch of an evicted carried-in cell sees
    prev=None, not a double-seeded copy of the old total."""
    from summingbird_spark.streaming.state_tools import (
        export_summer_bootstrap,
    )

    def day(d, h):
        return dt.datetime(2024, 1, 1 + d, h)

    b = sb.of_days(1)
    tmp_path.joinpath("a").mkdir()
    tmp_path.joinpath("b").mkdir()
    src_a = _write_chunks(
        spark, tmp_path.joinpath("a"),
        [[(day(0, 1), "k0", 40), (day(0, 2), "k0", 2), (day(0, 3), "k1", 9)]],
    )
    ck_a = str(tmp_path / "ck_a")
    _run_summer(spark, src_a, ck_a, kb=2)
    boot = str(tmp_path / "boot")
    export_summer_bootstrap(spark, ck_a, boot, "key string",
                            new_key_buckets=2)

    # gen B: day-0 cells are BELOW the eviction horizon (closed batch);
    # trigger 1 seeds from the bootstrap (prev = gen A's day-0 total),
    # then evicts the cell; trigger 2 touches the same cell again
    evict_point = b.batch_of(day(1, 0))
    src_b = _write_chunks(
        spark, tmp_path.joinpath("b"),
        [[(day(0, 20), "k0", 5)], [(day(0, 21), "k0", 7)]],
    )
    ck_b = str(tmp_path / "ck_b")
    out_b = str(tmp_path / "out_b")

    from summingbird_spark.core import semigroup as sg_mod
    from summingbird_spark.core.graph import TIME_COL
    from summingbird_spark.streaming.stateful import stateful_summer

    planner = StreamPlanner(spark)
    df = planner.compile(stream_source(src_b, SCHEMA, time_col="ts",
                                       max_files_per_trigger=1))
    base = df.select(
        "key", b.batch_col(F.col(TIME_COL)).alias("batch_id"),
        F.col(TIME_COL), F.col("value"),
    )
    out = stateful_summer(base, ["key"], "value", sg_mod.get("sum_long"),
                          evict_before_batch=evict_point, key_buckets=2,
                          bootstrap_dir=boot)
    q = (out.writeStream.foreachBatch(
            lambda bdf, bid: bdf.withColumn("bid", F.lit(bid))
            .write.mode("append").parquet(out_b))
         .outputMode("update").option("checkpointLocation", ck_b)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r.bid: r for r in spark.read.parquet(out_b).collect()}
    assert rows[0].prev == 42          # carried in exactly once
    assert rows[0].delta == 5
    assert rows[1].prev is None        # evicted — NOT re-seeded
    assert rows[1].delta == 7


def test_resize_advisory_warns_on_drifted_layout(spark, corpus, tmp_path):
    """VERDICT r14 item 5: resuming a checkpoint whose pinned layout has
    drifted ≥4x from the measured suggestion warns (naming the suggested
    count and the migration path); a layout inside the band is silent."""
    import warnings

    from summingbird_spark.streaming.planner import (
        StreamPlanner,
        guard_state_checkpoint,
    )

    def _plan_meta(kb):
        src = stream_source(corpus, SCHEMA, time_col="ts",
                            max_files_per_trigger=1)
        p = src.sum_by_key("key", "value", semigroup="sum_long",
                           batcher=sb.of_days(1))
        return StreamPlanner(spark, summer_key_buckets=kb).plan(p).state_meta

    # 6 resident keys, 64 pinned buckets: suggestion floors at 8,
    # 64 >= 4x8 -> over-provisioned drift, warn on resume
    ck = str(tmp_path / "ck_drift")
    _run_summer(spark, corpus, ck, kb=64)
    with pytest.warns(RuntimeWarning, match="suggested_buckets=8"):
        guard_state_checkpoint(None, ck, meta=_plan_meta(64), spark=spark)

    # kill switch for latency-critical starts
    import os

    os.environ["SBSPARK_RESIZE_ADVISORY"] = "0"
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            guard_state_checkpoint(None, ck, meta=_plan_meta(64), spark=spark)
    finally:
        del os.environ["SBSPARK_RESIZE_ADVISORY"]

    # same residency pinned AT the suggestion: inside the band, silent
    ck2 = str(tmp_path / "ck_in_band")
    _run_summer(spark, corpus, ck2, kb=8)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        guard_state_checkpoint(None, ck2, meta=_plan_meta(8), spark=spark)
