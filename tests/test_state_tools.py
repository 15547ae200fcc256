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


def _write_chunks(spark, tmp_path, chunks):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(chunks):
        tmp = tmp_path / f"__c{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(tmp))
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
