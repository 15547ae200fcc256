"""Derived-artifact caches must be CONTENT-keyed, not path-keyed.

VERDICT r4 item 3: the /tmp delta-store snapshot and the IVF index were
keyed by md5(path)+params only, so a corpus regenerated at the same path
silently served stale state to two hash-graded queries. These tests
regenerate a tiny corpus in place and assert every cache layer rebuilds:
the fingerprint itself, the IVF index path, the delta-store artifacts,
and load_table's layout-driven repartition decision.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from summingbird_spark.sources.tables import (
    corpus_fingerprint,
    load_table,
)


def _write_events(path: str, values: list[float]) -> None:
    n = len(values)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "ts": pa.array(
                [
                    dt.datetime(2024, 1, 10 + i % 10, 12, 0, 0, tzinfo=dt.timezone.utc)
                    for i in range(n)
                ],
                pa.timestamp("us", tz="UTC"),
            ),
            "value": pa.array(values, pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def _bump_mtime(path: str) -> None:
    # same-second rewrites can leave mtime unchanged on coarse filesystems;
    # the fingerprint uses mtime_ns + size, so force a visible change the
    # way a real regen (minutes later) would show one
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))


def test_fingerprint_changes_on_rewrite(tmp_path):
    p = str(tmp_path / "events.parquet")
    _write_events(p, [1.0, 2.0, 3.0])
    fp1 = corpus_fingerprint(p)
    _write_events(p, [9.0, 9.0, 9.0])  # same row count, same size class
    _bump_mtime(p)
    fp2 = corpus_fingerprint(p)
    assert fp1 != fp2
    assert corpus_fingerprint(str(tmp_path / "nope.parquet")) == "missing"


def test_fingerprint_walks_directories(tmp_path):
    d = tmp_path / "t.parquet"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), [1.0])
    fp1 = corpus_fingerprint(str(d))
    _write_events(str(d / "part-1.parquet"), [2.0])  # new file appears
    fp2 = corpus_fingerprint(str(d))
    assert fp1 != fp2


def test_ivf_index_path_changes_on_corpus_rewrite(tmp_path):
    from summingbird_spark.functions.similarity import ivf_index_path

    emb = str(tmp_path / "embeddings.parquet")
    _write_events(emb, [1.0, 2.0])  # schema irrelevant — path is keyed on stat
    p1 = ivf_index_path(str(tmp_path), k=16, n_iter=3, sample_fraction=0.2)
    _write_events(emb, [3.0, 4.0])
    _bump_mtime(emb)
    p2 = ivf_index_path(str(tmp_path), k=16, n_iter=3, sample_fraction=0.2)
    assert p1 != p2


def test_lsh_index_path_changes_on_corpus_rewrite(tmp_path):
    from summingbird_spark.functions.similarity import lsh_index_path

    emb = str(tmp_path / "embeddings.parquet")
    _write_events(emb, [1.0, 2.0])
    p1 = lsh_index_path(str(tmp_path), planes=6, tables=20)
    _write_events(emb, [3.0, 4.0])
    _bump_mtime(emb)
    p2 = lsh_index_path(str(tmp_path), planes=6, tables=20)
    assert p1 != p2
    # params are part of the key too
    assert lsh_index_path(str(tmp_path), planes=8, tables=20) != p2


def test_delta_artifacts_rebuild_on_corpus_rewrite(spark, tmp_path):
    """The graded delta_service_running state must track the corpus: after
    an in-place regen the snapshot totals reflect the NEW values."""
    from summingbird_spark.queries import _delta_artifacts

    sf = str(tmp_path)
    ev = str(tmp_path / "events.parquet")
    _write_events(ev, [1.0] * 12)
    store1, _sink1 = _delta_artifacts(spark, sf)
    snap1 = {
        r["user_id"]: r["value"]
        for r in store1.read_last(spark)[1].collect()
    }

    _write_events(ev, [5.0] * 12)
    _bump_mtime(ev)
    store2, _sink2 = _delta_artifacts(spark, sf)
    snap2 = {
        r["user_id"]: r["value"]
        for r in store2.read_last(spark)[1].collect()
    }
    assert store1.path != store2.path
    assert snap2 and all(v == 5.0 * snap1[k] for k, v in snap2.items())


def test_load_table_layout_tracks_rewrite(spark, tmp_path):
    """A documents table rewritten with a different row count must get a
    fresh repartition decision in the SAME process (the old lru_cache kept
    the first file count for the process lifetime), and the spread must be
    sized to the data — a tiny table gets a few tasks, not 32."""
    docs = str(tmp_path / "documents.parquet")
    _write_events(docs, [1.0] * 10)
    n_small = load_table(spark, str(tmp_path), "documents").rdd.getNumPartitions()

    _write_events(docs, [1.0] * 4000)
    _bump_mtime(docs)
    n_big = load_table(spark, str(tmp_path), "documents").rdd.getNumPartitions()

    assert n_small == 2  # 10 rows -> minimum spread, not defaultParallelism
    assert n_big > n_small  # rewrite picked up; spread scales with rows
