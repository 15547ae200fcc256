"""In-plan materialization with a durability escape hatch (r17).

Several operators pin ONE evaluation of an intermediate (iterative
lineage cuts in connected components / BPE, the witness queries' shared
decision columns) via ``localCheckpoint`` — executor-block storage with
NO lineage fallback. That is the right local-mode default (zero extra
I/O), but on a real cluster one executor loss (or dynamic-allocation
decommission) fails every downstream action instead of recomputing
(VERDICT r16 "What's wrong" #1).

``materialize`` keeps the localCheckpoint default and adds the reliable
path: a parquet round-trip through ``spark.summingbird.materialize.dir``
(or the session's checkpoint dir), which survives executor loss when
that directory is on shared storage (HDFS/S3). Selection is per-call
(``reliable=True``) or session-wide via the
``spark.summingbird.materialize.reliable`` conf, so cluster deployments
flip one setting without touching operator code.

Caveat shared by BOTH paths: blocks/files are not reclaimed until the
session ends (localCheckpoint blocks are never unpersisted; round-trip
files live until the directory is cleaned — ADVICE r16). The
materialized frames in this package are narrow decision/symbol tables,
so the leak is bounded; callers looping thousands of times should clean
up explicitly.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.summingbird.materialize.reliable"
DIR_CONF = "spark.summingbird.materialize.dir"


def _reliable_dir(spark) -> str:
    d = spark.conf.get(DIR_CONF, None)
    if d:
        return d
    ckpt = spark.sparkContext.getCheckpointDir()
    if ckpt is not None:
        return ckpt
    return os.path.join(tempfile.gettempdir(), "summingbird_spark_mat")


def materialize(df: DataFrame, eager: bool = True, reliable: bool | None = None) -> DataFrame:
    """Cut ``df``'s lineage, pinning one evaluation of it.

    ``reliable=None`` (default) consults the session conf
    ``spark.summingbird.materialize.reliable`` (default false →
    ``localCheckpoint``). ``reliable=True`` round-trips through parquet
    under ``spark.summingbird.materialize.dir`` / the checkpoint dir /
    a local tempdir — durable wherever that directory is durable. The
    reliable path is always EAGER (the write is an action)."""
    if reliable is None:
        reliable = (
            str(df.sparkSession.conf.get(RELIABLE_CONF, "false")).lower()
            == "true"
        )
    if not reliable:
        return df.localCheckpoint(eager=eager)
    spark = df.sparkSession
    path = os.path.join(_reliable_dir(spark), f"mat-{uuid.uuid4().hex[:16]}")
    df.write.mode("error").parquet(path)
    # explicit schema: an EMPTY frame writes only _SUCCESS (no file to
    # infer from), and the declared schema also pins nullability/order
    out = spark.read.schema(df.schema).parquet(path)
    return out.select(*df.columns)
