"""Queue stream sources — the Storm spout analog.

Reference: ``SpoutSource`` wraps a queue spout of ``(Timestamp, T)``
records (StormPlatform.scala:44), with the event time taken from the
payload via ``TimeExtractor`` at ingestion (StormPlatform.scala:87-91);
the example wires a live feed spout the same way (StormRunner.scala:71).

Spark-first: Structured Streaming's ``kafka`` source IS the queue spout —
offsets, partition rebalancing, and backpressure belong to the engine.
What this module owns is the part the reference's TimeExtractor owned:
turning the broker wire frame (``key``/``value`` binary, broker
``timestamp``) into a typed event row with the RIGHT event time — payload
event time when the records carry one, broker ingestion time as the
fallback. The decode is a pure Column transform, so it behaves
identically on a static test frame and a live streaming frame; tests
drive it on the former (the kafka connector package is not available in
every build, and a missing package fails loudly at stream start).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import graph as g

#: the fixed schema every Spark kafka record arrives with
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def decode_json_frames(
    frames: DataFrame,
    value_schema: str,
    time_col: Optional[str] = None,
    keep_key: bool = False,
) -> DataFrame:
    """Broker wire frames → typed event rows (TimeExtractor analog).

    ``value`` is parsed as JSON against ``value_schema`` (Spark SQL DDL).
    Event time: ``time_col`` names a payload field to use as the event
    time; ``None`` uses the broker timestamp, exposed as ``__queue_ts__``
    (the reference's default when payloads carry no time — ingestion
    time). Rows whose payload fails to parse keep NULL payload fields so
    a downstream filter can count/drop them explicitly — silently
    dropping malformed queue records hides producer bugs.
    """
    cols = [
        F.from_json(F.col("value").cast("string"), value_schema).alias("__v__"),
        F.col("timestamp").alias("__queue_ts__"),
    ]
    if keep_key:
        cols.insert(0, F.col("key").cast("string").alias("__key__"))
    out = frames.select(*cols)
    flat = ["__key__"] if keep_key else []
    out = out.select(*flat, "__v__.*", "__queue_ts__")
    if time_col is not None and time_col not in out.columns:
        raise ValueError(
            f"time_col {time_col!r} is not a payload field of {value_schema!r}"
        )
    return out


def encode_json_frames(
    df: DataFrame,
    key_col: Optional[str] = None,
    value_cols: Optional[list] = None,
) -> DataFrame:
    """Typed rows → broker wire frames — the write half of the queue
    roundtrip (the reference's ``OnlineSink`` publishes intermediate
    stream results to "a kestrel fanout or kafka topic",
    OnlineSink.scala:21-34). Output has exactly the two columns Spark's
    kafka sink consumes: ``key`` (the partitioning key — rows for one key
    land in one broker partition, IN ORDER, which is what makes the
    (prev, delta) consumer contract meaningful downstream) and ``value``
    (the selected columns as one JSON document). Pure Column transform —
    append ``.writeStream.format("kafka")`` (or batch ``.write``) on top.
    """
    cols = value_cols if value_cols is not None else df.columns
    value = F.to_json(F.struct(*[F.col(c) for c in cols]))
    key = (
        F.col(key_col).cast("string").cast("binary")
        if key_col is not None
        else F.lit(None).cast("binary")
    )
    return df.select(key.alias("key"), value.cast("binary").alias("value"))


def kafka_stream_source(
    topic: str,
    bootstrap_servers: str,
    value_schema: str,
    time_col: Optional[str] = None,
    starting_offsets: str = "earliest",
    name: Optional[str] = None,
    **options: str,
) -> g.Source:
    """A queue-backed streaming source node for the StreamPlanner — the
    ``SpoutSource`` analog. The returned Source's event time is the
    payload's ``time_col`` (TimeExtractor) or the broker timestamp
    (``__queue_ts__``) when the payload carries none.

    Requires the spark-sql-kafka connector on the session's classpath;
    without it the stream fails at start with Spark's standard
    missing-data-source error (loud, not silent).
    """

    def loader(spark) -> DataFrame:
        r = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        for k, v in options.items():
            r = r.option(k, v)
        return decode_json_frames(r.load(), value_schema, time_col)

    return g.Source(
        loader,
        time_col if time_col is not None else "__queue_ts__",
        name or f"kafka[{topic}]",
    )
