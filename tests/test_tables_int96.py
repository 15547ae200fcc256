"""load_table/read_parquet must not apply the TIMESTAMP(NANOS) rebuild
to INT96 timestamp columns (r17): Spark-written INT96 files surface as
timestamp[ns] in the arrow schema but Spark reads them natively as
TimestampType — mis-rebuilding failed with a TIMESTAMP div BIGINT
analysis error."""

import datetime as dt

from pyspark.sql import functions as F

from summingbird_spark.sources.tables import read_parquet


def test_read_parquet_int96_roundtrip(spark, tmp_path):
    path = str(tmp_path / "int96_events")
    old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 12, 0, 0), 1)], "ts timestamp, k long"
        ).write.mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old)
    df = read_parquet(spark, path)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    [r] = df.select(F.unix_millis("ts").alias("ms"), "k").collect()
    assert r.ms == int(
        dt.datetime(2024, 1, 1, 12, tzinfo=dt.timezone.utc).timestamp() * 1000
    )


def test_read_parquet_true_nanos_still_rebuilds(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "ns_events.parquet")
    t = pa.table(
        {
            "ts": pa.array([1_700_000_000_000_000_123], pa.timestamp("ns")),
            "k": pa.array([1], pa.int64()),
        }
    )
    pq.write_table(t, path)
    df = read_parquet(spark, path)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    [r] = df.select(F.unix_millis("ts").alias("ms")).collect()
    assert r.ms == 1_700_000_000_000
