"""JSON column operators: typed parse, corrupt-record capture, nested
fields, array explode."""

from summingbird_spark.functions.semistructured import (
    _split_ddl,
    explode_json_array,
    with_json_fields,
)


def test_split_ddl_respects_nesting():
    assert _split_ddl("k BIGINT, tags ARRAY<STRING>, m MAP<STRING,BIGINT>") == [
        "k BIGINT",
        "tags ARRAY<STRING>",
        "m MAP<STRING,BIGINT>",
    ]


def test_with_json_fields_and_corrupt_capture(spark):
    rows = [
        (1, '{"k": 7, "tags": ["a", "b"]}'),
        (2, '{"k": null}'),
        (3, "not json at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    out = with_json_fields(df, "props", "k BIGINT, tags ARRAY<STRING>")
    got = {r["id"]: (r["k"], r["tags"], r["_corrupt"]) for r in out.collect()}
    assert got[1] == (7, ["a", "b"], None)
    assert got[2] == (None, None, None)          # valid JSON, null field
    assert got[3] == (None, None, "not json at all")  # captured, not dropped
    assert got[4] == (None, None, None)          # NULL input stays NULL


def test_explode_json_array(spark):
    rows = [
        (1, '[{"x": 1}, {"x": 2}]'),
        (2, "[]"),
        (3, "broken"),
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    out = explode_json_array(df, "payload", "x BIGINT")
    got = sorted((r["id"], r["elem"]["x"]) for r in out.collect())
    assert got == [(1, 1), (1, 2)]  # empty + broken arrays contribute no rows
