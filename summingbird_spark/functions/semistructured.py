"""Semi-structured (JSON) column operators.

Event logs land with loosely-typed JSON payload columns (the `events`
table's ``props``). At 100 TB the rules are:

* parse ONCE with an explicit schema (``from_json`` is a JVM-side
  expression — schema-on-read, no Python workers, prunes unreferenced
  fields at parse time);
* never silently drop malformed payloads — PERMISSIVE mode captures the
  raw text of any row that fails to parse into a corrupt-record column
  so the pipeline can count/quarantine instead of guessing;
* extract before shuffling: pulling the 1-2 needed fields out of the
  JSON string before a groupBy means the shuffle carries longs, not
  payload blobs.

``explode_json_array`` handles the list-payload shape (one JSON array
of records per row) with the same typed-parse-then-explode discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_json(col: Column | str, schema: str, corrupt_col: str = "_corrupt") -> Column:
    """Parse a JSON string column against a DDL schema, PERMISSIVE mode:
    malformed rows yield NULL fields plus the raw text in ``corrupt_col``
    (appended to the struct) instead of vanishing.

    ``schema`` is field DDL like ``"k BIGINT, tags ARRAY<STRING>"``.
    """
    col = F.col(col) if isinstance(col, str) else col
    full = f"{schema}, {corrupt_col} STRING"
    return F.from_json(
        col,
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )


def with_json_fields(
    df: DataFrame,
    json_col: str,
    schema: str,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Flatten the parsed fields of ``json_col`` into top-level columns
    (named as in ``schema``) plus ``corrupt_col`` holding the raw text of
    unparseable rows (NULL when the row parsed)."""
    parsed = parse_json(F.col(json_col), schema, corrupt_col)
    out = df.withColumn("__parsed", parsed)
    names = [f.split()[0].strip() for f in _split_ddl(schema)]
    for name in names:
        out = out.withColumn(name, F.col(f"__parsed.{name}"))
    return out.withColumn(corrupt_col, F.col(f"__parsed.{corrupt_col}")).drop(
        "__parsed"
    )


def explode_json_array(
    df: DataFrame, json_col: str, element_schema: str, alias: str = "elem"
) -> DataFrame:
    """Parse a JSON *array* column (``[{...}, {...}]``) and explode to one
    row per element (``alias`` is a struct of ``element_schema``).
    Malformed arrays parse to NULL and produce zero rows (use
    ``parse_json`` first if they must be quarantined)."""
    arr = F.from_json(F.col(json_col), f"ARRAY<STRUCT<{element_schema}>>")
    return df.withColumn(alias, F.explode(arr))


def _split_ddl(schema: str) -> list[str]:
    """Split top-level DDL fields (commas inside <> don't split)."""
    fields, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur).strip())
    return [f for f in fields if f]
