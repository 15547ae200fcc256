"""Sweep every registered (non-streaming) query's physical plan for red flags.

For each query: build the DataFrame at $SPARK_GRAFT_SF_DIR, capture
explain('formatted'), and report
  - duplicated Python-node signatures (same UDF/function evaluated in >1
    plan node — the §4.4/§2.4 duplicated-subtree class),
  - Scan ExistingRDD (un-codegen'd createDataFrame legacy),
  - CartesianProduct / BroadcastNestedLoopJoin,
  - parquet ReadSchema wider than 6 columns (possible pruning miss),
  - Exchange count.
Prints one line per query; details for flagged ones to stderr.
"""
from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-sweep")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from summingbird_spark.queries import QUERIES

    skip_prefix = ("stream_",)
    names = [n for n in sorted(QUERIES) if not n.startswith(skip_prefix)]
    if len(sys.argv) > 1:
        names = sys.argv[1:]
    for name in names:
        fn = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # formatted gives node list; use simple string for signature scan
            pynodes = re.findall(
                r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
                r"FlatMapCoGroupsInPandas|MapInArrow)\s*(?:\[([^\]#,(]*)|\(?([a-zA-Z_0-9]*))",
                plan,
            )
            sigs = Counter(m[0] + ":" + (m[1] or m[2]).strip() for m in pynodes)
            dups = {s: c for s, c in sigs.items() if c > 1}
            n_ex = len(re.findall(r"\bExchange\b", plan))
            n_reuse = plan.count("ReusedExchange")
            flags = []
            if dups:
                flags.append(f"DUP_PY={dups}")
            if "Scan ExistingRDD" in plan:
                flags.append("EXISTING_RDD")
            if "CartesianProduct" in plan:
                flags.append("CARTESIAN")
            if "BroadcastNestedLoopJoin" in plan:
                flags.append("BNLJ")
            wide = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
            widest = max((len(w.split(",")) for w in wide), default=0)
            if widest > 6:
                flags.append(f"WIDE_READ={widest}")
            status = " ".join(flags) if flags else "ok"
            print(f"{name:40s} Ex={n_ex:2d} Reuse={n_reuse} {status}", flush=True)
        except Exception as e:
            print(f"{name:40s} ERROR {str(e)[:140]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
