"""Example job for the CLI executor — daily per-user value totals from the
events table (the builder-module job shape: summingbird-example/.../
ExampleJob.scala:23-50 re-expressed).

Run:
    python -m summingbird_spark.cli --job examples.events_daily_totals:build \
        --through-time 2024-01-20
    python -m summingbird_spark.cli --job examples.events_daily_totals:build \
        --batches 5
"""

import os

import summingbird_spark as sb
from summingbird_spark.sources.tables import load_table

def build(spark):
    # resolve env at call time so repeated runs honor a changed target dir
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = os.environ.get("SUMMINGBIRD_OUT", "/tmp/summingbird_example")
    return {
        "deltas": load_table(spark, sf_dir, "events"),
        "time_col": "ts",
        "store": sb.VersionedBatchStore(f"{out}/store", ["user_id"], "sum"),
        "batcher": sb.of_days(1),
        "state": f"{out}/state",
    }
