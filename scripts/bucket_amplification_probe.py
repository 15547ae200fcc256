"""Measure the bucketed-state write-amplification tradeoff empirically
(VERDICT r11 item 6): the sizing rule in ``stateful_summer``'s docstring
("a touched bucket re-serializes its WHOLE key dict per trigger, so
amplification ≈ keys-per-bucket ÷ keys-touched") was argued, not
measured. This probe runs the streaming summer over a corpus of K keys
where each trigger touches a deterministic ~10% subset (the skewed
deployment shape: most keys cold per trigger), sweeping
``key_buckets`` ∈ {16, 64, 256, 1024, 4096, per-key}, and reports:

- state bytes WRITTEN: total size of the checkpoint's state delta files
  (every HDFS-state-store version writes exactly the changed rows, so
  the on-disk deltas ARE the cumulative write volume);
- state rows updated (engine telemetry, numRowsUpdated summed);
- wall seconds (min of 2) — the per-group framework-tax side of the
  tradeoff that favors FEWER buckets.

Expected physics (and what the numbers feed): with hash bucketing, a
random 10% key subset touches essentially EVERY bucket once buckets ≲
touched-keys — each trigger then rewrites the whole keyset (amplification
≈ 1/touch-fraction). Only buckets ≫ touched-keys-per-trigger bring
amplification back toward 1, at the price of per-group round-trips. The
``auto_key_buckets`` clamp constants (keys/500, cap parts×4096) come
from this table — see SCALING.md round-12.

Usage: python scripts/bucket_amplification_probe.py [n_keys] [n_triggers]
(defaults 5000 keys, 10 triggers, 10% touched per trigger)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/sbspark-amplification"


def du_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def build_corpus(spark, n_keys: int, n_triggers: int) -> str:
    """One parquet file per trigger; trigger i carries rows for the ~10%
    of keys with (key_id * 2654435761 + i * 97) % 10 == 0 — deterministic,
    uniformly spread, disjoint-ish across triggers (the cold-key shape)."""
    src = os.path.join(ROOT, f"src_{n_keys}_{n_triggers}")
    if os.path.exists(os.path.join(src, "chunk0.parquet")):
        return src
    os.makedirs(src, exist_ok=True)
    base_t = 1_700_000_000
    for i in range(n_triggers):
        rows = [
            (f"user{k:07d}", float(base_t + i * 60), 1)
            for k in range(n_keys)
            if (k * 2654435761 + i * 97) % 10 == 0
        ]
        df = spark.createDataFrame(rows, "key string, tsec double, value long")
        tmp = src + f".w{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(src, f"chunk{i}.parquet")
        shutil.move(glob.glob(tmp + "/*.parquet")[0], dst)
        shutil.rmtree(tmp)
        os.utime(dst, times=(base_t + 10 * i, base_t + 10 * i))
    return src


def run_once(spark, src: str, key_buckets, tag: str):
    from pyspark.sql import functions as F

    from summingbird_spark.core import semigroup as sg_mod
    from summingbird_spark.core.graph import TIME_COL
    from summingbird_spark.streaming.stateful import stateful_summer

    work = os.path.join(ROOT, f"run_{tag}")
    shutil.rmtree(work, ignore_errors=True)
    base = (
        spark.readStream.schema("key string, tsec double, value long")
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withColumn(TIME_COL, F.timestamp_seconds(F.col("tsec")))
        .select("key", F.lit(100).cast("bigint").alias("batch_id"),
                F.col(TIME_COL), "value")
    )
    out = stateful_summer(base, ["key"], "value", sg_mod.get("sum_long"),
                          key_buckets=key_buckets)
    t0 = time.perf_counter()
    q = (out.writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", os.path.join(work, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    rows_updated = sum(
        op.get("numRowsUpdated", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    state_bytes = du_bytes(os.path.join(work, "ckpt", "state"))
    return wall, rows_updated, state_bytes


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_triggers = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    src = build_corpus(spark, n_keys, n_triggers)
    touched = spark.read.parquet(src).count() // n_triggers
    print(f"# {n_keys} keys, {n_triggers} triggers, ~{touched} keys touched "
          f"per trigger ({100.0 * touched / n_keys:.0f}%)", flush=True)

    sweep = [16, 64, 256, 1024, 4096, None]
    rows = []
    for kb in sweep:
        tag = f"kb{kb}" if kb is not None else "perkey"
        walls, ru, sb_ = [], 0, 0
        for r in range(2):
            wall, ru, sb_ = run_once(spark, src, kb, f"{tag}_{r}")
            walls.append(wall)
        per_trigger = sb_ / n_triggers
        rows.append((tag, min(walls), ru, sb_, per_trigger))
        print(f"  {tag}: wall {min(walls):.2f}s  rowsUpdated {ru}  "
              f"stateBytes {sb_:,}  bytes/trigger {per_trigger:,.0f}",
              flush=True)

    # normalize amplification against the per-key run's bytes/trigger
    # (per-key writes exactly the touched keys — amplification 1×)
    base_bt = next(r[4] for r in rows if r[0] == "perkey")
    print()
    print("| key_buckets | wall s (min2) | state rows updated | "
          "state bytes total | bytes/trigger | write amplification vs per-key |")
    print("|---|---|---|---|---|---|")
    for tag, wall, ru, sb_, bt in rows:
        print(f"| {tag} | {wall:.2f} | {ru} | {sb_:,} | {bt:,.0f} | "
              f"{bt / max(1.0, base_bt):.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
