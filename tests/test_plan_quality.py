"""Physical-plan invariants — the 100 TB scale contract.

These assert plan *shape*, not results: filters reach the parquet scan,
projections prune columns at the reader, small dims broadcast, partial
(map-side) aggregation exists, and nothing degenerates to a cartesian
product. A correct-but-full-scan plan is a regression even if every value
matches (SURVEY §4: the reference hand-plans these; Catalyst must be
*allowed* to by keeping the plan declarative).
"""

import pytest

from summingbird_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def scans_of(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan parquet" in l]


def test_filter_and_projection_reach_the_scan(spark):
    plan = plan_of(spark, "map_filter")
    (scan,) = scans_of(plan)
    # column pruning: only the 4 needed columns of 6 are read
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string,value:double>" in scan
    assert "props" not in scan
    # the event_type predicate is pushed into the scan
    assert "PushedFilters: [" in scan and "event_type" in scan


def test_dimension_join_broadcasts(spark):
    plan = plan_of(spark, "left_join_service")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # customer scan pruned to join key + grouped column
    dim_scan = [s for s in scans_of(plan) if "c_custkey" in s][0]
    assert "c_name" not in dim_scan and "c_acctbal" not in dim_scan


def test_sum_by_key_has_partial_aggregation(spark):
    plan = plan_of(spark, "sum_by_key")
    # partial + final HashAggregate pair around exactly one exchange
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1
    (scan,) = scans_of(plan)
    assert "ReadSchema: struct<user_id:bigint,value:double>" in scan


def test_asof_join_is_not_a_cartesian(spark):
    plan = plan_of(spark, "asof_latest_order")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union+window plan: one Window, sort-shuffled by key
    assert "Window" in plan


def test_topk_bounded_two_phase(spark):
    """Top-k never sorts the table globally, and reducer state is bounded:
    the salted two-phase plan has a (key, salt) aggregation feeding a key
    aggregation, each trimming to k."""
    plan = plan_of(spark, "topk_per_group")
    assert "rangepartitioning" not in plan.lower()  # no global sort shuffle
    # two aggregation levels: (key, salt) partials then per-key merge
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 3
    assert "__salt__" in plan or "xxhash64" in plan


def test_minhash_shuffles_on_digest_not_document(spark):
    """Dedup-exact shuffles md5 digests, not document bodies."""
    plan = plan_of(spark, "dedup_exact")
    assert plan.count("Exchange") <= 2  # partial agg then final
    assert "md5" in plan


@pytest.mark.parametrize("name", ["wordcount", "flat_map_keys_rollup"])
def test_explode_aggregations_keep_partial_agg(spark, name):
    plan = plan_of(spark, name)
    assert plan.count("HashAggregate") >= 2  # map-side combine survived explode


def test_trending_topk_takeordered_not_global_window(spark):
    """Global ranking must compile to TakeOrderedAndProject (bounded
    per-partition top-N + driver merge); a row_number window without a
    partition spec moves the whole frame to ONE task (VERDICT r1)."""
    plan = plan_of(spark, "trending_decayed_topk")
    assert "TakeOrderedAndProject" in plan
    # any Window that remains operates on the ≤10 limit survivors: it must
    # sit above the TakeOrdered, never directly over the aggregate
    if "Window" in plan:
        assert plan.index("Window") < plan.index("TakeOrderedAndProject")


@pytest.mark.parametrize(
    "name",
    ["text_stats", "lang_id", "quality_scores", "doc_fingerprint", "bpe_tokens",
     "clean_corpus_pipeline", "pii_scrub"],
)
def test_text_family_stays_in_codegen(spark, name):
    """The text operators must compile to codegen-able string/regexp
    primitives. Interpreted higher-order-function expressions
    (ArrayFilter/ArrayAggregate and lambda ArrayTransform) fall out of
    whole-stage codegen and run ~0.1-1 MB/s/core — a scale-killer on a
    100 TB corpus (VERDICT r2 item 1)."""
    plan = plan_of(spark, name)
    for interpreted in ("ArrayFilter", "ArrayAggregate", "ArrayTransform"):
        assert interpreted not in plan, f"{name}: interpreted {interpreted} in plan"


def test_delta_service_no_cartesian_single_window(spark):
    """readDeltaLog + left_join must stay the one-shuffle union+window
    as-of plan: no cartesian/theta join of probes x history."""
    plan = plan_of(spark, "delta_service_running")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_ivf_query_reads_prebuilt_index(spark):
    """The graded IVF query must probe the persisted index artifact, not
    train a quantizer in the query path (VERDICT r2 item 4): its scans
    include the on-disk centroid/assignment parquet."""
    plan = plan_of(spark, "embedding_ivf_topk")
    assert "summingbird_spark_ivf" in plan


def test_embedding_near_dup_is_distributed_tiles(spark):
    """The exact near-dup detector must be the distributed tile matmul
    (FlatMapGroupsInPandas over block pairs), not a driver-side collect +
    broadcast matrix (VERDICT r2 item 2 — driver OOM beyond ~10^6
    vectors)."""
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "FlatMapGroupsInPandas" in plan


def test_cpu_heavy_single_file_scan_is_spread(spark):
    """Signature work over a single-file documents scan must not pin to one
    task: load_table spreads CPU-heavy tables to defaultParallelism
    (VERDICT r2 item 3 — plan must not depend on input file layout)."""
    plan = plan_of(spark, "simhash_fingerprint")
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan


def test_global_topn_takeordered(spark):
    plan = plan_of(spark, "global_topn")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_bucketed_join_skips_both_exchanges(spark, tmp_path):
    """Two tables bucketed by the same key and count join with NO shuffle
    on either side — the write-time bucketing replaces the per-job
    Exchange (the durable co-location the reference hand-schedules with
    reducer reuse)."""
    from summingbird_spark.sources.bucketed import read_bucketed, write_bucketed

    ev = spark.range(0, 4000).selectExpr(
        "id AS user_id", "id % 97 AS value"
    )
    dim = spark.range(0, 500).selectExpr("id AS user_id", "id % 7 AS seg")
    write_bucketed(ev, "bq_events", "user_id", 8,
                   sort_cols="user_id", path=str(tmp_path / "ev"))
    write_bucketed(dim, "bq_dim", "user_id", 8,
                   sort_cols="user_id", path=str(tmp_path / "dim"))
    try:
        a, b = read_bucketed(spark, "bq_events"), read_bucketed(spark, "bq_dim")
        joined = a.join(b.hint("merge"), "user_id")
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bq_events")
        spark.sql("DROP TABLE IF EXISTS bq_dim")


def test_bucketed_store_merge_shuffles_only_the_delta_side(spark, tmp_path):
    """The rollforward prev ⊕ delta merge against a BucketedBatchStore
    snapshot: the PREV side (full store, the big side at scale) is a
    bucketed scan that already satisfies the join distribution — the only
    Exchange in the plan is the delta aggregation's. This is the durable
    co-location the reference hand-schedules via reducer reuse.

    Bucket count follows the sizing rule from the store docstring (match
    the consumer's parallelism): the CLI test leaves the shared session
    at 32 shuffle partitions, and the planner disables a bucketed scan
    whose bucket count is below the shuffle target."""
    import summingbird_spark as sb
    from pyspark.sql import functions as F

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    store = sb.BucketedBatchStore(
        str(tmp_path / "bjstore"), ["key"], "sum_long", num_buckets=n_buckets,
        table_prefix="t_bucketed_merge_plan",
    )
    snap = spark.range(0, 5000).selectExpr(
        "CAST(id % 400 AS STRING) AS key", "id AS value"
    ).groupBy("key").agg(F.sum("value").alias("value"))
    store.write_snapshot(snap, 7)

    prev = store.read_snapshot(spark, 7)
    delta = (
        spark.range(0, 2000)
        .selectExpr("CAST(id % 100 AS STRING) AS key", "id AS value")
        .groupBy("key")
        .agg(F.sum("value").alias("value"))
    )
    merged = (
        prev.withColumnRenamed("value", "__prev__")
        .join(delta.withColumnRenamed("value", "__delta__"), ["key"], "full")
        .select("key", (F.coalesce("__prev__", F.lit(0)) + F.coalesce("__delta__", F.lit(0))).alias("value"))
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert "SortMergeJoin" in plan
    # exactly the delta side's aggregation exchange; the bucketed prev
    # scan needs none (its FileScan reports "Bucketed: true")
    assert n_exchanges == 1, plan[:3000]
    assert "Bucketed: true" in plan


def test_temperature_mixture_is_a_pure_scan_filter(spark):
    """The sample itself must not shuffle on any key: counts are a
    separate bounded job; the output plan is scan + filter (plus
    load_table's deliberate round-robin spread of the single test file,
    which carries no key)."""
    plan = plan_of(spark, "temperature_mixture_docs")
    import re

    for ex in re.findall(r"Exchange (\w+)", plan):
        assert ex == "RoundRobinPartitioning", plan
    # the rate-map filter sits in the scan stage, under the spread
    assert plan.index("Filter") > plan.index("Exchange")


def test_pmi_generates_pairs_in_row_no_positional_self_join(spark):
    """Pairs come from in-row offset zips — a positional self-join
    (SortMergeJoin on (doc, pos)) must never appear; the only joins are
    the broadcast unigram/stats attachments."""
    plan = plan_of(spark, "pmi_cooccurrence")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cross_doc_repetition_single_digest_window_no_join(spark):
    """Gram document-frequency rides a window over the digest partition —
    no join anywhere, and exactly one window."""
    plan = plan_of(spark, "cross_doc_repetition")
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_bm25_filters_terms_before_shuffle(spark):
    """The query-term isin filter must sit below the first aggregation
    (only matching (doc, term) pairs shuffle), and the df/stats sides
    must broadcast."""
    plan = plan_of(spark, "bm25_search")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # generator (explode) feeds a Filter containing the term list before
    # any Exchange: find the Generate node and check a term literal
    # appears in a Filter below the first Exchange above it
    assert "spark" in plan and "merge" in plan  # term literals present


def test_tpch_q5_broadcasts_the_pruned_supplier_chain(spark):
    plan = plan_of(spark, "tpch_q5_local_supplier")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_takeordered(spark):
    plan = plan_of(spark, "weighted_sample_docs")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]


def test_buffer_join_is_not_a_cartesian(spark):
    """The batch replay of the Buffer leftJoin must stay a key-equi join
    with a range post-filter — never a cartesian/nested-loop product."""
    plan = plan_of(spark, "buffer_join_clicks")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_tpch_q6_is_a_pure_pruned_scan(spark):
    """Q6's whole cost is the scan: no join, 4-column ReadSchema, every
    conjunct pushed as a data filter, map-side partial aggregation."""
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    assert "Join" not in plan
    (scan,) = scans_of(plan)
    assert "l_orderkey" not in scan  # pruned
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert c in scan
    assert plan.count("HashAggregate") == 2


def test_tpch_q19_broadcasts_part_with_prefilters(spark):
    plan = plan_of(spark, "tpch_q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    part_scan = [s for s in scans_of(plan) if "p_brand" in s][0]
    # the derivable brand prefilter reaches the part scan
    assert "PushedFilters: [" in part_scan and "p_brand" in part_scan


def test_simhash_arrow_plan_has_no_exchange(spark):
    """SimHash is per-document: the Arrow vote-kernel plan must contain
    ZERO shuffles — scan → project → ArrowEvalPython, nothing else."""
    from summingbird_spark.functions.dedup import simhash_table
    from summingbird_spark.sources.tables import load_table

    df = simhash_table(
        load_table(spark, SF, "documents"), "doc_id", "text"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # load_table's round-robin spread of a single-file scan is allowed;
    # what must NOT exist is a KEYED shuffle (the old groupBy form)
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()
    assert "HashAggregate" not in plan
    assert "ArrowEvalPython" in plan or "Python" in plan


def test_moments_partial_aggregates(spark):
    """The moments carrier is a struct of five sums — each must partial-
    aggregate map-side like any plain sum (one exchange, two
    HashAggregates)."""
    plan = plan_of(spark, "moments_by_key")
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_tpch_q8_broadcasts_every_dimension(spark):
    """Q8's 7-way star: the only shuffle joins are the fact chain
    (lineitem-orders-customer); part/supplier/nation x2/region all
    broadcast, and the ratio aggregates partially map-side."""
    plan = plan_of(spark, "tpch_q8_market_share")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    # the date filter reaches the orders scan
    o_scan = [s for s in scans_of(plan) if "o_orderdate" in s][0]
    assert "PushedFilters: [" in o_scan and "IsNotNull" in o_scan


def test_tpch_q15_scalar_max_is_broadcast_not_rescan(spark):
    """The Q15 scalar subquery (max revenue) must come from the SAME
    per-supplier aggregate, broadcast back — exactly one lineitem scan
    feeding two HashAggregate chains, no window over the whole table."""
    plan = plan_of(spark, "tpch_q15_top_supplier")
    li_scans = [s for s in scans_of(plan) if "l_suppkey" in s]
    # ReusedExchange/Subquery reuse may still print one scan per branch;
    # what must NOT happen is a SortMergeJoin or a global Window
    assert len(li_scans) <= 2
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q17_threshold_join_no_cartesian(spark):
    plan = plan_of(spark, "tpch_q17_small_quantity_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # part prefilter pushed to its scan
    p_scan = [s for s in scans_of(plan) if "p_brand" in s][0]
    assert "PushedFilters: [" in p_scan and "p_brand" in p_scan


def test_tpch_q22_anti_join_and_scalar_broadcast(spark):
    plan = plan_of(spark, "tpch_q22_dormant_customers")
    assert "LeftAnti" in plan
    # the one-row scalar rides a broadcast nested loop (1 row x N is
    # fine); the data joins must not
    assert "CartesianProduct" not in plan
    # date prune reaches the orders scan
    o_scan = [s for s in scans_of(plan) if "o_orderdate" in s][0]
    assert "PushedFilters: [" in o_scan


def test_quantile_sketch_build_is_one_codegen_groupby(spark):
    """histogram_table: the scale path is a codegen (key, bin) count —
    two HashAggregate pairs (bin counts, map assembly), no cartesian,
    no Python eval."""
    plan = plan_of(spark, "quantile_sketch_values")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan
    # the exact-rank sandwich must be the cumulative-histogram rank
    # select, never a per-group sorted array of every raw value (the
    # r7 exact side collected the full value list into one row —
    # SURVEY §7(b)'s OOM). The only collect_list allowed is the
    # bounded (<= bins entries) sketch-map assembly.
    assert "sort_array(collect_list" not in plan
    # one logical collect_list == two plan mentions (partial + final
    # HashAggregate); the r7 array sandwich added a second pair
    assert plan.count("collect_list") <= 2


def test_heavy_hitters_bounded_by_window_head(spark):
    """summary_table: only top-(k+1) rows per key survive the window —
    the plan must show the rank filter and no cartesian/Python."""
    plan = plan_of(spark, "heavy_hitters_value_buckets")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Window" in plan and "row_number" in plan


def test_every_registered_query_lints_scalable(spark):
    """Engine-wide gate (round 15): EVERY registered query's physical
    plan passes the scale-linter (summingbird_spark/lint.py) — no
    cartesian products, no row-at-a-time Python UDFs, no unpartitioned
    global window over data. The named allowances are bounded-by-
    construction broadcast nested loops the linter cannot size:

    * embedding_cosine_topk / embedding_ivf_topk — the brute-force /
      rerank side joins the corpus against a BROADCAST 25-query probe
      set, TakeOrdered-capped (their docstrings carry the scale story;
      the subquadratic path is the LSH/IVF index itself).
    * bloom_membership — the probe GRID is distinct-event-types ×
      distinct-probe-users (both broadcast distinct-aggregates of
      bounded universes); the graded bloom path itself is the broadcast
      bitset equi-join.
    * incremental_semantic_dedup — its in-plan assignment at k=32 takes
      the flat ivf_assign path (below the two-level cutoff): a
      crossJoin against the BROADCAST 32-row centroid table — Θ(n·k)
      with k bounded by the quantizer, the module's documented
      small-k shape (large k routes through the hierarchical/
      partitioned assigners, which are crossJoin-free).
    """
    from summingbird_spark.lint import lint_plan

    ALLOW = {
        "embedding_cosine_topk": {"cartesian"},
        "embedding_ivf_topk": {"cartesian"},
        "bloom_membership": {"cartesian"},
        "incremental_semantic_dedup": {"cartesian"},
    }
    violations = {}
    for name, fn in QUERIES.items():
        try:
            errs = [
                f for f in lint_plan(fn(spark, SF))
                if f.level == "error" and f.code not in ALLOW.get(name, set())
            ]
        except Exception as e:  # a plan that fails to build is a failure
            violations[name] = [f"plan build failed: {e!r:.120}"]
            continue
        if errs:
            violations[name] = [str(f) for f in errs]
    assert not violations, f"scale-lint violations: {violations}"


def test_streaming_microbatch_plans_lint_scalable(spark, monkeypatch):
    """Close the streaming blind spot (VERDICT r15 item 3): the engine-
    wide gate above lints the DataFrame a ``stream_*`` query RETURNS —
    the post-run ``spark.read.parquet`` of its output — not the stateful
    micro-batch plan that executed inside the trigger. Here every
    StreamingQuery any graded stream_* row starts is intercepted (its
    ``awaitTermination`` records the handle), and after the row completes
    each query's last EXECUTED micro-batch plan (``streaming_plan_text``
    — state-store exchanges and all) goes through the same linter. Every
    captured kernel must be free of error-level findings, and the
    capture must actually have seen every stream_* row (a silent
    no-capture pass would be vacuous)."""
    from pyspark.sql.streaming import StreamingQuery

    from summingbird_spark.lint import lint_plan, streaming_plan_text

    seen: list = []
    orig = StreamingQuery.awaitTermination

    def record(self, timeout=None):
        if self not in seen:
            seen.append(self)
        return orig(self, timeout)

    monkeypatch.setattr(StreamingQuery, "awaitTermination", record)

    stream_rows = [n for n in QUERIES if n.startswith("stream_")]
    assert len(stream_rows) >= 10
    violations, captured = {}, {}
    for name in stream_rows:
        seen.clear()
        QUERIES[name](spark, SF).collect()
        assert seen, f"{name} started no StreamingQuery the hook saw"
        for i, q in enumerate(seen):
            try:
                text = streaming_plan_text(q)
            except Exception as e:
                violations[f"{name}[{i}]"] = [f"plan capture failed: {e!r:.120}"]
                continue
            captured[f"{name}[{i}]"] = text
            errs = [f for f in lint_plan(None, plan=text) if f.level == "error"]
            if errs:
                violations[f"{name}[{i}]"] = [str(f) for f in errs]
    assert not violations, f"streaming micro-batch lint violations: {violations}"
    # the micro-batch plans really are the stateful kernels, not scans
    assert any(
        "WithState" in t or "StateStore" in t or "SessionWindowStateStore" in t
        for t in captured.values()
    )


# ---------------------------------------------------------------- r16 pins
# Optimization-round plan-shape regressions: each pin guards a measured r16
# fix against the optimizer (or a refactor) silently reintroducing the
# duplicated work. Evidence for each: plans/r16/<query>_{before,after}.txt.


def test_bloom_probe_evaluates_once(spark):
    # r16: InferFiltersFromConstraints used to copy the ArrowEvalPython
    # bloom probe onto the eval side of the equi-join (two probe nodes in
    # the before-plan); asNondeterministic pins it to the corpus side.
    plan = plan_of(spark, "decontaminate_bloom")
    assert plan.count("ArrowEvalPython") == 1, plan


def test_witness_queries_run_the_pipeline_once(spark):
    # r16: total.crossJoin(checks) used to hold TWO FlatMapGroupsInPandas
    # scan subtrees (no exchange reuse fires above a pandas node). The
    # decision columns now come from one localCheckpoint-ed pipeline
    # execution, so the RETURNED plan contains no pandas scan at all —
    # only the checkpointed decisions plus the witnessed-only joins.
    for name in ("semantic_dedup", "semantic_dedup_partitioned"):
        plan = plan_of(spark, name)
        assert "FlatMapGroupsInPandas" not in plan, (name, plan)
        assert "FlatMapCoGroupsInPandas" not in plan, (name, plan)
        assert "ExistingRDD" in plan, (name, plan)


def test_remove_duplicate_spans_two_corpus_scans(spark):
    # r16: four documents scans -> two (grams join-back and the totals
    # branch both fused away); the token pass and the gram pass remain.
    plan = plan_of(spark, "remove_duplicate_spans")
    assert sum("documents.parquet" in l for l in scans_of(plan)) == 2, plan


def test_dedup_ids_path_not_double_shuffled(spark):
    # r16: ids came from the CPU-heavy spread load_table, paying a
    # round-robin shuffle immediately re-shuffled by hash for the join;
    # the narrow read leaves exactly one spread (the quality scan's).
    plan = plan_of(spark, "dedup_survivors")
    assert plan.count("RoundRobinPartitioning") == 1, plan


def test_corpus_to_shards_clean_pinned_once(spark):
    # r17: the two chained prefix sums each FORK their input (bucket
    # totals + offsets join-back, plus pack_shards' min/max pre-scan),
    # so the expensive clean subtree (scan + tokenize + survivor window
    # + contamination anti-join) ran four times — 24 parquet scans in
    # the before plan. Pinning the narrow clean and shuffled hand-offs
    # leaves the returned plan reading ONLY the pins (zero parquet
    # scans; the pipeline executes once at pin time). Evidence:
    # plans/r17/corpus_to_shards_{before,after}.txt, 3.03 -> 1.47 s.
    plan = plan_of(spark, "corpus_to_shards")
    assert "ExistingRDD" in plan, plan
    assert len(scans_of(plan)) == 0, plan


def test_bloom_members_pinned_once(spark):
    # r17: members (scan+filter+distinct over events) fed four consumers
    # — bitset build, FP-probe anti-join, the member union arm, and the
    # types list — each re-running the subtree (5 events scans in the
    # before plan). One eager pin leaves the returned plan reading the
    # pinned rows (ExistingRDD) with at most the two remaining event
    # scans (the bitset input is the pin, the probe universe keeps its
    # own scan). Evidence: plans/r17/bloom_membership_{before,after}.txt.
    plan = plan_of(spark, "bloom_membership")
    assert "ExistingRDD" in plan, plan
    assert sum("events.parquet" in l for l in scans_of(plan)) <= 2, plan
