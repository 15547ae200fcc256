"""summingbird_spark — a PySpark-native dataflow/aggregation engine with the
query surface of twitter/summingbird (see SURVEY.md), built Spark-first:
DataFrame/Column expressions compiled by Catalyst, Structured Streaming for
the online path, versioned parquet snapshot stores for the batch path, and a
serving-side batch⊕realtime merge."""

from .core.graph import Keyed, Producer, Source, source, TIME_COL
from .core import semigroup
from .core.semigroup import BloomSemigroup, CmsSemigroup, MomentsSemigroup, Semigroup, TopKSemigroup
from .batch import batcher
from .batch.batcher import Batcher, of_days, of_hours, of_millis, of_minutes, of_seconds, UNIT
from .batch.planner import BatchPlanner, plan, to_dataframe
from .batch.delta import BatchedDeltaService, read_delta_log
from .batch.store import (
    BucketedBatchStore,
    InitialBatchedStore,
    VersionedBatchStore,
    rollforward,
)
from .core.service import BufferService, ExternalLookupService, Service, StoreService, TemporalService
from .sinks.sinks import BatchedParquetSink, MemorySink, ParquetSink
from .lint import Finding, PlanScaleError, assert_scalable, lint_plan

__all__ = [
    "lint_plan",
    "assert_scalable",
    "Finding",
    "PlanScaleError",
    "Producer",
    "Keyed",
    "Source",
    "source",
    "TIME_COL",
    "semigroup",
    "Semigroup",
    "TopKSemigroup",
    "MomentsSemigroup",
    "CmsSemigroup",
    "BloomSemigroup",
    "batcher",
    "Batcher",
    "of_millis",
    "of_seconds",
    "of_minutes",
    "of_hours",
    "of_days",
    "UNIT",
    "BatchPlanner",
    "plan",
    "to_dataframe",
    "VersionedBatchStore",
    "BucketedBatchStore",
    "InitialBatchedStore",
    "rollforward",
    "read_delta_log",
    "BatchedDeltaService",
    "BatchedParquetSink",
    "Service",
    "TemporalService",
    "BufferService",
    "StoreService",
    "ExternalLookupService",
    "MemorySink",
    "ParquetSink",
]
