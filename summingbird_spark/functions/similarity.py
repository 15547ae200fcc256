"""Similarity search over embedding columns (array<float>).

* ``cosine`` — pure Column expression (zip_with dot product), double
  precision, deterministic left-to-right summation.
* ``brute_force_topk`` — the exact baseline: broadcast the (small) query
  set against the corpus, rank per query. One pass over the corpus, no
  corpus self-shuffle — this is the right plan when |queries| ≪ |corpus|.
* ``lsh_sign_buckets`` / ``lsh_topk`` — the scale path: deterministic
  random-hyperplane signatures (hash-derived planes, no RNG state) bucket
  the corpus; queries probe only their bucket. Recall is tunable with
  ``planes`` (bucket count 2^planes) and multi-probe is a follow-up.
* ``ivf_assign`` / ``ivf_topk`` — IVF variant: coarse-quantize the corpus
  to the nearest of k centroid rows, probe ``nprobe`` nearest lists.

At 100 TB the invariant to preserve: never materialize the corpus×corpus
product; every candidate generation step must shuffle on a small key
(bucket id / centroid id), and the final exact rerank touches only
candidates.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Exact top-k neighbors per query row. Queries are broadcast; the
    corpus streams once. Output: (query_id, rank, vec_id, sim)."""
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    scored = corpus.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qv__")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "sim")
    )


def _plane_component(plane: Column, j: Column) -> Column:
    """Deterministic ±1 hyperplane component from a hash — reproducible
    across runs/engines, no RNG broadcast needed."""
    return (F.xxhash64(plane, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("double")


def lsh_sign_signature(vec: Column, planes: int) -> Column:
    """Bucket id in [0, 2^planes): bit p = sign of <vec, plane_p>.
    Planes are unrolled Python-side (shift amounts must be literals)."""
    d = F.size(vec)
    idx = F.sequence(F.lit(0), d - 1)

    def bit(p: int) -> Column:
        s = F.aggregate(
            F.zip_with(
                vec, idx, lambda x, j: x.cast("double") * _plane_component(F.lit(p), j)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for p in range(planes):
        out = out + bit(p)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: only corpus rows in the query's sign bucket are
    scored. Shuffle key = bucket id (2^planes buckets)."""
    sig = lsh_sign_signature(F.col(vec_col), planes)
    c = corpus.withColumn("__bucket__", sig)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        sig.alias("__bucket__"),
    )
    scored = c.join(q, "__bucket__").where(F.col(id_col) != F.col("query_id")).select(
        "query_id", id_col, cosine(F.col(vec_col), F.col("__qv__")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "sim")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Coarse quantization: each corpus row gets its nearest centroid
    (centroids broadcast — they are few). This is the build step of an IVF
    index; persist the result partitioned by list for cheap probes."""
    c = centroids.select(
        F.col(centroid_id_col), F.col(vec_col).alias("__cv__")
    )
    scored = corpus.crossJoin(F.broadcast(c)).withColumn(
        "__sim__", cosine(F.col(vec_col), F.col("__cv__"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim__").desc(), F.col(centroid_id_col))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__cv__", "__sim__", "__rn__")
    )
