"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: one broadcast of the query
  vector, one map stage, one top-k reduction. The always-correct baseline.
- :func:`ivf_topk` — IVF-style approximate top-k: k-means-lite centroid
  assignment (here: provided cluster labels or hashed buckets), probe only
  ``nprobe`` nearest buckets. At 100 TB this turns a full scan into a scan
  of nprobe/nlist of the data; the bucket assignment is a one-off batch job.

All vector math uses built-in higher-order functions (``zip_with`` +
``aggregate``) — JVM-side, no Python in the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity against one query vector.

    The query is a literal array folded into the plan (broadcast by value);
    ranking is deterministic (similarity desc, id asc).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
        cosine_similarity(F.col(vec_col), q).alias("_exact"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(exclude_ids))
    return (
        scored.orderBy(F.col("_exact").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cosine")
    )


def brute_force_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs kNN join (left probe set × right corpus) — use only when the
    probe set is small enough to broadcast; otherwise go through ivf_topk."""
    from pyspark.sql import Window as W

    l = left.select(F.col(left_id).alias("probe_id"),
                    F.col(vec_col).alias("probe_vec"))
    r = right.select(F.col(right_id).alias("cand_id"),
                     F.col(vec_col).alias("cand_vec"))
    pairs = F.broadcast(l).crossJoin(r).select(
        "probe_id", "cand_id",
        cosine_similarity(F.col("probe_vec"), F.col("cand_vec")).alias("_sim"),
    )
    w = W.partitionBy("probe_id").orderBy(F.col("_sim").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", F.round("_sim", 4).alias("cosine"), "rank")
    )


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF list). Centroids are a
    plan literal — at realistic nlist (≤ 65k) this stays broadcast-sized."""
    best_idx, best_sim = None, None
    for i, c in enumerate(centroids):
        sim = cosine_similarity(
            F.col(vec_col), F.array(*[F.lit(float(v)) for v in c])
        )
        if best_sim is None:
            best_idx, best_sim = F.lit(i), sim
        else:
            cond = sim > best_sim
            best_idx = F.when(cond, F.lit(i)).otherwise(best_idx)
            best_sim = F.when(cond, sim).otherwise(best_sim)
    return df.select(F.col(id_col), F.col(vec_col), best_idx.alias("ivf_list"))


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score centroids driver-side, scan only the nprobe
    best IVF lists. Partition-prune-friendly when the table is written
    partitioned by ``ivf_list``."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(range(len(centroids)),
                    key=lambda i: -cos(centroids[i], query_vec))
    probe = ranked[:nprobe]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = (
        assigned.filter(F.col("ivf_list").isin(probe))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("_sim"),
        )
    )
    return (
        scored.orderBy(F.col("_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("_sim", 4).alias("cosine"))
    )
