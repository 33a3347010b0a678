"""Similarity search over embedding columns (`array<float>`).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. Dot
  products via ``zip_with``/``aggregate`` higher-order functions (JVM-side,
  no Python). Quadratic; use for query sets, not all-pairs at scale.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path. Vectors
  only meet within matching buckets, turning the quadratic join into a
  bucket-local one. Recall tunable via num_planes/num_tables.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize once so cosine = dot."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn("_unit", F.when(n > 0, F.transform(v, lambda x: x / n)))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Output: (query_id, neighbor_id, cosine), ranked by rounded cosine with
    neighbor-id tie-break so results are deterministic across engines.
    """
    a = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    b = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    qv = F.transform(F.col("_qv"), lambda x: x.cast("double"))
    nv = F.transform(F.col("_nv"), lambda x: x.cast("double"))
    cos = _dot(qv, nv) / (_norm(qv) * _norm(nv))
    pairs = (
        a.join(b, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, round_to).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_matrix(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).tolist()


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i); emitted as one
    integer bucket key, all in JVM expressions."""
    bits = []
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.shiftleft((_dot(vec, arr) > 0).cast("long"), i))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: vectors meet only when they share an LSH bucket in
    at least one of ``num_tables`` hyperplane tables."""
    dim = len(vectors.select(vec_col).first()[0])
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def bucketize(df, out_id):
        buckets = F.array(
            *[
                lsh_bucket_col(vd, _plane_matrix(dim, num_planes, seed + t))
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"_{out_id}_v"),
            F.posexplode(buckets).alias("table", f"_{out_id}_bucket"),
        )

    qb = bucketize(queries, "query_id")
    vb = bucketize(vectors, "neighbor_id")
    qv = F.transform(F.col("_query_id_v"), lambda x: x.cast("double"))
    nv = F.transform(F.col("_neighbor_id_v"), lambda x: x.cast("double"))
    cos = _dot(qv, nv) / (_norm(qv) * _norm(nv))
    pairs = (
        qb.join(
            vb,
            (qb["table"] == vb["table"])
            & (qb["_query_id_bucket"] == vb["_neighbor_id_bucket"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
