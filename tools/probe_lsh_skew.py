"""Audit bucket-join skew for ann_lsh_topk / embedding_near_dups (r12,
VERDICT item 7): measure per-(table, bucket) occupancy and the sum-of-
bucket-squared comparison volume at a given SF — the compute-skew signal
the rep-space banding fixed for minhash/simhash.

Usage: python tools/probe_lsh_skew.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf10"
    from mlforecast_spark.utils import get_spark
    from mlforecast_spark.operators.similarity import (
        _plane_matrix,
        lsh_bucket_col,
    )

    spark = get_spark("probe-lsh-skew")
    spark.sparkContext.setLogLevel("ERROR")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = embs.count()
    dim = 64
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    buckets = F.array(
        *[lsh_bucket_col(vd, _plane_matrix(dim, 8, 7 + t)) for t in range(4)]
    )
    b = embs.select(F.posexplode(buckets).alias("table", "bucket"))
    occ = b.groupBy("table", "bucket").agg(F.count(F.lit(1)).alias("n"))
    stats = occ.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("med_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
    ).collect()[0]
    print(f"vectors={n}")
    print(
        f"lsh buckets: n_buckets={stats['n_buckets']} max={stats['max_n']} "
        f"med={stats['med_n']} sum_n2={stats['sum_n2']:,}"
    )
    top = occ.orderBy(F.col("n").desc()).limit(10).collect()
    print("top buckets:", [(r["table"], r["bucket"], r["n"]) for r in top])
    # distinct-embedding rep space: how much would fingerprint grouping help?
    distinct = embs.select(F.xxhash64(F.col("embedding").cast("string")).alias("h")).distinct().count()
    print(f"distinct embeddings={distinct} (clone factor {n / max(distinct,1):.2f}x)")


if __name__ == "__main__":
    main()
