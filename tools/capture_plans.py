"""Capture `.explain("formatted")` plans for the bench workloads.

Usage: python tools/capture_plans.py <sf_dir> <suffix> [query ...]

Writes `plans/$PLANS_ROUND/<name>_<suffix>.txt` (default r12) for every selected bench line,
using the SAME workload builders as bench.py (including the pinned
`dedup_exact` / `doc_text_profile` bench overrides), so a before/after
pair diffs the exact plan the bench times. Two extra names document the
entry-slot `doc_text_profile` fusion:

- ``doc_text_profile_entry`` — the declared queries() slot as it stands.
- ``doc_text_profile_entry_composed`` — the pre-fusion three-way
  text_profile x bm25_scores x quality_filter composition (rebuilt from
  the still-exported leg operators), i.e. the fused slot's "before".
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _entry_composed(spark, sf_dir):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from mlforecast_spark.operators.text import (
        bm25_scores,
        quality_filter,
        text_profile,
    )

    docs = entry._docs(spark, sf_dir)
    bm = bm25_scores(docs, entry._BM25_TERMS).select(
        "doc_id", F.round("bm25", 6).alias("bm25")
    )
    qf = quality_filter(docs).select(
        "doc_id",
        "type_token_ratio",
        "top_token_frac",
        "dup_bigram_frac",
        F.array_join("drop_reasons", ",").alias("drop_reasons"),
        "keep",
    )
    return text_profile(docs).join(bm, "doc_id").join(qf, "doc_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    only = set(sys.argv[3:])

    from mlforecast_spark.utils import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("mlforecast-spark-plans", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entry

    qs = entry.queries()
    builders = {}
    for name in [
        "panel_build",
        "rolling_mean",
        "pooled_global_rolling_mean",
        "pooled_groupby_timeagg_rolling_mean",
        "seasonal_rolling_mean_std",
        "ewm",
        "events_tumbling_agg",
        "events_sessionize",
        "doc_text_profile",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_ivf_probe",
    ]:
        builders[name] = {
            "dedup_exact": bench._dedup_exact_plain,
            "doc_text_profile": bench._doc_text_profile_plain,
        }.get(name, qs[name])
    builders["wide_feature_matrix"] = bench._wide_feature_matrix
    builders["fit_predict_linreg_h7"] = bench._fit_predict
    builders["doc_text_profile_entry"] = qs["doc_text_profile"]
    builders["doc_text_profile_entry_composed"] = _entry_composed

    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    # EXECUTE=1: run the query first so the SAME QueryExecution finalizes its
    # AdaptiveSparkPlan — the formatted explain then shows the runtime plan
    # (isFinalPlan=true) including ReusedExchange stage-reuse nodes that a
    # static explain structurally cannot show.
    execute = os.environ.get("EXECUTE", "0") == "1"
    for name, fn in builders.items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        if execute:
            df.collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(name, "->", path)


if __name__ == "__main__":
    main()
