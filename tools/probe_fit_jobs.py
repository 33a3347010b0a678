"""Decompose bench.py's fit_predict_linreg_h7 into per-phase Spark jobs.

Usage: python tools/probe_fit_jobs.py [sf_dir]

Runs the exact bench workload once warm, then once timed with the cache
cleared (bench protocol), printing the job ids + wall consumed by each
phase: panel plan build, mf.fit (Gram + cache materialization + state
capture), mf.predict plan build, and the forced consumption. Job counts
come from the status tracker, so they are machine-independent.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> int:
    cols = [F.col(f"`{c}`") for c in df.columns]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("double")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]["n"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from mlforecast_spark.utils import get_spark

    spark = get_spark("probe-fit-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    import bench

    def run(tag):
        import __spark_entry__ as entry
        from mlforecast_spark import MLForecast
        from mlforecast_spark.lag_transforms import RollingMean
        from mlforecast_spark.models import LinearRegression
        import re

        spark.catalog.clearCache()
        marks = []

        def mark(name):
            ids = sc.statusTracker().getJobIdsForGroup(None) or []
            marks.append((name, time.perf_counter(), len(list(ids))))

        mark("start")
        panel = entry._panel(spark, sf_dir)
        mf = MLForecast(
            models=[LinearRegression()],
            freq="D",
            lags=[1, 7],
            lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
            date_features=["dayofweek"],
        )
        mark("panel_plan")
        mf.fit(panel)
        mark("fit")
        m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
        buckets = 128 if (m and float(m.group(1)) >= 1) else None
        preds = mf.predict(
            7, engine="cogroup", cogroup_buckets=buckets, sort_output=False
        )
        mark("predict_plan")
        _force(preds)
        mark("force")
        prev_t, prev_j = None, None
        print(f"--- {tag} ---")
        for name, t, j in marks:
            if prev_t is not None:
                print(f"{name:14s} wall={t - prev_t:7.3f}s jobs=+{j - prev_j}")
            prev_t, prev_j = t, j

    run("warm1")
    run("warm2")
    run("timed")


if __name__ == "__main__":
    main()
