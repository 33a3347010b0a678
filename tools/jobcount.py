"""Count Spark jobs and measure warm wall per bench query.

Usage: python tools/jobcount.py [sf_dir] [query ...]
Prints one line per query: name jobs wall_sec (min over 3 warm reps; job
count from the last rep via job-group tagging).
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
    names = sys.argv[2:] or [
        "pooled_global_rolling_mean",
        "pooled_groupby_timeagg_rolling_mean",
        "panel_build",
        "rolling_mean",
    ]
    from mlforecast_spark.utils import get_spark

    spark = get_spark("jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    sc = spark.sparkContext
    for name in names:
        fn = qs[name]
        _force(fn(spark, sf_dir))  # warm
        walls = []
        jobs = 0
        for i in range(3):
            # same contract as bench.py's timed region (r11): no cache may
            # survive from the warm rep into a timed rep
            spark.catalog.clearCache()
            grp = f"jc_{name}_{i}"
            sc.setJobGroup(grp, name)
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
            jobs = len(sc.statusTracker().getJobIdsForGroup(grp))
            sc.setJobGroup("", "")
        print(f"{name:42s} jobs={jobs:3d} wall={min(walls):.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
