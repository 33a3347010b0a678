"""Per-stage profile of a bench query via the Spark UI REST API.

Usage: python tools/profile_stages.py [sf_dir] [query ...]

Runs each query once warm, then once timed (cache cleared, job-group
tagged), and prints every stage of the timed run with its wall, task time,
I/O and shuffle volumes — the local-mode stand-in for the Stages tab the
optimization guide (§1.1, §7.1) profiles from. Needs the UI, so it forces
``spark.ui.enabled=true`` regardless of ``get_spark``'s default.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> int:
    cols = [F.col(f"`{c}`") for c in df.columns]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("double")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]["n"]


def _rest(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or ["dedup_minhash_lsh"]

    os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
        os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
        + ";spark.ui.enabled=true;spark.ui.showConsoleProgress=false"
    )
    from mlforecast_spark.utils import get_spark

    spark = get_spark("profile-stages")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    import __spark_entry__ as entry

    import bench

    qs = entry.queries()
    qs["wide_feature_matrix"] = bench._wide_feature_matrix
    qs["fit_predict_linreg_h7"] = bench._fit_predict
    sc = spark.sparkContext
    for name in names:
        fn = qs[name]
        _force(fn(spark, sf_dir))  # warm (JIT + page cache)
        spark.catalog.clearCache()
        grp = f"prof_{name}"
        sc.setJobGroup(grp, name)
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        job_ids = set(sc.statusTracker().getJobIdsForGroup(grp))
        stage_ids = []
        for j in _rest(ui, f"applications/{app_id}/jobs"):
            if j["jobId"] in job_ids:
                stage_ids.extend(j["stageIds"])
        rows = []
        for s in _rest(ui, f"applications/{app_id}/stages?status=complete"):
            if s["stageId"] not in stage_ids:
                continue
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                b = datetime.strptime(s["completionTime"], fmt)
                dur = (b - a).total_seconds()
            rows.append(
                (
                    s["stageId"],
                    dur if dur is not None else -1,
                    s["executorRunTime"] / 1e3,
                    s["executorCpuTime"] / 1e9,
                    s["numCompleteTasks"],
                    s["inputBytes"] / 1e6,
                    s["shuffleReadBytes"] / 1e6,
                    s["shuffleWriteBytes"] / 1e6,
                    s["name"].split("\n")[0][:60],
                )
            )
        rows.sort(key=lambda r: -r[2])
        print(f"\n=== {name}  wall={wall:.3f}s  jobs={len(job_ids)} "
              f"stages={len(rows)} ===")
        print(f"{'stage':>5} {'wall_s':>7} {'task_s':>8} {'cpu_s':>8} "
              f"{'tasks':>5} {'in_MB':>8} {'shR_MB':>8} {'shW_MB':>8}  name")
        for r in rows:
            print(
                f"{r[0]:>5} {r[1]:>7.2f} {r[2]:>8.2f} {r[3]:>8.2f} "
                f"{r[4]:>5} {r[5]:>8.1f} {r[6]:>8.1f} {r[7]:>8.1f}  {r[8]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
