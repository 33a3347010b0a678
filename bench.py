"""Benchmark: headline engine workloads at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_sec", "value": N, "unit": "sec", "queries": {...}, "sf": X}

Each query is forced to full materialization with a cheap hash-sum aggregate
(so Catalyst can't prune the feature columns away), mirroring what a
downstream training pipeline would consume.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pyspark.sql import functions as F


def _force(df) -> int:
    cols = [F.col(f"`{c}`") for c in df.columns]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("double")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]["n"]


def _wide_feature_matrix(spark, sf_dir):
    """The M4-style workload: 14 lags + rolling/expanding/EWM features in one
    FeaturePlan pass over the nation panel."""
    import __spark_entry__ as entry
    from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
    from mlforecast_spark.lag_transforms import (
        ExpandingMean,
        ExponentiallyWeightedMean,
        RollingMean,
        RollingStd,
    )

    panel = entry._panel(spark, sf_dir)
    registry = _parse_transforms(
        list(range(1, 15)),
        {
            1: [RollingMean(window_size=7), RollingMean(window_size=28),
                RollingStd(window_size=7), ExpandingMean(),
                ExponentiallyWeightedMean(alpha=0.3)],
            7: [RollingMean(window_size=7), RollingMean(window_size=28)],
        },
    )
    plan = FeaturePlan(schema=PanelSchema(), registry=registry)
    return plan.apply(panel)


def _dedup_exact_plain(spark, sf_dir):
    """The r01-r05 bench workload for this line: digest-groupBy exact dedup
    alone. The driver-contract `dedup_exact` query has since grown a merged
    paragraph-dedup leg for oracle coverage; the bench keeps timing the
    original workload so the line stays comparable across rounds (the
    DuckDB side in tools/bench_oracle.py pins the same plain SQL)."""
    import __spark_entry__ as entry
    from mlforecast_spark.operators.dedup import exact_duplicates

    return exact_duplicates(entry._docs(spark, sf_dir))


def _doc_text_profile_plain(spark, sf_dir):
    """The r01-r06 bench workload for this line: the fused token-stats +
    language-ID + fingerprint projection alone. The driver-contract
    `doc_text_profile` query has since grown a merged BM25 leg for oracle
    coverage; the bench keeps timing the original workload so the line
    stays comparable across rounds (tools/bench_oracle.py pins the same
    plain SQL)."""
    import __spark_entry__ as entry
    from mlforecast_spark.operators.text import text_profile

    return text_profile(entry._docs(spark, sf_dir))


def _fit_predict(spark, sf_dir):
    from mlforecast_spark import MLForecast
    from mlforecast_spark.lag_transforms import RollingMean
    from mlforecast_spark.models import LinearRegression
    import __spark_entry__ as entry

    panel = entry._panel(spark, sf_dir)
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
        date_features=["dayofweek"],
    )
    mf.fit(panel)
    # all features are per-series -> the cogrouped single-job rollout is the
    # right engine (equality with the lockstep loop: test_cogroup_predict.py;
    # hash-exact oracle: predict_snaive_gbt's snaive_cogroup leg).
    # bucket_by=128 amortizes the per-series Python-call cost once the
    # replicated SFs multiply the series count (sf10: 2500 series, predict
    # 5.2 -> 1.4 s, output bit-exact — LinearRegression's batched scoring is
    # row-independent). Below sf1 (25-250 series) bucketing is pure cost:
    # the cached feature frame is already hash-partitioned by id, so
    # groupBy(id) plans ZERO exchanges while groupBy(bucket) adds one —
    # pick the bucketed plan only where it pays. sort_output=False: the
    # forced consumer is an order-independent aggregate (like any
    # downstream trainer/sink), so the global (id, ds) sort — a range
    # exchange + boundary-sampling job over the whole forecast frame —
    # is skipped; values identical (the kwarg only drops the orderBy).
    # tightened SF pattern (r"sf([0-9.]+)" matched trailing dots -> float()
    # ValueError) and conservative default: an unparseable path means
    # UNKNOWN scale, and unbucketed is the safe plan there — the old
    # sf=1.0 default silently turned bucketing ON for nonconforming paths.
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    buckets = 128 if (m and float(m.group(1)) >= 1) else None
    return mf.predict(
        7, engine="cogroup", cogroup_buckets=buckets, sort_output=False
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from mlforecast_spark.utils import get_spark

    spark = get_spark("mlforecast-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    bench_names = [
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
    ]
    timings: dict[str, float] = {}

    overrides = {
        "dedup_exact": _dedup_exact_plain,
        "doc_text_profile": _doc_text_profile_plain,
    }

    # Warm the JVM: one tiny-SF pass of every bench query so whole-stage-
    # codegen JIT compiles before the timed runs (the minhash/simhash
    # pipelines alone carry multi-second cold-JIT cost that a long-lived
    # cluster pays once, not per query), THEN one untimed pass of every
    # query at the bench SF itself — symmetric with tools/bench_oracle.py,
    # whose DuckDB warm pass runs every query once at the bench SF so the
    # OS page cache and buffer manager are primed. Without this, Spark's
    # doc/embedding/events scans are timed cold while DuckDB's are warm —
    # an asymmetry in the exact ratio the gate tracks.
    _force(entry._panel(spark, sf_dir))
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    warm_dirs = [d for d in (warm_dir, sf_dir) if os.path.isdir(d)]
    for d in warm_dirs:
        for name in bench_names:
            try:
                _force(overrides.get(name, qs.get(name))(spark, d))
            except Exception:
                pass
        _force(_wide_feature_matrix(spark, d))
        _force(_fit_predict(spark, d))
    # r11 measurement fix: drop every InMemoryRelation before each timed
    # query. The dedup operators cache their signature/fingerprint frames
    # (session-lived by contract); r11 fixed the bug that silently killed
    # those caches (utils.sql_with_frames), so without this clear the warm
    # pass would pre-materialize them and the timed run would skip the
    # signature computation entirely — result caching across runs, exactly
    # what the timed region must not do. With the clear, each timed query
    # computes from the parquet inputs (its own intra-query cache reuse is
    # legitimate plan CSE); this also matches what the pre-r11 numbers
    # actually measured, since their caches were dead at timing time.
    for name in bench_names:
        fn = overrides.get(name, qs.get(name))
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    _force(_wide_feature_matrix(spark, sf_dir))
    timings["wide_feature_matrix"] = round(time.perf_counter() - t0, 3)

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    _force(_fit_predict(spark, sf_dir))
    timings["fit_predict_linreg_h7"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # r12: self-report the core-count contract so the scaling probe can
        # verify it from the bench output instead of guessing (the r11
        # driver's `suspect_cpus_ignored` flag fired on a guess: every
        # 8-vs-32 ratio read ~1.0 because sf0.1 is floor-bound, and nothing
        # in the JSON proved the env var reached the master/partitions).
        # `cpus` is $SPARK_GRAFT_CPUS as parsed; `default_parallelism` is
        # what the live SparkContext actually runs with.
        "cpus": cpus,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    # Same-session DuckDB baseline (bench_both protocol): re-measure the
    # oracle in THIS process so ratio_vs_oracle always pairs identical
    # machine states. The r9 committed-file denominator was captured during
    # a documented 40-70% machine slowdown and made BENCH_r09's headline
    # ratio non-comparable; a live re-run can't skew that way. Falls back to
    # the committed ORACLE_BENCH file only if the live run fails.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    base = None
    try:
        sys.path.insert(0, os.path.join(repo_dir, "tools"))
        import bench_oracle

        base = bench_oracle.measure(sf_dir, cpus)
        out_src = "same_session"
    except Exception:
        base = None
    if base is None:
        base_path = os.path.join(repo_dir, f"ORACLE_BENCH_sf{sf}.json")
        if not os.path.exists(base_path):
            base_path = os.path.join(repo_dir, "ORACLE_BENCH.json")
        if os.path.exists(base_path):
            try:
                with open(base_path) as f:
                    base = json.load(f)
                out_src = "committed_file"
            except Exception:
                base = None
    if base is not None:
        try:
            if base.get("sf") == sf:
                base_total = sum(
                    v for k, v in base["queries"].items() if v is not None and k in timings
                )
                ours_covered = sum(
                    v for k, v in timings.items() if base["queries"].get(k) is not None
                )
                out["oracle_engine"] = base.get("engine", "duckdb")
                out["oracle_sec"] = round(base_total, 3)
                out["oracle_source"] = out_src
                out["ratio_vs_oracle"] = round(ours_covered / base_total, 2)
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
