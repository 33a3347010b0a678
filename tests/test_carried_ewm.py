"""Carried-EWM predict fast path must reproduce the full-recompute path."""

import numpy as np
import pytest

from mlforecast_spark import MLForecast
from mlforecast_spark.core import FeaturePlan
from mlforecast_spark.lag_transforms import ExponentiallyWeightedMean, RollingMean
from mlforecast_spark.models import LinearRegression


@pytest.mark.parametrize("lag", [1, 3])
def test_carried_matches_recompute(spark, panel, lag, monkeypatch):
    def build():
        mf = MLForecast(
            models=[LinearRegression()],
            freq="D",
            lags=[1, 7],
            lag_transforms={lag: [ExponentiallyWeightedMean(alpha=0.35), RollingMean(window_size=5, min_samples=1)]},
        )
        mf.fit(panel)
        return mf

    mf_fast = build()
    fast = (
        mf_fast.predict(6, ewm_update_mode="carried")
        .toPandas()
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )

    mf_slow = build()
    slow = mf_slow.predict(6).toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)

    np.testing.assert_allclose(
        fast["LinearRegression"].to_numpy(),
        slow["LinearRegression"].to_numpy(),
        rtol=1e-9,
    )


def test_scan_engine_matches_pandas_path(spark):
    """engine='scan' (log-depth window scan, no Python) must agree with the
    pandas recurrence to float-reassociation tolerance, including NaN gaps
    (ignore_na carry-forward) and leading NaNs from the lag shift."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms

    rng = np.random.RandomState(3)
    rows = []
    for uid, n in (("a", 257), ("b", 31), ("c", 1)):
        vals = rng.randn(n).cumsum() + 50
        mask = rng.rand(n) < 0.15  # inject NaN gaps
        for t in range(n):
            rows.append((uid, t, None if mask[t] else float(vals[t])))
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")

    def run(engine):
        registry = _parse_transforms(
            [], {2: [ExponentiallyWeightedMean(alpha=0.3, engine=engine)]}
        )
        plan = FeaturePlan(schema=PanelSchema(), registry=registry)
        name = next(iter(registry))
        return (
            plan.apply(panel)
            .select("unique_id", "ds", F.col(f"`{name}`").alias("ewm"))
            .toPandas()
            .sort_values(["unique_id", "ds"])
            .reset_index(drop=True)
        )

    scan = run("scan")
    ref = run("pandas")
    assert scan[["unique_id", "ds"]].equals(ref[["unique_id", "ds"]])
    np.testing.assert_allclose(scan["ewm"], ref["ewm"], rtol=1e-9, equal_nan=True)
    # the hand recurrence, independently of both engines
    pdf = panel.toPandas().sort_values(["unique_id", "ds"])
    exp = pdf.groupby("unique_id")["y"].apply(
        lambda s: s.shift(2).ewm(alpha=0.3, adjust=False, ignore_na=True).mean()
    ).reset_index(drop=True)
    np.testing.assert_allclose(scan["ewm"], exp, rtol=1e-9, equal_nan=True)


def test_scan_engine_explicit_rounds_plans_without_action(spark):
    """Plan construction triggers no Spark job with the DEFAULT scan_rounds
    (a safe constant, 31) or an explicit value; scan_rounds=None is the
    opt-in for deriving rounds with a count job."""
    from pyspark.sql import functions as F

    from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms

    panel = spark.createDataFrame(
        [("a", t, float(t)) for t in range(20)], "unique_id string, ds long, y double"
    )
    for kwargs in ({"scan_rounds": 6}, {}):
        registry = _parse_transforms(
            [], {1: [ExponentiallyWeightedMean(alpha=0.5, engine="scan", **kwargs)]}
        )
        plan = FeaturePlan(schema=PanelSchema(), registry=registry)
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        out = plan.apply(panel)  # lazy - no job may run here
        after = tracker.getJobIdsForGroup(None)
        assert len(after) == len(before), kwargs
        name = next(iter(registry))
        got = out.select(F.col(f"`{name}`")).toPandas()
        assert got.notna().sum().iloc[0] == 19

    # opt-in derivation (scan_rounds=None) runs a count job at plan time
    # and still produces the same feature
    registry = _parse_transforms(
        [],
        {1: [ExponentiallyWeightedMean(alpha=0.5, engine="scan",
                                       scan_rounds=None)]},
    )
    plan = FeaturePlan(schema=PanelSchema(), registry=registry)
    out = plan.apply(panel)
    name = next(iter(registry))
    got = out.select(F.col(f"`{name}`")).toPandas()
    assert got.notna().sum().iloc[0] == 19
