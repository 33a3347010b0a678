"""Edge-case hardening: degenerate series, io helpers, series scales."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.models import LinearRegression


def test_short_series_survive_pipeline(spark):
    """A 2-row series produces no lag7 features (dropna removes it from
    training) but must still get predictions from the recursive loop."""
    rows = [("long", t, float(t)) for t in range(30)] + [("tiny", 0, 5.0), ("tiny", 1, 6.0)]
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(panel)
    preds = mf.predict(2).toPandas()
    assert set(preds["unique_id"]) == {"long", "tiny"}
    assert preds["LinearRegression"].notna().all()


def test_constant_series_scalers(spark):
    """Zero-variance series must not divide by zero."""
    from mlforecast_spark.target_transforms import LocalMinMaxScaler, LocalStandardScaler

    rows = [("c", t, 5.0) for t in range(20)]
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    for tfm in (LocalStandardScaler(), LocalMinMaxScaler()):
        tfm.set_column_names("unique_id", "ds", "y")
        out = tfm.fit_transform(panel).toPandas()
        assert np.isfinite(out["y"]).all()


def test_predict_h1(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel)
    preds = mf.predict(1).toPandas()
    assert len(preds) == panel.select("unique_id").distinct().count()


def test_series_scales(spark):
    from mlforecast_spark.conformal import compute_series_scales

    rows = [("a", t, float(2 * t)) for t in range(20)]  # Δy constant 2 → mad 0 → floor
    rows += [("b", t, float(t**1.5)) for t in range(20)]
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    mad = compute_series_scales(panel, estimator="mad").toPandas().set_index("unique_id")
    assert mad.loc["a", "scale"] == pytest.approx(1e-8)
    assert mad.loc["b", "scale"] > 0.1
    std = compute_series_scales(panel, estimator="std").toPandas().set_index("unique_id")
    assert std.loc["a", "scale"] == pytest.approx(1e-8, abs=1e-6)


def test_io_partitioned_roundtrip(spark, panel, tmp_path):
    from mlforecast_spark.io import read_panel, write_panel_partitioned

    path = str(tmp_path / "panel")
    write_panel_partitioned(panel, path, granularity="month")
    back = read_panel(spark, path)
    assert back.count() == panel.count()
    # time filter must prune partitions, not just rows
    filtered = back.filter(F.col("ds") >= "2000-03-01")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "_part" in plan


def test_duplicate_model_names_resolved(spark, panel):
    mf = MLForecast(
        models={"lr_a": LinearRegression(), "lr_b": LinearRegression(fit_intercept=False)},
        freq="D",
        lags=[1],
    )
    mf.fit(panel)
    preds = mf.predict(2).toPandas()
    assert {"lr_a", "lr_b"} <= set(preds.columns)
