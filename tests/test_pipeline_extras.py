"""Fitted values, history warm-up (new_df), weight_col, dummy date features,
sparse horizons, ElasticNet."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.models import ElasticNet, LinearRegression, SeasonalNaive
from mlforecast_spark.target_transforms import LocalStandardScaler


def test_forecast_fitted_values(spark, panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        target_transforms=[LocalStandardScaler()],
    )
    mf.fit(panel)
    fitted = mf.forecast_fitted_values().toPandas()
    assert {"unique_id", "ds", "y", "h", "LinearRegression"} == set(fitted.columns)
    assert (fitted["h"] == 1).all()
    # y must be back in the original scale
    orig = panel.toPandas()
    merged = fitted.merge(orig, on=["unique_id", "ds"], suffixes=("_f", ""))
    np.testing.assert_allclose(merged["y_f"], merged["y"], rtol=1e-9)
    # in-sample fit should correlate strongly with the target
    corr = np.corrcoef(fitted["y"], fitted["LinearRegression"])[0, 1]
    assert corr > 0.3


def test_new_df_warmup(spark, panel):
    """predict(new_df=shifted history) must use the new last dates and leave
    the stored state untouched."""
    mf = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
    mf.fit(panel)
    base = mf.predict(2).toPandas()
    # warm up on a truncated history: drop the last 3 rows of each series
    from pyspark.sql import Window

    w = Window.partitionBy("unique_id").orderBy(F.col("ds").desc())
    trunc = (
        panel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 3)
        .drop("_rn")
    )
    warm = mf.predict(2, new_df=trunc).toPandas()
    trunc_last = trunc.groupBy("unique_id").agg(F.max("ds").alias("last")).toPandas()
    merged = warm.merge(trunc_last, on="unique_id")
    days = (pd.to_datetime(merged["ds"]) - pd.to_datetime(merged["last"])).dt.days
    assert set(days) == {1, 2}
    # stored state unaffected
    again = mf.predict(2).toPandas()
    pd.testing.assert_frame_equal(
        base.sort_values(["unique_id", "ds"]).reset_index(drop=True),
        again.sort_values(["unique_id", "ds"]).reset_index(drop=True),
    )


def test_weight_col(spark):
    """Zero-weighting a contaminated segment must recover the clean relation."""
    rows = []
    for t in range(60):
        y = 2.0 * t
        w = 1.0
        if t >= 50:  # contaminated tail
            y = 1000.0
            w = 0.0
        rows.append(("a", t, float(t), y, w))
    df = spark.createDataFrame(rows, "unique_id string, ds long, x double, y double, w double")
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[])
    # x is a static-looking extra col but actually dynamic; declare statics=[]
    mf.fit(df, static_features=["x"], weight_col="w")
    model = mf.models_["LinearRegression"]
    # y = 2*x on the weighted rows
    idx = mf.features_order_.index("x")
    np.testing.assert_allclose(model.coef_[idx], 2.0, atol=1e-6)


def test_dummy_date_features(spark, panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1],
        date_features=["dayofweek"],
        date_features_as_dummies=True,
    )
    feats = mf.preprocess(panel)
    for v in range(7):
        assert f"dayofweek_{v}" in feats.columns
    assert "dayofweek" not in mf.feature_names_
    pdf = feats.toPandas()
    sums = pdf[[f"dayofweek_{v}" for v in range(7)]].sum(axis=1)
    assert (sums == 1).all()
    mf.fit(panel)
    assert mf.predict(2).count() > 0


def test_sparse_horizons(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, max_horizon=5)
    preds = mf.predict(5, horizons=[2, 5]).toPandas()
    n_series = panel.select("unique_id").distinct().count()
    assert len(preds) == 2 * n_series
    last = panel.groupBy("unique_id").agg(F.max("ds").alias("last")).toPandas()
    merged = preds.merge(last, on="unique_id")
    days = (pd.to_datetime(merged["ds"]) - pd.to_datetime(merged["last"])).dt.days
    assert set(days) == {2, 5}


def test_elastic_net_shrinks(spark, panel):
    mf = MLForecast(
        models=[LinearRegression(), ElasticNet(alpha=0.5, l1_ratio=0.9)],
        freq="D",
        lags=[1, 2, 3],
    )
    mf.fit(panel)
    lr = mf.models_["LinearRegression"].coef_
    en = mf.models_["ElasticNet"].coef_
    assert np.abs(en).sum() < np.abs(lr).sum()
    preds = mf.predict(2).toPandas()
    assert preds["ElasticNet"].notna().all()


def test_generate_prices_for_series(spark):
    from mlforecast_spark.utils import generate_daily_series, generate_prices_for_series

    s = generate_daily_series(spark, 4, 20, 30, equal_ends=True, seed=1)
    p = generate_prices_for_series(s, horizon=5).toPandas()
    spans = s.groupBy("unique_id").count().toPandas().set_index("unique_id")["count"]
    got = p.groupby("unique_id").size()
    for uid in spans.index:
        assert got[uid] == spans[uid] + 5
    assert ((p["price"] >= 0) & (p["price"] < 1)).all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="equal ends"):
        generate_prices_for_series(generate_daily_series(spark, 3, 20, 30, seed=2))


def test_compact_parquet(spark, tmp_path):
    import os

    from mlforecast_spark.io import compact_parquet

    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    spark.range(10000).repartition(32).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 32
    n_out = compact_parquet(spark, src, dest, target_file_mb=512)
    assert n_out == 1
    n_dest = len([f for f in os.listdir(dest) if f.endswith(".parquet")])
    assert n_dest == 1
    assert spark.read.parquet(dest).count() == 10000
