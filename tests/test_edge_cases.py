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


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """The z-order layout contract: per-file min/max ranges shrink on EVERY
    clustered column (that's what parquet footer pruning needs), where a
    single-column sort leaves the other column's per-file range ~global."""
    import glob

    import pyarrow.parquet as pq
    from mlforecast_spark.io import write_panel_zordered

    n = 40_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 100_000).alias("a"),
        (F.xxhash64(F.col("id") + 1) % 100_000).alias("b"),
    )

    def avg_range(path, col):
        spans, lo_all, hi_all = [], None, None
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                los.append(c.statistics.min)
                his.append(c.statistics.max)
            spans.append(max(his) - min(los))
            lo_all = min(los) if lo_all is None else min(lo_all, min(los))
            hi_all = max(his) if hi_all is None else max(hi_all, max(his))
        return sum(spans) / len(spans), hi_all - lo_all

    zpath = str(tmp_path / "z")
    write_panel_zordered(df, zpath, ["a", "b"], num_files=16)
    za, ga = avg_range(zpath, "a")
    zb, gb = avg_range(zpath, "b")
    # 16 files over an 8x8-bin 2-D curve: each file covers a fraction of
    # BOTH axes (~the sqrt of the file fraction, not 1/16 — curve locality)
    assert za < 0.6 * ga, (za, ga)
    assert zb < 0.6 * gb, (zb, gb)

    # contrast: a plain sort by 'a' leaves b's per-file span at ~global
    spath = str(tmp_path / "s")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(spath)
    sb, gsb = avg_range(spath, "b")
    assert sb > 0.9 * gsb, (sb, gsb)


def test_zorder_write_validation(spark, tmp_path):
    from mlforecast_spark.io import write_panel_zordered

    df = spark.range(10).select(F.col("id").alias("a"), F.lit("x").alias("s"))
    with pytest.raises(ValueError, match="unsupported type"):
        write_panel_zordered(df, str(tmp_path / "x"), ["a", "s"])
    with pytest.raises(ValueError, match="not in frame"):
        write_panel_zordered(df, str(tmp_path / "y"), ["nope"])
