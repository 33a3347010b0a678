"""Transfer conformal: intervals for a short-history target panel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.conformal import PredictionIntervals
from mlforecast_spark.models import LinearRegression
from mlforecast_spark.transfer_conformal import transfer_intervals


@pytest.fixture(scope="module")
def source_mf(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, prediction_intervals=PredictionIntervals(n_windows=2, h=3))
    return mf


@pytest.fixture(scope="module")
def target_panel(spark):
    from mlforecast_spark.utils import generate_daily_series

    # distinct ids, shorter histories, larger scale
    t = generate_daily_series(spark, 3, 25, 35, seed=42)
    return t.withColumn("unique_id", F.concat(F.lit("tgt_"), "unique_id")).withColumn(
        "y", F.col("y") * 10
    ).cache()


@pytest.mark.parametrize("method", ["scale_aligned", "error_scaled", "recalibrate"])
def test_transfer_methods(spark, source_mf, target_panel, method):
    out = transfer_intervals(
        source_mf, target_panel, h=3, level=[80], method=method, n_windows=2
    ).toPandas()
    n_tgt = target_panel.select("unique_id").distinct().count()
    assert len(out) == 3 * n_tgt
    lo, hi = "LinearRegression-lo-80", "LinearRegression-hi-80"
    assert out[[lo, hi]].notna().all().all()
    assert (out[lo] <= out["LinearRegression"]).all()
    assert (out["LinearRegression"] <= out[hi]).all()
    # intervals have nonzero width
    assert ((out[hi] - out[lo]) > 0).all()


def test_scale_alignment_widens_for_bigger_target(spark, source_mf, target_panel):
    """The target is 10× the source scale: scale_aligned widths must exceed
    the raw source-score widths."""
    aligned = transfer_intervals(
        source_mf, target_panel, h=3, level=[80], method="scale_aligned"
    ).toPandas()
    src_q = (
        source_mf.cs_df_.agg(
            F.percentile(F.abs(F.col("LinearRegression")), F.lit(0.8)).alias("q")
        ).collect()[0]["q"]
    )
    width = (
        aligned["LinearRegression-hi-80"] - aligned["LinearRegression-lo-80"]
    ).median()
    assert width > 2 * src_q  # aligned width ≫ unaligned 2·q

def test_unknown_method_raises(spark, source_mf, target_panel):
    with pytest.raises(ValueError):
        transfer_intervals(source_mf, target_panel, 2, [80], method="nope")
    with pytest.raises(NotImplementedError):
        transfer_intervals(source_mf, target_panel, 2, [80], method="weighted_conformal")
