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


@pytest.mark.parametrize(
    "method",
    [
        "scale_aligned",
        "error_scaled",
        "recalibrate",
        "weighted_conformal",
        "scale_aligned_weighted",
    ],
)
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


def test_weighted_step_quantiles_match_reference_formula(spark):
    """Distributed weighted quantile == the reference's _weighted_quantiles
    (`/root/reference/mlforecast/conformal_prediction.py:437-460`) on a frame
    with known weights."""
    from mlforecast_spark.transfer_conformal import _weighted_pooled_step_quantiles

    rng = np.random.default_rng(7)
    rows = []
    for step in (1, 2):
        for _ in range(40):
            rows.append(
                (f"id_{rng.integers(5)}", step, float(rng.normal()), float(rng.uniform(0.2, 3.0)))
            )
    cs = spark.createDataFrame(
        rows, "unique_id string, _step int, M double, _w double"
    )
    w_test = 1.3
    got = (
        _weighted_pooled_step_quantiles(cs, ["M"], [80, 95], w_test)
        .toPandas()
        .set_index("_step")
        .sort_index()
    )

    def ref_wq(vals, weights, cut, w_test):
        total = weights.sum() + w_test
        order = np.argsort(vals)
        sv = np.append(vals[order], np.inf)
        sw = np.append(weights[order] / total, w_test / total)
        cum = np.cumsum(sw)
        idx = int(np.searchsorted(cum, 1.0 - (1.0 - cut), side="left"))
        return sv[idx]

    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["unique_id", "_step", "M", "_w"])
    for step in (1, 2):
        sub = pdf[pdf._step == step]
        vals = np.abs(sub["M"].to_numpy())
        w = sub["_w"].to_numpy()
        for lv in (80, 95):
            exp = ref_wq(vals, w, lv / 100, w_test)
            np.testing.assert_allclose(got.loc[step, f"_q_M_{lv}"], exp, rtol=1e-12)


def test_weighted_transfer_reacts_to_covariate_shift(spark, source_mf, target_panel):
    """The DRE must upweight calibration points that look like the target:
    weights vary (not all equal) and the weighted interval differs from the
    unweighted pooled one."""
    from mlforecast_spark.transfer_conformal import _dre_weighted_scores

    cs_w, w_test = _dre_weighted_scores(source_mf, target_panel)
    ws = cs_w.select("_w").toPandas()["_w"]
    assert ws.notna().all() and (ws > 0).all()
    assert ws.std() > 0  # covariate shift (10x scale) ⇒ non-constant weights
    assert w_test > 0


def test_predict_transfer_conformal_wiring(spark, source_mf, target_panel):
    """The reference's predict-time surface: predict(transfer_conformal=...)
    with new_df + level must equal the direct transfer_intervals call; a
    plain string is shorthand for TransferConformal(method=...)."""
    from mlforecast_spark.transfer_conformal import TransferConformal

    direct = transfer_intervals(
        source_mf, target_panel, h=3, level=[80], method="scale_aligned"
    ).toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    via_str = source_mf.predict(
        3, new_df=target_panel, level=[80], transfer_conformal="scale_aligned"
    ).toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    via_obj = source_mf.predict(
        3,
        new_df=target_panel,
        level=[80],
        transfer_conformal=TransferConformal(method="scale_aligned"),
    ).toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(direct, via_str[direct.columns])
    pd.testing.assert_frame_equal(direct, via_obj[direct.columns])

    with pytest.raises(ValueError, match="new_df"):
        source_mf.predict(3, level=[80], transfer_conformal="scale_aligned")
    with pytest.raises(ValueError, match="level"):
        source_mf.predict(
            3, new_df=target_panel, transfer_conformal="scale_aligned"
        )
    with pytest.raises(ValueError, match="dre_estimator|logistic"):
        TransferConformal(dre_estimator="gradient_boosting")
