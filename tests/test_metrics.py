"""Metric aggregations vs hand-computed numpy values."""

import numpy as np
import pandas as pd

from mlforecast_spark.metrics import evaluate, mase, smape


def test_metrics_vs_numpy(spark):
    rows = []
    rng = np.random.RandomState(0)
    for uid in ["a", "b"]:
        for t in range(10):
            y = float(10 + t + rng.rand())
            rows.append((uid, t, y, y + 1.0, y - 2.0))
    cv = spark.createDataFrame(rows, "unique_id string, ds long, y double, m1 double, m2 double")
    pdf = cv.toPandas()

    out = smape(cv, ["m1", "m2"]).toPandas().set_index("unique_id")
    for uid, g in pdf.groupby("unique_id"):
        exp = np.mean(2 * np.abs(g.m1 - g.y) / (np.abs(g.y) + np.abs(g.m1)))
        np.testing.assert_allclose(out.loc[uid, "m1"], exp, rtol=1e-9)

    train_rows = [("a", t, float(t)) for t in range(20)] + [("b", t, float(2 * t)) for t in range(20)]
    train = spark.createDataFrame(train_rows, "unique_id string, ds long, y double")
    ms = mase(cv, train, ["m1"], season_length=1).toPandas().set_index("unique_id")
    # scale: mean |diff| of train = 1.0 for 'a', 2.0 for 'b'
    mae_a = np.abs(pdf[pdf.unique_id == "a"].m1 - pdf[pdf.unique_id == "a"].y).mean()
    np.testing.assert_allclose(ms.loc["a", "m1"], mae_a / 1.0, rtol=1e-9)
    mae_b = np.abs(pdf[pdf.unique_id == "b"].m1 - pdf[pdf.unique_id == "b"].y).mean()
    np.testing.assert_allclose(ms.loc["b", "m1"], mae_b / 2.0, rtol=1e-9)

    ev = evaluate(cv, ["smape", "mae", "rmse"], ["m1", "m2"]).toPandas()
    assert set(ev["metric"]) == {"smape", "mae", "rmse"}
    assert len(ev) == 6  # 2 series × 3 metrics
