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


def test_extended_metrics_vs_numpy(spark):
    from mlforecast_spark.metrics import coverage, mape, mqloss, quantile_loss, rmsse

    rows = []
    rng = np.random.RandomState(1)
    for uid in ["a", "b"]:
        for t in range(12):
            y = float(5 + t + rng.rand())
            p = y + rng.randn()
            rows.append((uid, t, y, p, p - 1.5, p + 1.5))
    cv = spark.createDataFrame(
        rows, "unique_id string, ds long, y double, m1 double, `m1-lo-80` double, `m1-hi-80` double"
    )
    pdf = cv.toPandas()

    out = mape(cv, ["m1"]).toPandas().set_index("unique_id")
    for uid, g in pdf.groupby("unique_id"):
        np.testing.assert_allclose(
            out.loc[uid, "m1"], np.mean(np.abs(g.m1 - g.y) / np.abs(g.y)), rtol=1e-9
        )

    train_rows = [("a", t, float(t * t % 7)) for t in range(15)] + [
        ("b", t, float(3 * t % 5)) for t in range(15)
    ]
    train = spark.createDataFrame(train_rows, "unique_id string, ds long, y double")
    tr = pd.DataFrame(train_rows, columns=["unique_id", "ds", "y"])
    out = rmsse(cv, train, ["m1"], season_length=1).toPandas().set_index("unique_id")
    for uid, g in pdf.groupby("unique_id"):
        tg = tr[tr.unique_id == uid].sort_values("ds").y
        scale = np.mean(np.diff(tg) ** 2)
        exp = np.sqrt(np.mean((g.m1 - g.y) ** 2) / scale)
        np.testing.assert_allclose(out.loc[uid, "m1"], exp, rtol=1e-9)

    q = 0.25
    out = quantile_loss(cv, ["m1"], q=q).toPandas().set_index("unique_id")
    for uid, g in pdf.groupby("unique_id"):
        d = g.y - g.m1
        exp = np.mean(np.maximum(q * d, (q - 1) * d))
        np.testing.assert_allclose(out.loc[uid, "m1"], exp, rtol=1e-9)

    out = mqloss(cv, ["m1"], level=[80]).toPandas().set_index("unique_id")
    for uid, g in pdf.groupby("unique_id"):
        terms = []
        for col, qv in (("m1-lo-80", 0.1), ("m1-hi-80", 0.9)):
            d = g.y - g[col]
            terms.append(np.maximum(qv * d, (qv - 1) * d))
        np.testing.assert_allclose(
            out.loc[uid, "m1"], np.mean((terms[0] + terms[1]) / 2.0), rtol=1e-9
        )

    out = coverage(cv, ["m1"], level=80).toPandas().set_index("unique_id")
    for uid, g in pdf.groupby("unique_id"):
        exp = np.mean((g.y >= g["m1-lo-80"]) & (g.y <= g["m1-hi-80"]))
        np.testing.assert_allclose(out.loc[uid, "m1"], exp, rtol=1e-12)

    ev = evaluate(
        cv, ["mape", "rmsse", "mqloss", "coverage"], ["m1"],
        train_df=train, level=[80],
    ).toPandas()
    assert set(ev["metric"]) == {"mape", "rmsse", "mqloss", "coverage"}
    assert len(ev) == 8


def test_mape_zero_target_rows_excluded(spark):
    from mlforecast_spark.metrics import mape

    cv = spark.createDataFrame(
        [("a", 0, 0.0, 1.0), ("a", 1, 2.0, 3.0)],
        "unique_id string, ds long, y double, m1 double",
    )
    out = mape(cv, ["m1"]).toPandas()
    # the y=0 row contributes NULL and is skipped: mean over the one valid row
    np.testing.assert_allclose(out["m1"].iloc[0], 0.5)


def test_evaluate_coverage_multiple_levels(spark):
    """coverage with level=[80, 95] emits one 'coverage-{lv}' row per level
    so it can mix with mqloss in a single evaluate call (the utilsforecast
    evaluate(level=[...]) pattern)."""
    import numpy as np

    from mlforecast_spark.metrics import evaluate

    rows = []
    rng = np.random.RandomState(3)
    for uid in ["a", "b"]:
        for t in range(10):
            y = float(t + rng.rand())
            p = y + rng.randn()
            rows.append((uid, t, y, p, p - 1.0, p + 1.0, p - 2.0, p + 2.0))
    cv = spark.createDataFrame(
        rows,
        "unique_id string, ds long, y double, m1 double, `m1-lo-80` double,"
        " `m1-hi-80` double, `m1-lo-95` double, `m1-hi-95` double",
    )
    ev = evaluate(cv, ["mqloss", "coverage"], ["m1"], level=[80, 95]).toPandas()
    assert set(ev["metric"]) == {"mqloss", "coverage-80", "coverage-95"}
    assert len(ev) == 6  # 2 series x 3 metric rows
    pdf = cv.toPandas()
    for lv in (80, 95):
        sub = ev[ev.metric == f"coverage-{lv}"].set_index("unique_id")
        for uid, g in pdf.groupby("unique_id"):
            exp = np.mean((g.y >= g[f"m1-lo-{lv}"]) & (g.y <= g[f"m1-hi-{lv}"]))
            np.testing.assert_allclose(sub.loc[uid, "m1"], exp, rtol=1e-12)
