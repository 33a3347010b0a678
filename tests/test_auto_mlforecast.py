"""AutoMLForecast random-search study + update validation."""

import numpy as np
import pytest

from mlforecast_spark.auto import AutoMLForecast, AutoModel
from mlforecast_spark.models import LinearRegression, Ridge
from mlforecast_spark import MLForecast


def test_auto_mlforecast_study(spark, panel):
    auto = AutoMLForecast(
        models=[AutoModel(Ridge, lambda rng: {"alpha": rng.choice([0.1, 1.0, 10.0])})],
        freq="D",
        season_length=7,
        num_samples=3,
        seed=1,
    )
    auto.fit(panel, n_windows=2, h=3)
    assert len(auto.trials_) == 3
    ok_trials = [t for t in auto.trials_ if "losses" in t]
    assert ok_trials, auto.trials_
    best_loss = auto.best_["Ridge"][0]
    assert best_loss == min(t["losses"]["Ridge"] for t in ok_trials)
    preds = auto.predict(3).toPandas()
    assert len(preds) == 3 * panel.select("unique_id").distinct().count()
    assert preds["Ridge"].notna().all()


def test_auto_mlforecast_cogroup_engine_same_study(spark, panel):
    """engine='cogroup' must reproduce the default study exactly: same
    trials, same losses, same winner (the rollouts are engine-equal)."""
    import numpy as np

    def run(engine):
        auto = AutoMLForecast(
            models=[AutoModel(Ridge, lambda rng: {"alpha": rng.choice([0.1, 1.0])})],
            freq="D",
            season_length=7,
            num_samples=2,
            seed=1,
        )
        auto.fit(panel, n_windows=2, h=3, engine=engine)
        return auto

    a, b = run("spark"), run("cogroup")
    for ta, tb in zip(a.trials_, b.trials_):
        assert ("losses" in ta) == ("losses" in tb)
        if "losses" in ta:
            np.testing.assert_allclose(
                ta["losses"]["Ridge"], tb["losses"]["Ridge"], rtol=1e-8
            )


def test_update_validation(spark):
    hist = spark.createDataFrame(
        [("a", t, float(t)) for t in range(20)], "unique_id string, ds long, y double"
    )
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(hist)
    # gap: jumps from 19 to 25
    bad = spark.createDataFrame([("a", 25, 1.0)], "unique_id string, ds long, y double")
    with pytest.raises(ValueError, match="gap-free"):
        mf.update(bad, validate=True)
    # duplicate timestamps
    bad2 = spark.createDataFrame(
        [("a", 20, 1.0), ("a", 20, 2.0)], "unique_id string, ds long, y double"
    )
    with pytest.raises(ValueError, match="gap-free"):
        mf.update(bad2, validate=True)
    # valid continuation passes and new series are admitted
    good = spark.createDataFrame(
        [("a", 20, 20.0), ("b", 0, 1.0)], "unique_id string, ds long, y double"
    )
    mf.update(good, validate=True)
    preds = mf.predict(1).toPandas().set_index("unique_id")
    assert preds.loc["a", "ds"] == 21
    assert preds.loc["b", "ds"] == 1
