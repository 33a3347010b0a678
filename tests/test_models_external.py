"""Import-gated external GBDT adapters: surface parity with the reference's
SparkLGBMForecast/SparkXGBForecast (`/root/reference/mlforecast/distributed/
models/spark/lgb.py`, `xgb.py`), gating behavior without the libraries, and
skip-unless-installed end-to-end fits."""

import numpy as np
import pytest

from mlforecast_spark.models_external import SparkLGBMForecast, SparkXGBForecast


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def test_adapters_construct_and_mirror_reference_surface():
    for cls in (SparkLGBMForecast, SparkXGBForecast):
        m = cls(num_round=5) if cls is SparkXGBForecast else cls()
        # the reference's two extension points exist under the same names
        assert hasattr(m, "_pre_fit") and hasattr(m, "extract_local_model")
        # engine protocol: distributed fit + local scoring
        assert hasattr(m, "fit_spark") and hasattr(m, "predict")
        with pytest.raises(ValueError, match="not fitted"):
            m.predict(np.zeros((2, 2)))


@pytest.mark.skipif(_has("synapse.ml.lightgbm"), reason="synapseml installed")
def test_lgb_fit_spark_raises_clear_import_error(spark, panel):
    with pytest.raises(ImportError, match="synapseml"):
        SparkLGBMForecast()._pre_fit("y")


@pytest.mark.skipif(_has("xgboost.spark"), reason="xgboost installed")
def test_xgb_fit_spark_raises_clear_import_error(spark, panel):
    with pytest.raises(ImportError, match="xgboost"):
        SparkXGBForecast()._pre_fit("y")


@pytest.mark.skipif(not _has("xgboost.spark"), reason="xgboost not installed")
def test_xgb_end_to_end(spark, panel):
    from mlforecast_spark import MLForecast

    mf = MLForecast(
        models=[SparkXGBForecast(num_round=10, max_depth=3)],
        freq="D",
        lags=[1, 7],
    )
    mf.fit(panel)
    preds = mf.predict(3).toPandas()
    assert preds["SparkXGBForecast"].notna().all()


@pytest.mark.skipif(
    not (_has("synapse.ml.lightgbm") and _has("lightgbm")),
    reason="synapseml/lightgbm not installed",
)
def test_lgb_end_to_end(spark, panel):
    from mlforecast_spark import MLForecast

    mf = MLForecast(
        models=[SparkLGBMForecast(numIterations=10)],
        freq="D",
        lags=[1, 7],
    )
    mf.fit(panel)
    preds = mf.predict(3).toPandas()
    assert preds["SparkLGBMForecast"].notna().all()
