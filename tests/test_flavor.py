"""MLflow flavor shim: pyfunc wrapper contract without mlflow installed."""

import numpy as np
import pandas as pd
import pytest

from mlforecast_spark import MLForecast
from mlforecast_spark.flavor import _MLForecastModelWrapper, _load_from_dir, save_model
from mlforecast_spark.models import LinearRegression


@pytest.fixture(scope="module")
def fitted(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel)
    return mf


def test_wrapper_predict_contract(spark, fitted):
    wrapper = _MLForecastModelWrapper(fitted)
    out = wrapper.predict(pd.DataFrame({"h": [3]}))
    n = fitted.statics_.count()
    assert len(out) == 3 * n
    assert "LinearRegression" in out.columns

    with pytest.raises(ValueError, match="Only 1 row"):
        wrapper.predict(pd.DataFrame({"h": [3, 4]}))
    with pytest.raises(ValueError, match="`h` parameter"):
        wrapper.predict(pd.DataFrame({"level": [None]}))


def test_wrapper_predict_with_ids(spark, fitted):
    wrapper = _MLForecastModelWrapper(fitted)
    ids = [r["unique_id"] for r in fitted.statics_.select("unique_id").limit(2).collect()]
    out = wrapper.predict(pd.DataFrame({"h": [2], "ids": [ids]}))
    assert set(out["unique_id"]) == set(ids)


def test_roundtrip_dir_without_mlflow(spark, fitted, tmp_path):
    """The persisted artifact is MLForecast.save's own format — loadable via
    the flavor's dir loader without mlflow."""
    path = str(tmp_path / "m")
    fitted.save(path)
    loaded = _load_from_dir(path, spark)
    a = fitted.predict(2).toPandas().sort_values(["unique_id", "ds"])
    b = loaded.predict(2).toPandas().sort_values(["unique_id", "ds"])
    np.testing.assert_allclose(
        a["LinearRegression"].to_numpy(), b["LinearRegression"].to_numpy()
    )


def test_mlflow_entry_points_gated(fitted, tmp_path):
    try:
        import mlflow  # noqa: F401

        pytest.skip("mlflow installed; gating not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="mlflow is required"):
        save_model(fitted, str(tmp_path / "x"))
