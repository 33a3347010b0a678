"""MLflow model flavor for mlforecast_spark pipelines.

API parity with `/root/reference/mlforecast/flavor.py:64-349`
(save_model / log_model / load_model / pyfunc wrapper with a one-row config
DataFrame carrying h / level / ids / X_df / new_df). mlflow is not installed
in this container, so every mlflow-touching entry point is import-gated with
a clear error; the pyfunc wrapper itself is plain Python and fully tested
without mlflow.

The persisted artifact is the engine's own directory format
(``MLForecast.save``: Parquet state + meta.pkl), so models saved here load
anywhere the package and a SparkSession exist.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from .forecast import MLForecast

FLAVOR_NAME = "mlforecast_spark"

_SERIALIZED_MODEL_FILE = "model"


def _require_mlflow():
    try:
        import mlflow  # noqa: F401

        return mlflow
    except ImportError as e:  # pragma: no cover - mlflow absent in container
        raise ImportError(
            "mlflow is required for the MLflow flavor entry points "
            "(save_model/log_model/load_model). Install mlflow, or use "
            "MLForecast.save/load directly — they persist the same artifact."
        ) from e


def get_default_pip_requirements():
    return ["pyspark", "pandas", "numpy"]


def get_default_conda_env():
    """Reference-name parity (`flavor.py`): a conda env spec wrapping the
    default pip requirements — built without importing mlflow so the name
    resolves even where mlflow is absent (mlflow users can pass it to
    ``log_model(conda_env=...)``)."""
    import sys

    py = f"{sys.version_info.major}.{sys.version_info.minor}"
    return {
        "name": "mlforecast-spark-env",
        "channels": ["conda-forge"],
        "dependencies": [
            f"python={py}",
            "pip",
            {"pip": get_default_pip_requirements()},
        ],
    }


def save_model(
    model: MLForecast,
    path: str,
    conda_env=None,
    code_paths=None,
    mlflow_model=None,
    signature=None,
    input_example=None,
    pip_requirements=None,
    extra_pip_requirements=None,
):
    """Save an ``MLForecast`` pipeline as an MLflow model directory
    (`/root/reference/mlforecast/flavor.py:64-173`)."""
    mlflow = _require_mlflow()
    from mlflow.models import Model
    from mlflow.models.utils import _save_example

    os.makedirs(path, exist_ok=True)
    if mlflow_model is None:
        mlflow_model = Model()
    if signature is not None:
        mlflow_model.signature = signature
    if input_example is not None:
        _save_example(mlflow_model, input_example, path)

    model_data_path = os.path.join(path, _SERIALIZED_MODEL_FILE)
    model.save(model_data_path)

    mlflow_model.add_flavor(
        FLAVOR_NAME, serialization_format="dir", model_path=_SERIALIZED_MODEL_FILE
    )
    import mlflow.pyfunc

    mlflow.pyfunc.add_to_model(
        mlflow_model,
        loader_module="mlforecast_spark.flavor",
        model_path=_SERIALIZED_MODEL_FILE,
        conda_env=conda_env,
        python_env=None,
    )
    mlflow_model.save(os.path.join(path, "MLmodel"))
    return mlflow_model


def log_model(model: MLForecast, artifact_path: str, **kwargs):
    """Log the pipeline as an MLflow artifact
    (`/root/reference/mlforecast/flavor.py:176-253`)."""
    mlflow = _require_mlflow()
    from mlflow.models import Model

    import mlforecast_spark.flavor as flavor_module

    return Model.log(
        artifact_path=artifact_path,
        flavor=flavor_module,
        model=model,
        **kwargs,
    )


def load_model(model_uri: str, spark=None, dst_path: Optional[str] = None) -> MLForecast:
    """Load an ``MLForecast`` from an MLflow model URI
    (`/root/reference/mlforecast/flavor.py:255-288`)."""
    _require_mlflow()
    from mlflow.tracking.artifact_utils import _download_artifact_from_uri

    local_path = _download_artifact_from_uri(
        artifact_uri=model_uri, output_path=dst_path
    )
    return _load_from_dir(os.path.join(local_path, _SERIALIZED_MODEL_FILE), spark)


def _load_from_dir(path: str, spark=None) -> MLForecast:
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            from .utils import get_spark

            spark = get_spark()
    return MLForecast.load(path, spark)


def _load_pyfunc(path: str):
    """PyFunc loader (`/root/reference/mlforecast/flavor.py:291-302`)."""
    return _MLForecastModelWrapper(_load_from_dir(path))


class _MLForecastModelWrapper:
    """One-row config-DataFrame predict contract
    (`/root/reference/mlforecast/flavor.py:305-349`): columns h (required),
    level, ids, X_df, new_df. Returns the forecast as pandas."""

    def __init__(self, model: MLForecast):
        self.model = model

    def predict(self, config_df, params: Optional[Dict[str, Any]] = None):
        import pandas as pd

        n_rows = config_df.shape[0]
        if n_rows > 1:
            raise ValueError(
                f"The provided prediction DataFrame contains {n_rows} rows. "
                "Only 1 row should be supplied."
            )
        attrs = config_df.iloc[0].to_dict()
        h = attrs.get("h")
        if h is None:
            raise ValueError("The `h` parameter is required to make forecasts.")
        level = attrs.get("level")
        if level is not None:
            level = list(level)
        new_df = attrs.get("new_df")
        X_df = attrs.get("X_df")
        ids = attrs.get("ids")
        if ids is not None:
            ids = list(ids)
        spark = self.model.state_.sparkSession
        if new_df is not None:
            if level is not None:
                raise ValueError(
                    "Prediction intervals are not supported in transfer "
                    "learning. Please provide either `level` or `new_df`, "
                    "but not both."
                )
            new_df = spark.createDataFrame(pd.DataFrame(new_df))
        if X_df is not None:
            X_df = spark.createDataFrame(pd.DataFrame(X_df))
        return self.model.predict(
            int(h), X_df=X_df, ids=ids, level=level, new_df=new_df
        ).toPandas()
