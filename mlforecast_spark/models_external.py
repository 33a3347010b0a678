"""Import-gated adapters for external distributed GBDT libraries.

Reference parity: the reference ships thin subclasses of each library's own
Spark estimator — ``SparkLGBMForecast(LightGBMRegressor)`` with
``_pre_fit``/``extract_local_model``
(`/root/reference/mlforecast/distributed/models/spark/lgb.py:25-34`) and
``SparkXGBForecast(SparkXGBRegressor)``
(`/root/reference/mlforecast/distributed/models/spark/xgb.py:17-28`). This
engine's model protocol is ``fit_spark(df, feature_cols, target_col,
weight_col=)`` + local ``fit``/``predict``, so the adapters here wrap
instead of subclass, keep the reference's two extension-point names
(``_pre_fit``, ``extract_local_model``), and gate every import so the
module always imports cleanly — in containers without the libraries the
constructor works and ``fit*`` raises a clear ImportError (tests skip).

Scale design: the distributed fit is the library's own Spark estimator
(histogram-parallel boosting across executors); after training the native
booster is extracted to a local object, so scoring rides the engine's
generic Arrow-batched pandas-UDF path with the booster broadcast to
workers — no per-row JVM<->Python chatter.

Neither lightgbm, synapseml, nor xgboost is installed in this container:
both adapters are exercised by construct-and-raise tests here and by
skip-unless-installed fit tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

__all__ = ["SparkLGBMForecast", "SparkXGBForecast"]


class _ExternalBoosterAdapter:
    """Shared shape: distributed fit via the library's Spark estimator,
    local scoring via the extracted native booster."""

    _lib_hint = ""

    def __init__(self, **params):
        self.params = dict(params)
        self._local = None

    # -- extension points mirroring the reference adapters ---------------
    def _pre_fit(self, target_col: str, weight_col: Optional[str] = None):
        raise NotImplementedError

    def extract_local_model(self, trained_model):
        raise NotImplementedError

    # -- engine protocol --------------------------------------------------
    def predict(self, X):
        if self._local is None:
            raise ValueError("model is not fitted")
        import numpy as np

        return np.asarray(self._local.predict(X), dtype="float64")


class SparkLGBMForecast(_ExternalBoosterAdapter):
    """LightGBM over Spark via SynapseML's ``LightGBMRegressor`` (the same
    estimator the reference subclasses); local scoring via the extracted
    ``lgb.Booster``. Requires ``synapse.ml`` for the distributed fit and
    ``lightgbm`` for booster extraction / local fit."""

    def _pre_fit(self, target_col: str, weight_col: Optional[str] = None):
        try:
            from synapse.ml.lightgbm import LightGBMRegressor
        except ImportError as e:
            raise ImportError(
                "SparkLGBMForecast.fit_spark needs the synapseml package "
                "(com.microsoft.azure:synapseml) on the cluster; install it "
                "or use the built-in GradientBoostedTrees."
            ) from e
        reg = LightGBMRegressor(**self.params).setLabelCol(target_col)
        if weight_col is not None and hasattr(reg, "setWeightCol"):
            reg = reg.setWeightCol(weight_col)
        return reg

    def extract_local_model(self, trained_model):
        import lightgbm as lgb

        return lgb.Booster(model_str=trained_model.getNativeModel())

    def fit_spark(
        self,
        df: DataFrame,
        feature_cols: Sequence[str],
        target_col: str,
        weight_col: Optional[str] = None,
    ):
        from pyspark.ml.feature import VectorAssembler

        reg = self._pre_fit(target_col, weight_col).setFeaturesCol("_features")
        assembled = VectorAssembler(
            inputCols=list(feature_cols), outputCol="_features"
        ).transform(df)
        self._local = self.extract_local_model(reg.fit(assembled))
        return self

    def fit(self, X, y):
        try:
            import lightgbm as lgb
        except ImportError as e:
            raise ImportError(
                "SparkLGBMForecast.fit needs the lightgbm package."
            ) from e
        self._local = lgb.train(
            {"objective": "regression", "verbosity": -1, **self.params},
            lgb.Dataset(X, label=y),
        )
        return self


class SparkXGBForecast(_ExternalBoosterAdapter):
    """XGBoost over Spark via ``xgboost.spark.SparkXGBRegressor`` (the same
    estimator the reference subclasses); local scoring via the extracted
    booster. ``features_col`` as a column list skips vector assembly."""

    def _pre_fit(self, target_col: str, weight_col: Optional[str] = None):
        try:
            from xgboost.spark import SparkXGBRegressor
        except ImportError as e:
            raise ImportError(
                "SparkXGBForecast.fit_spark needs the xgboost package "
                "(>=1.7, with xgboost.spark); install it or use the "
                "built-in GradientBoostedTrees."
            ) from e
        params = dict(self.params)
        params["label_col"] = target_col
        if weight_col is not None:
            params["weight_col"] = weight_col
        return SparkXGBRegressor(**params)

    def extract_local_model(self, trained_model):
        import xgboost as xgb

        local = xgb.XGBRegressor()
        local.load_model(trained_model.get_booster().save_raw("ubj"))
        return local

    def fit_spark(
        self,
        df: DataFrame,
        feature_cols: Sequence[str],
        target_col: str,
        weight_col: Optional[str] = None,
    ):
        reg = self._pre_fit(target_col, weight_col)
        reg.setParams(features_col=list(feature_cols))
        self._local = self.extract_local_model(reg.fit(df))
        return self

    def fit(self, X, y):
        try:
            import xgboost as xgb
        except ImportError as e:
            raise ImportError("SparkXGBForecast.fit needs the xgboost package.") from e
        local = xgb.XGBRegressor(**self.params)
        local.fit(X, y)
        self._local = local
        return self
