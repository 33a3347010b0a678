"""Models: sklearn-compatible numpy estimators with Spark-scalable training.

The container has no sklearn/lightgbm, so we provide our own estimators with
the same ``fit(X, y)`` / ``predict(X)`` surface the reference expects
(`/root/reference/mlforecast/forecast.py:608-680` just calls those two).

Scale design (mirrors the reference's distributed-trainer idea,
`/root/reference/mlforecast/distributed/forecast.py:408-418`): training for
linear models runs as a *distributed sufficient-statistics pass* — each Arrow
batch contributes a k×k Gram matrix and X'y vector via ``mapInPandas``, the
driver sums the tiny partials and solves the normal equations. No feature
matrix ever materializes on the driver, so this trains on 100 TB as long as
k (features) is modest. Scoring is a pure ``Column`` expression (JVM-side,
whole-stage codegen) — no Python in the predict hot loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .utils import qcol


class _LinearBase:
    """Shared fit/predict for linear family."""

    fit_intercept: bool = True
    l2: float = 0.0

    coef_: Optional[np.ndarray] = None
    intercept_: float = 0.0

    def _solve(self, gram: np.ndarray, xty: np.ndarray, n: int, k: int):
        reg = self.l2 * np.eye(k + 1)
        if self.fit_intercept:
            reg[0, 0] = 0.0  # don't penalize the intercept
        else:
            gram = gram[1:, 1:]
            xty = xty[1:]
            reg = reg[1:, 1:]
        try:
            beta = np.linalg.solve(gram + reg, xty)
        except np.linalg.LinAlgError:
            beta, *_ = np.linalg.lstsq(gram + reg, xty, rcond=None)
        if self.fit_intercept:
            self.intercept_ = float(beta[0])
            self.coef_ = beta[1:].astype(np.float64)
        else:
            self.intercept_ = 0.0
            self.coef_ = beta.astype(np.float64)
        return self

    # --- numpy API (driver-side, small matrices) -------------------------
    def fit(self, X: np.ndarray, y: np.ndarray):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, k = X.shape
        Xa = np.column_stack([np.ones(n), X])
        return self._solve(Xa.T @ Xa, Xa.T @ y, n, k)

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return X @ self.coef_ + self.intercept_

    # --- Spark API (distributed sufficient statistics) -------------------
    _JVM_GRAM_MAX_K = 40  # (k+1)(k+2)/2 aggregates; beyond this use Arrow path

    def fit_spark(
        self,
        df: DataFrame,
        feature_cols: Sequence[str],
        target_col: str,
        weight_col: Optional[str] = None,
    ):
        if len(feature_cols) <= self._JVM_GRAM_MAX_K:
            return self._fit_spark_jvm(df, feature_cols, target_col, weight_col)
        return self._fit_spark_arrow(df, feature_cols, target_col, weight_col)

    def _fit_spark_jvm(
        self,
        df: DataFrame,
        feature_cols: Sequence[str],
        target_col: str,
        weight_col: Optional[str] = None,
    ):
        """Gram matrix as one JVM HashAggregate: (k+1)(k+2)/2 sum() exprs over
        products — no Python workers in the training path at all. Sample
        weights fold into the sums (weighted least squares). The aggregate
        expressions are built as SQL strings parsed JVM-side in one pass:
        at k features that is (k+1)(k+2)/2 + k + 2 aggregates, and
        node-by-node py4j construction of them dominated fit()'s fixed
        plan-build floor (same pathology measured on simhash/minhash — see
        operators/dedup.py r9 notes)."""
        from .utils import qsql

        orig_cols = list(feature_cols)
        k = len(orig_cols)
        cols = ["1.0D"] + [
            f"cast({qsql(c)} as double)" for c in orig_cols
        ]
        y = f"cast({qsql(target_col)} as double)"
        parts = [f"({y} is not null and not isnan({y}))"]
        for c in cols[1:]:
            parts.append(f"({c} is not null and not isnan({c}))")
        if weight_col is not None:
            w = f"cast({qsql(weight_col)} as double)"
            parts.append(f"({w} is not null and not isnan({w}))")
        else:
            w = "1.0D"
        valid = " and ".join(parts)
        # one struct-valued aggregate expression -> ONE F.expr/py4j call for
        # the whole Gram (78 separate F.expr calls at k=11 measurably slowed
        # the fit floor; the parsed tree is identical either way)
        aggs = []
        for i in range(k + 1):
            for j in range(i, k + 1):
                aggs.append(
                    f"sum(if({valid}, {w} * {cols[i]} * {cols[j]}, null))"
                    f" as g_{i}_{j}"
                )
        for i in range(k + 1):
            aggs.append(f"sum(if({valid}, {w} * {cols[i]} * {y}, null)) as xy_{i}")
        if weight_col is None:
            aggs.append(f"sum(cast({valid} as long)) as n")
        else:
            aggs.append(f"sum(if({valid}, {w}, null)) as n")
        # r12: compute the Gram via observe() + a noop write instead of
        # agg().collect(). CollectMetrics evaluates the same per-partition
        # partial aggregates and merges them on the DRIVER, so the
        # single-partition Exchange + final-aggregate stage the collect form
        # planned disappears (guide §2.4: remove shuffles outright) — one
        # Spark job per fit instead of two, and one less full pass over the
        # feature matrix when the frame is cached (the partial-Gram stage
        # used to re-read the cache the materialization pass had just
        # built). Merge order of the 32 partials is arbitrary in BOTH forms
        # (shuffled final agg vs driver-side task-completion order), so the
        # float reassociation class is unchanged.
        from pyspark.sql import Observation

        obs = Observation()
        df.observe(obs, F.expr(f"struct({', '.join(aggs)})").alias("_g")).write.format(
            "noop"
        ).mode("overwrite").save()
        row = obs.get["_g"]
        gram = np.zeros((k + 1, k + 1))
        xty = np.zeros(k + 1)
        for i in range(k + 1):
            for j in range(i, k + 1):
                v = row[f"g_{i}_{j}"] or 0.0
                gram[i, j] = gram[j, i] = v
            xty[i] = row[f"xy_{i}"] or 0.0
        self.n_samples_ = row["n"] or 0
        return self._solve(gram, xty, self.n_samples_, k)

    def _fit_spark_arrow(
        self,
        df: DataFrame,
        feature_cols: Sequence[str],
        target_col: str,
        weight_col: Optional[str] = None,
    ):
        import pandas as pd

        orig_cols = list(feature_cols)
        k = len(orig_cols)
        # sanitized aliases: pyspark's mapInPandas can't address dotted names
        feature_cols = [f"_f{i}" for i in range(k)]
        sel = [qcol(c).cast("double").alias(a) for c, a in zip(orig_cols, feature_cols)]
        sel.append(qcol(target_col).cast("double").alias("_t"))
        if weight_col is not None:
            sel.append(qcol(weight_col).cast("double").alias("_w"))
        df = df.select(*sel)
        target_col = "_t"
        weighted = weight_col is not None

        def partials(batches):
            gram = np.zeros((k + 1, k + 1))
            xty = np.zeros(k + 1)
            n = 0.0
            for pdf in batches:
                X = pdf[feature_cols].to_numpy(dtype=np.float64)
                y = pdf[target_col].to_numpy(dtype=np.float64)
                w = (
                    pdf["_w"].to_numpy(dtype=np.float64)
                    if weighted
                    else np.ones(len(y))
                )
                mask = ~(np.isnan(X).any(axis=1) | np.isnan(y) | np.isnan(w))
                X, y, w = X[mask], y[mask], w[mask]
                if len(y) == 0:
                    continue
                Xa = np.column_stack([np.ones(len(y)), X])
                gram += (Xa * w[:, None]).T @ Xa
                xty += Xa.T @ (w * y)
                n += float(w.sum())
            yield pd.DataFrame(
                {
                    "gram": [gram.ravel().tobytes()],
                    "xty": [xty.tobytes()],
                    "n": [n],
                }
            )

        parts = df.mapInPandas(
            partials, schema="gram binary, xty binary, n double"
        ).collect()
        gram = np.zeros((k + 1, k + 1))
        xty = np.zeros(k + 1)
        n = 0.0
        for row in parts:
            gram += np.frombuffer(row["gram"]).reshape(k + 1, k + 1)
            xty += np.frombuffer(row["xty"])
            n += row["n"]
        self.n_samples_ = n
        return self._solve(gram, xty, n, k)

    def to_spark_column(self, feature_cols: Sequence[str]) -> Column:
        """Scoring as a pure expression — stays in whole-stage codegen."""
        expr = F.lit(float(self.intercept_))
        for c, w in zip(feature_cols, self.coef_):
            expr = expr + qcol(c).cast("double") * float(w)
        return expr


class LinearRegression(_LinearBase):
    def __init__(self, fit_intercept: bool = True):
        self.fit_intercept = fit_intercept
        self.l2 = 0.0


class Ridge(_LinearBase):
    def __init__(self, alpha: float = 1.0, fit_intercept: bool = True):
        self.l2 = alpha
        self.fit_intercept = fit_intercept


class ElasticNet(_LinearBase):
    """L1+L2 linear model via coordinate descent on driver-aggregated
    sufficient statistics (X'X, X'y) — no data collect. With ``l1_ratio=1``
    this is Lasso; sklearn-compatible parametrization."""

    def __init__(
        self,
        alpha: float = 1.0,
        l1_ratio: float = 0.5,
        fit_intercept: bool = True,
        max_iter: int = 1000,
        tol: float = 1e-8,
    ):
        self.alpha = alpha
        self.l1_ratio = l1_ratio
        self.fit_intercept = fit_intercept
        self.l2 = 0.0
        self.max_iter = max_iter
        self.tol = tol

    def _solve(self, gram: np.ndarray, xty: np.ndarray, n: int, k: int):
        # coordinate descent on the normal-equation form
        lam = self.alpha * self.l1_ratio * n
        lam2 = self.alpha * (1.0 - self.l1_ratio) * n
        beta = np.zeros(k + 1)
        active = range(0 if self.fit_intercept else 1, k + 1)
        for _ in range(self.max_iter):
            max_delta = 0.0
            for j in active:
                gjj = gram[j, j]
                if gjj == 0:
                    continue
                rho = xty[j] - gram[j] @ beta + gjj * beta[j]
                if j == 0:  # intercept unpenalized
                    new = rho / gjj
                else:
                    new = np.sign(rho) * max(abs(rho) - lam, 0.0) / (gjj + lam2)
                max_delta = max(max_delta, abs(new - beta[j]))
                beta[j] = new
            if max_delta < self.tol:
                break
        if self.fit_intercept:
            self.intercept_ = float(beta[0])
        else:
            self.intercept_ = 0.0
        self.coef_ = beta[1:].astype(np.float64)
        return self


class Lasso(ElasticNet):
    """Pure-L1 special case."""

    def __init__(self, alpha: float = 1.0, fit_intercept: bool = True, max_iter: int = 1000, tol: float = 1e-8):
        super().__init__(
            alpha=alpha, l1_ratio=1.0, fit_intercept=fit_intercept, max_iter=max_iter, tol=tol
        )


class LogisticRegression:
    """Binary logistic regression by IRLS over distributed sufficient
    statistics: each Newton iteration is one JVM aggregation computing the
    weighted Gram/score at the current coefficients — no data collect. Used
    by the conformal density-ratio estimator
    (`/root/reference/mlforecast/conformal_prediction.py:646-748` analog)."""

    def __init__(self, max_iter: int = 25, tol: float = 1e-8, l2: float = 1e-6):
        self.max_iter = max_iter
        self.tol = tol
        self.l2 = l2
        self.coef_: Optional[np.ndarray] = None
        self.intercept_: float = 0.0

    def fit_spark(self, df: DataFrame, feature_cols: Sequence[str], target_col: str):
        k = len(feature_cols)
        cols = [F.lit(1.0)] + [qcol(c).cast("double") for c in feature_cols]
        yb = qcol(target_col).cast("double")
        beta = np.zeros(k + 1)
        for _ in range(self.max_iter):
            eta = F.lit(float(beta[0]))
            for c, b in zip(cols[1:], beta[1:]):
                eta = eta + c * float(b)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            w = p * (1.0 - p) + F.lit(1e-10)
            r = yb - p  # score contribution
            aggs = []
            for i in range(k + 1):
                for j in range(i, k + 1):
                    aggs.append(F.sum(w * cols[i] * cols[j]).alias(f"h_{i}_{j}"))
            for i in range(k + 1):
                aggs.append(F.sum(r * cols[i]).alias(f"g_{i}"))
            row = df.agg(*aggs).collect()[0]
            H = np.zeros((k + 1, k + 1))
            g = np.zeros(k + 1)
            for i in range(k + 1):
                for j in range(i, k + 1):
                    H[i, j] = H[j, i] = row[f"h_{i}_{j}"] or 0.0
                g[i] = row[f"g_{i}"] or 0.0
            H += self.l2 * np.eye(k + 1)
            try:
                step = np.linalg.solve(H, g)
            except np.linalg.LinAlgError:
                step, *_ = np.linalg.lstsq(H, g, rcond=None)
            beta = beta + step
            if np.abs(step).max() < self.tol:
                break
        self.intercept_ = float(beta[0])
        self.coef_ = beta[1:]
        return self

    def fit(self, X, y):
        import pandas as pd

        # driver-side IRLS for small matrices (same math)
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        Xa = np.column_stack([np.ones(len(y)), X])
        beta = np.zeros(Xa.shape[1])
        for _ in range(self.max_iter):
            p = 1.0 / (1.0 + np.exp(-(Xa @ beta)))
            w = p * (1 - p) + 1e-10
            H = Xa.T @ (Xa * w[:, None]) + self.l2 * np.eye(Xa.shape[1])
            g = Xa.T @ (y - p)
            step = np.linalg.solve(H, g)
            beta += step
            if np.abs(step).max() < self.tol:
                break
        self.intercept_ = float(beta[0])
        self.coef_ = beta[1:]
        return self

    def predict_proba_col(self, feature_cols: Sequence[str]) -> Column:
        eta = F.lit(self.intercept_)
        for c, b in zip(feature_cols, self.coef_):
            eta = eta + qcol(c).cast("double") * float(b)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))


def __getattr__(name):
    # re-export the GBT here so `from mlforecast_spark.models import
    # GradientBoostedTrees` works without a circular import at module load
    if name == "GradientBoostedTrees":
        from .models_gbt import GradientBoostedTrees

        return GradientBoostedTrees
    raise AttributeError(name)


class SeasonalNaive:
    """y_hat(t) = y(t - season_length) — the sanity-check model the reference
    CI uses (`/root/reference/tests/test_pipeline.py:13-18`). Implemented as a
    linear model on the matching lag feature."""

    def __init__(self, season_length: int = 7):
        self.season_length = season_length
        self.lag_feature = f"lag{season_length}"
        self.coef_ = None
        self.feature_cols_: list[str] = []

    def fit(self, X, y):
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        idx = self.feature_cols_.index(self.lag_feature)
        return np.asarray(X, dtype=np.float64)[:, idx]

    def fit_spark(self, df, feature_cols, target_col):
        if self.lag_feature not in feature_cols:
            raise ValueError(
                f"SeasonalNaive(season_length={self.season_length}) needs "
                f"`lags=[{self.season_length}]` so {self.lag_feature} exists"
            )
        self.feature_cols_ = list(feature_cols)
        return self

    def to_spark_column(self, feature_cols: Sequence[str]) -> Column:
        return F.col(self.lag_feature).cast("double")
