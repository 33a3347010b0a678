"""MLForecast: the public pipeline API on Spark DataFrames.

Mirrors `/root/reference/mlforecast/forecast.py` (fit/preprocess/predict/
cross_validation/make_future_dataframe/update, `forecast.py:423-2126`) with a
Spark-native execution strategy:

- ``preprocess`` is one lazy DataFrame DAG (windows + joins), see core.py.
- Training runs distributed via sufficient statistics (models.py); only
  model coefficients live on the driver.
- The recursive predict loop (`/root/reference/mlforecast/core.py:1648-1681`)
  operates on a compact per-series *tail* frame bounded by the inferred
  ``keep_last_n`` (`core.py:404-425` semantics): h sequential narrow jobs,
  each = window features over the tail → JVM-expression scoring → union one
  new row per series. State is checkpointed per step to keep lineage flat.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .core import FeaturePlan, PanelSchema, _parse_transforms
from .date_features import DateFeature
from .target_transforms import BaseTargetTransform
from .utils import Freq, qcol, time_plus

# A model without fit_spark collects the whole feature matrix to the driver;
# above this many rows that collect is refused unless the model opts in via
# `model.allow_driver_collect = True`.
DRIVER_COLLECT_MAX_ROWS = 5_000_000


def _get_model_name(model) -> str:
    return type(model).__name__


def _template_matches(template: str, col: str) -> bool:
    """Does ``col`` instantiate ``template`` for some integer h?"""
    import re

    pattern = re.escape(template).replace(re.escape("{h}"), r"\d+")
    return re.fullmatch(pattern, col) is not None


class MLForecast:
    """Forecasting pipeline: feature engineering + models + recursive or
    direct multi-horizon prediction (`/root/reference/mlforecast/forecast.py:185-421`)."""

    def __init__(
        self,
        models,
        freq: Freq,
        lags: Optional[Sequence[int]] = None,
        lag_transforms: Optional[dict] = None,
        date_features: Optional[Sequence[DateFeature]] = None,
        target_transforms: Optional[Sequence[BaseTargetTransform]] = None,
        date_features_as_dummies: bool = False,
        lag_transforms_namer: Optional[Callable] = None,
        num_threads: int = 1,  # accepted for API parity; Spark parallelizes
    ):
        self.date_features_as_dummies = date_features_as_dummies
        self.lag_transforms_namer = lag_transforms_namer
        if isinstance(models, list):
            self.models = {_get_model_name(m): m for m in models}
        elif isinstance(models, dict):
            self.models = models
        else:
            self.models = {_get_model_name(models): models}
        from .utils import parse_freq

        parse_freq(freq)  # fail fast on unsupported aliases
        self.freq = freq
        self.lags = list(lags or [])
        self.lag_transforms = lag_transforms or {}
        self.date_features = list(date_features or [])
        self.target_transforms = list(target_transforms or [])
        self.registry = _parse_transforms(
            self.lags, self.lag_transforms, namer=lag_transforms_namer
        )

    @classmethod
    def from_cv(cls, cv) -> "MLForecast":
        """Build a pipeline from a fitted :class:`LightGBMCV` study with the
        discovered iteration count
        (`/root/reference/mlforecast/forecast.py:224-236`)."""
        if not hasattr(cv, "best_iteration_"):
            raise ValueError("LightGBMCV object must be fitted first.")
        return cv.to_mlforecast()

    # ------------------------------------------------------------------
    def _build_plan(self, schema: PanelSchema) -> FeaturePlan:
        return FeaturePlan(
            schema=schema,
            registry=self.registry,
            date_features=self.date_features,
            date_features_as_dummies=getattr(self, "date_features_as_dummies", False),
        )

    @property
    def ts(self):  # API-parity convenience
        return self

    # ------------------------------------------------------------------
    def preprocess(
        self,
        df: DataFrame,
        id_col: str = "unique_id",
        time_col: str = "ds",
        target_col: str = "y",
        static_features: Optional[Sequence[str]] = None,
        dropna: bool = True,
        keep_last_n: Optional[int] = None,
        fit_transforms: bool = True,
    ) -> DataFrame:
        schema = PanelSchema(id_col, time_col, target_col)
        self.schema_ = schema
        plan = self._build_plan(schema)
        self.plan_ = plan

        weight_col = getattr(self, "weight_col_", None)
        horizon_cols = set()
        for cols in getattr(self, "horizon_features_", {}).values():
            horizon_cols.update(cols)
        for t in getattr(self, "horizon_feature_templates_", []):
            horizon_cols.update(
                c for c in df.columns if _template_matches(t, c)
            )
        self.horizon_cols_ = sorted(horizon_cols)
        extra_cols = [
            c
            for c in df.columns
            if c not in (id_col, time_col, target_col, weight_col)
            and c not in horizon_cols
        ]
        if static_features is None:
            self.static_cols_ = extra_cols
            self.dynamic_cols_ = []
        else:
            self.static_cols_ = list(static_features)
            self.dynamic_cols_ = [c for c in extra_cols if c not in self.static_cols_]

        if fit_transforms:
            # each transform's INPUT frame is kept (lazy) so fitted-values can
            # invert Differences with actual lagged targets instead of the
            # recursive rebuild (reference forecast.py:1318-1423 semantics)
            self._tfm_inputs_ = []
            for tfm in self.target_transforms:
                tfm.set_column_names(id_col, time_col, target_col)
                self._tfm_inputs_.append(df)
                df = tfm.fit_transform(df)
            # keep the transformed panel: it is the recursive-predict state
            self.transformed_panel_ = df

        feats = plan.apply(df)
        self.feature_names_ = plan.feature_names()
        self.features_order_ = extra_cols + self.feature_names_
        # pre-filter frame (no dropna, no keep_last_n): the predict-state
        # capture reads THIS — it is the transformed panel plus feature
        # columns, so when fit() caches it the state trim becomes a tiny
        # window over the cache instead of a second scan of the whole
        # upstream panel pipeline (see _capture_state)
        self._feats_all_ = feats
        if dropna:
            cond = None
            for c in self.feature_names_:
                nn = qcol(c).isNotNull()
                cond = nn if cond is None else (cond & nn)
            if cond is not None:
                feats = feats.filter(cond)
        if keep_last_n is not None:
            w = Window.partitionBy(id_col).orderBy(F.col(time_col).desc())
            feats = (
                feats.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= keep_last_n)
                .drop("_rn")
            )
        return feats

    # ------------------------------------------------------------------
    def fit(
        self,
        df: DataFrame,
        id_col: str = "unique_id",
        time_col: str = "ds",
        target_col: str = "y",
        static_features: Optional[Sequence[str]] = None,
        dropna: bool = True,
        keep_last_n: Optional[int] = None,
        max_horizon: Optional[int] = None,
        horizons: Optional[Sequence[int]] = None,
        prediction_intervals=None,
        weight_col: Optional[str] = None,
        horizon_features: Optional[dict] = None,
        horizon_feature_templates: Optional[Sequence[str]] = None,
        engine: str = "spark",
        models_fit_kwargs: Optional[dict] = None,
        validate_data: bool = False,
        cache_train_df: bool = True,
    ) -> "MLForecast":
        # ``engine`` is forwarded to the conformal-calibration backtest
        # (prediction_intervals): with per-series features 'cogroup' turns
        # its n_windows x h sequential predict jobs into n_windows jobs.
        # ``horizons`` (reference `forecast.py:1132`): train ONLY those direct
        # horizon steps — the rest stay None and predict demands a matching
        # `horizons=` subset. ``models_fit_kwargs`` maps model name -> extra
        # fit kwargs. ``validate_data`` runs the panel validator up front
        # (off by default: one extra pass over the panel — a deliberate
        # at-scale default, unlike the reference's eager True).
        # ``cache_train_df`` controls caching the feature matrix (uncache to
        # trade refit speed for executor memory on huge panels).
        if horizons is not None:
            if len(list(horizons)) == 0:
                raise ValueError("horizons must be a non-empty sequence")
            if max_horizon is None:
                max_horizon = max(horizons)
            bad_h = [x for x in horizons if not (1 <= x <= max_horizon)]
            if bad_h:
                raise ValueError(
                    f"horizons must lie in [1, max_horizon]; got {bad_h}"
                )
        if validate_data:
            from .data_validation import validate_panel

            validate_panel(
                df, id_col, time_col, target_col, freq=self.freq,
                raise_on_invalid=True,
            )
        # Per-horizon exog convention (`/root/reference/mlforecast/forecast.py:296-421`):
        # template column `name_{s}` at a row with timestamp t carries the
        # exogenous information for time t+s-1 — i.e. the time that direct
        # model step s predicts when that row is the one-step frontier.
        self.horizon_features_ = horizon_features or {}
        self.horizon_feature_templates_ = list(horizon_feature_templates or [])
        if (horizon_features or horizon_feature_templates) and max_horizon is None:
            raise ValueError("horizon features require direct mode (max_horizon)")
        self.weight_col_ = weight_col
        if prediction_intervals is not None:
            from .conformal import conformity_scores

            cv = self.cross_validation(
                df,
                n_windows=prediction_intervals.n_windows,
                h=prediction_intervals.h,
                id_col=id_col,
                time_col=time_col,
                target_col=target_col,
                static_features=static_features,
                dropna=dropna,
                # refit=False needs no transform refit; with target transforms
                # each window refits so scores stay in the original scale
                refit=bool(self.target_transforms),
                max_horizon=max_horizon,
                weight_col=weight_col,
                horizon_features=horizon_features,
                horizon_feature_templates=horizon_feature_templates,
                engine=engine,
                models_fit_kwargs=models_fit_kwargs,
            )
            self.cs_df_ = conformity_scores(
                cv,
                list(self.models),
                id_col,
                time_col,
                target_col,
                prediction_intervals.method,
            ).localCheckpoint(eager=True)
        # set AFTER the backtest: the calibration windows re-enter fit(),
        # which resets these instance attributes (same hazard the
        # prediction_intervals_ assignment below already guards against)
        self.trained_horizons_ = (
            sorted(set(horizons)) if horizons is not None else None
        )
        self.models_fit_kwargs_ = dict(models_fit_kwargs or {})
        self.prediction_intervals_ = prediction_intervals
        self._needs_conformal_weights = (
            prediction_intervals is not None
            and prediction_intervals.method.startswith("weighted")
        )
        feats = self.preprocess(
            df,
            id_col=id_col,
            time_col=time_col,
            target_col=target_col,
            static_features=static_features,
            dropna=dropna,
            keep_last_n=keep_last_n,
        )
        self.max_horizon_ = max_horizon
        self._cache_train_df_ = cache_train_df
        if cache_train_df:
            # cache the PRE-filter frame: the training filters (dropna /
            # keep_last_n) and the predict-state capture both read it, so
            # one materialization (the first training action) serves both —
            # Spark's cache substitution matches the cached plan as a
            # subtree of the filtered training plan
            self._feats_all_ = self._feats_all_.cache()
        self._fitted_feats = feats
        try:
            if max_horizon is None:
                self.models_ = {}
                for name, model in self.models.items():
                    self.models_[name] = self._fit_one(
                        model, feats, target_col,
                        fit_kwargs=self.models_fit_kwargs_.get(name),
                    )
            else:
                # direct multi-horizon: one model per horizon on lead targets
                # (`/root/reference/mlforecast/core.py:1061-1186`)
                w = Window.partitionBy(id_col).orderBy(time_col)
                leads = feats
                lead_cols = []
                for h in range(max_horizon):
                    c = f"_mlfs_target{h}"
                    leads = leads.withColumn(c, F.lead(target_col, h).over(w))
                    lead_cols.append(c)
                leads = leads.cache()
                base_order = list(self.features_order_)
                self.horizon_orders_ = {}
                for h in range(max_horizon):
                    extra = list(self.horizon_features_.get(h + 1, []))
                    extra += [t.format(h=h + 1) for t in self.horizon_feature_templates_]
                    self.horizon_orders_[h] = base_order + extra
                trained = (
                    set(self.trained_horizons_)
                    if self.trained_horizons_ is not None
                    else set(range(1, max_horizon + 1))
                )
                self.models_ = {}
                for name, model in self.models.items():
                    per_h = []
                    for h in range(max_horizon):
                        if h + 1 not in trained:
                            per_h.append(None)  # sparse horizons: untrained
                            continue
                        sub = leads.filter(F.col(lead_cols[h]).isNotNull())
                        self.features_order_ = self.horizon_orders_[h]
                        per_h.append(
                            self._fit_one(
                                model, sub, lead_cols[h], clone_of=model,
                                fit_kwargs=self.models_fit_kwargs_.get(name),
                            )
                        )
                    self.models_[name] = per_h
                self.features_order_ = base_order
        finally:
            pass
        self._capture_state(df, id_col, time_col, target_col)
        if getattr(self, "_needs_conformal_weights", False):
            self._attach_conformal_weights()
        return self

    def _attach_conformal_weights(self):
        """Density-ratio weights for weighted conformal: calibration rows vs
        the most recent h rows per series (test-like covariates)."""
        from pyspark.sql import types as T

        from .conformal import estimate_density_ratio

        s = self.schema_
        numeric = [
            c
            for c in self.features_order_
            if isinstance(
                self._fitted_feats.schema[c].dataType,
                (T.DoubleType, T.FloatType, T.IntegerType, T.LongType, T.ShortType),
            )
        ]
        feats = self._fitted_feats.select(
            s.id_col, s.time_col, *[qcol(c).alias(c) for c in numeric]
        )
        calib = feats.join(
            self.cs_df_.select(s.id_col, s.time_col), on=[s.id_col, s.time_col], how="left_semi"
        )
        w_last = Window.partitionBy(s.id_col).orderBy(F.col(s.time_col).desc())
        recent = (
            feats.withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") <= self.prediction_intervals_.h)
            .drop("_rn")
        )
        clf, weight_col = estimate_density_ratio(calib, recent, numeric)
        self.dre_ = clf
        weighted = (
            self.cs_df_.join(feats, on=[s.id_col, s.time_col], how="left")
            .withColumn("_w", F.coalesce(weight_col, F.lit(1.0)))
            .select(*self.cs_df_.columns, "_w")
        )
        self.cs_df_ = weighted.localCheckpoint(eager=True)

    def _fit_one(
        self, model, feats: DataFrame, target_col: str, clone_of=None,
        fit_kwargs: Optional[dict] = None,
    ):
        import copy
        import inspect

        model = copy.deepcopy(model)
        weight_col = getattr(self, "weight_col_", None)
        if hasattr(model, "fit_spark"):
            kwargs = dict(fit_kwargs or {})
            if weight_col is not None:
                if "weight_col" not in inspect.signature(model.fit_spark).parameters:
                    raise ValueError(
                        f"{type(model).__name__} does not support weight_col"
                    )
                kwargs["weight_col"] = weight_col
            model.fit_spark(feats, self.features_order_, target_col, **kwargs)
        else:
            # ESCAPE HATCH, NOT A SCALE PATH: a model without fit_spark
            # collects the ENTIRE feature matrix to the driver. Fine for
            # experimentation on small panels; at cluster scale implement
            # fit_spark (sufficient statistics / distributed histograms —
            # see models.py, models_gbt.py) instead. Row-count guard so the
            # collect can't silently ship against a cluster-scale panel.
            # limit(N+1) bounds the guard's cost for uncached callers: we
            # only need to know whether the count exceeds the cap, not the
            # exact total.
            n_rows = feats.limit(DRIVER_COLLECT_MAX_ROWS + 1).count()
            if n_rows > DRIVER_COLLECT_MAX_ROWS and not getattr(
                model, "allow_driver_collect", False
            ):
                raise ValueError(
                    f"{type(model).__name__} has no fit_spark and the feature "
                    f"matrix holds more than "
                    f"{DRIVER_COLLECT_MAX_ROWS:,} rows: refusing to collect it to "
                    "the driver. Implement fit_spark for a distributed fit, "
                    "or set `model.allow_driver_collect = True` to accept "
                    "the driver-side collect."
                )
            pdf = feats.select(
                *[qcol(c).alias(c) for c in self.features_order_], target_col
            ).toPandas()
            X = pdf[self.features_order_].to_numpy()
            y = pdf[target_col].to_numpy()
            model.fit(X, y, **(fit_kwargs or {}))
        return model

    # ------------------------------------------------------------------
    def _capture_state(self, df: DataFrame, id_col, time_col, target_col):
        """Tail frame + per-series statics (the predict state).

        When the training frame is cached (``cache_train_df=True``, the
        default) the tail trim reads the cached PRE-filter feature frame —
        it carries the transformed panel's columns, so the state is a tiny
        lazy window over data the Gram/GBT fit already materialized, and
        the separate state-capture job (panel re-scan + eager
        localCheckpoint: ~0.35 s of fit()'s fixed floor at any SF)
        disappears. Uncached fits keep the one-job trim + checkpoint so
        predict never re-runs the upstream panel plan per action."""
        cached = getattr(self, "_cache_train_df_", False)
        feats_all = getattr(self, "_feats_all_", None)
        if cached and feats_all is not None:
            panel = feats_all
        else:
            panel = getattr(self, "transformed_panel_", df)
        keep = self.plan_.keep_last_n_bound()
        state_cols = [
            id_col,
            time_col,
            target_col,
            *self.static_cols_,
            *self.dynamic_cols_,
            *getattr(self, "horizon_cols_", []),
        ]
        state = panel.select(*state_cols)
        if keep is not None and keep > 0:
            w = Window.partitionBy(id_col).orderBy(F.col(time_col).desc())
            state = (
                state.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= keep)
                .drop("_rn")
            )
        if cached and feats_all is not None:
            # lazy on purpose: cache-backed, one tiny window per consumer
            self.state_ = state
        else:
            self.state_ = state.localCheckpoint(eager=True)
        w_last = Window.partitionBy(id_col).orderBy(F.col(time_col).desc())
        # lazy on purpose: state_ is already a checkpointed, keep_last_n-sized
        # frame, so this is one tiny window per consuming action — an eager
        # localCheckpoint here would spend 1-2 extra Spark jobs inside every
        # fit() for no lineage benefit (fit was 9 jobs at sf0.1; the per-job
        # fixed floor is ~0.07-0.09 s, FLOOR_DECOMPOSITION.json)
        self.statics_ = (
            self.state_.select(id_col, time_col, *self.static_cols_)
            .withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumnRenamed(time_col, "_last_ds")
        )

    # ------------------------------------------------------------------
    def make_future_dataframe(self, h: int) -> DataFrame:
        """ids × next h timestamps (`/root/reference/mlforecast/forecast.py:1425-1443`)."""
        s = self.schema_
        steps = F.explode(F.sequence(F.lit(1), F.lit(h))).alias("_step")
        out = self.statics_.select(s.id_col, "_last_ds").select(
            s.id_col, "_last_ds", steps
        )
        ds_type = self.state_.schema[s.time_col].dataType
        out = out.withColumn(
            s.time_col,
            time_plus(F.col("_last_ds"), self.freq, F.col("_step")).cast(ds_type),
        )
        return out.select(s.id_col, s.time_col)

    def _align_exog_asof(self, X_df: DataFrame, h: int, statics: DataFrame) -> DataFrame:
        """Snap an IRREGULAR exogenous feed onto the exact future grid.

        Builds the ids × h-step grid from ``statics`` (respecting a
        ``new_df`` warm-up) and backward-as-of joins ``X_df`` onto it per
        series: each grid timestamp carries the latest exogenous row at or
        before it — include the last known print (dated before the window)
        in the feed to cover grid steps preceding the first in-window
        print. The equi-join path would drop every feed row
        that misses a grid step exactly (`tests/test_x_align.py` pins the
        difference). One shuffle on the id key — same exchange the engines'
        own (id, ds) join pays."""
        from .joins import asof_join

        s = self.schema_
        ds_type = self.state_.schema[s.time_col].dataType
        grid = (
            statics.select(s.id_col, "_last_ds")
            .select(
                s.id_col,
                "_last_ds",
                F.explode(F.sequence(F.lit(1), F.lit(h))).alias("_step"),
            )
            .withColumn(
                s.time_col,
                time_plus(F.col("_last_ds"), self.freq, F.col("_step")).cast(ds_type),
            )
            .select(s.id_col, s.time_col)
        )
        return asof_join(grid, X_df, on=s.time_col, by=[s.id_col])

    def get_missing_future(self, h: int, X_df: DataFrame) -> DataFrame:
        """Expected future rows minus provided ones
        (`/root/reference/mlforecast/forecast.py:1445-1457`)."""
        s = self.schema_
        expected = self.make_future_dataframe(h)
        return expected.join(
            X_df.select(s.id_col, s.time_col), on=[s.id_col, s.time_col], how="left_anti"
        )

    # ------------------------------------------------------------------
    def predict(
        self,
        h: int,
        X_df: Optional[DataFrame] = None,
        ids: Optional[Sequence[str]] = None,
        level: Optional[Sequence[float]] = None,
        new_df: Optional[DataFrame] = None,
        horizons: Optional[Sequence[int]] = None,
        ewm_update_mode: str = "recompute",
        before_predict_callback: Optional[Callable] = None,
        after_predict_callback: Optional[Callable] = None,
        engine: str = "spark",
        cogroup_buckets: Optional[int] = None,
        transfer_conformal=None,
        x_align: str = "exact",
        sort_output: bool = True,
    ) -> DataFrame:
        """``ewm_update_mode``: 'recompute' (default) re-derives EWM features
        from history each step — cheapest at short histories / local scale.
        'carried' advances EWM as an O(1) per-step expression over a carried
        per-series column and trims the loop state to the finite window bound
        — wins when per-series histories are long (cluster scale); verified
        bit-equivalent in tests/test_carried_ewm.py.

        ``engine``: 'spark' (default) advances all series in lockstep — h
        sequential jobs, required when features pool across series.
        'cogroup' runs the whole h-step rollout per series inside ONE
        ``applyInPandas`` job (``local_predict.py``) — the scale shape for
        per-series feature sets (one shuffle, no per-step barriers);
        equality with the loop is asserted in tests/test_cogroup_predict.py.
        ``cogroup_buckets``: with millions of series, group the rollout by
        ``hash(id) % cogroup_buckets`` (≈ a few × total cores) so the fixed
        per-UDF-call cost amortizes across a bucket's series instead of
        being paid per series; values are identical.
        'auto' picks 'cogroup' when the pipeline is eligible (recursive
        mode, per-series features, no callbacks) and silently falls back
        to the loop otherwise — the refusal is a driver-side plan check,
        so 'auto' costs nothing at run time.

        ``x_align``: how ``X_df`` rows map onto the future grid. 'exact'
        (default, the reference's contract —
        `/root/reference/mlforecast/core.py:1124-1170` assumes validated
        gap-free grids) equi-joins on (id, ds): an exogenous row whose
        timestamp is not exactly a grid step is silently dropped and the
        feature arrives null. 'asof' aligns IRREGULAR feeds (macro prints,
        sparse price changes, sensor calibrations) by as-of joining the
        feed onto the exact future grid per series first (backward: each
        grid step carries the most recent exogenous row at or before it),
        then feeds the aligned frame to whichever engine runs — one extra
        distributed join, identical plan downstream.

        ``sort_output``: globally sort the forecast frame by (id, time)
        before returning (default, matching the reference's ordered
        output). A global sort is a range-partitioning exchange plus a
        boundary-sampling job over the ENTIRE forecast frame — at cluster
        scale (millions of series x h rows) that is a full extra shuffle a
        downstream trainer or sink that doesn't care about row order never
        needs. Pass ``False`` to skip it; values are identical.
        """
        if engine not in ("spark", "cogroup", "auto"):
            raise ValueError("engine must be 'spark', 'cogroup' or 'auto'")
        if x_align not in ("exact", "asof"):
            raise ValueError(f"x_align must be 'exact' or 'asof', got {x_align!r}")
        if transfer_conformal is not None:
            # reference surface (`forecast.py:1459-1468`): intervals for a
            # low-history target panel, calibrated by transfer from this
            # (source) pipeline instead of its own cs_df_
            from .transfer_conformal import TransferConformal, transfer_intervals

            if new_df is None:
                raise ValueError(
                    "transfer_conformal requires `new_df` (the target panel)."
                )
            if level is None:
                raise ValueError("transfer_conformal requires `level`.")
            ignored = {
                "X_df": X_df,
                "ids": ids,
                "horizons": horizons,
                "before_predict_callback": before_predict_callback,
                "after_predict_callback": after_predict_callback,
            }
            bad = [k for k, v in ignored.items() if v is not None]
            if bad:
                raise ValueError(
                    f"transfer_conformal does not support {bad}: the transfer "
                    "path re-forecasts the target via new_df warm-up only."
                )
            tc = (
                TransferConformal(method=transfer_conformal)
                if isinstance(transfer_conformal, str)
                else transfer_conformal
            )
            extra = {} if tc.n_windows is None else {"n_windows": tc.n_windows}
            return transfer_intervals(
                self, new_df, h, list(level), method=tc.method, **extra
            )
        if engine == "cogroup" and getattr(self, "max_horizon_", None) is not None:
            from .local_predict import CogroupUnsupportedError

            raise CogroupUnsupportedError(
                "direct-mode predict (fit with max_horizon) is already a "
                "single pass; engine='cogroup' applies to recursive mode "
                "only — omit engine or use engine='spark'."
            )
        s = self.schema_
        state, statics, tfms = self.state_, self.statics_, self.target_transforms
        if new_df is not None:
            state, statics, tfms = self._history_warmup(new_df)
        if X_df is not None and x_align == "asof":
            X_df = self._align_exog_asof(X_df, h, statics)
        if horizons is not None and getattr(self, "max_horizon_", None) is None:
            raise ValueError("`horizons` requires direct mode (fit with max_horizon)")
        cogroup_results = None
        if engine in ("cogroup", "auto") and getattr(self, "max_horizon_", None) is None:
            from .local_predict import CogroupUnsupportedError, predict_cogroup

            try:
                if before_predict_callback is not None or after_predict_callback is not None:
                    raise CogroupUnsupportedError(
                        "predict callbacks run on Spark frames inside the "
                        "lockstep loop; use engine='spark' with callbacks."
                    )
                cogroup_results = predict_cogroup(
                    self, h, X_df=X_df, ids=ids, state=state,
                    bucket_by=cogroup_buckets,
                )
            except CogroupUnsupportedError:
                if engine == "cogroup":
                    raise
        if getattr(self, "max_horizon_", None) is not None:
            results = self._predict_direct(
                h, X_df=X_df, ids=ids, state=state, statics=statics, horizons=horizons
            )
            results = self._inverse_transforms(results, list(self.models_), tfms)
            if sort_output:
                results = results.orderBy(s.id_col, s.time_col)
        elif cogroup_results is not None:
            results = self._inverse_transforms(cogroup_results, list(self.models_), tfms)
            if sort_output:
                results = results.orderBy(s.id_col, s.time_col)
        else:
            results = None
            for name, model in self.models_.items():
                preds = self._predict_recursive_one(
                    name, model, h, X_df, ids,
                    before_predict_callback, after_predict_callback,
                    state=state, statics=statics,
                    ewm_update_mode=ewm_update_mode,
                )
                results = preds if results is None else results.join(
                    preds, on=[s.id_col, s.time_col], how="inner"
                )
            results = self._inverse_transforms(results, list(self.models_), tfms)
            if sort_output:
                results = results.orderBy(s.id_col, s.time_col)
        if level is not None:
            results = self._add_intervals(results, h, level)
        if "_step" in results.columns:
            results = results.drop("_step")
        return results

    def _history_warmup(self, new_df: DataFrame):
        """Rebuild predict state from fresh history without touching the
        fitted pipeline (`/root/reference/mlforecast/core.py:1234-1305`)."""
        import copy

        s = self.schema_
        tfms = []
        df = new_df
        for tfm in self.target_transforms:
            if tfm.refit_on_warmup:
                tfm = copy.copy(tfm)
                df = tfm.fit_transform(df)
            else:
                df = tfm.transform(df)
            tfms.append(tfm)
        keep = self.plan_.keep_last_n_bound()
        state_cols = [
            s.id_col, s.time_col, s.target_col, *self.static_cols_, *self.dynamic_cols_
        ]
        state = df.select(*state_cols)
        if keep is not None and keep > 0:
            w = Window.partitionBy(s.id_col).orderBy(F.col(s.time_col).desc())
            state = (
                state.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= keep)
                .drop("_rn")
            )
        state = state.localCheckpoint(eager=True)
        w_last = Window.partitionBy(s.id_col).orderBy(F.col(s.time_col).desc())
        statics = (
            state.select(s.id_col, s.time_col, *self.static_cols_)
            .withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumnRenamed(s.time_col, "_last_ds")
            .localCheckpoint(eager=True)
        )
        return state, statics, tfms

    def _add_intervals(self, results: DataFrame, h: int, level) -> DataFrame:
        from .conformal import add_interval_columns

        pi = getattr(self, "prediction_intervals_", None)
        if pi is None:
            raise ValueError(
                "Prediction intervals need `prediction_intervals=PredictionIntervals(...)` at fit."
            )
        if h > pi.h:
            raise ValueError(
                f"h={h} exceeds the h={pi.h} the intervals were calibrated for."
            )
        s = self.schema_
        if pi.method.startswith("weighted"):
            from .conformal import weighted_interval_columns

            return weighted_interval_columns(
                results,
                self.cs_df_,
                list(self.models_),
                list(level),
                pi.method,
                s.id_col,
                s.time_col,
            )
        return add_interval_columns(
            results,
            self.cs_df_,
            list(self.models_),
            list(level),
            pi.method,
            s.id_col,
            s.time_col,
        )

    def _inverse_transforms(
        self, preds: DataFrame, pred_cols: list[str], tfms=None
    ) -> DataFrame:
        tfms = self.target_transforms if tfms is None else tfms
        for tfm in reversed(tfms):
            preds = tfm.inverse_transform(preds, pred_cols)
        return preds

    def _score_col(self, model):
        if hasattr(model, "to_spark_column"):
            return model.to_spark_column(self.features_order_)
        # generic numpy model: Arrow-batched pandas UDF with broadcast model
        from pyspark.sql.functions import pandas_udf

        feats = list(self.features_order_)
        mdl = model

        def score(*cols):
            import numpy as np
            import pandas as pd

            X = np.column_stack([c.to_numpy(dtype="float64") for c in cols])
            return pd.Series(mdl.predict(X))

        score_udf = pandas_udf(score, "double")
        return score_udf(*[qcol(c) for c in feats])

    def _predict_recursive_one(
        self, name, model, h, X_df, ids, before_cb, after_cb,
        state=None, statics=None, ewm_update_mode="recompute",
    ) -> DataFrame:
        s = self.schema_
        state = self.state_ if state is None else state
        statics = self.statics_ if statics is None else statics
        if ids is not None:
            state = state.filter(F.col(s.id_col).isin(list(ids)))
            statics = statics.filter(F.col(s.id_col).isin(list(ids)))
        state = state.withColumn("_is_future", F.lit(False))
        ds_type = self.state_.schema[s.time_col].dataType
        score_col = self._score_col(model)
        dyn_cols = list(self.dynamic_cols_)
        # Carried-EWM fast path: advance ewm' = α·y[t'-lag] + (1-α)·ewm as a
        # per-step expression over a carried per-series column, instead of an
        # Arrow pass over the whole history every step (the engine analogue
        # of the reference's O(1) update path, `lag_transforms.py:280-281`).
        carried = (
            self.plan_.carried_ewm_features() if ewm_update_mode == "carried" else {}
        )
        plan = self.plan_
        carry = None
        if carried:
            import dataclasses

            registry = type(self.registry)(
                (n, v) for n, v in self.registry.items() if n not in carried
            )
            plan = dataclasses.replace(self.plan_, registry=registry)
            carry = self._initial_ewm_carry(state, carried)
            # with EWM carried, the remaining transforms have a finite
            # history requirement — trim the loop-local state so every step's
            # windows/union/checkpoint touch only the tail
            bound = self.plan_.keep_last_n_bound(exclude_carried=True)
            if bound is not None and bound > 0:
                w_trim = Window.partitionBy(s.id_col).orderBy(F.col(s.time_col).desc())
                state = (
                    state.withColumn("_rn", F.row_number().over(w_trim))
                    .filter(F.col("_rn") <= bound)
                    .drop("_rn")
                    .localCheckpoint(eager=True)
                )
        for step in range(1, h + 1):
            frontier = statics.withColumn(
                s.time_col,
                time_plus(F.col("_last_ds"), self.freq, step).cast(ds_type),
            ).drop("_last_ds")
            frontier = frontier.withColumn(s.target_col, F.lit(None).cast("double"))
            if carried:
                frontier = frontier.join(carry, on=s.id_col, how="left")
                for i, (feat_name, (ewm_lag, ewm_tfm)) in enumerate(carried.items()):
                    hist = state.select(
                        F.col(s.id_col),
                        time_plus(F.col(s.time_col), self.freq, ewm_lag)
                        .cast(ds_type)
                        .alias(s.time_col),
                        F.col(s.target_col).alias(f"_lv_{i}"),
                    )
                    frontier = frontier.join(
                        hist, on=[s.id_col, s.time_col], how="left"
                    )
                    a = ewm_tfm.alpha
                    new_val = F.when(
                        F.col(f"_lv_{i}").isNotNull(),
                        F.when(
                            F.col(f"_c_{i}").isNotNull(),
                            a * F.col(f"_lv_{i}") + (1 - a) * F.col(f"_c_{i}"),
                        ).otherwise(F.col(f"_lv_{i}")),
                    ).otherwise(F.col(f"_c_{i}"))
                    frontier = frontier.withColumn(f"_c_{i}", new_val).withColumn(
                        feat_name, F.col(f"_c_{i}")
                    ).drop(f"_lv_{i}")
            if dyn_cols:
                if X_df is None:
                    raise ValueError(
                        f"Dynamic features {dyn_cols} require `X_df` at predict."
                    )
                frontier = frontier.join(
                    X_df.select(s.id_col, s.time_col, *dyn_cols),
                    on=[s.id_col, s.time_col],
                    how="left",
                )
            frontier = frontier.withColumn("_is_future", F.lit(True))
            frontier = frontier.withColumn("_is_new", F.lit(True))
            work = state.withColumn("_is_new", F.lit(False)).unionByName(
                frontier, allowMissingColumns=True
            )
            feats = plan.apply(work)
            new_rows = feats.filter(F.col("_is_new"))
            if before_cb is not None:
                new_rows = before_cb(new_rows)
            scored = new_rows.withColumn("_pred", score_col)
            if after_cb is not None:
                scored = after_cb(scored)
            if carried:
                # scored feeds both the state append and the carry update:
                # persist so the carry checkpoint reads the cache instead of
                # re-running the whole step DAG
                scored = scored.persist()
            appended = scored.select(
                *[
                    F.col("_pred").alias(s.target_col) if c == s.target_col else F.col(c)
                    for c in state.columns
                ]
            )
            # eager checkpoint each step: the state feeds both the next
            # step's windows and its union base, so lazy chaining would
            # recompute it 2^k times between checkpoints
            state = state.unionByName(appended).localCheckpoint(eager=True)
            if carried:
                carry = scored.select(
                    s.id_col, *[F.col(f"_c_{i}") for i in range(len(carried))]
                ).localCheckpoint(eager=True)
                scored.unpersist()
        preds = (
            state.filter(F.col("_is_future"))
            .select(s.id_col, s.time_col, F.col(s.target_col).alias(name))
        )
        return preds

    def _initial_ewm_carry(self, state: DataFrame, carried: dict) -> DataFrame:
        """Per-series EWM state BEFORE the first frontier update: the EWM of
        y[.. T-lag] — the step-1 update then consumes y[T+1-lag]
        (one Arrow pass over the state, once per predict)."""
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        s = self.schema_
        specs = [(lag, tfm.alpha) for _, (lag, tfm) in carried.items()]
        out_schema = T.StructType(
            [T.StructField(s.id_col, state.schema[s.id_col].dataType)]
            + [T.StructField(f"_c_{i}", T.DoubleType()) for i in range(len(specs))]
        )
        time_col, target_col = s.time_col, s.target_col

        def compute(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col)
            y = pdf[target_col].to_numpy(dtype="float64")
            row = {s.id_col: [pdf[s.id_col].iloc[0]]}
            for i, (lag, alpha) in enumerate(specs):
                prefix = y[: len(y) - lag] if lag < len(y) else y[:0]
                e = np.nan
                for v in prefix:
                    if not np.isnan(v):
                        e = v if np.isnan(e) else alpha * v + (1 - alpha) * e
                row[f"_c_{i}"] = [None if np.isnan(e) else float(e)]
            return pd.DataFrame(row)

        return (
            state.select(s.id_col, time_col, target_col)
            .groupBy(s.id_col)
            .applyInPandas(compute, schema=out_schema)
            .localCheckpoint(eager=True)
        )

    def _predict_direct(
        self, h, X_df=None, ids=None, state=None, statics=None, horizons=None
    ) -> DataFrame:
        """Direct multi-horizon: model_j maps (features at the one-step
        frontier τ = last+1) → y_{τ+j}, matching the reference's
        expand_target training alignment
        (`/root/reference/mlforecast/core.py:1683-1818`)."""
        s = self.schema_
        if h > self.max_horizon_:
            raise ValueError(f"h={h} exceeds max_horizon={self.max_horizon_}")
        steps = list(horizons) if horizons is not None else list(range(1, h + 1))
        if horizons is not None and steps and max(steps) > h:
            raise ValueError(
                f"horizons {steps} exceed the requested h={h}; intervals and "
                "time stamps are only defined up to h."
            )
        if horizons is not None and max(steps) > self.max_horizon_:
            raise ValueError("horizons exceed max_horizon")
        state = self.state_ if state is None else state
        statics = self.statics_ if statics is None else statics
        if ids is not None:
            state = state.filter(F.col(s.id_col).isin(list(ids)))
            statics = statics.filter(F.col(s.id_col).isin(list(ids)))
        ds_type = self.state_.schema[s.time_col].dataType
        frontier = statics.withColumn(
            s.time_col, time_plus(F.col("_last_ds"), self.freq, 1).cast(ds_type)
        ).drop("_last_ds")
        frontier = frontier.withColumn(s.target_col, F.lit(None).cast("double"))
        future_cols = list(self.dynamic_cols_) + list(getattr(self, "horizon_cols_", []))
        if future_cols:
            if X_df is None:
                raise ValueError(
                    f"Columns {future_cols} must be supplied via `X_df` at predict."
                )
            frontier = frontier.join(
                X_df.select(s.id_col, s.time_col, *future_cols),
                on=[s.id_col, s.time_col],
                how="left",
            )
        frontier = frontier.withColumn("_is_new", F.lit(True))
        work = state.withColumn("_is_new", F.lit(False)).unionByName(
            frontier, allowMissingColumns=True
        )
        origin = self.plan_.apply(work).filter(F.col("_is_new"))
        results = None
        base_order = list(self.features_order_)
        for name, per_h_models in self.models_.items():
            per_h_frames = []
            for step in steps:
                model = per_h_models[step - 1]
                if model is None:
                    raise ValueError(
                        f"horizon {step} was not trained; fit(horizons=...) "
                        f"trained only {self.trained_horizons_} — pass a "
                        "matching `horizons=` subset to predict."
                    )
                self.features_order_ = getattr(self, "horizon_orders_", {}).get(
                    step - 1, base_order
                )
                scored = origin.withColumn("_pred", self._score_col(model))
                self.features_order_ = base_order
                scored = scored.select(
                    s.id_col,
                    time_plus(F.col(s.time_col), self.freq, step - 1)
                    .cast(ds_type)
                    .alias(s.time_col),
                    # true horizon step: conformal quantiles are calibrated
                    # per step, so a sparse `horizons=[2, 4]` subset must not
                    # be renumbered 1, 2 by a row_number downstream
                    F.lit(step).cast("int").alias("_step"),
                    F.col("_pred").alias(name),
                )
                per_h_frames.append(scored)
            from functools import reduce

            frame = reduce(DataFrame.unionByName, per_h_frames)
            results = frame if results is None else results.join(
                frame, on=[s.id_col, s.time_col, "_step"], how="inner"
            )
        return results

    # ------------------------------------------------------------------
    def update(self, df: DataFrame, validate: bool = False) -> None:
        """Append new observations (and new series) to the predict state
        (`/root/reference/mlforecast/core.py:2019-2113`). With ``validate``
        the append must continue each known series gap-free from its last
        timestamp (`/root/reference/mlforecast/data_validation.py:148-199`)."""
        s = self.schema_
        if validate:
            self._validate_update(df)
        # pooled lag transforms window across series, so every updated
        # timestamp must carry every series — the reference enforces the same
        # (`/root/reference/mlforecast/core.py:2035-2053`)
        if any(tfm.is_pooled for _, tfm in self.registry.values()):
            known = self.statics_.select(s.id_col)
            incoming = df.select(s.id_col).distinct()
            expected = known.unionByName(incoming).distinct().count()
            bad = (
                df.groupBy(s.time_col)
                .agg(F.countDistinct(s.id_col).alias("_n_ids"))
                .filter(F.col("_n_ids") != expected)
                .limit(1)
                .collect()
            )
            if bad:
                raise ValueError(
                    "Pooled lag transforms require updates to include all "
                    "series for each timestamp."
                )
        if self.target_transforms:
            # the reference applies tfm.update() for existing series and only
            # forbids NEW series with transforms fitted
            # (`/root/reference/mlforecast/core.py:2075-2098`)
            new_ids = (
                df.select(s.id_col)
                .distinct()
                .join(self.statics_.select(s.id_col), on=s.id_col, how="left_anti")
            )
            sample = new_ids.limit(5).collect()
            if sample:
                ids = [r[s.id_col] for r in sample]
                raise ValueError(
                    f"Can't add new series with target_transforms, e.g. {ids}"
                )
            for tfm in self.target_transforms:
                df = tfm.update(df)
        state = self.state_.unionByName(df, allowMissingColumns=True)
        keep = self.plan_.keep_last_n_bound()
        if keep is not None and keep > 0:
            w = Window.partitionBy(s.id_col).orderBy(F.col(s.time_col).desc())
            state = (
                state.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= keep)
                .drop("_rn")
            )
        self.state_ = state.localCheckpoint(eager=True)
        w_last = Window.partitionBy(s.id_col).orderBy(F.col(s.time_col).desc())
        self.statics_ = (
            state.select(s.id_col, s.time_col, *self.static_cols_)
            .withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumnRenamed(s.time_col, "_last_ds")
            .localCheckpoint(eager=True)
        )

    # ------------------------------------------------------------------
    def _validate_update(self, df: DataFrame) -> None:
        """New rows for known series must start at last_ds + 1 step and be
        gap-free and duplicate-free; offenders raise with examples."""
        s = self.schema_
        joined = df.join(self.statics_.select(s.id_col, "_last_ds"), on=s.id_col, how="left")
        unit, step = __import__(
            "mlforecast_spark.utils", fromlist=["parse_freq"]
        ).parse_freq(self.freq)
        agg = joined.groupBy(s.id_col, "_last_ds").agg(
            F.min(s.time_col).alias("_new_start"),
            F.max(s.time_col).alias("_new_end"),
            F.count("*").alias("_n"),
            F.countDistinct(s.time_col).alias("_n_unique"),
        )
        known = agg.filter(F.col("_last_ds").isNotNull())
        expected_start = time_plus(F.col("_last_ds"), self.freq, 1)
        ds_type = self.state_.schema[s.time_col].dataType
        if unit == "int":
            span = (F.col("_new_end") - F.col("_new_start")) / step + 1
        elif unit == "day":
            span = F.datediff("_new_end", "_new_start") / step + 1
        elif unit in ("hour", "minute", "second"):
            secs = {"hour": 3600, "minute": 60, "second": 1}[unit] * step
            span = (
                F.unix_timestamp("_new_end") - F.unix_timestamp("_new_start")
            ) / secs + 1
        else:  # month/year grids: start + dup checks only
            span = F.col("_n_unique") * 1.0
        bad = known.filter(
            (F.col("_new_start") != expected_start.cast(ds_type))
            | (F.col("_n") != F.col("_n_unique"))
            | (F.col("_n_unique") < F.floor(span))
        )
        sample = bad.limit(5).collect()
        if sample:
            ids = [r[s.id_col] for r in sample]
            raise ValueError(
                f"update() rows must continue each series gap-free from its "
                f"last timestamp; offending series e.g. {ids}"
            )

    # ------------------------------------------------------------------
    def forecast_fitted_values(
        self, h: int = 1, allow_unbounded_history: bool = False
    ) -> DataFrame:
        """In-sample predictions (`/root/reference/mlforecast/forecast.py:1318-1423`):
        (id, ds, y, h, one column per model), original scale.

        - recursive h=1: score the cached feature matrix.
        - direct mode: horizon-``h`` model scored at each frontier row,
          aligned to its target timestamp.
        - recursive h>1: distributed origin-replication (see
          ``_fitted_recursive_h``) — the Spark-native replacement for the
          reference's per-origin driver loop (`forecast.py:978-1120`).

        ``allow_unbounded_history``: with expanding/EWM features each
        origin's synthetic series must carry its FULL history, so the
        replicated frame is quadratic in series length (Σ_p p rows per
        series). Refused by default as a scale guard; opt in for
        small/medium panels where in-sample diagnostics justify it.

        Differences are inverted with the ACTUAL lagged targets (available
        in-sample), not the recursive tail rebuild."""
        if not isinstance(h, int) or h < 1:
            raise ValueError("`h` must be a positive integer.")
        if not hasattr(self, "_fitted_feats") or not hasattr(
            self, "transformed_panel_"
        ):
            raise ValueError(
                "forecast_fitted_values is unavailable on a load()ed "
                "pipeline: save() persists model/transform state but not the "
                "fitted feature matrix. Re-run fit() (or preprocess()) on "
                "the training panel first."
            )
        s = self.schema_
        cols = [s.target_col] + list(self.models_)
        if getattr(self, "max_horizon_", None) is not None:
            if h > self.max_horizon_:
                raise ValueError(f"h={h} exceeds max_horizon={self.max_horizon_}")
            ds_type = self.state_.schema[s.time_col].dataType
            feats = self._fitted_feats
            base_order = list(self.features_order_)
            sel = [
                F.col(s.id_col),
                time_plus(F.col(s.time_col), self.freq, h - 1)
                .cast(ds_type)
                .alias(s.time_col),
            ]
            for name, per_h_models in self.models_.items():
                self.features_order_ = getattr(self, "horizon_orders_", {}).get(
                    h - 1, base_order
                )
                if per_h_models[h - 1] is None:
                    raise ValueError(
                        f"horizon {h} was not trained; fit(horizons=...) "
                        f"trained only {self.trained_horizons_}."
                    )
                sel.append(self._score_col(per_h_models[h - 1]).alias(name))
                self.features_order_ = base_order
            scored = feats.select(*sel)
            actual = self.transformed_panel_.select(
                s.id_col, s.time_col, s.target_col
            )
            out = scored.join(actual, on=[s.id_col, s.time_col], how="inner")
        elif h == 1:
            feats = self._fitted_feats
            out = feats.select(
                s.id_col,
                s.time_col,
                F.col(s.target_col),
                *[
                    self._score_col(model).alias(name)
                    for name, model in self.models_.items()
                ],
            )
        else:
            out, already_inverted = self._fitted_recursive_h(
                h, allow_unbounded_history=allow_unbounded_history
            )
            if already_inverted:
                out = out.select(
                    s.id_col,
                    s.time_col,
                    s.target_col,
                    F.lit(h).cast("long").alias("h"),
                    *list(self.models_),
                )
                return out.orderBy(s.id_col, s.time_col)
        out = self._inverse_transforms_fitted(out, cols)
        out = out.select(
            s.id_col, s.time_col, s.target_col, F.lit(h).cast("long").alias("h"),
            *list(self.models_),
        )
        return out.orderBy(s.id_col, s.time_col)

    def _inverse_transforms_fitted(self, out: DataFrame, cols) -> DataFrame:
        """Reverse transform chain for in-sample rows: Differences add back
        the ACTUAL lagged values of their fitted input series (one window
        pass + broadcastable join); the Auto* family does the same with its
        per-series (d, sl) choice (their tails-based ``inverse_transform``
        continues from the END of training and would be wrong for in-sample
        rows); everything else uses its normal inverse."""
        from .target_transforms import Differences, _AutoPerSeriesTransform

        s = self.schema_
        inputs = getattr(self, "_tfm_inputs_", [])
        for i in range(len(self.target_transforms) - 1, -1, -1):
            tfm = self.target_transforms[i]
            if isinstance(tfm, _AutoPerSeriesTransform):
                add = self._auto_actual_addback(tfm, inputs[i])
                out = out.join(add, on=[s.id_col, s.time_col], how="left")
                for c in cols:
                    out = out.withColumn(c, qcol(c) + F.col("_addback"))
                out = out.drop("_addback")
            elif isinstance(tfm, Differences):
                src = inputs[i]
                w = Window.partitionBy(s.id_col).orderBy(s.time_col)
                cur = src.select(
                    s.id_col, s.time_col, F.col(s.target_col).alias("_lvl0")
                )
                lag_cols = []
                for k, d in enumerate(tfm.differences):
                    cur = cur.withColumn(f"_lag{k}", F.lag(f"_lvl{k}", d).over(w))
                    cur = cur.withColumn(
                        f"_lvl{k + 1}", F.col(f"_lvl{k}") - F.col(f"_lag{k}")
                    )
                    lag_cols.append(F.col(f"_lag{k}"))
                addback = lag_cols[0]
                for c in lag_cols[1:]:
                    addback = addback + c
                add = cur.select(s.id_col, s.time_col, addback.alias("_addback"))
                out = out.join(add, on=[s.id_col, s.time_col], how="left")
                for c in cols:
                    out = out.withColumn(c, qcol(c) + F.col("_addback"))
                out = out.drop("_addback")
            else:
                out = tfm.inverse_transform(out, cols)
        return out

    def _auto_actual_addback(self, tfm, src: DataFrame) -> DataFrame:
        """(id, ds, _addback) for one Auto* transform: the sum over its
        difference levels of the ACTUAL level value ``sl`` steps before each
        in-sample row — ``level_k[t] = level_{k+1}[t] + level_k[t-sl]``
        telescopes, so adding ``Σ_k level_k[t-sl]`` to a transformed-scale
        in-sample prediction restores the original scale. Per-series (d, sl)
        comes from the transform's fitted meta; the per-series recursion is
        the sanctioned Arrow-batched Python path for the Auto family."""
        import json

        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        s = self.schema_
        id_col, time_col, target_col = s.id_col, s.time_col, s.target_col
        src2 = src.select(id_col, time_col, target_col).join(
            tfm.stats_, on=id_col, how="left"
        )
        out_schema = T.StructType(
            [src.schema[id_col], src.schema[time_col], T.StructField("_addback", T.DoubleType())]
        )

        def add(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col).reset_index(drop=True)
            raw = pdf["_meta"].iloc[0]
            meta = json.loads(raw) if raw else {}
            d = int(meta.get("d", 0) or 0)
            sl = int(meta.get("sl", 1) or 1)
            cur = pdf[target_col].to_numpy(dtype="float64")
            ab = np.zeros(len(cur))
            for _ in range(d):
                lag = np.full_like(cur, np.nan)
                lag[sl:] = cur[:-sl]
                ab = ab + lag
                cur = cur - lag
            return pd.DataFrame(
                {id_col: pdf[id_col], time_col: pdf[time_col], "_addback": ab}
            )

        return src2.groupBy(id_col).applyInPandas(add, schema=out_schema)

    def _fitted_recursive_h(
        self, h: int, allow_unbounded_history: bool = False
    ) -> DataFrame:
        """h-step-ahead in-sample predictions, fully distributed.

        The reference walks origins one at a time on the driver
        (`forecast.py:978-1120`). Here every (series, origin) pair becomes its
        own synthetic series holding the ``keep_last_n_bound()`` rows of
        history before the origin, and ONE run of the existing recursive
        engine predicts h steps for all origins at once — h Spark jobs total
        instead of n_origins sequential predicts. Row expansion is bounded by
        origins × bound, which is why unbounded-history transforms
        (expanding/EWM) are rejected.

        Returns ``(frame, already_inverted)``: with ``Differences`` in the
        chain the per-origin recursive inverse happens here (it needs every
        step of each origin's path, not just the last), so the caller must
        skip the shared actual-lag inverse."""
        from .target_transforms import Differences, _AutoPerSeriesTransform

        if any(
            t.refit_on_warmup
            and not isinstance(t, (Differences, _AutoPerSeriesTransform))
            for t in self.target_transforms
        ):
            raise NotImplementedError(
                "h>1 fitted values support Differences, the Auto* family and "
                "scaler-type transforms; custom warm-up-refitting transforms "
                "would need their own per-origin tail state."
            )
        bound = self.plan_.keep_last_n_bound()
        if bound is None and not allow_unbounded_history:
            raise NotImplementedError(
                "h>1 fitted values with unbounded-history transforms "
                "(expanding/EWM) replicate each origin's FULL history — "
                "quadratic in series length. Pass "
                "allow_unbounded_history=True to accept that plan on "
                "small/medium panels; the reference has the matching "
                "restriction for pooled transforms (forecast.py:1391-1399)"
            )
        s = self.schema_
        tp = self.transformed_panel_
        w = Window.partitionBy(s.id_col).orderBy(s.time_col)
        state_cols = [*self.static_cols_, *self.dynamic_cols_]
        base = tp.select(s.id_col, s.time_col, s.target_col, *state_cols).withColumn(
            "_rn", F.row_number().over(w)
        )
        base = base.withColumn(
            "_n", F.max("_rn").over(Window.partitionBy(s.id_col))
        ).localCheckpoint(eager=True)
        # valid origins p: the row AFTER p survived dropna (it is in the
        # fitted matrix) and the h-step target row exists
        valid = self._fitted_feats.select(s.id_col, s.time_col).withColumn(
            "_isv", F.lit(1)
        )
        origins = (
            base.join(valid, on=[s.id_col, s.time_col], how="inner")
            .filter((F.col("_rn") >= 2) & (F.col("_rn") - 1 + h <= F.col("_n")))
            .select(s.id_col, (F.col("_rn") - 1).alias("_p"))
        )
        cid = F.concat_ws("\x1f", F.col(s.id_col).cast("string"), F.col("_p"))
        mapping = origins.select(
            s.id_col, "_p", cid.alias("_cid")
        ).localCheckpoint(eager=True)
        # history membership: row at position j serves origin p iff
        # p-bound < j <= p; with
        # unbounded history (bound None, opted in) it serves every origin
        # from its own position on — the quadratic plan the guard above
        # makes explicit
        hist_end = (
            F.col("_n") if bound is None else F.col("_rn") + F.lit(bound - 1)
        )
        hist = base.select(
            s.id_col, s.time_col, s.target_col, *state_cols,
            F.explode(F.sequence(F.col("_rn"), hist_end)).alias("_p"),
        ).join(origins, on=[s.id_col, "_p"], how="inner")
        expanded = hist.select(
            cid.alias("_cid"), s.time_col, s.target_col, *state_cols
        ).withColumnRenamed("_cid", s.id_col)
        x_df = None
        if self.dynamic_cols_:
            fut = base.select(
                s.id_col, s.time_col, *self.dynamic_cols_,
                F.explode(
                    F.sequence(F.col("_rn") - F.lit(h), F.col("_rn") - F.lit(1))
                ).alias("_p"),
            ).join(origins, on=[s.id_col, "_p"], how="inner")
            x_df = fut.select(
                cid.alias(s.id_col), s.time_col, *self.dynamic_cols_
            )
        # the expanded state is built from transformed_panel_, i.e. ALREADY in
        # the transformed scale — suppress the warm-up's transform pass and
        # inverse per ORIGINAL series id after mapping back
        saved_tfms = self.target_transforms
        self.target_transforms = []
        try:
            preds = self.predict(h, X_df=x_df, new_df=expanded)
        finally:
            self.target_transforms = saved_tfms
        diff_idx = [
            i
            for i, t in enumerate(self.target_transforms)
            if isinstance(t, (Differences, _AutoPerSeriesTransform))
        ]
        if diff_idx:
            w_step = Window.partitionBy(s.id_col).orderBy(s.time_col)
            steps = (
                preds.withColumn("_step", F.row_number().over(w_step))
                .withColumnRenamed(s.id_col, "_cid")
                .join(mapping, on="_cid", how="inner")
                .drop("_cid")
            )
            model_cols = list(self.models_)
            inputs = self._tfm_inputs_
            for i in range(len(self.target_transforms) - 1, -1, -1):
                tfm = self.target_transforms[i]
                if isinstance(tfm, _AutoPerSeriesTransform):
                    steps = self._invert_auto_per_origin(
                        steps, tfm, inputs[i], model_cols
                    )
                elif isinstance(tfm, Differences):
                    steps = self._invert_differences_per_origin(
                        steps, tfm, inputs[i], model_cols, h
                    )
                else:
                    steps = tfm.inverse_transform(steps, model_cols)
            out = steps.filter(F.col("_step") == h).drop("_step", "_p")
            actual = inputs[0].select(s.id_col, s.time_col, s.target_col)
            return out.join(actual, on=[s.id_col, s.time_col], how="inner"), True
        w_last = Window.partitionBy(s.id_col).orderBy(F.col(s.time_col).desc())
        last = (
            preds.withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumnRenamed(s.id_col, "_cid")
        )
        out = last.join(mapping, on="_cid", how="inner").drop("_cid", "_p")
        actual = tp.select(s.id_col, s.time_col, s.target_col)
        return out.join(actual, on=[s.id_col, s.time_col], how="inner"), False

    def _invert_differences_per_origin(
        self, steps: DataFrame, tfm, src: DataFrame, model_cols, h: int
    ) -> DataFrame:
        """Per-origin recursive inverse of one ``Differences`` transform for
        h-step fitted values: the step-``i`` reconstruction of origin ``p``
        adds back the transform-input level at position ``p + i - d`` — an
        ACTUAL value while that position is at or before the origin, the
        origin's own step-``i-d`` reconstruction beyond it. The reference
        rebuilds the same recursion origin-by-origin on the driver
        (`/root/reference/mlforecast/forecast.py:978-1120`); here each fill
        round is one window pass over the (origin x step) frame, and
        ceil(h/d)-1 rounds complete the recursion."""
        import math

        s = self.schema_
        w = Window.partitionBy(s.id_col).orderBy(s.time_col)
        diffs = list(tfm.differences)
        cur = src.select(
            s.id_col, s.time_col, F.col(s.target_col).alias("_lvl0")
        )
        for k, d in enumerate(diffs):
            cur = cur.withColumn(
                f"_lvl{k + 1}", F.col(f"_lvl{k}") - F.lag(f"_lvl{k}", d).over(w)
            )
        cur = cur.withColumn("_apos", F.row_number().over(w))
        w_o = Window.partitionBy(s.id_col, "_p").orderBy("_step")
        for lv in range(len(diffs) - 1, -1, -1):
            d = diffs[lv]
            act = cur.select(
                F.col(s.id_col).alias("_aid"),
                F.col("_apos"),
                F.col(f"_lvl{lv}").alias("_act"),
            )
            steps = steps.withColumn(
                "_need", F.col("_p") + F.col("_step") - F.lit(d)
            ).join(
                act,
                on=(F.col(s.id_col) == F.col("_aid"))
                & (F.col("_need") == F.col("_apos")),
                how="left",
            ).drop("_aid", "_apos", "_need")
            dcols = {m: f"_d_{j}" for j, m in enumerate(model_cols)}
            for m, dc in dcols.items():
                steps = steps.withColumn(dc, F.col(m))
            for m, dc in dcols.items():
                steps = steps.withColumn(
                    m, F.when(F.col("_step") <= d, F.col(dc) + F.col("_act"))
                )
            for _ in range(math.ceil(h / d) - 1):
                for m, dc in dcols.items():
                    steps = steps.withColumn(
                        m,
                        F.coalesce(
                            F.col(m), F.col(dc) + F.lag(F.col(m), d).over(w_o)
                        ),
                    )
            steps = steps.drop("_act", *dcols.values())
        return steps

    def _invert_auto_per_origin(
        self, steps: DataFrame, tfm, src: DataFrame, model_cols
    ) -> DataFrame:
        """Per-origin recursive inverse of one Auto* transform for h-step
        fitted values: same recursion as ``_invert_differences_per_origin``
        but with the PER-SERIES (d, sl) chosen at fit — variable lags rule
        out ``F.lag``, so each series runs its recursion in one Arrow batch
        (the sanctioned Python path for the Auto family), cogrouped with its
        actual transform-input levels. Reference rebuilds this origin-by-
        origin on the driver (`/root/reference/mlforecast/forecast.py:978-1120`)."""
        import json

        import numpy as np
        import pandas as pd

        s = self.schema_
        id_col, time_col, target_col = s.id_col, s.time_col, s.target_col
        src2 = src.select(id_col, time_col, target_col).join(
            tfm.stats_, on=id_col, how="left"
        )
        cols = list(model_cols)
        out_schema = steps.schema

        def rebuild(sp: pd.DataFrame, act: pd.DataFrame) -> pd.DataFrame:
            if sp.empty:
                return sp
            sp = sp.sort_values(["_p", "_step"]).reset_index(drop=True)
            if act.empty:
                return sp
            act = act.sort_values(time_col)
            raw = act["_meta"].iloc[0]
            meta = json.loads(raw) if raw else {}
            d = int(meta.get("d", 0) or 0)
            sl = int(meta.get("sl", 1) or 1)
            if d == 0:
                return sp
            y = act[target_col].to_numpy(dtype="float64")
            levels = [y]
            for _ in range(d):
                cur = levels[-1]
                nxt = np.full_like(cur, np.nan)
                nxt[sl:] = cur[sl:] - cur[:-sl]
                levels.append(nxt)
            p = sp["_p"].to_numpy(dtype="int64")
            step = sp["_step"].to_numpy(dtype="int64")
            n = len(sp)
            # rows are (origin, step)-sorted with full 1..h blocks per
            # origin, so "step i-sl of the same origin" is simply row r-sl
            for c in cols:
                vals = sp[c].to_numpy(dtype="float64")
                for k in range(d - 1, -1, -1):
                    lvl = levels[k]
                    out = np.empty_like(vals)
                    for r in range(n):
                        if step[r] <= sl:
                            idx = p[r] + step[r] - sl - 1
                            prev = lvl[idx] if 0 <= idx < len(lvl) else np.nan
                        else:
                            prev = out[r - sl]
                        out[r] = vals[r] + prev
                    vals = out
                sp[c] = vals
            return sp

        return (
            steps.groupby(id_col)
            .cogroup(src2.groupby(id_col))
            .applyInPandas(rebuild, schema=out_schema)
        )

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist the fitted pipeline: state tables as Parquet, config +
        models (pure numpy) as pickle
        (`/root/reference/mlforecast/forecast.py:2088-2124` shape)."""
        import os
        import pickle

        os.makedirs(path, exist_ok=True)
        self.state_.write.mode("overwrite").parquet(os.path.join(path, "state"))
        self.statics_.write.mode("overwrite").parquet(os.path.join(path, "statics"))
        if getattr(self, "cs_df_", None) is not None:
            self.cs_df_.write.mode("overwrite").parquet(os.path.join(path, "cs"))
        # target-transform state frames (stats_/tails_) are small per-series
        # DataFrames — persist each as Parquet and pickle the transform with
        # the frame attributes stripped
        import copy

        tfm_entries = []
        for i, tfm in enumerate(self.target_transforms):
            t = copy.copy(tfm)
            frames = []
            for attr in ("stats_", "tails_"):
                fr = getattr(t, attr, None)
                if isinstance(fr, DataFrame):
                    fr.write.mode("overwrite").parquet(
                        os.path.join(path, f"tfm_{i}_{attr}")
                    )
                    setattr(t, attr, None)
                    frames.append(attr)
            tfm_entries.append({"tfm": t, "frames": frames})
        meta = {
            "models": self.models,
            "models_": self.models_,
            "freq": self.freq,
            "lags": self.lags,
            "lag_transforms": self.lag_transforms,
            "date_features": self.date_features,
            "target_transforms": tfm_entries,
            "schema": self.schema_,
            "static_cols": self.static_cols_,
            "dynamic_cols": self.dynamic_cols_,
            "features_order": self.features_order_,
            "feature_names": self.feature_names_,
            "max_horizon": getattr(self, "max_horizon_", None),
            "prediction_intervals": getattr(self, "prediction_intervals_", None),
            "horizon_orders": getattr(self, "horizon_orders_", None),
            "horizon_cols": getattr(self, "horizon_cols_", []),
            "horizon_features": getattr(self, "horizon_features_", {}),
            "horizon_feature_templates": getattr(self, "horizon_feature_templates_", []),
            "weight_col": getattr(self, "weight_col_", None),
            "trained_horizons": getattr(self, "trained_horizons_", None),
        }
        with open(os.path.join(path, "meta.pkl"), "wb") as f:
            pickle.dump(meta, f)

    @classmethod
    def load(cls, path: str, spark) -> "MLForecast":
        import os
        import pickle

        with open(os.path.join(path, "meta.pkl"), "rb") as f:
            meta = pickle.load(f)
        tfms = []
        for i, entry in enumerate(meta.get("target_transforms") or []):
            tfm = entry["tfm"]
            for attr in entry["frames"]:
                setattr(
                    tfm,
                    attr,
                    spark.read.parquet(
                        os.path.join(path, f"tfm_{i}_{attr}")
                    ).localCheckpoint(eager=True),
                )
            tfms.append(tfm)
        mf = cls(
            models=meta["models"],
            freq=meta["freq"],
            lags=meta["lags"],
            lag_transforms=meta["lag_transforms"],
            date_features=meta["date_features"],
            target_transforms=tfms,
        )
        mf.models_ = meta["models_"]
        mf.schema_ = meta["schema"]
        mf.static_cols_ = meta["static_cols"]
        mf.dynamic_cols_ = meta["dynamic_cols"]
        mf.features_order_ = meta["features_order"]
        mf.feature_names_ = meta["feature_names"]
        mf.max_horizon_ = meta["max_horizon"]
        mf.prediction_intervals_ = meta["prediction_intervals"]
        if meta.get("horizon_orders"):
            mf.horizon_orders_ = meta["horizon_orders"]
        mf.horizon_cols_ = meta.get("horizon_cols", [])
        mf.horizon_features_ = meta.get("horizon_features", {})
        mf.horizon_feature_templates_ = meta.get("horizon_feature_templates", [])
        mf.weight_col_ = meta.get("weight_col")
        mf.trained_horizons_ = meta.get("trained_horizons")
        mf.plan_ = mf._build_plan(mf.schema_)
        mf.state_ = spark.read.parquet(os.path.join(path, "state")).localCheckpoint(
            eager=True
        )
        mf.statics_ = spark.read.parquet(
            os.path.join(path, "statics")
        ).localCheckpoint(eager=True)
        cs_path = os.path.join(path, "cs")
        if os.path.exists(cs_path):
            mf.cs_df_ = spark.read.parquet(cs_path).localCheckpoint(eager=True)
        return mf

    # ------------------------------------------------------------------
    def cross_validation(
        self,
        df: DataFrame,
        n_windows: int,
        h: int,
        id_col: str = "unique_id",
        time_col: str = "ds",
        target_col: str = "y",
        step_size: Optional[int] = None,
        static_features: Optional[Sequence[str]] = None,
        dropna: bool = True,
        refit: "bool | int" = True,
        max_horizon: Optional[int] = None,
        weight_col: Optional[str] = None,
        horizon_features: Optional[dict] = None,
        horizon_feature_templates: Optional[Sequence[str]] = None,
        engine: str = "spark",
        cogroup_buckets: Optional[int] = None,
        keep_last_n: Optional[int] = None,
        input_size: Optional[int] = None,
        horizons: Optional[Sequence[int]] = None,
        before_predict_callback: Optional[Callable] = None,
        after_predict_callback: Optional[Callable] = None,
        prediction_intervals=None,
        level: Optional[Sequence[float]] = None,
        fitted: bool = False,
        models_fit_kwargs: Optional[dict] = None,
    ) -> DataFrame:
        """Rolling-origin backtest (`/root/reference/mlforecast/forecast.py:1859-2077`):
        per-series cutoffs relative to each series' own end; result is the
        union over windows of (id, ds, cutoff, y, *model predictions).

        ``weight_col`` / ``horizon_features`` / ``horizon_feature_templates``
        are forwarded into each window's fit so backtest models train exactly
        like the final model — required when fit(prediction_intervals=...)
        delegates here, else the nested fits would silently reset them.

        ``engine`` forwards to :meth:`predict` for each window's rollout —
        with per-series features, ``'cogroup'`` turns the backtest's
        n_windows × h sequential predict jobs into n_windows single jobs.

        Reference-parity extras (`/root/reference/mlforecast/forecast.py:1859-2077`):
        ``refit`` may be an int — refit every ``refit`` windows, reusing the
        previous window's models in between (state still advances).
        ``input_size`` trims each window's training set to the last N rows
        per series; ``keep_last_n`` forwards to fit. ``horizons`` /
        callbacks / ``prediction_intervals`` / ``level`` forward to the
        per-window fit/predict. ``fitted=True`` stores each window's
        in-sample predictions (``cross_validation_fitted_values()``)."""
        if fitted and max_horizon is not None:
            raise ValueError(
                "fitted=True with direct mode is not supported in "
                "cross_validation yet."
            )
        step_size = step_size or h
        w_last = Window.partitionBy(id_col)
        df = df.withColumn("_max_ds", F.max(time_col).over(w_last))
        results = []
        self.cv_fitted_values_ = [] if fitted else None
        for i in range(n_windows):
            back = h + (n_windows - 1 - i) * step_size
            cutoff_col = time_plus(F.col("_max_ds"), self.freq, -back)
            train = df.filter(F.col(time_col) <= cutoff_col).drop("_max_ds")
            if input_size is not None:
                w_in = Window.partitionBy(id_col).orderBy(F.col(time_col).desc())
                train = (
                    train.withColumn("_rn_in", F.row_number().over(w_in))
                    .filter(F.col("_rn_in") <= input_size)
                    .drop("_rn_in")
                )
            valid = df.filter(
                (F.col(time_col) > cutoff_col)
                & (F.col(time_col) <= time_plus(cutoff_col, self.freq, h))
            )
            cutoffs = (
                df.select(id_col, cutoff_col.alias("cutoff")).distinct()
            )
            # reference cadence (`forecast.py:1940`): window 0 always fits;
            # int refit=k refits every k-th window; True==1, False==0
            should_fit = i == 0 or (refit > 0 and i % refit == 0)
            if should_fit:
                # fit(prediction_intervals=...) runs a NESTED backtest for
                # calibration, which re-enters this method and resets
                # cv_fitted_values_ — shield the outer accumulator
                outer_fv = self.cv_fitted_values_
                self.fit(
                    train,
                    id_col=id_col,
                    time_col=time_col,
                    target_col=target_col,
                    static_features=static_features,
                    dropna=dropna,
                    keep_last_n=keep_last_n,
                    max_horizon=max_horizon,
                    prediction_intervals=prediction_intervals,
                    weight_col=weight_col,
                    horizon_features=horizon_features,
                    horizon_feature_templates=horizon_feature_templates,
                    engine=engine,
                    models_fit_kwargs=models_fit_kwargs,
                )
                self.cv_fitted_values_ = outer_fv
            else:
                if self.target_transforms:
                    raise ValueError(
                        "refit=False with target_transforms is not supported yet"
                    )
                self.transformed_panel_ = train
                # _feats_all_ still belongs to the last FITTED window's
                # train frame — drop it so the state capture reads THIS
                # window's train, not the stale cache
                self._feats_all_ = None
                self._capture_state(train, id_col, time_col, target_col)
                if fitted:
                    # models are reused but the train window advanced —
                    # refresh the feature matrix the in-sample scoring reads
                    self._fitted_feats = self.preprocess(
                        train,
                        id_col=id_col,
                        time_col=time_col,
                        target_col=target_col,
                        static_features=static_features,
                        dropna=dropna,
                        keep_last_n=keep_last_n,
                        fit_transforms=False,
                    )
            if fitted:
                fv = (
                    self.forecast_fitted_values()
                    .drop("h")
                    .withColumn("fold", F.lit(i))
                )
                self.cv_fitted_values_.append(fv)
            # future exog for this window comes from the held-out rows
            future_cols = list(self.dynamic_cols_) + list(
                getattr(self, "horizon_cols_", [])
            )
            X_df = valid.drop(target_col) if future_cols else None
            preds = self.predict(
                h,
                X_df=X_df,
                engine=engine,
                cogroup_buckets=cogroup_buckets,
                horizons=horizons,
                level=level,
                before_predict_callback=before_predict_callback,
                after_predict_callback=after_predict_callback,
            )
            extra_pred_cols = [
                c
                for c in preds.columns
                if c not in (id_col, time_col) and c not in self.models_
            ]
            merged = (
                valid.select(id_col, time_col, target_col)
                .join(preds, on=[id_col, time_col], how="inner")
                .join(cutoffs, on=id_col, how="left")
                .select(
                    id_col, time_col, "cutoff", target_col,
                    *self.models_.keys(), *extra_pred_cols,
                )
            )
            results.append(merged)
        from functools import reduce

        return reduce(DataFrame.unionByName, results)

    def cross_validation_fitted_values(self) -> DataFrame:
        """Per-window in-sample predictions stored by
        ``cross_validation(fitted=True)``
        (`/root/reference/mlforecast/forecast.py:2079-2087`): (id, ds, fold,
        y, one column per model)."""
        if not getattr(self, "cv_fitted_values_", None):
            raise ValueError(
                "Please run cross_validation with fitted=True first."
            )
        from functools import reduce

        out = reduce(DataFrame.unionByName, self.cv_fitted_values_)
        s = self.schema_
        first = [s.id_col, s.time_col, "fold", s.target_col]
        rest = [c for c in out.columns if c not in first]
        return out.select(*first, *rest)
