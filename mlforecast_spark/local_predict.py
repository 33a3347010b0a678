"""Cogrouped recursive-predict engine: the whole h-step rollout in ONE job.

The default predict engine (``forecast.py:_predict_recursive_one``) advances
all series in lockstep: per step it unions the frontier onto the state,
re-applies the feature plan (Spark windows), scores, and checkpoints — h
sequential Spark jobs. That lockstep is REQUIRED when any feature pools
information across series (``global_``/``groupby``/``partition_by``
transforms read other series' just-predicted values), but for per-series
feature sets it is pure overhead: the recursion of one series never reads
another series' predictions.

This engine exploits that independence: one ``applyInPandas`` over the
(bounded) per-series state tails runs the entire h-step recursion inside the
UDF — per step each feature value comes from an O(window) numpy kernel
(``_BaseLagTransform.frontier_fn``) that mirrors the transform's Spark
expression, and the model scores a 1×k row with its driver-side ``predict``.

Scale shape (the reason this exists, not just a local-floor fix): on a
1000-executor cluster with millions of series, the default loop pays h global
barriers — h shuffles/window sorts over the full tail frame plus h
checkpoint materializations — while this engine pays ONE shuffle (the groupBy
on series id) and streams Arrow batches through Python workers with zero
further coordination. It is the engine analogue of the reference's numpy
per-group rollout (`/root/reference/mlforecast/core.py:1061-1186`), with
Spark doing the distribution instead of a single process.

Semantics match the default engine exactly (asserted by
``tests/test_cogroup_predict.py``): same frontier timestamps, same NaN/null
propagation, same EWM recurrence (carried O(1) state), pandas-convention
date features, dynamic exogenous lookups from ``X_df``. Unsupported —
pooled/lookup transforms, Spark-side callbacks, DataFrame-returning callable
date features — raise :class:`CogroupUnsupportedError` directing to
``engine='spark'``; callers that degrade gracefully catch that type.

One documented boundary: a GENERIC model (scored via pandas_udf in the
loop engine) that returns float NaN predictions. Appended NaNs are treated
as missing by this engine's window kernels (matching how the loop treats
the NULLs that expression-scored models produce), while the loop's
pandas_udf path stores them as non-null doubles that poison subsequent
window aggregates — the loop's two scoring paths already disagree with
each other there. Expression-scored models (every built-in) are identical
across engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .date_features import DUMMY_FEATURE_VALUES
from .utils import parse_freq

__all__ = ["CogroupUnsupportedError", "predict_cogroup"]


class CogroupUnsupportedError(ValueError):
    """The cogrouped engine cannot express this pipeline (pooled features,
    callbacks, direct mode, ...). Callers that want graceful degradation
    catch THIS type and rerun with ``engine='spark'`` — never match on the
    message text."""


# pandas-convention scalar date features; value parity with the Spark
# expressions in date_features._DATE_FEATURES (pandas Monday=0 dayofweek,
# ISO week, calendar-boundary flags) is asserted by the engine-equality tests
_PD_DATE_FEATURES = {
    "year": lambda t: t.year,
    "month": lambda t: t.month,
    "day": lambda t: t.day,
    "hour": lambda t: t.hour,
    "minute": lambda t: t.minute,
    "second": lambda t: t.second,
    "dayofyear": lambda t: t.dayofyear,
    "day_of_year": lambda t: t.dayofyear,
    "weekofyear": lambda t: int(t.isocalendar()[1]),
    "week": lambda t: int(t.isocalendar()[1]),
    "dayofweek": lambda t: t.dayofweek,
    "day_of_week": lambda t: t.dayofweek,
    "weekday": lambda t: t.dayofweek,
    "quarter": lambda t: t.quarter,
    "daysinmonth": lambda t: t.days_in_month,
    "days_in_month": lambda t: t.days_in_month,
    "is_month_start": lambda t: int(t.is_month_start),
    "is_month_end": lambda t: int(t.is_month_end),
    "is_quarter_start": lambda t: int(t.month in (1, 4, 7, 10) and t.day == 1),
    "is_quarter_end": lambda t: int(t.is_quarter_end),
    "is_year_start": lambda t: int(t.month == 1 and t.day == 1),
    "is_year_end": lambda t: int(t.month == 12 and t.day == 31),
}


def _py_time_plus(ts, unit: str, total: int):
    """Python mirror of utils.time_plus for a single timestamp."""
    if unit == "int":
        return ts + total
    ts = pd.Timestamp(ts)
    if unit == "day":
        return ts + pd.Timedelta(days=total)
    if unit == "hour":
        return ts + pd.Timedelta(hours=total)
    if unit == "minute":
        return ts + pd.Timedelta(minutes=total)
    if unit == "second":
        return ts + pd.Timedelta(seconds=total)
    if unit == "month":
        # Spark's add_months operates on the DATE part (returns a date; the
        # engine casts back, landing on midnight) and clamps to month end;
        # pandas DateOffset clamps the same way — normalize() mirrors the
        # date truncation so both engines stamp identical frontiers
        return ts.normalize() + pd.DateOffset(months=total)
    if unit == "year":
        return ts.normalize() + pd.DateOffset(months=12 * total)
    raise AssertionError(unit)


def _compile_feature_specs(mf):
    """features_order_ -> list of (kind, payload) instructions; fail fast on
    anything the per-series rollout can't reproduce."""
    plan = mf.plan_
    registry = plan.registry
    statics = set(mf.static_cols_)
    dynamics = set(mf.dynamic_cols_)
    date_strs = {f for f in plan.date_features if isinstance(f, str)}
    callables = {f.__name__: f for f in plan.date_features if callable(f)}
    dummy_of = {}
    if plan.date_features_as_dummies:
        for feat in date_strs:
            if feat in DUMMY_FEATURE_VALUES:
                for v in DUMMY_FEATURE_VALUES[feat]:
                    dummy_of[f"{feat}_{v}"] = (feat, v)

    for name, (lag, tfm) in registry.items():
        if tfm.is_pooled:
            raise CogroupUnsupportedError(
                f"predict(engine='cogroup') cannot compute pooled feature "
                f"{name!r}: cross-series transforms need the lockstep loop — "
                "use engine='spark'."
            )
        try:
            tfm.frontier_fn(lag)  # fail fast (LookupLag, exotic transforms)
        except NotImplementedError as e:
            raise CogroupUnsupportedError(
                f"predict(engine='cogroup') cannot compute feature {name!r}: {e}"
            ) from e

    specs = []
    for col in mf.features_order_:
        if col in statics:
            specs.append(("static", col))
        elif col in dynamics:
            specs.append(("dynamic", col))
        elif col in registry:
            specs.append(("tfm", col))
        elif col in dummy_of:
            specs.append(("dummy", dummy_of[col]))
        elif col in date_strs and not (
            plan.date_features_as_dummies and col in DUMMY_FEATURE_VALUES
        ):
            if col not in _PD_DATE_FEATURES:
                raise CogroupUnsupportedError(
                    f"predict(engine='cogroup') has no pandas kernel for date "
                    f"feature {col!r}; use engine='spark'."
                )
            specs.append(("date", col))
        elif col in callables:
            specs.append(("date_callable", callables[col]))
        else:
            raise CogroupUnsupportedError(
                f"predict(engine='cogroup') cannot source feature {col!r}; "
                "use engine='spark'."
            )
    return specs


def predict_cogroup(
    mf,
    h: int,
    X_df: Optional[DataFrame] = None,
    ids: Optional[Sequence[str]] = None,
    state: Optional[DataFrame] = None,
    bucket_by: Optional[int] = None,
) -> DataFrame:
    """Run every model's h-step recursive rollout in one distributed pass.

    Returns the same (id, time, <model>...) frame as the default engine,
    BEFORE target-transform inversion (the caller applies that, shared with
    the loop path).

    ``bucket_by``: group the pass by ``hash(id) % bucket_by`` instead of by
    id, looping over the bucket's series inside each UDF call. With
    millions of series, per-series groups pay a fixed Python-call + Arrow
    batch cost per SERIES; bucketing amortizes it per BUCKET (pick
    bucket_by ≈ a few × total cores). The rollout never crosses series, so
    results are independent of the grouping; exactness caveat: the batched
    ``model.predict`` sees an (n×k) matrix instead of 1×k rows, so a model
    whose predict uses blocked/threaded BLAS may differ in the last ulp by
    batch shape (the in-repo models are row-independent and exact).
    Measured on local[32], 20k series × h=7: 22 s per-series → 3.2 s with
    bucket_by=128 (7×; 12× vs the original per-series-per-step scoring) —
    the step-synchronous batching does one predict call per (group, step).
    """
    s = mf.schema_
    state = mf.state_ if state is None else state
    if ids is not None:
        state = state.filter(F.col(s.id_col).isin(list(ids)))
    dyn_cols = list(mf.dynamic_cols_)
    if dyn_cols and X_df is None:
        raise ValueError(f"Dynamic features {dyn_cols} require `X_df` at predict.")

    models = dict(mf.models_)
    for name, model in models.items():
        if not hasattr(model, "predict"):
            raise CogroupUnsupportedError(
                f"Model {name!r} has no driver-side `predict`; "
                "use engine='spark'."
            )
    specs = _compile_feature_specs(mf)
    registry = mf.plan_.registry
    unit, step = parse_freq(mf.freq)
    id_field = state.schema[s.id_col]
    ds_type = state.schema[s.time_col].dataType
    ds_is_date = isinstance(ds_type, T.DateType)
    out_schema = T.StructType(
        [id_field, T.StructField(s.time_col, ds_type)]
        + [T.StructField(name, T.DoubleType()) for name in models]
    )
    id_col, time_col, target_col = s.id_col, s.time_col, s.target_col
    static_cols = list(mf.static_cols_)
    model_items = list(models.items())

    def _fill_features(row, kernels, hist, ds, xrow, statics_row):
        """One frontier feature row, in features_order_ order."""
        for j, (kind, payload) in enumerate(specs):
            if kind == "tfm":
                v = kernels[payload](hist)
            elif kind == "static":
                v = statics_row[payload]
            elif kind == "dynamic":
                v = xrow[payload] if xrow is not None else np.nan
            elif kind == "date":
                v = _PD_DATE_FEATURES[payload](pd.Timestamp(ds))
            elif kind == "dummy":
                feat, want = payload
                v = int(_PD_DATE_FEATURES[feat](pd.Timestamp(ds)) == want)
            else:  # date_callable
                res = payload(pd.DatetimeIndex([ds]))
                if isinstance(res, pd.DataFrame):
                    raise ValueError(
                        "DataFrame-returning callable date features "
                        "are not supported by engine='cogroup'."
                    )
                v = pd.Series(res).iloc[0]
            try:
                row[j] = np.float64(v) if v is not None else np.nan
            except (TypeError, ValueError) as e:
                raise ValueError(
                    f"feature {specs[j]!r} is not numeric: {v!r}"
                ) from e

    def rollout_many(pdf: pd.DataFrame, xpdf: Optional[pd.DataFrame]) -> pd.DataFrame:
        """All series in the group, advanced step-synchronously: per step ONE
        batched ``model.predict`` over every series' frontier row (instead of
        a 1×k call per series) — the recursion never crosses series, so
        stepping them together is free parallelism. With bucketed grouping
        this turns n_series×h×n_models predict calls into h×n_models per
        bucket."""
        if len(pdf) == 0:
            return pd.DataFrame({f.name: [] for f in out_schema.fields})
        xgroups = (
            dict(tuple(xpdf.groupby(id_col, sort=False)))
            if xpdf is not None and len(xpdf)
            else {}
        )
        ctxs = []
        for sid, g in pdf.groupby(id_col, sort=False):
            g = g.sort_values(time_col)
            y0 = g[target_col].astype("float64").to_numpy()
            last_ds = g[time_col].iloc[-1]
            statics_row = {c: g[c].iloc[-1] for c in static_cols}
            dyn_lookup = {}
            xg = xgroups.get(sid)
            if xg is not None and len(xg):
                for _, r in xg.iterrows():
                    key = (
                        pd.Timestamp(r[time_col]) if unit != "int" else r[time_col]
                    )
                    dyn_lookup[key] = r
            future_ds = [
                _py_time_plus(last_ds, unit, step * i) for i in range(1, h + 1)
            ]
            ctxs.append(
                {
                    "sid": sid,
                    "y0": y0,
                    "n0": len(y0),
                    "statics": statics_row,
                    "dyn": dyn_lookup,
                    "fds": future_ds,
                }
            )
        k = len(specs)
        n_series = len(ctxs)
        preds_by_model = {}
        for mname, model in model_items:
            for c in ctxs:
                c["buf"] = np.concatenate([c["y0"], np.full(h, np.nan)])
                # FRESH kernels per (series, model): EWM carries state
                c["kernels"] = {
                    fname: tfm.frontier_fn(lag)
                    for fname, (lag, tfm) in registry.items()
                }
            outs = np.empty((n_series, h))
            for step_i in range(1, h + 1):
                X = np.empty((n_series, k))
                for si, c in enumerate(ctxs):
                    hist = c["buf"][: c["n0"] + step_i - 1]
                    ds = c["fds"][step_i - 1]
                    xrow = c["dyn"].get(
                        pd.Timestamp(ds) if unit != "int" else ds
                    )
                    _fill_features(
                        X[si], c["kernels"], hist, ds, xrow, c["statics"]
                    )
                preds = np.asarray(model.predict(X), dtype="float64").reshape(-1)
                for si, c in enumerate(ctxs):
                    c["buf"][c["n0"] + step_i - 1] = preds[si]
                outs[:, step_i - 1] = preds
            preds_by_model[mname] = outs
        ids_out = []
        ds_out = []
        for c in ctxs:
            ids_out.extend([c["sid"]] * h)
            if ds_is_date:
                ds_out.extend(pd.Timestamp(d).date() for d in c["fds"])
            elif unit == "int":
                ds_out.extend(c["fds"])
            else:
                ds_out.extend(pd.Timestamp(d) for d in c["fds"])
        data = {id_col: ids_out, time_col: ds_out}
        for mname, outs in preds_by_model.items():
            data[mname] = outs.reshape(-1)
        return pd.DataFrame(data)

    bucket_col = "_mlfs_bucket"
    if bucket_by is not None:
        state = state.withColumn(
            bucket_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(bucket_by)))
        )
    group_key = bucket_col if bucket_by is not None else id_col

    if dyn_cols:
        xsel = X_df.select(id_col, time_col, *dyn_cols)
        if ids is not None:
            xsel = xsel.filter(F.col(id_col).isin(list(ids)))
        if bucket_by is not None:
            xsel = xsel.withColumn(
                bucket_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(bucket_by)))
            )

        def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            return rollout_many(left, right)

        return (
            state.groupBy(group_key)
            .cogroup(xsel.groupBy(group_key))
            .applyInPandas(run, schema=out_schema)
        )

    def run_solo(pdf: pd.DataFrame) -> pd.DataFrame:
        return rollout_many(pdf, None)

    return state.groupBy(group_key).applyInPandas(run_solo, schema=out_schema)
