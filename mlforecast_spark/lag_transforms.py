"""Lag-transform library: every feature is a Spark ``Column`` over a window.

API parity with the reference's ``mlforecast/lag_transforms.py`` (see
`/root/reference/mlforecast/lag_transforms.py:320-1885`): same class names,
constructor signatures and deterministic feature naming
(`/root/reference/mlforecast/lag_transforms.py:145-167`), but the execution
strategy is Spark-first — each transform *emits an expression* against a
window frame built by the planner (``mlforecast_spark/core.py``), so Catalyst
plans the whole feature set as one WindowExec pass per distinct window spec.

Frame semantics (validated against the reference's SQL oracle,
`/root/reference/tests/test_pooled_sqlite_oracle.py:115-133`):

- rolling:   ``BETWEEN lag+window_size-1 PRECEDING AND lag PRECEDING``
- expanding: ``BETWEEN UNBOUNDED PRECEDING AND lag PRECEDING``

In local (per-series) mode grids are gap-free so ROWS == RANGE and we use
``rowsBetween`` (whole-stage-codegen friendly); pooled modes use
``rangeBetween`` over a dense time ordinal.

Only ``ExponentiallyWeightedMean`` is not expressible as a Spark window
aggregate (order-dependent recurrence); it goes through an Arrow-batched
``applyInPandas`` pass grouped by series/bucket (the one sanctioned slow
path; see SURVEY.md §7).
"""

from __future__ import annotations

import operator
import re
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

__all__ = [
    "Lag",
    "LookupLag",
    "RollingMean",
    "RollingStd",
    "RollingMin",
    "RollingMax",
    "RollingQuantile",
    "SeasonalRollingMean",
    "SeasonalRollingStd",
    "SeasonalRollingMin",
    "SeasonalRollingMax",
    "SeasonalRollingQuantile",
    "ExpandingMean",
    "ExpandingStd",
    "ExpandingMin",
    "ExpandingMax",
    "ExpandingQuantile",
    "ExponentiallyWeightedMean",
    "Offset",
    "Combine",
]


def _pascal2snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def _normalize_columns(cols: Optional[Sequence[str]]):
    if cols is None:
        return None
    if isinstance(cols, str):
        return [cols]
    return list(cols)


_VALID_TIME_AGGS = ("sum", "count", "mean", "min", "max")


def _validate_time_agg(time_agg, global_, groupby):
    if time_agg is None:
        return
    if time_agg not in _VALID_TIME_AGGS:
        raise ValueError(f"time_agg must be one of {_VALID_TIME_AGGS}, got {time_agg!r}")
    if not (global_ or groupby):
        raise ValueError("time_agg requires `global_` or `groupby`.")


class _BaseLagTransform:
    """Base: pooled-mode attributes + reference-parity naming.

    Subclasses implement :meth:`expr` (emit a Column against a ``FrameCtx``)
    and/or :meth:`pandas_fn` (per-group pandas fallback, EWM only).
    """

    global_: bool = False
    groupby = None
    partition_by = None
    time_agg = None

    # ordered (name, value, default) params for name generation
    def _name_params(self):
        return []

    def _get_name(self, lag: int) -> str:
        prefix = ""
        if getattr(self, "global_", False):
            prefix = "global_"
        elif getattr(self, "groupby", None):
            prefix = "groupby_" + "__".join(self.groupby) + "_"
        if getattr(self, "partition_by", None):
            prefix += "partby_" + "__".join(self.partition_by) + "_"
        result = f"{prefix}{_pascal2snake(type(self).__name__)}_lag{lag}"
        changed = [f"{n}{v}" for n, v, d in self._name_params() if v != d]
        if changed:
            result += "_" + "_".join(changed)
        return result

    @property
    def is_pooled(self) -> bool:
        return bool(self.global_ or self.groupby or self.partition_by)

    @property
    def mode_key(self):
        """Grouping key for pooled sub-plans (mirrors `core.py:323-355`)."""
        return (
            bool(self.global_),
            tuple(self.groupby or ()),
            tuple(self.partition_by or ()),
            self.time_agg,
        )

    def update_samples(self, lag: int) -> int:
        """Rows of history needed to produce the value at a new step; -1 = all."""
        raise NotImplementedError

    # --- emission API -----------------------------------------------------
    def expr(self, ctx, lag: int) -> Optional[Column]:
        """Return the feature Column, or None if a pandas pass is needed."""
        return None

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        """Return the feature as ONE SQL expression string, or None to fall
        back to :meth:`expr`. Parsed JVM-side via a single ``F.expr`` call —
        the plan-build fast path for wide feature matrices, where node-by-
        node py4j Column construction dominates the driver floor (measured
        ~0.6 s for a 23-column plan before this path). Only emitted when the
        planner set ``ctx.y_name`` (the local rows-frame mode); pooled and
        range contexts keep the Column path. MUST compile to the exact same
        resolved expression tree as :meth:`expr` — the DuckDB value oracle
        (tools/check_oracle.py) guards the equivalence."""
        return None

    def expr_partial_agg(self, ctx, lag: int) -> Optional[Column]:
        """Pooled fast path: emit the feature from windowed per-(bucket, ts)
        partial aggregates (``ctx.wsum/wcnt/wsumsq/wmin/wmax``) — the
        reference's `_TimestampAggregates` strategy
        (`/root/reference/mlforecast/pooled.py:183-218`). None = no partial
        form (e.g. quantiles) → row-level window fallback."""
        return None

    def pandas_fn(self, lag: int):
        """Return fn(pd.Series) -> pd.Series for the per-group pandas path."""
        raise NotImplementedError(f"{type(self).__name__} has no pandas path")

    def frontier_fn(self, lag: int):
        """Return ``fn(y: np.ndarray) -> float`` giving this feature's value
        for the NEXT row of a series whose full history (targets including
        prior predictions, NaN for nulls) is ``y`` — the per-step kernel of
        the cogrouped predict engine (``local_predict.py``), which runs the
        whole h-step recursion inside one ``applyInPandas`` instead of h
        sequential Spark jobs.

        The returned closure may be stateful (EWM carries its recurrence);
        callers must build a FRESH closure per (series, model) rollout.

        Default: replay :meth:`pandas_fn` on the history extended with a NaN
        frontier target and take the last value — O(n) per step, the escape
        hatch for callable transforms; structured transforms override with
        O(window) numpy kernels that mirror their Spark expressions.
        """
        import numpy as np
        import pandas as pd

        pfn = self.pandas_fn(lag)

        def fn(y):
            s = pd.Series(np.append(y, np.nan))
            v = pfn(s).iloc[-1]
            return float(v) if v == v else float("nan")

        return fn


def _pop_legacy(kwargs, global_, groupby, partition_by):
    if "global" in kwargs:
        global_ = kwargs.pop("global")
    if kwargs:
        raise TypeError(f"Unexpected keyword arguments: {list(kwargs)}")
    return global_, groupby, partition_by


class Lag(_BaseLagTransform):
    """Plain lag. `/root/reference/mlforecast/lag_transforms.py:320-340`."""

    def __init__(self, lag: int):
        self.lag = lag

    def _get_name(self, lag: int) -> str:
        return f"lag{lag}"

    def __eq__(self, other):
        return isinstance(other, Lag) and self.lag == other.lag

    def update_samples(self, lag: int) -> int:
        return self.lag

    def expr(self, ctx, lag: int) -> Column:
        return ctx.shift(self.lag)

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None:
            return None
        return ctx.sql_shift(self.lag)

    def frontier_fn(self, lag: int):
        import numpy as np

        k = self.lag

        def fn(y):
            return float(y[-k]) if len(y) >= k else np.nan

        return fn


class LookupLag(_BaseLagTransform):
    """Previous value within ``(unique_id, *partition_by)`` buckets.

    `/root/reference/mlforecast/lag_transforms.py:375-482`.
    """

    def __init__(self, partition_by: Optional[Sequence[str]] = None):
        self.partition_by = _normalize_columns(partition_by)
        if not self.partition_by:
            raise ValueError(
                "LookupLag requires `partition_by`; it defines the buckets "
                "used for the occurrence lookup."
            )

    def _get_name(self, lag: int) -> str:
        return "partby_" + "__".join(self.partition_by) + f"_lookup_lag{lag}"

    def update_samples(self, lag: int) -> int:
        return -1  # the previous matching occurrence may be arbitrarily far back

    @property
    def is_pooled(self) -> bool:
        # handled as a local expression with a custom window, not a pooled plan
        return False

    def expr(self, ctx, lag: int) -> Column:
        w = ctx.window(extra_partition=tuple(self.partition_by))
        return F.lag(ctx.y, lag).over(w)

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None:
            return None
        return ctx.sql_shift(lag, extra_partition=tuple(self.partition_by))

    def frontier_fn(self, lag: int):
        raise NotImplementedError(
            "LookupLag buckets on extra columns the cogrouped predict engine "
            "does not carry; use predict(engine='spark')."
        )


class _RollingBase(_BaseLagTransform):
    """Rolling statistic. `/root/reference/mlforecast/lag_transforms.py:485-613`."""

    _agg: str = ""

    def __init__(
        self,
        window_size: int,
        min_samples: Optional[int] = None,
        global_: bool = False,
        groupby: Optional[Sequence[str]] = None,
        partition_by: Optional[Sequence[str]] = None,
        time_agg: Optional[str] = None,
        **kwargs,
    ):
        global_, groupby, partition_by = _pop_legacy(kwargs, global_, groupby, partition_by)
        self.window_size = window_size
        self.min_samples = min_samples
        self.global_ = global_
        self.groupby = _normalize_columns(groupby)
        self.partition_by = _normalize_columns(partition_by)
        self.time_agg = time_agg
        if self.global_ and self.groupby:
            raise ValueError("`global_` and `groupby` can't be used together.")
        _validate_time_agg(time_agg, self.global_, self.groupby)

    def _name_params(self):
        return [
            ("window_size", self.window_size, None),
            ("min_samples", self.min_samples, None),
            ("time_agg", self.time_agg, None),
        ]

    def _effective_min_samples(self) -> int:
        if self.min_samples is not None:
            ms = self.min_samples
        elif self.partition_by and not (self.global_ or self.groupby):
            ms = 1  # local partition mode default (see reference docstring)
        else:
            ms = self.window_size
        if not self.is_pooled:
            ms = min(ms, self.window_size)  # coreforecast caps in local mode
        return ms

    def update_samples(self, lag: int) -> int:
        return lag + self.window_size - 1

    def _stat(self, y: Column, w) -> Column:
        fn = {"mean": F.avg, "min": F.min, "max": F.max}[self._agg]
        return fn(y).over(w)

    def expr(self, ctx, lag: int) -> Column:
        w = ctx.frame(-(lag + self.window_size - 1), -lag)
        cnt = F.count(ctx.y).over(w)
        ms = self._effective_min_samples()
        return F.when(cnt >= max(ms, 1), self._stat(ctx.y, w))

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None or self._agg not in ("mean", "min", "max"):
            return None
        over = ctx.sql_over(-(lag + self.window_size - 1), -lag)
        if over is None:
            return None
        y = ctx.y_name
        ms = max(self._effective_min_samples(), 1)
        agg = {"mean": "avg", "min": "min", "max": "max"}[self._agg]
        return (
            f"case when count({y}) {over} >= {ms}"
            f" then {agg}({y}) {over} end"
        )

    def expr_partial_agg(self, ctx, lag: int) -> Optional[Column]:
        w = ctx.frame(-(lag + self.window_size - 1), -lag)
        ms = max(self._effective_min_samples(), 1)
        cnt = ctx.wcnt(w)
        if self._agg == "mean":
            return F.when(cnt >= ms, ctx.wsum(w) / cnt)
        if self._agg == "min":
            return F.when(cnt >= ms, ctx.wmin(w))
        if self._agg == "max":
            return F.when(cnt >= ms, ctx.wmax(w))
        return None

    def _frontier_window(self, lag: int):
        """Slice of history feeding the frontier row's window: rows
        ``n-lag-ws+1 .. n-lag`` for a frontier at position n = len(y)."""
        import numpy as np

        ws = self.window_size

        def window(y):
            n = len(y)
            hi = n - lag + 1
            if hi <= 0:
                return y[:0]
            vals = y[max(n - lag - ws + 1, 0) : hi]
            return vals[~np.isnan(vals)]

        return window

    def frontier_fn(self, lag: int):
        import numpy as np

        window = self._frontier_window(lag)
        ms = max(self._effective_min_samples(), 1)
        agg = {"mean": np.mean, "min": np.min, "max": np.max}[self._agg]

        def fn(y):
            vals = window(y)
            return float(agg(vals)) if len(vals) >= ms else np.nan

        return fn


class RollingMean(_RollingBase):
    _agg = "mean"


class RollingMin(_RollingBase):
    _agg = "min"


class RollingMax(_RollingBase):
    _agg = "max"


class RollingStd(_RollingBase):
    """Sample std via the reference's explicit sum/sum²/count formula with a
    clamp at zero (`/root/reference/mlforecast/lag_transforms.py:721-742`,
    mirrored by the oracle `tests/test_pooled_sqlite_oracle.py:33-45`)."""

    _agg = "std"

    def expr(self, ctx, lag: int) -> Column:
        w = ctx.frame(-(lag + self.window_size - 1), -lag)
        y = ctx.y
        s = F.sum(y).over(w)
        s2 = F.sum(y * y).over(w)
        cnt = F.count(y).over(w)
        ms = self._effective_min_samples()
        var = F.greatest((s2 - s * s / cnt) / (cnt - 1), F.lit(0.0))
        return F.when((cnt >= max(ms, 2)) & (cnt > 1), F.sqrt(var))

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None:
            return None
        over = ctx.sql_over(-(lag + self.window_size - 1), -lag)
        if over is None:
            return None
        y = ctx.y_name
        ms = max(self._effective_min_samples(), 2)
        s = f"sum({y}) {over}"
        s2 = f"sum({y} * {y}) {over}"
        cnt = f"count({y}) {over}"
        var = f"greatest((({s2}) - ({s}) * ({s}) / ({cnt})) / (({cnt}) - 1), 0.0D)"
        return (
            f"case when ({cnt}) >= {ms} and ({cnt}) > 1"
            f" then sqrt({var}) end"
        )

    def expr_partial_agg(self, ctx, lag: int) -> Column:
        w = ctx.frame(-(lag + self.window_size - 1), -lag)
        ms = self._effective_min_samples()
        cnt = ctx.wcnt(w)
        s = ctx.wsum(w)
        s2 = ctx.wsumsq(w)
        var = F.greatest((s2 - s * s / cnt) / (cnt - 1), F.lit(0.0))
        return F.when((cnt >= max(ms, 2)) & (cnt > 1), F.sqrt(var))

    def frontier_fn(self, lag: int):
        import math

        import numpy as np

        window = self._frontier_window(lag)
        ms = max(self._effective_min_samples(), 2)

        def fn(y):
            vals = window(y)
            cnt = len(vals)
            if cnt < ms:
                return np.nan
            s = float(vals.sum())
            s2 = float((vals * vals).sum())
            return math.sqrt(max((s2 - s * s / cnt) / (cnt - 1), 0.0))

        return fn


class RollingQuantile(_RollingBase):
    """Exact rolling quantile (numpy linear interpolation == Spark
    ``percentile``). `/root/reference/mlforecast/lag_transforms.py:949-992`."""

    def __init__(self, p: float, window_size: int, min_samples: Optional[int] = None, **kwargs):
        super().__init__(window_size=window_size, min_samples=min_samples, **kwargs)
        self.p = p

    def _name_params(self):
        return [("p", self.p, None)] + super()._name_params()

    def _stat(self, y: Column, w) -> Column:
        return F.percentile(y, F.lit(self.p)).over(w)

    def expr(self, ctx, lag: int) -> Column:
        w = ctx.frame(-(lag + self.window_size - 1), -lag)
        cnt = F.count(ctx.y).over(w)
        ms = self._effective_min_samples()
        return F.when(cnt >= max(ms, 1), self._stat(ctx.y, w))

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None:
            return None
        over = ctx.sql_over(-(lag + self.window_size - 1), -lag)
        if over is None:
            return None
        y = ctx.y_name
        ms = max(self._effective_min_samples(), 1)
        return (
            f"case when count({y}) {over} >= {ms}"
            f" then percentile({y}, {self.p!r}D) {over} end"
        )

    def frontier_fn(self, lag: int):
        import numpy as np

        window = self._frontier_window(lag)
        ms = max(self._effective_min_samples(), 1)
        p = self.p

        def fn(y):
            vals = window(y)
            # np.quantile 'linear' == Spark `percentile` interpolation
            return float(np.quantile(vals, p)) if len(vals) >= ms else np.nan

        return fn


class _ExpandingBase(_BaseLagTransform):
    """Expanding statistic. `/root/reference/mlforecast/lag_transforms.py:1184-1272`."""

    _agg: str = ""

    def __init__(
        self,
        global_: bool = False,
        groupby: Optional[Sequence[str]] = None,
        partition_by: Optional[Sequence[str]] = None,
        time_agg: Optional[str] = None,
        **kwargs,
    ):
        global_, groupby, partition_by = _pop_legacy(kwargs, global_, groupby, partition_by)
        self.global_ = global_
        self.groupby = _normalize_columns(groupby)
        self.partition_by = _normalize_columns(partition_by)
        self.time_agg = time_agg
        if self.global_ and self.groupby:
            raise ValueError("`global_` and `groupby` can't be used together.")
        _validate_time_agg(time_agg, self.global_, self.groupby)

    def _name_params(self):
        return [("time_agg", self.time_agg, None)]

    def update_samples(self, lag: int) -> int:
        return -1

    def expr(self, ctx, lag: int) -> Column:
        w = ctx.frame(None, -lag)
        y = ctx.y
        cnt = F.count(y).over(w)
        if self._agg == "std":
            s = F.sum(y).over(w)
            s2 = F.sum(y * y).over(w)
            var = F.greatest((s2 - s * s / cnt) / (cnt - 1), F.lit(0.0))
            return F.when(cnt > 1, F.sqrt(var))
        fn = {"mean": F.avg, "min": F.min, "max": F.max}[self._agg]
        return F.when(cnt > 0, fn(y).over(w))

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None or self._agg not in ("mean", "min", "max", "std"):
            return None
        over = ctx.sql_over(None, -lag)
        if over is None:
            return None
        y = ctx.y_name
        cnt = f"count({y}) {over}"
        if self._agg == "std":
            s = f"sum({y}) {over}"
            s2 = f"sum({y} * {y}) {over}"
            var = (
                f"greatest((({s2}) - ({s}) * ({s}) / ({cnt})) / (({cnt}) - 1),"
                f" 0.0D)"
            )
            return f"case when ({cnt}) > 1 then sqrt({var}) end"
        agg = {"mean": "avg", "min": "min", "max": "max"}[self._agg]
        return f"case when ({cnt}) > 0 then {agg}({y}) {over} end"

    def expr_partial_agg(self, ctx, lag: int) -> Optional[Column]:
        w = ctx.frame(None, -lag)
        cnt = ctx.wcnt(w)
        if self._agg == "mean":
            return F.when(cnt > 0, ctx.wsum(w) / cnt)
        if self._agg == "min":
            return F.when(cnt > 0, ctx.wmin(w))
        if self._agg == "max":
            return F.when(cnt > 0, ctx.wmax(w))
        if self._agg == "std":
            s = ctx.wsum(w)
            s2 = ctx.wsumsq(w)
            var = F.greatest((s2 - s * s / cnt) / (cnt - 1), F.lit(0.0))
            return F.when(cnt > 1, F.sqrt(var))
        return None

    def _frontier_window(self, lag: int):
        import numpy as np

        def window(y):
            hi = len(y) - lag + 1
            if hi <= 0:
                return y[:0]
            vals = y[:hi]
            return vals[~np.isnan(vals)]

        return window

    def frontier_fn(self, lag: int):
        import math

        import numpy as np

        window = self._frontier_window(lag)
        agg = self._agg

        def fn(y):
            vals = window(y)
            cnt = len(vals)
            if agg == "std":
                if cnt < 2:
                    return np.nan
                s = float(vals.sum())
                s2 = float((vals * vals).sum())
                return math.sqrt(max((s2 - s * s / cnt) / (cnt - 1), 0.0))
            if cnt < 1:
                return np.nan
            return float({"mean": np.mean, "min": np.min, "max": np.max}[agg](vals))

        return fn


class ExpandingMean(_ExpandingBase):
    _agg = "mean"


class ExpandingStd(_ExpandingBase):
    _agg = "std"


class ExpandingMin(_ExpandingBase):
    _agg = "min"


class ExpandingMax(_ExpandingBase):
    _agg = "max"


class ExpandingQuantile(_ExpandingBase):
    """`/root/reference/mlforecast/lag_transforms.py:1465-1499`.

    Scale note: in pooled ``global_`` mode this is the one transform with no
    partial-aggregate or bounded-join form (an exact expanding quantile needs
    every prior raw value), so it windows the raw rows through a single
    partition. The plan compiler REFUSES that plan unless
    ``allow_single_partition=True`` is passed — prefer ``RollingQuantile``
    with a long window (bounded-join scale path) or per-series/groupby
    scoping on very large panels."""

    def __init__(self, p: float, allow_single_partition: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.p = p
        self.allow_single_partition = allow_single_partition

    def _name_params(self):
        return [("p", self.p, None)] + super()._name_params()

    def expr(self, ctx, lag: int) -> Column:
        w = ctx.frame(None, -lag)
        cnt = F.count(ctx.y).over(w)
        return F.when(cnt > 0, F.percentile(ctx.y, F.lit(self.p)).over(w))

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None:
            return None
        over = ctx.sql_over(None, -lag)
        if over is None:
            return None
        y = ctx.y_name
        return (
            f"case when count({y}) {over} > 0"
            f" then percentile({y}, {self.p!r}D) {over} end"
        )

    def frontier_fn(self, lag: int):
        import numpy as np

        window = self._frontier_window(lag)
        p = self.p

        def fn(y):
            vals = window(y)
            return float(np.quantile(vals, p)) if len(vals) else np.nan

        return fn


class _SeasonalRollingBase(_BaseLagTransform):
    """Rolling statistic over same-phase seasonal positions
    (`/root/reference/mlforecast/lag_transforms.py:995-1132`): the window for
    position *o* covers ``o - lag - i*season_length`` for i in 0..ws-1.

    Spark strategy: lag the target by ``lag`` with the base per-series window,
    then aggregate over a ROWS window partitioned by
    ``(unique_id, ord % season_length)`` — same-phase rows are exactly
    ``season_length`` apart, so ``ROWS window_size-1 PRECEDING`` hits the
    seasonal positions without a self-join.
    """

    _agg: str = ""

    def __init__(
        self,
        season_length: int,
        window_size: int,
        min_samples: Optional[int] = None,
        global_: bool = False,
        groupby: Optional[Sequence[str]] = None,
        partition_by: Optional[Sequence[str]] = None,
        time_agg: Optional[str] = None,
        **kwargs,
    ):
        global_, groupby, partition_by = _pop_legacy(kwargs, global_, groupby, partition_by)
        self.season_length = season_length
        self.window_size = window_size
        self.min_samples = min_samples
        self.global_ = global_
        self.groupby = _normalize_columns(groupby)
        self.partition_by = _normalize_columns(partition_by)
        self.time_agg = time_agg
        _validate_time_agg(time_agg, self.global_, self.groupby)

    def _name_params(self):
        return [
            ("season_length", self.season_length, None),
            ("window_size", self.window_size, None),
            ("min_samples", self.min_samples, None),
        ]

    def update_samples(self, lag: int) -> int:
        if self.is_pooled:
            # pooled ordinals are parent-calendar positions which can outpace
            # per-series row counts — keep one extra season of slack
            # (matches `/root/reference/mlforecast/lag_transforms.py:1092`)
            return lag + self.season_length * self.window_size
        return lag + self.season_length * (self.window_size - 1)

    def _effective_min_samples(self) -> int:
        if self.min_samples is not None:
            ms = self.min_samples
        elif self.partition_by and not (self.global_ or self.groupby):
            ms = 1  # local partition mode default (see reference docstring)
        else:
            ms = self.window_size
        if not self.is_pooled:
            ms = min(ms, self.window_size)  # coreforecast caps in local mode
        return ms

    def _stat(self, y: Column, w) -> Column:
        fn = {"mean": F.avg, "min": F.min, "max": F.max}[self._agg]
        return fn(y).over(w)

    def expr(self, ctx, lag: int) -> Column:
        lagged = ctx.shift(lag)
        w = ctx.seasonal_frame(self.season_length, -(self.window_size - 1), 0)
        cnt = F.count(lagged).over(w)
        ms = self._effective_min_samples()
        if self._agg == "std":
            s = F.sum(lagged).over(w)
            s2 = F.sum(lagged * lagged).over(w)
            var = F.greatest((s2 - s * s / cnt) / (cnt - 1), F.lit(0.0))
            return F.when((cnt >= max(ms, 2)) & (cnt > 1), F.sqrt(var))
        if self._agg == "quantile":
            stat = F.percentile(lagged, F.lit(self.p)).over(w)
        else:
            stat = self._stat(lagged, w)
        return F.when(cnt >= max(ms, 1), stat)

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if ctx.y_name is None:
            return None
        lagged = ctx.sql_shift(lag)
        over = ctx.sql_seasonal_over(
            self.season_length, -(self.window_size - 1), 0
        )
        if lagged is None or over is None:
            return None
        cnt = f"count({lagged}) {over}"
        ms = self._effective_min_samples()
        if self._agg == "std":
            s = f"sum({lagged}) {over}"
            s2 = f"sum(({lagged}) * ({lagged})) {over}"
            var = (
                f"greatest((({s2}) - ({s}) * ({s}) / ({cnt})) / (({cnt}) - 1),"
                f" 0.0D)"
            )
            return (
                f"case when ({cnt}) >= {max(ms, 2)} and ({cnt}) > 1"
                f" then sqrt({var}) end"
            )
        if self._agg == "quantile":
            stat = f"percentile({lagged}, {self.p!r}D) {over}"
        else:
            agg = {"mean": "avg", "min": "min", "max": "max"}[self._agg]
            stat = f"{agg}({lagged}) {over}"
        return f"case when ({cnt}) >= {max(ms, 1)} then {stat} end"

    def frontier_fn(self, lag: int):
        import math

        import numpy as np

        sl, ws = self.season_length, self.window_size
        agg = self._agg
        p = getattr(self, "p", None)
        ms = max(self._effective_min_samples(), 2 if agg == "std" else 1)

        def fn(y):
            n = len(y)
            # same-phase rows n - i*sl, each contributing y[n - i*sl - lag]
            idxs = [n - lag - i * sl for i in range(ws)]
            vals = np.array([y[i] for i in idxs if i >= 0], dtype=np.float64)
            vals = vals[~np.isnan(vals)]
            cnt = len(vals)
            if cnt < ms:
                return np.nan
            if agg == "std":
                s = float(vals.sum())
                s2 = float((vals * vals).sum())
                return math.sqrt(max((s2 - s * s / cnt) / (cnt - 1), 0.0))
            if agg == "quantile":
                return float(np.quantile(vals, p))
            return float({"mean": np.mean, "min": np.min, "max": np.max}[agg](vals))

        return fn


class SeasonalRollingMean(_SeasonalRollingBase):
    _agg = "mean"


class SeasonalRollingStd(_SeasonalRollingBase):
    _agg = "std"


class SeasonalRollingMin(_SeasonalRollingBase):
    _agg = "min"


class SeasonalRollingMax(_SeasonalRollingBase):
    _agg = "max"


class SeasonalRollingQuantile(_SeasonalRollingBase):
    _agg = "quantile"

    def __init__(self, p: float, season_length: int, window_size: int, **kwargs):
        super().__init__(season_length=season_length, window_size=window_size, **kwargs)
        self.p = p

    def _name_params(self):
        return [("p", self.p, None)] + super()._name_params()


class ExponentiallyWeightedMean(_BaseLagTransform):
    """EWM (order-dependent recurrence ``s_t = a*y_t + (1-a)*s_{t-1}``,
    NaNs skipped). `/root/reference/mlforecast/lag_transforms.py:1530-1699`.

    Not expressible as a single Spark window aggregate. Two engines:

    - ``engine='pandas'`` (default): Arrow-batched ``applyInPandas`` pass per
      series (pooled: per bucket over the time_agg-collapsed frame). This is
      bit-exact with the reference's sequential evaluation order, which the
      DuckDB correctness oracle (list_reduce) shares — important because the
      driver hash-compares values after round(6), where even ulp-level
      reassociation noise can flip a rounding boundary.
    - ``engine='scan'``: fully JVM-side log-depth associative scan. The
      recurrence is linear (``s = A*s_prev + B`` with per-row
      ``A=1-a, B=a*y`` for observed values, identity for NaNs, ``A=0, B=y``
      at each series' first observation), so prefix states compose
      associatively and ceil(log2(max_len)) Hillis-Steele window passes —
      one sort, no Python — produce every row's EWM. Values agree with the
      pandas path to ~1e-12 relative (float reassociation only), which is
      why it is opt-in rather than the default under a hash-exact gate.
      Measured at sf1 (1.3M rows, 250 series): 1.3 s vs the Arrow path's
      1.2 s — no single-node wall-clock win; its value is removing the
      Python-worker stage from the fit plan (one sorted JVM stage end to
      end), which matters for cluster memory/deployment, not local speed.
    """

    def __init__(
        self,
        alpha: float,
        global_: bool = False,
        groupby: Optional[Sequence[str]] = None,
        partition_by: Optional[Sequence[str]] = None,
        time_agg: str = "mean",
        engine: str = "pandas",
        scan_rounds: Optional[int] = 31,
        **kwargs,
    ):
        global_, groupby, partition_by = _pop_legacy(kwargs, global_, groupby, partition_by)
        if engine not in ("pandas", "scan"):
            raise ValueError("engine must be 'pandas' or 'scan'")
        self.engine = engine
        self.scan_rounds = scan_rounds
        self.alpha = alpha
        self.global_ = global_
        self.groupby = _normalize_columns(groupby)
        self.partition_by = _normalize_columns(partition_by)
        if time_agg is None:
            raise ValueError("ExponentiallyWeightedMean requires a time_agg (default 'mean').")
        if time_agg != "mean" and not (self.global_ or self.groupby):
            raise ValueError("time_agg values other than 'mean' require `global_` or `groupby`.")
        # local mode: one row per timestamp, time_agg='mean' is an identity
        self.time_agg = time_agg if self.is_pooled else None

    def _name_params(self):
        return [
            ("alpha", self.alpha, None),
            ("time_agg", self.time_agg if self.is_pooled else "mean", "mean"),
        ]

    @property
    def mode_key(self):
        return (
            bool(self.global_),
            tuple(self.groupby or ()),
            tuple(self.partition_by or ()),
            self.time_agg if self.is_pooled else None,
        )

    def update_samples(self, lag: int) -> int:
        return -1

    def expr(self, ctx, lag: int):
        return None  # python path (or multipass scan, see below)

    @property
    def use_multipass(self) -> bool:
        return self.engine == "scan" and not self.is_pooled

    def multipass_apply(self, df, schema, lag: int, out_name: str):
        """engine='scan': Hillis-Steele prefix scan over the linear
        recurrence, entirely in window expressions. Each round composes a
        row's affine state ``(A, B)`` with the state ``2^k`` rows back
        (``g∘f = (Ag·Af, Ag·Bf + Bg)``); all rounds share one window spec so
        Spark sorts each partition once. ``scan_rounds`` defaults to 31
        (covers series up to 2^31 rows — the JVM int window-offset limit;
        extra rounds compose with the identity, so over-provisioning is
        correct) — plan construction stays action-free by default. Pass a
        smaller value when series lengths are known, or
        ``scan_rounds=None`` to OPT IN to deriving
        ceil(log2(longest series)) with one count job at plan time. Steps
        are clamped at 2^30 so offsets never overflow int32; rounds past
        the clamp extend coverage linearly (2^30 rows per round)."""
        import math

        a = float(self.alpha)
        w = Window.partitionBy(schema.id_col).orderBy(schema.time_col)
        rounds = self.scan_rounds
        if rounds is None:
            max_len = (
                df.groupBy(schema.id_col).count().agg(F.max("count")).collect()[0][0]
                or 1
            )
            rounds = max(1, math.ceil(math.log2(max_len))) if max_len > 1 else 0
        yl = F.lag(F.col(schema.target_col), lag).over(w)
        j = F.count(yl).over(w.rowsBetween(Window.unboundedPreceding, 0))
        nn = yl.isNotNull()
        first = nn & (j == 1)
        df = (
            df.withColumn("_ewm_j", j)
            .withColumn(
                "_ewm_A",
                F.when(first, F.lit(0.0))
                .when(nn, F.lit(1.0 - a))
                .otherwise(F.lit(1.0)),
            )
            .withColumn(
                "_ewm_B",
                F.when(first, F.lag(F.col(schema.target_col), lag).over(w))
                .when(nn, F.lit(a) * F.lag(F.col(schema.target_col), lag).over(w))
                .otherwise(F.lit(0.0)),
            )
        )
        from .utils import qsql

        over = (
            f"over (partition by {qsql(schema.id_col)} order by "
            f"{qsql(schema.time_col)})"
        )
        keep = [qsql(c) for c in df.columns if c not in ("_ewm_A", "_ewm_B")]
        step = 1
        for _ in range(rounds):
            # one selectExpr per round (the 6-op withColumn/rename chain per
            # round built ~250 py4j DataFrame nodes at the default 31 rounds)
            df = df.selectExpr(
                *keep,
                f"_ewm_A * coalesce(lag(_ewm_A, {step}) {over}, 1.0D) as _ewm_A",
                f"_ewm_A * coalesce(lag(_ewm_B, {step}) {over}, 0.0D) + _ewm_B"
                f" as _ewm_B",
            )
            step = min(step * 2, 1 << 30)
        return df.withColumn(
            out_name, F.when(F.col("_ewm_j") > 0, F.col("_ewm_B"))
        ).drop("_ewm_A", "_ewm_B", "_ewm_j")

    def pandas_fn(self, lag: int):
        alpha = self.alpha

        def fn(s):
            return s.shift(lag).ewm(alpha=alpha, adjust=False, ignore_na=True).mean()

        return fn

    def frontier_fn(self, lag: int):
        """STATEFUL kernel: the recurrence advances from a carried scalar —
        the first call folds the whole history (the analogue of
        ``_initial_ewm_carry``), every later call consumes only the newly
        available lagged value: O(1) per step."""
        import numpy as np

        a = self.alpha
        state = {"e": np.nan, "next": 0}

        def fn(y):
            last = len(y) - lag  # frontier at n uses lagged values y[..n-lag]
            e = state["e"]
            i = state["next"]
            while i <= last:
                v = y[i]
                if v == v:  # skip NaN (ignore_na=True, adjust=False)
                    e = v if e != e else a * v + (1 - a) * e
                i += 1
            state["e"], state["next"] = e, i
            return e

        return fn


class Offset(_BaseLagTransform):
    """Shift series before the inner transform: equivalent to running the
    inner transform at ``lag + n``. `/root/reference/mlforecast/lag_transforms.py:1702-1763`."""

    def __init__(self, tfm: _BaseLagTransform, n: int):
        self.tfm = tfm
        self.n = n
        self.global_ = getattr(tfm, "global_", False)
        self.groupby = getattr(tfm, "groupby", None)
        self.partition_by = getattr(tfm, "partition_by", None)
        self.time_agg = getattr(tfm, "time_agg", None)

    def _get_name(self, lag: int) -> str:
        return self.tfm._get_name(lag + self.n)

    def update_samples(self, lag: int) -> int:
        inner = self.tfm.update_samples(lag + self.n)
        return -1 if inner == -1 else inner

    def expr(self, ctx, lag: int):
        if lag + self.n < 1:
            raise ValueError(
                f"Offset(n={self.n}) applied to lag {lag} produces an effective "
                f"lag of {lag + self.n}; the effective lag must be at least 1."
            )
        return self.tfm.expr(ctx, lag + self.n)

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        if lag + self.n < 1:
            raise ValueError(
                f"Offset(n={self.n}) applied to lag {lag} produces an effective "
                f"lag of {lag + self.n}; the effective lag must be at least 1."
            )
        return self.tfm.sql_expr(ctx, lag + self.n)

    def pandas_fn(self, lag: int):
        return self.tfm.pandas_fn(lag + self.n)

    def frontier_fn(self, lag: int):
        return self.tfm.frontier_fn(lag + self.n)


class Combine(_BaseLagTransform):
    """Binary operator over two transforms.
    `/root/reference/mlforecast/lag_transforms.py:1766-1885`."""

    def __init__(self, tfm1: _BaseLagTransform, tfm2: _BaseLagTransform, operator: Callable):
        self.tfm1 = tfm1
        self.tfm2 = tfm2
        self.operator = operator
        if getattr(tfm1, "global_", False) != getattr(tfm2, "global_", False):
            raise ValueError("Can't combine transforms with different global_ settings.")
        g1, g2 = getattr(tfm1, "groupby", None), getattr(tfm2, "groupby", None)
        if (g1 or g2) and g1 != g2:
            raise ValueError("Can't combine transforms with different groupby settings.")
        p1, p2 = getattr(tfm1, "partition_by", None), getattr(tfm2, "partition_by", None)
        if (p1 or p2) and p1 != p2:
            raise ValueError("Can't combine transforms with different partition_by settings.")
        self.global_ = getattr(tfm1, "global_", False)
        self.groupby = g1
        self.partition_by = p1
        self.time_agg = getattr(tfm1, "time_agg", None)

    def _get_name(self, lag: int) -> str:
        lag1 = getattr(self.tfm1, "lag", lag)
        lag2 = getattr(self.tfm2, "lag", lag)
        return f"{self.tfm1._get_name(lag1)}_{self.operator.__name__}_{self.tfm2._get_name(lag2)}"

    def update_samples(self, lag: int) -> int:
        u1, u2 = self.tfm1.update_samples(lag), self.tfm2.update_samples(lag)
        return -1 if -1 in (u1, u2) else max(u1, u2)

    _OP_COLS = {
        operator.truediv: lambda a, b: a / b,
        operator.add: lambda a, b: a + b,
        operator.sub: lambda a, b: a - b,
        operator.mul: lambda a, b: a * b,
    }

    def expr(self, ctx, lag: int):
        e1 = self.tfm1.expr(ctx, lag)
        e2 = self.tfm2.expr(ctx, lag)
        if e1 is None or e2 is None:
            return None  # at least one side needs the pandas path
        op = self._OP_COLS.get(self.operator, self.operator)
        return op(e1, e2)

    _OP_SQL = {
        operator.truediv: "/",
        operator.add: "+",
        operator.sub: "-",
        operator.mul: "*",
    }

    def sql_expr(self, ctx, lag: int) -> Optional[str]:
        op = self._OP_SQL.get(self.operator)
        if op is None:
            return None  # arbitrary callables keep the Column/pandas path
        s1 = self.tfm1.sql_expr(ctx, lag)
        s2 = self.tfm2.sql_expr(ctx, lag)
        if s1 is None or s2 is None:
            return None
        return f"(({s1}) {op} ({s2}))"

    def pandas_fn(self, lag: int):
        # only reached when a side is python-only (e.g. Combine(EWM, Lag))
        import pandas as pd  # noqa: F401

        tfm1, tfm2, op = self.tfm1, self.tfm2, self.operator

        def _side(tfm, s, lag):
            e = None
            try:
                fn = tfm.pandas_fn(lag)
                return fn(s)
            except NotImplementedError:
                pass
            raise NotImplementedError(
                "Combine with a mixed expression/python side is computed "
                "column-wise by the planner"
            )

        def fn(s):
            return op(_side(tfm1, s, lag), _side(tfm2, s, lag))

        return fn

    def frontier_fn(self, lag: int):
        import numpy as np

        f1 = self.tfm1.frontier_fn(lag)
        f2 = self.tfm2.frontier_fn(lag)
        opr = self.operator
        op = self._OP_COLS.get(opr, opr)

        def fn(y):
            v1, v2 = np.float64(f1(y)), np.float64(f2(y))
            # Spark SQL x/0 -> NULL (non-ANSI); mirror that instead of inf
            if opr is operator.truediv and (v2 != v2 or v2 == 0.0):
                return np.nan
            return float(op(v1, v2))

        return fn
