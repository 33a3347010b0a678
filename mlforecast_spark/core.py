"""Feature-plan compiler: turns the transforms registry into one lazy
Spark DataFrame DAG.

This is the Spark-native replacement for the reference's ``TimeSeries``
(`/root/reference/mlforecast/core.py:152-1059`). Key differences in HOW while
preserving WHAT:

- The panel stays one distributed DataFrame; there is no ``GroupedArray``.
  ``Window.partitionBy(id).orderBy(ds)`` replaces indptr slicing.
- All expression-capable transforms for a given window spec are emitted in a
  single ``select`` so Catalyst fuses them into one ``WindowExec`` pass per
  distinct (partition, order, frame-type) spec — the per-series shuffle/sort
  happens once regardless of how many features are requested.
- Pooled transforms (``global_``/``groupby``/``partition_by``/``time_agg``,
  `/root/reference/mlforecast/pooled.py:475-815`) compile to
  agg → range-window over a dense time ordinal → (for time_agg) join-back.
  This is the plan shape the reference's own SQL oracle uses
  (`/root/reference/tests/test_pooled_sqlite_oracle.py:115-213`). Because the
  engine is not sharded by series id, pooled transforms work distributed —
  something the reference's own distributed mode forbids
  (`/root/reference/mlforecast/distributed/forecast.py:128-146`).
- Only order-dependent recurrences (EWM) leave the JVM, via one Arrow-batched
  ``applyInPandas`` pass per (mode, sort) group.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .date_features import DateFeature, apply_date_features
from .lag_transforms import Combine, Lag, _BaseLagTransform
from .utils import Freq, qcol

ORD_COL = "_mlfs_ord"

LagTransform = _BaseLagTransform
LagTransforms = dict[int, Sequence[Union[LagTransform, Callable, tuple]]]


@dataclass
class PanelSchema:
    id_col: str = "unique_id"
    time_col: str = "ds"
    target_col: str = "y"


class _CallableTransform(_BaseLagTransform):
    """Legacy callable lag transform ``fn(series, *args)`` — the UDF escape
    hatch (`/root/reference/mlforecast/grouped_array.py:24-57`). Runs on the
    pandas path per series."""

    def __init__(self, fn: Callable, args: tuple = ()):
        self.fn = fn
        self.args = args

    def _get_name(self, lag: int) -> str:
        name = f"{self.fn.__name__}_lag{lag}"
        if self.args:
            name += "_" + "_".join(str(a) for a in self.args)
        return name

    def update_samples(self, lag: int) -> int:
        return -1

    def expr(self, ctx, lag: int):
        return None

    def pandas_fn(self, lag: int):
        fn, args = self.fn, self.args

        def run(s):
            import pandas as pd

            res = fn(s.shift(lag).to_numpy(), *args)
            return pd.Series(res, index=s.index)

        return run


def _parse_transforms(
    lags: Sequence[int],
    lag_transforms: Optional[LagTransforms],
    namer: Optional[Callable] = None,
) -> "OrderedDict[str, tuple[int, _BaseLagTransform]]":
    """Build the ordered name → (lag, transform) registry
    (mirrors `/root/reference/mlforecast/core.py:193-213`; ``namer`` is the
    custom `lag_transforms_namer`, `core.py:107-114`)."""
    registry: OrderedDict[str, tuple[int, _BaseLagTransform]] = OrderedDict()
    for lag in lags or []:
        tfm = Lag(lag)
        registry[tfm._get_name(lag)] = (lag, tfm)
    for lag, tfms in (lag_transforms or {}).items():
        for tfm in tfms:
            if isinstance(tfm, tuple):
                tfm = _CallableTransform(tfm[0], tfm[1:])
            elif callable(tfm) and not isinstance(tfm, _BaseLagTransform):
                tfm = _CallableTransform(tfm)
            name = namer(tfm, lag) if namer is not None else tfm._get_name(lag)
            if name in registry:
                raise ValueError(f"Duplicate feature name: {name}")
            registry[name] = (lag, tfm)
    return registry


@dataclass
class FrameCtx:
    """What a transform needs to emit its Column (local mode)."""

    y: Column
    id_col: str
    time_col: str
    use_range: bool = False
    order_col: Optional[str] = None  # ordinal column for range frames
    partition_cols: tuple = ()
    # Backtick-quoted SQL identifier of the target column. Set ONLY by the
    # local rows-frame plan in FeaturePlan.apply — its presence is what
    # enables the transforms' sql_expr() fast path (whole feature column as
    # one SQL string parsed JVM-side instead of node-by-node py4j Column
    # construction; the same plan-build-floor fix as the simhash/minhash/
    # Gram rewrites, measured ~9x cheaper at wide plans). Pooled/range
    # contexts leave it None and keep the Column path.
    y_name: Optional[str] = None

    # --- SQL-string emission (mirrors _base/frame/shift exactly) ---------
    def _sql_part_order(self, extra_partition: tuple = ()) -> Optional[str]:
        from .utils import qsql

        parts = [qsql(c) for c in (*self.partition_cols, *extra_partition)]
        if not parts or self.use_range:
            return None  # pooled/global/range modes stay on the Column path
        order = qsql(self.order_col if self.use_range else self.time_col)
        return f"partition by {', '.join(parts)} order by {order}"

    @staticmethod
    def _sql_bound(v: Optional[int]) -> str:
        if v is None:
            return "unbounded preceding"
        if v == 0:
            return "current row"
        return f"{-v} preceding" if v < 0 else f"{v} following"

    def sql_over(
        self, lo: Optional[int], hi: int, extra_partition: tuple = ()
    ) -> Optional[str]:
        base = self._sql_part_order(extra_partition)
        if base is None:
            return None
        return (
            f"over ({base} rows between {self._sql_bound(lo)}"
            f" and {self._sql_bound(hi)})"
        )

    def sql_shift(self, n: int, extra_partition: tuple = ()) -> Optional[str]:
        base = self._sql_part_order(extra_partition)
        if base is None or self.y_name is None:
            return None
        return f"lag({self.y_name}, {int(n)}) over ({base})"

    def sql_seasonal_over(
        self, season_length: int, lo: int, hi: int
    ) -> Optional[str]:
        from .utils import qsql

        if self.use_range or not self.partition_cols:
            return None
        parts = [qsql(c) for c in self.partition_cols] + [
            f"pmod({qsql(ORD_COL)}, {int(season_length)})"
        ]
        return (
            f"over (partition by {', '.join(parts)} order by "
            f"{qsql(self.time_col)} rows between {self._sql_bound(lo)}"
            f" and {self._sql_bound(hi)})"
        )

    def _base(self, extra_partition: tuple = ()) -> WindowSpec:
        parts = [F.col(c) for c in (*self.partition_cols, *extra_partition)]
        order = F.col(self.order_col if self.use_range else self.time_col)
        if not parts:
            # global pooled mode: constant partition (single logical series);
            # acceptable because it only runs over per-timestamp aggregates
            return Window.partitionBy(F.lit(0)).orderBy(order)
        return Window.partitionBy(*parts).orderBy(order)

    def frame(self, lo: Optional[int], hi: int, extra_partition: tuple = ()) -> WindowSpec:
        w = self._base(extra_partition)
        lo_b = Window.unboundedPreceding if lo is None else lo
        if self.use_range:
            return w.rangeBetween(lo_b, hi)
        return w.rowsBetween(lo_b, hi)

    def shift(self, n: int) -> Column:
        return F.lag(self.y, n).over(self._base())

    def seasonal_frame(self, season_length: int, lo: int, hi: int) -> WindowSpec:
        phase = F.pmod(F.col(ORD_COL), F.lit(season_length))
        parts = [F.col(c) for c in self.partition_cols] + [phase]
        return (
            Window.partitionBy(*parts)
            .orderBy(F.col(self.time_col))
            .rowsBetween(lo, hi)
        )

    def window(self, extra_partition: tuple = ()) -> WindowSpec:
        return self._base(extra_partition)

    # windowed per-timestamp partial aggregates (pooled fast path)
    def wsum(self, w: WindowSpec) -> Column:
        return F.sum(F.col("_psum")).over(w)

    def wcnt(self, w: WindowSpec) -> Column:
        return F.sum(F.col("_pcnt")).over(w)

    def wsumsq(self, w: WindowSpec) -> Column:
        return F.sum(F.col("_psumsq")).over(w)

    def wmin(self, w: WindowSpec) -> Column:
        return F.min(F.col("_pmin")).over(w)

    def wmax(self, w: WindowSpec) -> Column:
        return F.max(F.col("_pmax")).over(w)


_TIME_AGG_FN = {"sum": F.sum, "count": F.count, "mean": F.avg, "min": F.min, "max": F.max}


def _null_safe_key(df: DataFrame, col: str) -> Column:
    """NaN == null for bucket keys (`/root/reference/mlforecast/pooled.py:21-66`).

    Returns a reference bound to ``df`` so self-join conditions stay
    unambiguous."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.nanvl(df[col], F.lit(None))
    return df[col]


@dataclass
class FeaturePlan:
    """Compiles the transforms registry against a panel DataFrame."""

    schema: PanelSchema
    registry: "OrderedDict[str, tuple[int, _BaseLagTransform]]"
    date_features: Sequence[DateFeature] = field(default_factory=list)
    date_features_as_dummies: bool = False
    # Join-back strategy for pooled features: the collapsed feature frame
    # (one row per (bucket, ts)) is joined back onto every raw row. None =
    # auto: broadcast it when there are NO bucket keys (global_ modes — the
    # frame is at most |calendar| rows, safely broadcastable at any panel
    # scale, and broadcasting spares the full panel a sort+shuffle for the
    # sort-merge join). True = force the broadcast for bucketed modes too —
    # an explicit caller assertion that |buckets| x |calendar| is small
    # (e.g. a handful of regions); False = never (calendars beyond ~10M
    # rows). Bucketed modes stay shuffle-join by default because bucket
    # cardinality is unknowable at plan time and a wrong broadcast OOMs
    # the driver.
    join_back_broadcast: Optional[bool] = None

    # ------------------------------------------------------------------
    def feature_names(self) -> list[str]:
        from .date_features import dummy_feature_names

        names = list(self.registry)
        names += dummy_feature_names(self.date_features, self.date_features_as_dummies)
        return names

    def keep_last_n_bound(self, exclude_carried: bool = False) -> Optional[int]:
        """Max rows of history any transform needs for a one-step update
        (mirrors `/root/reference/mlforecast/core.py:404-425`); None = all.

        With ``exclude_carried`` the carried-state EWM features don't force
        unbounded history (their recursion advances from a carried column, so
        only ``lag`` rows back are needed)."""
        carried = set(self.carried_ewm_features()) if exclude_carried else set()
        bound = 0
        for name, (lag, tfm) in self.registry.items():
            if name in carried:
                bound = max(bound, lag)
                continue
            u = tfm.update_samples(lag)
            if u == -1:
                return None
            bound = max(bound, u)
        return bound

    def carried_ewm_features(self) -> dict:
        """Local-mode EWM features whose predict-path value can advance via
        ``ewm' = α·y[t'-lag] + (1-α)·ewm`` from a carried per-series column —
        the engine's analogue of the reference's O(1) ``update`` path
        (`/root/reference/mlforecast/lag_transforms.py:280-281`)."""
        from .lag_transforms import ExponentiallyWeightedMean

        out = {}
        for name, (lag, tfm) in self.registry.items():
            if isinstance(tfm, ExponentiallyWeightedMean) and not tfm.is_pooled:
                out[name] = (lag, tfm)
        return out

    def _needs_ord(self) -> bool:
        from .lag_transforms import _SeasonalRollingBase

        def seasonal(t):
            if isinstance(t, _SeasonalRollingBase):
                return True
            if isinstance(t, Combine):
                return seasonal(t.tfm1) or seasonal(t.tfm2)
            inner = getattr(t, "tfm", None)
            return seasonal(inner) if inner is not None else False

        return any(seasonal(t) for _, t in self.registry.values())

    # ------------------------------------------------------------------
    def apply(self, df: DataFrame) -> DataFrame:
        """Attach every feature column; stays lazy."""
        s = self.schema
        local_exprs: dict[str, Column] = {}
        python_local: dict[str, tuple[int, _BaseLagTransform]] = {}
        pooled: dict[tuple, dict[str, tuple[int, _BaseLagTransform]]] = {}

        if self._needs_ord():
            w = Window.partitionBy(s.id_col).orderBy(s.time_col)
            df = df.withColumn(ORD_COL, F.row_number().over(w) - 1)

        from .utils import qsql

        ctx = FrameCtx(
            y=F.col(s.target_col),
            id_col=s.id_col,
            time_col=s.time_col,
            partition_cols=(s.id_col,),
            y_name=qsql(s.target_col),
        )
        multipass: dict[str, tuple[int, _BaseLagTransform]] = {}
        for name, (lag, tfm) in self.registry.items():
            if tfm.is_pooled:
                pooled.setdefault(tfm.mode_key, {})[name] = (lag, tfm)
                continue
            sql = tfm.sql_expr(ctx, lag)
            if sql is not None:
                local_exprs[name] = F.expr(sql)
                continue
            col = tfm.expr(ctx, lag)
            if col is not None:
                local_exprs[name] = col
            elif getattr(tfm, "use_multipass", False):
                # order-dependent recurrences (EWM engine='scan') that
                # compile to a chain of window passes instead of one
                # expression or a Python fallback
                multipass[name] = (lag, tfm)
            elif isinstance(tfm, Combine):
                self._plan_mixed_combine(name, lag, tfm, ctx, local_exprs, python_local)
            else:
                python_local[name] = (lag, tfm)

        # Python-path features (EWM engine='pandas') cross the Arrow
        # boundary, and applyInPandas ships every column of its input both
        # ways — so run that pass FIRST, on the narrow base frame (id, time,
        # y [+statics]), not after the JVM window features have widened it
        # (wide_feature_matrix: 24 columns through Arrow for one EWM input).
        # Order is free: every engine's features are functions of
        # (id, time, y) only, rows pass through unchanged, and consumers
        # select features by name. The pandas pass clusters by id, which the
        # feature windows' partitionBy(id) then reuses — same exchange count
        # as the old order.
        if python_local:
            df = self._apply_python_local(df, python_local)
        if local_exprs:
            df = df.select("*", *[c.alias(n) for n, c in local_exprs.items()])
        for name, (lag, tfm) in multipass.items():
            df = tfm.multipass_apply(df, s, lag, name)
        # mixed Combines need both the python-side and expression-side
        # hidden columns on the frame, so they finish only after both passes
        df = self._finish_combines(df)
        for mode_key, feats in pooled.items():
            df = self._apply_pooled(df, mode_key, feats)
        if self.date_features:
            df, _ = apply_date_features(
                df, s.time_col, self.date_features, self.date_features_as_dummies
            )
        if ORD_COL in df.columns:
            df = df.drop(ORD_COL)
        return df

    # ------------------------------------------------------------------
    def _plan_mixed_combine(self, name, lag, tfm, ctx, local_exprs, python_local):
        """Combine with one python side: compute sides as hidden features then
        apply the operator column-wise."""
        n1, n2 = f"_mlfs_c1_{name}", f"_mlfs_c2_{name}"
        for side_name, side in ((n1, tfm.tfm1), (n2, tfm.tfm2)):
            e = side.expr(ctx, lag)
            if e is not None:
                local_exprs[side_name] = e
            else:
                python_local[side_name] = (lag, side)
        op = Combine._OP_COLS.get(tfm.operator, tfm.operator)
        self._pending_combines = getattr(self, "_pending_combines", [])
        self._pending_combines.append((name, n1, n2, op))

    def _finish_combines(self, df: DataFrame) -> DataFrame:
        from .utils import qcol

        for name, n1, n2, op in getattr(self, "_pending_combines", []):
            if n1 in df.columns and n2 in df.columns:
                # qcol: the hidden side names inherit the feature's
                # reference-parity name, which may contain dots (alpha0.5)
                df = df.withColumn(name, op(qcol(n1), qcol(n2))).drop(
                    qcol(n1), qcol(n2)
                )
        self._pending_combines = []
        return df

    # ------------------------------------------------------------------
    def _apply_python_local(
        self, df: DataFrame, feats: dict[str, tuple[int, _BaseLagTransform]]
    ) -> DataFrame:
        """One Arrow-batched applyInPandas pass per series computing every
        python-path feature; rows pass through so no join-back is needed."""
        import pandas as pd

        s = self.schema
        fns = {name: tfm.pandas_fn(lag) for name, (lag, tfm) in feats.items()}
        # pyspark's applyInPandas references pass-through columns unquoted
        # (df[col] per column), so dotted feature names (alpha0.5, p0.5...)
        # already on the frame would fail to resolve — shield them behind
        # temporary safe names for the pandas pass (zero-cost projections)
        unsafe = [c for c in df.columns if "." in c]
        safe_of = {c: f"_mlfs_safe_{i}" for i, c in enumerate(unsafe)}
        if safe_of:
            df = df.withColumnsRenamed(safe_of)
        out_schema = T.StructType(
            df.schema.fields + [T.StructField(n, T.DoubleType()) for n in fns]
        )
        time_col, target_col = s.time_col, s.target_col

        def compute(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col)
            ser = pdf[target_col].astype("float64")
            for n, fn in fns.items():
                pdf[n] = fn(ser).to_numpy()
            return pdf

        res = df.groupBy(s.id_col).applyInPandas(compute, schema=out_schema)
        if safe_of:
            res = res.withColumnsRenamed({v: k for k, v in safe_of.items()})
        return res

    # ------------------------------------------------------------------
    def _mode_cols(self, mode_key) -> tuple[list[str], list[str]]:
        """(parent_scope_cols, bucket_cols) for a pooled mode
        (`/root/reference/mlforecast/pooled.py:475-518` semantics)."""
        global_, groupby, partition_by, _ = mode_key
        s = self.schema
        if global_:
            parent: list[str] = []
        elif groupby:
            parent = list(groupby)
        else:  # local partition mode
            parent = [s.id_col]
        bucket = parent + list(partition_by)
        return parent, bucket

    def _apply_pooled(self, df: DataFrame, mode_key, feats) -> DataFrame:
        global_, groupby, partition_by, time_agg = mode_key
        s = self.schema
        parent, bucket = self._mode_cols(mode_key)

        ord_name = f"_mlfs_ord_{abs(hash(mode_key)) % 10**8}"

        # NaN/null-unified bucket keys: float keys get a materialized
        # normalized column so window partitioning unifies NaN with NULL
        # (`/root/reference/mlforecast/pooled.py:21-66`)
        norm_name: dict[str, str] = {}
        temp_keys: list[str] = []
        for c in bucket:
            dt = df.schema[c].dataType
            if isinstance(dt, (T.DoubleType, T.FloatType)):
                nc = f"_mlfs_k_{c}"
                df = df.withColumn(nc, F.nanvl(F.col(c), F.lit(None)))
                norm_name[c] = nc
                temp_keys.append(nc)
            else:
                norm_name[c] = c
        parent_keys = [norm_name.get(c, c) for c in parent]
        bucket = [norm_name[c] for c in bucket]

        # seasonal rolling needs a phase-keyed join (the output row's phase
        # differs from its source rows' phase whenever lag % season_length
        # != 0, which no single window partitioning can express) — peel those
        # off before the window-expression probe
        from .lag_transforms import _SeasonalRollingBase

        seasonal_feats = {
            n: v for n, v in feats.items() if isinstance(v[1], _SeasonalRollingBase)
        }
        feats = {n: v for n, v in feats.items() if n not in seasonal_feats}

        expr_feats, py_feats = {}, {}
        probe = FrameCtx(
            y=F.col(s.target_col),
            id_col=s.id_col,
            time_col=s.time_col,
            use_range=True,
            order_col=ord_name,
            partition_cols=tuple(bucket),
        )
        for name, (lag, tfm) in feats.items():
            if tfm.expr(probe, lag) is None:
                py_feats[name] = (lag, tfm)
            else:
                expr_feats[name] = (lag, tfm)
        agg_feats: dict[str, tuple] = {}
        row_feats: dict[str, tuple] = {}
        if time_agg is None:
            for name, (lag, tfm) in expr_feats.items():
                if tfm.expr_partial_agg(probe, lag) is not None:
                    agg_feats[name] = (lag, tfm)
                else:
                    row_feats[name] = (lag, tfm)

        # Attach the parent-calendar ordinal to the RAW rows only when a
        # consumer genuinely reads it per-row (seasonal phase joins, rolling
        # quantiles' bounded joins, python EWM over raw rows). The pure
        # partial-aggregate path (and time_agg collapse) derives the ordinal
        # on the COLLAPSED frame instead (`_collapsed_ord`), which saves a
        # full raw-frame scan + distinct shuffle + broadcast join per pooled
        # mode — the dominant fixed cost in FLOOR_DECOMPOSITION.json's
        # 14-16-job pooled plans.
        needs_raw_ord = bool(seasonal_feats) or (
            time_agg is None and bool(row_feats or py_feats)
        )
        if needs_raw_ord:
            if s.id_col in parent:
                # per-series parent scope: dense_rank parallelizes across series
                w_parent = Window.partitionBy(*parent).orderBy(s.time_col)
                df = df.withColumn(ord_name, F.dense_rank().over(w_parent) - 1)
            else:
                # global/group parent scope: ranking the raw rows would funnel
                # everything through one (or few) window partitions. Rank the
                # DISTINCT (parent, ts) calendar instead (tiny) and join back;
                # AQE broadcasts the calendar.
                ord_src = df.select(*parent, s.time_col).distinct()
                w_cal = (
                    Window.partitionBy(*parent).orderBy(s.time_col)
                    if parent
                    else Window.partitionBy(F.lit(0)).orderBy(s.time_col)
                )
                ord_src = ord_src.withColumn(ord_name, F.row_number().over(w_cal) - 1)
                df = df.join(F.broadcast(ord_src), on=[*parent, s.time_col], how="left")
        key_cols = {c: df[c] for c in bucket}

        if seasonal_feats:
            df = self._apply_pooled_seasonal(
                df, bucket, ord_name, key_cols, seasonal_feats, time_agg
            )
            key_cols = {c: df[c] for c in bucket}
        if not feats:
            return df.drop(ord_name, *temp_keys)

        if time_agg is None:
            # Scale path: mean/std/min/max roll up from per-(bucket, ts)
            # PARTIAL aggregates — groupBy (parallel) + window over the tiny
            # collapsed frame + join back, the reference's own
            # `_TimestampAggregates` strategy (`pooled.py:183-218`). Windowing
            # the raw rows directly would put every row of a bucket (ALL rows,
            # for global_) into one window partition — a scale cliff. Only
            # quantiles (no partial form) keep the row-level window.
            if agg_feats:
                y = F.col(s.target_col)
                group_col = ord_name if needs_raw_ord else s.time_col
                collapsed = df.groupBy(
                    *[key_cols[c].alias(c) for c in bucket], F.col(group_col)
                ).agg(
                    F.sum(y).alias("_psum"),
                    F.count(y).alias("_pcnt"),
                    F.sum(y * y).alias("_psumsq"),
                    F.min(y).alias("_pmin"),
                    F.max(y).alias("_pmax"),
                )
                collapsed = self._coalesce_collapsed(collapsed, bucket)
                if not needs_raw_ord:
                    collapsed = self._collapsed_ord(
                        collapsed, parent_keys, bucket, ord_name
                    )
                cctx = FrameCtx(
                    y=F.col("_psum"),
                    id_col=s.id_col,
                    time_col=s.time_col,
                    use_range=True,
                    order_col=ord_name,
                    partition_cols=tuple(bucket),
                )
                cols = {
                    n: tfm.expr_partial_agg(cctx, lag)
                    for n, (lag, tfm) in agg_feats.items()
                }
                right = collapsed.select(
                    *bucket, group_col, *[c.alias(n) for n, c in cols.items()]
                )
                df = self._join_back(df, right, bucket, group_col, key_cols, list(agg_feats))
            if row_feats:
                # ROLLING quantiles have a bounded window: compute them as a
                # (bucket, ordinal-range) join against the raw rows — each
                # row matches <= window_size output ordinals, so the work
                # distributes instead of funneling every bucket row through
                # one window partition (for global_ that is ALL rows).
                # Expanding quantiles stay on the window (an unbounded join
                # would be quadratic in the calendar).
                from .lag_transforms import RollingQuantile

                bounded_q = {
                    n: v
                    for n, v in row_feats.items()
                    if isinstance(v[1], RollingQuantile)
                }
                rest = {n: v for n, v in row_feats.items() if n not in bounded_q}
                if bounded_q:
                    df = self._apply_pooled_rolling_quantile(
                        df, bucket, ord_name, key_cols, bounded_q
                    )
                    key_cols = {c: df[c] for c in bucket}
                if rest:
                    # plan-time scale gate: a global_ expanding quantile has
                    # no partial-aggregate or bounded-join form, so its window
                    # funnels EVERY raw row through one partition — refuse to
                    # ship that plan silently
                    from .lag_transforms import ExpandingQuantile

                    if not bucket:
                        for name, (lag, tfm) in rest.items():
                            if isinstance(tfm, ExpandingQuantile) and not getattr(
                                tfm, "allow_single_partition", False
                            ):
                                raise ValueError(
                                    f"{name}: ExpandingQuantile(global_=True) "
                                    "windows all raw rows through a single "
                                    "partition — a scale cliff on large "
                                    "panels. Use RollingQuantile with a long "
                                    "window (bounded-join scale path), scope "
                                    "with groupby/partition_by, or pass "
                                    "allow_single_partition=True to accept "
                                    "the single-partition plan."
                                )
                    cols = {n: tfm.expr(probe, lag) for n, (lag, tfm) in rest.items()}
                    df = df.select("*", *[c.alias(n) for n, c in cols.items()])
            if py_feats:
                df = self._pooled_python(df, bucket, ord_name, py_feats, collapsed=False)
            return df.drop(ord_name, *temp_keys)

        # time_agg: collapse to one row per (bucket, ord), window over the
        # collapsed frame, then join back — the oracle's CTE shape
        agg_fn = _TIME_AGG_FN[time_agg]
        group_col = ord_name if needs_raw_ord else s.time_col
        collapsed = df.groupBy(
            *[key_cols[c].alias(c) for c in bucket], F.col(group_col)
        ).agg(agg_fn(F.col(s.target_col)).alias("_mlfs_v"))
        collapsed = self._coalesce_collapsed(collapsed, bucket)
        if not needs_raw_ord:
            collapsed = self._collapsed_ord(collapsed, parent_keys, bucket, ord_name)
        cctx = FrameCtx(
            y=F.col("_mlfs_v"),
            id_col=s.id_col,
            time_col=s.time_col,
            use_range=True,
            order_col=ord_name,
            partition_cols=tuple(bucket),
        )
        cols = {n: tfm.expr(cctx, lag) for n, (lag, tfm) in expr_feats.items()}
        collapsed = collapsed.select("*", *[c.alias(n) for n, c in cols.items()])
        if py_feats:
            collapsed = self._pooled_python(
                collapsed, bucket, ord_name, py_feats, collapsed=True
            )
        feat_names = list(feats)
        right = collapsed.select(
            *bucket, group_col, *[qcol(n).alias(n) for n in feat_names]
        )
        res = self._join_back(df, right, bucket, group_col, key_cols, feat_names)
        return res.drop(ord_name, *temp_keys)

    def _coalesce_collapsed(self, collapsed, bucket):
        """Fuse the collapsed frame's downstream windows into its
        aggregation stage (r11).

        When there are no bucket keys (global_ modes) the collapsed frame
        is calendar-sized and its ordinal/feature windows run over ONE
        window partition anyway; with tiny asserted buckets
        (``join_back_broadcast=True``) it is |buckets| x calendar and the
        windows run over |buckets| partitions. Either way every row is
        about to be funneled into one task per bucket — ``coalesce(1)``
        (a narrow dependency) makes that explicit, so the planner drops
        the Exchange it would otherwise insert for the window's
        clustering requirement: final aggregate, ordinal ranking and
        feature windows become one stage. Scale-safe exactly when the
        broadcast join-back is (same predicate): the frame must be small
        enough to ship to every executor anyway."""
        small = self.join_back_broadcast
        if small is None:
            small = not bucket
        return collapsed.coalesce(1) if small else collapsed

    def _collapsed_ord(self, collapsed, parent_keys, bucket, ord_name):
        """Parent-calendar ordinal derived ON the collapsed frame.

        The raw panel never carries the ordinal on this path: the collapsed
        frame is one row per (bucket, ts), so its (parent, ts) set IS the
        parent calendar and ranking it here is free relative to the old
        attach (distinct over the RAW panel + broadcast join onto every raw
        row — one extra full scan, one shuffle, and a broadcast exchange per
        pooled mode; see FLOOR_DECOMPOSITION.json's 14-16-job pooled plans).

        parent non-empty: dense_rank partitioned by parent — parallel across
        groups, identical to the oracle's `DENSE_RANK() OVER (PARTITION BY
        parent ORDER BY ds) - 1`. parent empty (global_): rank the DISTINCT
        calendar (|calendar| rows) and broadcast it back so the single
        unavoidable ordering never sees |calendar| x |buckets| rows; when
        there are no bucket keys either, the collapsed frame IS the calendar
        and is ranked directly.
        """
        ts = self.schema.time_col
        if parent_keys:
            w = Window.partitionBy(*parent_keys).orderBy(ts)
            return collapsed.withColumn(ord_name, F.dense_rank().over(w) - 1)
        if not bucket:
            w = Window.partitionBy(F.lit(0)).orderBy(ts)
            return collapsed.withColumn(ord_name, F.row_number().over(w) - 1)
        # cal derives from collapsed, so the self-join needs a renamed key
        # (unaliased collapsed[ts]/cal[ts] refs are ambiguous to Spark).
        cal_ts = "_mlfs_cal_ts"
        cal = collapsed.select(F.col(ts).alias(cal_ts)).distinct()
        w = Window.partitionBy(F.lit(0)).orderBy(cal_ts)
        cal = cal.withColumn(ord_name, F.row_number().over(w) - 1)
        out = collapsed.join(
            F.broadcast(cal), F.col(ts).eqNullSafe(F.col(cal_ts)), "left"
        )
        return out.drop(cal_ts)

    def _join_back(self, df, right, bucket, join_col, key_cols, feat_names):
        """Null-safe (bucket, join_col) left join of collapsed features onto
        rows; join_col is the parent-calendar ordinal when the raw rows carry
        it, else the time column itself.

        Broadcasts ``right`` per ``join_back_broadcast`` (auto: bucket-empty
        modes — right is calendar-sized). A broadcast here removes BOTH
        sort-merge exchanges: the calendar-sized feature frame ships to the
        executors and the raw panel streams through the probe side
        unshuffled — at 100 TB that spares the panel a full sort+shuffle,
        and on the bench it drops two AQE job boundaries."""
        bcast = self.join_back_broadcast
        if bcast is None:
            bcast = not bucket
        if bcast:
            right = F.broadcast(right)
        cond = df[join_col].eqNullSafe(right[join_col])
        for c in bucket:
            cond = cond & key_cols[c].eqNullSafe(right[c])
        res = df.join(right, cond, "left")
        for c in bucket + [join_col]:
            res = res.drop(right[c])
        return res

    def _apply_pooled_rolling_quantile(self, df, bucket, ord_name, key_cols, feats):
        """Pooled rolling quantile via a bounded ordinal-range join: output
        ordinals (the collapsed calendar) against raw rows in
        ``[o-lag-ws+1, o-lag]``, then one exact percentile per (bucket, o).
        Same shape as the pooled seasonal path, minus the phase key.

        The join carries an explicit equi-key: a coarse ordinal block id of
        span ``lag + ws``. Each output ordinal's source window spans at most
        two consecutive blocks (the left side explodes into both), and each
        raw row belongs to exactly one, so Spark plans a hash join on
        (bucket, block) with the range predicate as a residual filter —
        without it, ``global_`` mode (empty bucket) has no equi-key at all
        and degrades to a broadcast nested-loop join costing
        O(raw_rows x calendar_length)."""
        s = self.schema
        y = F.col(s.target_col)
        bkeys = [key_cols[c].alias(c) for c in bucket]
        out_ords = df.select(*bkeys, F.col(ord_name)).distinct()
        groups: dict[tuple, dict] = {}
        for name, (lag, tfm) in feats.items():
            groups.setdefault((lag, tfm.window_size), {})[name] = tfm
        cur = df
        for (lag, ws), grp in groups.items():
            span = lag + ws  # window length <= span, so <= 2 blocks per ordinal
            l = out_ords.withColumnRenamed(ord_name, "_o").withColumn(
                "_blk",
                F.explode(
                    F.array_distinct(
                        F.array(
                            F.floor((F.col("_o") - F.lit(lag + ws - 1)) / F.lit(span)),
                            F.floor((F.col("_o") - F.lit(lag)) / F.lit(span)),
                        )
                    )
                ),
            )
            r = df.select(
                *bkeys, F.col(ord_name).alias("_p"), y.alias("_ry")
            ).withColumn("_blk", F.floor(F.col("_p") / F.lit(span)))
            cond = (
                (l["_blk"] == r["_blk"])
                & (r["_p"] >= l["_o"] - F.lit(lag + ws - 1))
                & (r["_p"] <= l["_o"] - F.lit(lag))
            )
            for c in bucket:
                cond = cond & l[c].eqNullSafe(r[c])
            j = l.join(r, cond, "left").select(
                *[l[c].alias(c) for c in bucket], l["_o"].alias(ord_name), "_ry"
            )
            aggs = [F.count("_ry").alias("_cnt")]
            qnames = {}
            for i, (name, tfm) in enumerate(grp.items()):
                aggs.append(F.percentile(F.col("_ry"), F.lit(tfm.p)).alias(f"_q_{i}"))
                qnames[name] = f"_q_{i}"
            grouped = j.groupBy(*bucket, ord_name).agg(*aggs)
            sel = [F.col(c) for c in bucket] + [F.col(ord_name)]
            for name, tfm in grp.items():
                ms = max(tfm._effective_min_samples(), 1)
                sel.append(
                    F.when(F.col("_cnt") >= ms, F.col(qnames[name])).alias(name)
                )
            right = grouped.select(*sel)
            cur_keys = {c: cur[c] for c in bucket}
            cur = self._join_back(cur, right, bucket, ord_name, cur_keys, list(grp))
        return cur

    def _apply_pooled_seasonal(self, df, bucket, ord_name, key_cols, feats, time_agg):
        """Pooled seasonal rolling — value at parent ordinal ``o`` aggregates
        every bucket row at ordinals ``o - lag - i*season_length`` for
        i in 0..window_size-1 (`/root/reference/mlforecast/lag_transforms.py:1095-1127`).

        A single window can't express this: the output row's phase
        (``o % sl``) differs from its sources' phase whenever
        ``lag % sl != 0``, and window partition keys must be one expression
        over all rows. Compiled instead as an equi-join on
        (bucket, phase) with a bounded range predicate over the COLLAPSED
        per-(bucket, ordinal) frame: each output ordinal matches at most
        ``window_size`` collapsed rows, so the join is linear in the calendar
        — not the reference's row-level fallback whose cost grows with
        ``unique timestamps × bucket rows``. Only ``SeasonalRollingQuantile``
        without ``time_agg`` joins raw rows (quantiles have no partial form).
        """
        s = self.schema
        y = F.col(s.target_col)
        bkeys = [key_cols[c].alias(c) for c in bucket]
        if time_agg is not None:
            agg_fn = _TIME_AGG_FN[time_agg]
            collapsed = df.groupBy(*bkeys, F.col(ord_name)).agg(
                agg_fn(y).alias("_v")
            )
        else:
            collapsed = df.groupBy(*bkeys, F.col(ord_name)).agg(
                F.sum(y).alias("_psum"),
                F.count(y).alias("_pcnt"),
                F.sum(y * y).alias("_psumsq"),
                F.min(y).alias("_pmin"),
                F.max(y).alias("_pmax"),
            )

        groups: dict[tuple, dict] = {}
        for name, (lag, tfm) in feats.items():
            needs_raw = getattr(tfm, "_agg", "") == "quantile" and time_agg is None
            key = (lag, tfm.season_length, tfm.window_size, needs_raw)
            groups.setdefault(key, {})[name] = tfm

        out_ords = collapsed.select(*bucket, ord_name)
        cur = df
        for (lag, sl, ws, needs_raw), grp in groups.items():
            l = out_ords.withColumn(
                "_oph", F.pmod(F.col(ord_name) - F.lit(lag), F.lit(sl))
            ).withColumnRenamed(ord_name, "_o")
            if needs_raw:
                r = df.select(
                    *bkeys, F.col(ord_name).alias("_p"), y.alias("_ry")
                )
            elif time_agg is not None:
                r = collapsed.select(*bucket, F.col(ord_name).alias("_p"), "_v")
            else:
                r = collapsed.select(
                    *bucket,
                    F.col(ord_name).alias("_p"),
                    "_psum", "_pcnt", "_psumsq", "_pmin", "_pmax",
                )
            r = r.withColumn("_pph", F.pmod(F.col("_p"), F.lit(sl)))
            cond = l["_oph"] == r["_pph"]
            for c in bucket:
                cond = cond & l[c].eqNullSafe(r[c])
            cond = (
                cond
                & (r["_p"] >= l["_o"] - F.lit(lag + (ws - 1) * sl))
                & (r["_p"] <= l["_o"] - F.lit(lag))
            )
            j = l.join(r, cond, "left")
            val_cols = (
                [j["_ry"]] if needs_raw
                else [F.col("_v")] if time_agg is not None
                else [F.col(c) for c in ("_psum", "_pcnt", "_psumsq", "_pmin", "_pmax")]
            )
            j = j.select(
                *[l[c].alias(c) for c in bucket],
                l["_o"].alias(ord_name),
                *val_cols,
            )
            if needs_raw:
                aggs = [F.count("_ry").alias("_cnt")]
                qv = F.col("_ry")
            elif time_agg is not None:
                aggs = [
                    F.count("_v").alias("_cnt"),
                    F.sum("_v").alias("_s"),
                    F.sum(F.col("_v") * F.col("_v")).alias("_s2"),
                    F.min("_v").alias("_mn"),
                    F.max("_v").alias("_mx"),
                ]
                qv = F.col("_v")
            else:
                aggs = [
                    F.sum("_pcnt").alias("_cnt"),
                    F.sum("_psum").alias("_s"),
                    F.sum("_psumsq").alias("_s2"),
                    F.min("_pmin").alias("_mn"),
                    F.max("_pmax").alias("_mx"),
                ]
                qv = None
            qnames = {}
            for i, (name, tfm) in enumerate(grp.items()):
                if getattr(tfm, "_agg", "") == "quantile":
                    aggs.append(F.percentile(qv, F.lit(tfm.p)).alias(f"_q_{i}"))
                    qnames[name] = f"_q_{i}"
            grouped = j.groupBy(*bucket, ord_name).agg(*aggs)
            sel = [F.col(c) for c in bucket] + [F.col(ord_name)]
            cnt = F.col("_cnt")
            for name, tfm in grp.items():
                ms = tfm._effective_min_samples()
                agg = getattr(tfm, "_agg", "")
                if agg == "mean":
                    e = F.when(cnt >= max(ms, 1), F.col("_s") / cnt)
                elif agg == "std":
                    var = F.greatest(
                        (F.col("_s2") - F.col("_s") * F.col("_s") / cnt) / (cnt - 1),
                        F.lit(0.0),
                    )
                    e = F.when((cnt >= max(ms, 2)) & (cnt > 1), F.sqrt(var))
                elif agg == "min":
                    e = F.when(cnt >= max(ms, 1), F.col("_mn"))
                elif agg == "max":
                    e = F.when(cnt >= max(ms, 1), F.col("_mx"))
                else:  # quantile
                    e = F.when(cnt >= max(ms, 1), F.col(qnames[name]))
                sel.append(e.alias(name))
            right = grouped.select(*sel)
            cur_keys = {c: cur[c] for c in bucket}
            cur = self._join_back(cur, right, bucket, ord_name, cur_keys, list(grp))
        return cur

    def _pooled_python(self, df, bucket, ord_name, feats, collapsed):
        """EWM over pooled buckets via applyInPandas keyed by bucket.

        The recurrence consumes values by *ordinal value*, not position
        (`/root/reference/mlforecast/lag_transforms.py:1607-1640`): partition
        buckets may have parent-calendar holes, so ``result[k]`` is the EWM
        state after consuming every bucket value with ``ord <= ord[k] - lag``.
        """
        import numpy as np
        import pandas as pd

        s = self.schema
        value_col = "_mlfs_v" if collapsed else s.target_col

        def _supported(tfm) -> bool:
            if hasattr(tfm, "alpha"):
                return True
            if hasattr(tfm, "tfm1"):  # Combine: both sides must be python-able
                return _supported(tfm.tfm1) and _supported(tfm.tfm2)
            return False

        for name, (_, tfm) in feats.items():
            if not _supported(tfm):
                raise NotImplementedError(
                    f"pooled python path supports ExponentiallyWeightedMean and "
                    f"Combine of such; got {type(tfm).__name__} for {name!r}"
                )
        specs = dict(feats)
        out_schema = T.StructType(
            df.schema.fields + [T.StructField(n, T.DoubleType()) for n in specs]
        )

        def compute(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ord_name)
            ords = pdf[ord_name].to_numpy()
            vals = pdf[value_col].astype("float64").to_numpy()

            def ewm_state(alpha):
                # running EWM state after consuming row i (NaNs skipped)
                state = np.full(len(vals), np.nan)
                ewm = np.nan
                for i, v in enumerate(vals):
                    if not np.isnan(v):
                        ewm = v if np.isnan(ewm) else alpha * v + (1 - alpha) * ewm
                    state[i] = ewm
                return state

            def shifted(state, lag):
                # last index with ord <= ord[k] - lag
                idx = np.searchsorted(ords, ords - lag, side="right") - 1
                res = np.full(len(vals), np.nan)
                mask = idx >= 0
                res[mask] = state[idx[mask]]
                return res

            def eval_tfm(tfm, lag):
                if hasattr(tfm, "alpha"):
                    return shifted(ewm_state(tfm.alpha), lag)
                a = eval_tfm(tfm.tfm1, getattr(tfm.tfm1, "lag", lag))
                b = eval_tfm(tfm.tfm2, getattr(tfm.tfm2, "lag", lag))
                return tfm.operator(a, b)

            for n, (lag, tfm) in specs.items():
                pdf[n] = eval_tfm(tfm, lag)
            return pdf

        if bucket:
            grouped = df.groupBy(*bucket)
        else:
            grouped = df.groupBy(F.lit(0).alias("_mlfs_g"))
        return grouped.applyInPandas(compute, schema=out_schema)
