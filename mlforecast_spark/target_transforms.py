"""Target transforms: fit → transform at preprocess, inverse at predict.

Reference interface: `/root/reference/mlforecast/target_transforms.py:30-84`
(applied in order at fit `/root/reference/mlforecast/core.py:583-598`,
inverted in reverse at predict `core.py:1978-1999`). State lives in small
per-series DataFrames (broadcast-joined back), never in pickled blobs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class BaseTargetTransform:
    """fit_transform over the panel; inverse_transform over predictions.

    ``stats_`` is a small per-series DataFrame (the fitted state)."""

    id_col = "unique_id"
    time_col = "ds"
    target_col = "y"

    def set_column_names(self, id_col: str, time_col: str, target_col: str):
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def fit_transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def transform(self, df: DataFrame) -> DataFrame:
        """Apply with already-fitted state (history warm-up path,
        `/root/reference/mlforecast/core.py:1234-1305`). Stateful transforms
        that must re-derive state from the new history override/refit."""
        raise NotImplementedError

    def inverse_transform(self, df: DataFrame, pred_cols: Sequence[str]) -> DataFrame:
        raise NotImplementedError

    def update(self, df: DataFrame) -> DataFrame:
        """Transform rows appended to EXISTING series into the fitted scale,
        advancing any internal state (`/root/reference/mlforecast/core.py:2089-2098`
        calls ``tfm.update(ga)``). Stateless-at-append transforms (scalers,
        BoxCox, global maps) just re-apply the fitted state."""
        return self.transform(df)

    @property
    def refit_on_warmup(self) -> bool:
        """True if the transform's state must be rebuilt from new history
        (e.g. Differences tails); False if fitted state is reused (scalers)."""
        return False


class _RefitOnWarmup:
    @property
    def refit_on_warmup(self) -> bool:
        return True


class Differences(_RefitOnWarmup, BaseTargetTransform):
    """Iterated differencing ``y_t - y_{t-d}``
    (`/root/reference/mlforecast/target_transforms.py:87-182`).

    The inverse for recursive forecasts is a sequential per-series rebuild:
    each horizon step adds back the value ``d`` steps earlier, which may be a
    stored training tail or an already-reconstructed prediction. Done in one
    ``applyInPandas`` pass per series over (tails ∪ predictions) — the tails
    are ≤ sum(differences) rows per series.
    """

    def __init__(self, differences: Sequence[int]):
        self.differences = list(differences)
        self.tails_: Optional[DataFrame] = None

    def fit_transform(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.id_col).orderBy(self.time_col)
        # store tails of each intermediate level BEFORE applying that level's
        # difference: level i tail needs differences[i] last values
        tails = []
        n_rows = F.count("*").over(Window.partitionBy(self.id_col))
        rn_desc = F.row_number().over(
            Window.partitionBy(self.id_col).orderBy(F.col(self.time_col).desc())
        )
        cur = df
        for level, d in enumerate(self.differences):
            tail = (
                cur.withColumn("_rn", rn_desc)
                .filter(F.col("_rn") <= d)
                .select(
                    self.id_col,
                    self.time_col,
                    F.col(self.target_col).alias("_tail_y"),
                    F.lit(level).alias("_level"),
                    (d - F.col("_rn")).alias("_pos"),
                )
            )
            tails.append(tail)
            cur = cur.withColumn(
                self.target_col,
                F.col(self.target_col) - F.lag(self.target_col, d).over(w),
            )
        if not tails:
            self.tails_ = None
            return cur
        from functools import reduce

        self.tails_ = reduce(DataFrame.unionByName, tails)
        return cur

    def inverse_transform(self, df: DataFrame, pred_cols: Sequence[str]) -> DataFrame:
        import numpy as np
        import pandas as pd

        diffs = list(self.differences)
        id_col, time_col = self.id_col, self.time_col
        preds = df
        tails = self.tails_.groupBy(id_col).agg(
            F.collect_list(F.struct("_level", "_pos", "_tail_y")).alias("_tails")
        )
        joined = preds.join(tails, on=id_col, how="left")
        out_schema = preds.schema

        def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col).reset_index(drop=True)
            tail_structs = pdf["_tails"].iloc[0]
            # organize tails: level -> array of the last d values (train order)
            tail_by_level = {}
            if tail_structs is not None:
                for item in tail_structs:
                    lv = item["_level"]
                    tail_by_level.setdefault(lv, {})[item["_pos"]] = item["_tail_y"]
            h = len(pdf)
            for col in pred_cols:
                vals = pdf[col].astype("float64").to_numpy()
                # invert levels in reverse order
                for lv in range(len(diffs) - 1, -1, -1):
                    d = diffs[lv]
                    t = tail_by_level.get(lv, {})
                    tail_arr = np.array([t.get(p, np.nan) for p in range(d)])
                    rebuilt = np.empty(h)
                    for i in range(h):
                        prev = tail_arr[i % d] if i < d else rebuilt[i - d]
                        rebuilt[i] = vals[i] + prev
                    vals = rebuilt
                pdf[col] = vals
            return pdf.drop(columns=["_tails"])

        return joined.groupBy(id_col).applyInPandas(rebuild, schema=out_schema)

    def update(self, df: DataFrame) -> DataFrame:
        """Difference appended rows against the stored tails and advance the
        tails to the new series end. One applyInPandas pass per series over
        (new rows ⨝ collected tails); the pass emits both the transformed
        rows and the replacement tail entries, split afterwards."""
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        diffs = list(self.differences)
        id_col, time_col, target_col = self.id_col, self.time_col, self.target_col
        if not diffs:
            return df
        tails = self.tails_.groupBy(id_col).agg(
            F.collect_list(
                F.struct("_level", "_pos", "_tail_y", F.col(time_col).alias("_tail_ds"))
            ).alias("_tails")
        )
        joined = df.join(tails, on=id_col, how="left")
        out_schema = T.StructType(
            df.schema.fields
            + [
                T.StructField("_level", T.IntegerType()),
                T.StructField("_pos", T.IntegerType()),
                T.StructField("_tail_y", T.DoubleType()),
                T.StructField("_is_tail", T.BooleanType()),
            ]
        )
        df_cols = [f.name for f in df.schema.fields]

        def upd(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col).reset_index(drop=True)
            tail_structs = pdf["_tails"].iloc[0]
            tail_by_level: dict = {}
            if tail_structs is not None:
                for item in tail_structs:
                    tail_by_level.setdefault(item["_level"], {})[item["_pos"]] = (
                        item["_tail_y"],
                        item["_tail_ds"],
                    )
            cur = pdf[target_col].astype("float64").to_numpy()
            cur_ds = list(pdf[time_col])
            m = len(cur)
            tail_rows = []
            for lv, d in enumerate(diffs):
                t = tail_by_level.get(lv, {})
                tail_vals = np.array(
                    [t[p][0] if p in t and t[p][0] is not None else np.nan for p in range(d)]
                )
                tail_ds = [t[p][1] if p in t else None for p in range(d)]
                # value d steps earlier: stored tail for the first d rows,
                # then this update's own (level-input) values
                prev = np.array(
                    [tail_vals[i] if i < d else cur[i - d] for i in range(m)]
                )
                nxt = cur - prev
                all_vals = np.concatenate([tail_vals, cur])
                all_ds = tail_ds + cur_ds
                for p in range(d):
                    tail_rows.append(
                        (lv, p, all_vals[-d + p], all_ds[len(all_ds) - d + p])
                    )
                cur = nxt
            pdf[target_col] = cur
            pdf["_level"] = None
            pdf["_pos"] = None
            pdf["_tail_y"] = None
            pdf["_is_tail"] = False
            pdf = pdf.drop(columns=["_tails"])
            trows = pd.DataFrame(
                {
                    id_col: [pdf[id_col].iloc[0]] * len(tail_rows),
                    time_col: [r[3] for r in tail_rows],
                    "_level": [r[0] for r in tail_rows],
                    "_pos": [r[1] for r in tail_rows],
                    "_tail_y": [None if np.isnan(r[2]) else float(r[2]) for r in tail_rows],
                    "_is_tail": [True] * len(tail_rows),
                }
            )
            if np.issubdtype(pdf[time_col].dtype, np.datetime64):
                # collected tail ds arrive as date objects; align dtypes so
                # the concat column stays datetime64 for Arrow
                trows[time_col] = pd.to_datetime(trows[time_col])
            return pd.concat([pdf, trows], ignore_index=True)[
                df_cols + ["_level", "_pos", "_tail_y", "_is_tail"]
            ]

        out = (
            joined.groupBy(id_col)
            .applyInPandas(upd, schema=out_schema)
            .localCheckpoint(eager=True)
        )
        # series NOT in this update keep their old tails unchanged
        updated_ids = out.select(id_col).distinct()
        kept = self.tails_.join(updated_ids, on=id_col, how="left_anti")
        new_tails = out.filter(F.col("_is_tail")).select(
            id_col, time_col, "_tail_y", "_level", "_pos"
        )
        self.tails_ = kept.unionByName(new_tails).localCheckpoint(eager=True)
        return out.filter(~F.col("_is_tail")).select(*df_cols)


class _AutoPerSeriesTransform(_RefitOnWarmup, BaseTargetTransform):
    """Base for per-series adaptive transforms (Auto* family,
    `/root/reference/mlforecast/target_transforms.py:185-375`): each series
    chooses its own parameters at fit. The per-series decision + tails live in
    a JSON meta column of ``stats_``; transform and inverse are Arrow-batched
    ``applyInPandas`` passes (per-series MLE/teststatistics are the sanctioned
    Python path, SURVEY.md §7)."""

    def _choose_and_transform(self, y):
        """numpy in → (transformed numpy, meta dict). Implemented by subclasses."""
        raise NotImplementedError

    def update(self, df: DataFrame) -> DataFrame:
        """Difference appended rows of EXISTING series with the per-series
        meta chosen at fit (d, sl, tails) and advance the tails — the
        incremental path the reference's coreforecast scalers expose via
        ``update`` (`/root/reference/mlforecast/core.py:2089-2098`). The
        per-series decision (d, sl) is NOT revisited."""
        import json

        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        id_col, time_col, target_col = self.id_col, self.time_col, self.target_col
        joined = df.join(self.stats_, on=id_col, how="left")
        out_schema = T.StructType(
            df.schema.fields
            + [
                T.StructField("_meta", T.StringType()),
                T.StructField("_is_meta", T.BooleanType()),
            ]
        )
        df_cols = [f.name for f in df.schema.fields]

        def upd(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col).reset_index(drop=True)
            raw_meta = pdf["_meta"].iloc[0]
            meta = json.loads(raw_meta) if raw_meta else {"d": 0, "sl": 1, "tails": []}
            sl = meta.get("sl", 1)
            cur = pdf[target_col].astype("float64").to_numpy()
            m = len(cur)
            new_tails = []
            for level in range(meta.get("d", 0)):
                tail = np.array(
                    [v if v is not None else np.nan for v in meta["tails"][level]],
                    dtype="float64",
                )
                prev = np.array(
                    [tail[i] if i < sl else cur[i - sl] for i in range(m)]
                )
                merged = np.concatenate([tail, cur])
                new_tails.append(
                    [None if np.isnan(v) else float(v) for v in merged[-sl:]]
                )
                cur = cur - prev
            meta["tails"] = new_tails
            pdf[target_col] = cur
            pdf["_meta"] = None
            pdf["_is_meta"] = False
            pdf = pdf.drop(columns=[c for c in pdf.columns if c not in df_cols + ["_meta", "_is_meta"]])
            mrow = {c: [None] for c in df_cols}
            mrow[id_col] = [pdf[id_col].iloc[0]]
            mrow["_meta"] = [json.dumps(meta)]
            mrow["_is_meta"] = [True]
            mdf = pd.DataFrame(mrow)
            if np.issubdtype(pdf[time_col].dtype, np.datetime64):
                mdf[time_col] = pd.to_datetime(mdf[time_col])
            return pd.concat([pdf, mdf], ignore_index=True)[
                df_cols + ["_meta", "_is_meta"]
            ]

        out = (
            joined.groupBy(id_col)
            .applyInPandas(upd, schema=out_schema)
            .localCheckpoint(eager=True)
        )
        updated_ids = out.select(id_col).distinct()
        kept = self.stats_.join(updated_ids, on=id_col, how="left_anti")
        new_stats = out.filter(F.col("_is_meta")).select(id_col, "_meta")
        self.stats_ = kept.unionByName(new_stats).localCheckpoint(eager=True)
        return out.filter(~F.col("_is_meta")).select(*df_cols)

    def _inverse(self, preds, meta):
        raise NotImplementedError

    def fit_transform(self, df: DataFrame) -> DataFrame:
        import json

        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        import copy as _copy

        id_col, time_col, target_col = self.id_col, self.time_col, self.target_col
        # strip driver-only state so the closure serializes cleanly
        worker = _copy.copy(self)
        worker.stats_ = None
        choose = worker._choose_and_transform
        out_schema = df.schema
        meta_schema = f"`{id_col}` string, `_meta` string"
        metas_acc = []

        def transform_series(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col)
            y = pdf[target_col].to_numpy(dtype="float64")
            transformed, meta = choose(y)
            pdf[target_col] = transformed
            pdf["_meta"] = json.dumps(meta)
            return pdf

        with_meta_schema = T.StructType(
            out_schema.fields + [T.StructField("_meta", T.StringType())]
        )
        transformed = df.groupBy(id_col).applyInPandas(
            transform_series, schema=with_meta_schema
        )
        transformed = transformed.cache()
        self.stats_ = (
            transformed.groupBy(id_col).agg(F.first("_meta").alias("_meta"))
        ).localCheckpoint(eager=True)
        return transformed.drop("_meta")

    def inverse_transform(self, df: DataFrame, pred_cols: Sequence[str]) -> DataFrame:
        import json

        import numpy as np
        import pandas as pd

        import copy as _copy

        id_col, time_col = self.id_col, self.time_col
        worker = _copy.copy(self)
        worker.stats_ = None
        inverse = worker._inverse
        joined = df.join(self.stats_, on=id_col, how="left")
        out_schema = df.schema
        cols = list(pred_cols)

        def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col).reset_index(drop=True)
            meta = json.loads(pdf["_meta"].iloc[0]) if pdf["_meta"].iloc[0] else {}
            for c in cols:
                pdf[c] = inverse(pdf[c].to_numpy(dtype="float64"), meta)
            return pdf.drop(columns=["_meta"])

        return joined.groupBy(id_col).applyInPandas(rebuild, schema=out_schema)


def _ndiffs(y, max_diffs: int, season_length: int = 1, threshold: float = 0.95):
    """Pick the number of (seasonal) differences: keep differencing while the
    variance of the differenced series drops below ``threshold`` × current —
    a deterministic variance-ratio criterion standing in for the reference's
    coreforecast unit-root tests."""
    import numpy as np

    d = 0
    cur = y[~np.isnan(y)]
    for _ in range(max_diffs):
        if len(cur) <= 2 * season_length:
            break
        nxt = cur[season_length:] - cur[:-season_length]
        if len(nxt) < 3 or np.var(cur) == 0:
            break
        if np.var(nxt) < threshold * np.var(cur):
            d += 1
            cur = nxt
        else:
            break
    return d


class AutoDifferences(_AutoPerSeriesTransform):
    """Per-series number of lag-1 differences
    (`/root/reference/mlforecast/target_transforms.py:185-305`)."""

    def __init__(self, max_diffs: int):
        self.max_diffs = max_diffs

    def _choose_and_transform(self, y):
        import numpy as np

        d = _ndiffs(y, self.max_diffs, season_length=1)
        tails = []
        cur = y.astype("float64").copy()
        for _ in range(d):
            tails.append([float(cur[-1])])
            nxt = np.full_like(cur, np.nan)
            nxt[1:] = cur[1:] - cur[:-1]
            cur = nxt
        return cur, {"d": d, "sl": 1, "tails": tails}

    def _inverse(self, preds, meta):
        import numpy as np

        sl = meta.get("sl", 1)
        for level in range(meta["d"] - 1, -1, -1):
            tail = meta["tails"][level]
            rebuilt = np.empty(len(preds))
            for i in range(len(preds)):
                prev = tail[i % sl] if i < sl else rebuilt[i - sl]
                rebuilt[i] = preds[i] + prev
            preds = rebuilt
        return preds


class AutoSeasonalDifferences(AutoDifferences):
    """Per-series number of seasonal differences
    (`/root/reference/mlforecast/target_transforms.py:308-326`)."""

    def __init__(self, season_length: int, max_diffs: int, n_seasons: Optional[int] = None):
        self.season_length = season_length
        self.max_diffs = max_diffs
        self.n_seasons = n_seasons

    def _choose_and_transform(self, y):
        import numpy as np

        sl = self.season_length
        d = _ndiffs(y, self.max_diffs, season_length=sl)
        tails = []
        cur = y.astype("float64").copy()
        for _ in range(d):
            tails.append([float(v) for v in cur[-sl:]])
            nxt = np.full_like(cur, np.nan)
            nxt[sl:] = cur[sl:] - cur[:-sl]
            cur = nxt
        return cur, {"d": d, "sl": sl, "tails": tails}


class AutoSeasonalityAndDifferences(AutoSeasonalDifferences):
    """Detect the season length per series, then seasonal differences
    (`/root/reference/mlforecast/target_transforms.py:329-375`; detection
    delegated there to coreforecast's STL-style period finder).

    Detection (``detection='acf'``, default): autocorrelation of the
    DETRENDED (first-differenced) series; candidate periods are significant
    LOCAL MAXIMA of the ACF (|acf| > 1.96/sqrt(n), the standard white-noise
    band), strongest wins. Detrending first stops trends masquerading as
    long periods — the main failure mode of a plain ACF argmax on
    multi-seasonal/trending series.

    ``detection='periodogram'``: classical periodogram of the detrended
    series with Fisher's g-test for peak significance — the same family of
    method as the reference's coreforecast period finder (which is not
    installable here; `tests/test_seasonality_detection.py` bounds the
    divergence between the two detectors on a multi-seasonal fixture
    suite). ``n_seasons`` caps the sample used for the differencing test to
    the last ``max_season_length * n_seasons`` points, matching the
    reference."""

    def __init__(
        self,
        max_season_length: int,
        max_diffs: int,
        n_seasons: Optional[int] = 10,
        detection: str = "acf",
    ):
        if detection not in ("acf", "periodogram"):
            raise ValueError("detection must be 'acf' or 'periodogram'")
        self.max_season_length = max_season_length
        self.max_diffs = max_diffs
        self.n_seasons = n_seasons
        self.detection = detection

    def fit_transform(self, df: DataFrame) -> DataFrame:
        # the reference validates series length driver-side before the
        # per-series pass (`target_transforms.py:354-372`)
        min_required = self.max_diffs + 4
        short = (
            df.groupBy(self.id_col)
            .agg(F.count(self.target_col).alias("_n"))
            .filter(F.col("_n") < min_required)
            .limit(5)
            .collect()
        )
        if short:
            ids = [r[self.id_col] for r in short]
            raise ValueError(
                f"Insufficient data for seasonality detection: with "
                f"max_diffs={self.max_diffs} each series needs at least "
                f"{min_required} observations; offenders e.g. {ids}"
            )
        return super().fit_transform(df)

    def _detect_season_periodogram(self, y) -> int:
        """Periodogram with harmonic aggregation: linearly detrend (a first
        difference would tilt the spectrum toward period 2), score each
        candidate integer period by the power at its fundamental plus second
        harmonic (non-sinusoidal seasonality — square-ish weekly patterns —
        spreads power across harmonics, so a raw peak-pick lands on a
        harmonic instead of the period), and require the fundamental bin to
        be individually elevated (kills superharmonic aliases: period 2p
        'owns' period p's power only through its harmonics, never its
        fundamental). Significance: combined harmonic power must exceed 10×
        its white-noise expectation — ~2% family-wise false-positive rate
        over ≤40 candidates for an exponential periodogram."""
        import numpy as np

        y = y[~np.isnan(y)]
        n = len(y)
        if n < 6:
            return 1
        t = np.arange(n, dtype="float64")
        coef = np.polyfit(t, y, 1)
        d = y - np.polyval(coef, t)
        # degenerate guard: residual variance at float-rounding scale (pure
        # trend / constant series) is noise, not signal
        scale = max(1.0, float(np.max(np.abs(y))))
        if float(d @ d) <= n * (1e-9 * scale) ** 2:
            return 1
        spec = np.abs(np.fft.rfft(d)) ** 2
        spec[0] = 0.0
        m = len(spec)
        if m < 4:
            return 1
        mean_p = spec[1:].sum() / (m - 1)
        if mean_p == 0:
            return 1
        max_sl = min(self.max_season_length, n // 3)
        best_sl, best_score = 1, 0.0
        for k in range(1, m):
            p = int(round(n / k))
            if p < 2 or p > max_sl:
                continue
            fund = float(spec[k])
            if fund < 3.0 * mean_p:  # fundamental must be real, not aliased
                continue
            score, j = 0.0, k
            while j < m:
                score += float(spec[j])
                j += k
            if score > best_score:
                best_score, best_sl = score, p
        return best_sl if best_score >= 10.0 * mean_p else 1

    def _detect_season(self, y) -> int:
        import numpy as np

        if getattr(self, "detection", "acf") == "periodogram":
            return self._detect_season_periodogram(y)
        y = y[~np.isnan(y)]
        if len(y) < 4:
            return 1
        d = np.diff(y)  # detrend
        n = len(d)
        dc = d - d.mean()
        denom = float(dc @ dc)
        # same degenerate guard as the periodogram path: rounding-noise
        # variance on a pure trend is not signal
        scale = max(1.0, float(np.max(np.abs(y))))
        if denom <= n * (1e-9 * scale) ** 2 or n < 6:
            return 1
        max_sl = min(self.max_season_length, n // 3)
        acf = np.array(
            [float(dc[sl:] @ dc[:-sl]) / denom for sl in range(1, max_sl + 2)]
        )
        # white-noise band with a multiple-comparison correction: the probe
        # scans up to max_sl candidate lags, and the plain 1.96/sqrt(n) band
        # false-positives on ~1 of 40 lags of pure noise (observed on a
        # white-noise fixture). sqrt(2*log(2*m)) is the universal-threshold
        # analogue (≈2.96 at m=40 vs 1.96).
        sig = np.sqrt(2.0 * np.log(2.0 * max(max_sl, 2))) / np.sqrt(n)
        best_sl, best_ac = 1, 0.0
        for sl in range(2, max_sl + 1):
            a = acf[sl - 1]
            # significant local maximum of the ACF
            if a > sig and a >= acf[sl - 2] and a >= acf[sl]:
                if a > best_ac:
                    best_ac, best_sl = a, sl
        return best_sl

    def _choose_and_transform(self, y):
        import numpy as np

        sl = self._detect_season(y)
        self.season_length = sl  # per-series; recorded in meta below
        if self.n_seasons is not None:
            tail = self.max_season_length * self.n_seasons
            y_test = y[-tail:] if len(y) > tail else y
        else:
            y_test = y
        d = _ndiffs(y_test, self.max_diffs, season_length=sl)
        tails = []
        cur = y.astype("float64").copy()
        for _ in range(d):
            tails.append([float(v) for v in cur[-sl:]])
            nxt = np.full_like(cur, np.nan)
            nxt[sl:] = cur[sl:] - cur[:-sl]
            cur = nxt
        return cur, {"d": d, "sl": sl, "tails": tails}


class _LocalScalerBase(BaseTargetTransform):
    """Per-series affine scaler: stats via one groupBy, applied/inverted with
    a broadcast join (`/root/reference/mlforecast/target_transforms.py:378-423`)."""

    def _stats_exprs(self):  # -> [(_loc, _scale) aggregate expressions]
        raise NotImplementedError

    def fit_transform(self, df: DataFrame) -> DataFrame:
        loc, scale = self._stats_exprs()
        self.stats_ = df.groupBy(self.id_col).agg(
            loc.alias("_loc"), scale.alias("_scale")
        )
        # guard zero scale (constant series) like the reference does
        self.stats_ = self.stats_.withColumn(
            "_scale", F.when(F.col("_scale") == 0.0, F.lit(1.0)).otherwise(F.col("_scale"))
        )
        out = df.join(F.broadcast(self.stats_), on=self.id_col, how="left")
        out = out.withColumn(
            self.target_col, (F.col(self.target_col) - F.col("_loc")) / F.col("_scale")
        )
        return out.drop("_loc", "_scale")

    def transform(self, df: DataFrame) -> DataFrame:
        out = df.join(F.broadcast(self.stats_), on=self.id_col, how="left")
        out = out.withColumn(
            self.target_col, (F.col(self.target_col) - F.col("_loc")) / F.col("_scale")
        )
        return out.drop("_loc", "_scale")

    def inverse_transform(self, df: DataFrame, pred_cols: Sequence[str]) -> DataFrame:
        out = df.join(F.broadcast(self.stats_), on=self.id_col, how="left")
        for c in pred_cols:
            out = out.withColumn(c, F.col(c) * F.col("_scale") + F.col("_loc"))
        return out.drop("_loc", "_scale")


class LocalStandardScaler(_LocalScalerBase):
    def _stats_exprs(self):
        y = F.col(self.target_col)
        return F.avg(y), F.stddev_pop(y)


class LocalMinMaxScaler(_LocalScalerBase):
    def _stats_exprs(self):
        y = F.col(self.target_col)
        return F.min(y), (F.max(y) - F.min(y))


class LocalRobustScaler(_LocalScalerBase):
    """scale='iqr' or 'mad' (`/root/reference/mlforecast/target_transforms.py:414-423`)."""

    def __init__(self, scale: str = "iqr"):
        if scale not in ("iqr", "mad"):
            raise ValueError("scale must be 'iqr' or 'mad'")
        self.scale = scale

    def _stats_exprs(self):
        y = F.col(self.target_col)
        if self.scale == "iqr":
            return (
                F.percentile(y, F.lit(0.5)),
                F.percentile(y, F.lit(0.75)) - F.percentile(y, F.lit(0.25)),
            )
        med = F.percentile(y, F.lit(0.5))
        return med, F.lit(None).cast("double")  # mad needs a second pass

    def fit_transform(self, df: DataFrame) -> DataFrame:
        if self.scale == "iqr":
            return super().fit_transform(df)
        med = df.groupBy(self.id_col).agg(
            F.percentile(F.col(self.target_col), F.lit(0.5)).alias("_loc")
        )
        dev = (
            df.join(F.broadcast(med), on=self.id_col)
            .withColumn("_adev", F.abs(F.col(self.target_col) - F.col("_loc")))
            .groupBy(self.id_col)
            .agg(F.percentile(F.col("_adev"), F.lit(0.5)).alias("_scale"))
        )
        self.stats_ = med.join(dev, on=self.id_col).withColumn(
            "_scale", F.when(F.col("_scale") == 0.0, F.lit(1.0)).otherwise(F.col("_scale"))
        )
        out = df.join(F.broadcast(self.stats_), on=self.id_col, how="left")
        out = out.withColumn(
            self.target_col, (F.col(self.target_col) - F.col("_loc")) / F.col("_scale")
        )
        return out.drop("_loc", "_scale")


class LocalBoxCox(BaseTargetTransform):
    """Per-series Box-Cox with λ by log-likelihood MLE over a grid
    (`/root/reference/mlforecast/target_transforms.py:426-431`; scipy is not
    available in this container, so λ is fit by dense grid search in numpy —
    same objective, deterministic)."""

    def __init__(self, lower: float = -1.0, upper: float = 2.0, n_grid: int = 61):
        self.lower, self.upper, self.n_grid = lower, upper, n_grid

    def fit_transform(self, df: DataFrame) -> DataFrame:
        import numpy as np
        import pandas as pd

        id_col, target_col = self.id_col, self.target_col
        lo, hi, ng = self.lower, self.upper, self.n_grid

        def fit_lambda(pdf: pd.DataFrame) -> pd.DataFrame:
            x = pdf[target_col].to_numpy(dtype="float64")
            x = x[~np.isnan(x)]
            lambdas = np.linspace(lo, hi, ng)
            best_lmb, best_ll = 1.0, -np.inf
            if (x > 0).all() and len(x) > 2:
                logx = np.log(x)
                for lmb in lambdas:
                    if abs(lmb) < 1e-12:
                        z = logx
                    else:
                        z = (np.power(x, lmb) - 1.0) / lmb
                    var = z.var()
                    if var <= 0:
                        continue
                    ll = -0.5 * len(x) * np.log(var) + (lmb - 1.0) * logx.sum()
                    if ll > best_ll:
                        best_ll, best_lmb = ll, lmb
            return pd.DataFrame({id_col: [pdf[id_col].iloc[0]], "_lambda": [best_lmb]})

        self.stats_ = df.select(id_col, target_col).groupBy(id_col).applyInPandas(
            fit_lambda, schema=f"`{id_col}` string, `_lambda` double"
        )
        out = df.join(F.broadcast(self.stats_), on=id_col, how="left")
        y = F.col(target_col)
        lmb = F.col("_lambda")
        out = out.withColumn(
            target_col,
            F.when(F.abs(lmb) < 1e-12, F.log(y)).otherwise(
                (F.pow(y, lmb) - 1.0) / lmb
            ),
        )
        return out.drop("_lambda")

    def transform(self, df: DataFrame) -> DataFrame:
        out = df.join(F.broadcast(self.stats_), on=self.id_col, how="left")
        y = F.col(self.target_col)
        lmb = F.col("_lambda")
        out = out.withColumn(
            self.target_col,
            F.when(F.abs(lmb) < 1e-12, F.log(y)).otherwise((F.pow(y, lmb) - 1.0) / lmb),
        )
        return out.drop("_lambda")

    def inverse_transform(self, df: DataFrame, pred_cols: Sequence[str]) -> DataFrame:
        out = df.join(F.broadcast(self.stats_), on=self.id_col, how="left")
        lmb = F.col("_lambda")
        for c in pred_cols:
            v = F.col(c)
            out = out.withColumn(
                c,
                F.when(F.abs(lmb) < 1e-12, F.exp(v)).otherwise(
                    F.pow(v * lmb + 1.0, 1.0 / lmb)
                ),
            )
        return out.drop("_lambda")


class GlobalSklearnTransformer(BaseTargetTransform):
    """The reference wraps sklearn FunctionTransformer for elementwise maps —
    its shipped use is log1p/expm1 (`/root/reference/mlforecast/auto.py:321-323`).
    Here: named elementwise pairs as JVM expressions."""

    _FUNCS = {
        "log1p": (F.log1p, F.expm1),
        "log": (F.log, F.exp),
    }

    def __init__(self, func: str = "log1p"):
        if func not in self._FUNCS:
            raise ValueError(f"func must be one of {sorted(self._FUNCS)}")
        self.func = func

    def fit_transform(self, df: DataFrame) -> DataFrame:
        fwd, _ = self._FUNCS[self.func]
        return df.withColumn(self.target_col, fwd(F.col(self.target_col)))

    def transform(self, df: DataFrame) -> DataFrame:
        return self.fit_transform(df)

    def inverse_transform(self, df: DataFrame, pred_cols: Sequence[str]) -> DataFrame:
        _, inv = self._FUNCS[self.func]
        for c in pred_cols:
            df = df.withColumn(c, inv(F.col(c)))
        return df
