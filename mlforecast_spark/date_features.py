"""Calendar feature expressions with pandas-convention parity.

Mirrors the reference's date-feature dispatch
(`/root/reference/mlforecast/core.py:63-85,807-840`): same feature names and
value conventions (pandas ``dayofweek`` Monday=0 vs Spark's Sunday=1 — shifted
here), emitted as built-in Spark expressions so they stay inside whole-stage
codegen. Dummy (one-hot) features use the reference's fixed vocabularies
(`/root/reference/mlforecast/utils.py:26-123`) so the schema is static.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DateFeature = Union[str, Callable]


def _is_quarter_start(ds: Column) -> Column:
    return F.month(ds).isin(1, 4, 7, 10) & (F.dayofmonth(ds) == 1)


def _is_quarter_end(ds: Column) -> Column:
    return F.month(ds).isin(3, 6, 9, 12) & (F.to_date(ds) == F.last_day(ds))


_DATE_FEATURES: dict[str, Callable[[Column], Column]] = {
    "year": lambda ds: F.year(ds),
    "month": lambda ds: F.month(ds),
    "day": lambda ds: F.dayofmonth(ds),
    "hour": lambda ds: F.hour(ds),
    "minute": lambda ds: F.minute(ds),
    "second": lambda ds: F.second(ds),
    "dayofyear": lambda ds: F.dayofyear(ds),
    "day_of_year": lambda ds: F.dayofyear(ds),
    "weekofyear": lambda ds: F.weekofyear(ds),
    "week": lambda ds: F.weekofyear(ds),
    "dayofweek": lambda ds: (F.dayofweek(ds) + 5) % 7,  # pandas: Monday=0
    "day_of_week": lambda ds: (F.dayofweek(ds) + 5) % 7,
    "weekday": lambda ds: (F.dayofweek(ds) + 5) % 7,
    "quarter": lambda ds: F.quarter(ds),
    "daysinmonth": lambda ds: F.dayofmonth(F.last_day(ds)),
    "days_in_month": lambda ds: F.dayofmonth(F.last_day(ds)),
    "is_month_start": lambda ds: (F.dayofmonth(ds) == 1).cast("int"),
    "is_month_end": lambda ds: (F.to_date(ds) == F.last_day(ds)).cast("int"),
    "is_quarter_start": lambda ds: _is_quarter_start(ds).cast("int"),
    "is_quarter_end": lambda ds: _is_quarter_end(ds).cast("int"),
    "is_year_start": lambda ds: ((F.month(ds) == 1) & (F.dayofmonth(ds) == 1)).cast("int"),
    "is_year_end": lambda ds: ((F.month(ds) == 12) & (F.dayofmonth(ds) == 31)).cast("int"),
}


# fixed one-hot vocabularies (`/root/reference/mlforecast/utils.py:26-41`);
# static schema — no fitting needed, leap-safe dayofyear
DUMMY_FEATURE_VALUES: dict[str, list[int]] = {
    "dayofweek": list(range(7)),
    "day_of_week": list(range(7)),
    "weekday": list(range(7)),
    "month": list(range(1, 13)),
    "quarter": list(range(1, 5)),
    "day": list(range(1, 32)),
    "hour": list(range(24)),
    "minute": list(range(60)),
    "second": list(range(60)),
    "dayofyear": list(range(1, 367)),
    "day_of_year": list(range(1, 367)),
    "week": list(range(1, 54)),
    "weekofyear": list(range(1, 54)),
}


def dummy_feature_names(features: Sequence[DateFeature], as_dummies: bool) -> list[str]:
    """Output column names for the date features under the dummy flag."""
    names: list[str] = []
    for f in features:
        if not isinstance(f, str):
            names.append(f.__name__)
        elif as_dummies and f in DUMMY_FEATURE_VALUES:
            names.extend(f"{f}_{v}" for v in DUMMY_FEATURE_VALUES[f])
        else:
            names.append(f)
    return names


def date_feature_col(feature: str, ds: Column) -> Column:
    if feature not in _DATE_FEATURES:
        raise ValueError(
            f"Unknown date feature {feature!r}; known: {sorted(_DATE_FEATURES)}"
        )
    return _DATE_FEATURES[feature](ds).cast("int")


def apply_date_features(
    df: DataFrame,
    time_col: str,
    features: Sequence[DateFeature],
    as_dummies: bool = False,
) -> tuple[DataFrame, list[str]]:
    """Attach date-feature columns; callables go through the distinct-dates
    plan (compute on ``select(ds).distinct()`` + broadcast join back), the
    reference's own optimization (`/root/reference/mlforecast/core.py:1000-1036`).
    With ``as_dummies``, vocabulary features become fixed one-hot indicators
    (`/root/reference/mlforecast/utils.py:82-123`)."""
    names: list[str] = []
    ds = F.col(time_col)
    callables = [f for f in features if callable(f)]
    for feat in features:
        if isinstance(feat, str):
            base = date_feature_col(feat, ds)
            if as_dummies and feat in DUMMY_FEATURE_VALUES:
                dummy_cols = [
                    (base == v).cast("int").alias(f"{feat}_{v}")
                    for v in DUMMY_FEATURE_VALUES[feat]
                ]
                df = df.select("*", *dummy_cols)
                names.extend(f"{feat}_{v}" for v in DUMMY_FEATURE_VALUES[feat])
                continue
            df = df.withColumn(feat, base)
            names.append(feat)
    if callables:
        import pandas as pd

        distinct = df.select(time_col).distinct()

        def compute(pdf: pd.DataFrame) -> pd.DataFrame:
            idx = pd.DatetimeIndex(pdf[time_col])
            out = pdf.copy()
            for fn in callables:
                res = fn(idx)
                if isinstance(res, pd.DataFrame):
                    for c in res.columns:
                        out[str(c)] = res[c].to_numpy()
                else:
                    out[fn.__name__] = pd.Series(res).to_numpy()
            return out

        sample = compute(distinct.limit(5).toPandas())
        extra_cols = [c for c in sample.columns if c != time_col]
        schema = ", ".join(
            [f"`{time_col}` {df.schema[time_col].dataType.simpleString()}"]
            + [f"`{c}` double" for c in extra_cols]
        )

        def compute_cast(pdf: pd.DataFrame) -> pd.DataFrame:
            out = compute(pdf)
            for c in extra_cols:
                out[c] = out[c].astype("float64")
            return out[[time_col] + extra_cols]

        mapped = distinct.mapInPandas(
            lambda it: (compute_cast(pdf) for pdf in it), schema=schema
        )
        df = df.join(F.broadcast(mapped), on=time_col, how="left")
        names.extend(extra_cols)
    return df, names
