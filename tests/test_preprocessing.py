"""fill_gaps vs an independent pandas replay (pd.date_range grids built on
the driver, sharing no code with the engine) across time types, freqs and
start/end modes."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark.preprocessing import fill_gaps


def _panel(spark, rows, schema="unique_id string, ds date, y double"):
    return spark.createDataFrame(rows, schema)


def _collect(df):
    pdf = df.toPandas()
    return pdf.sort_values(["unique_id", "ds"]).reset_index(drop=True)


def _expected(frames, start, end, freq_alias):
    """Pandas replay: per-series date_range grid, left-join values."""
    gmin = min(f["ds"].min() for f in frames.values())
    gmax = max(f["ds"].max() for f in frames.values())
    out = []
    for uid, f in frames.items():
        s = {"per_serie": f["ds"].min(), "global": gmin}.get(start, start)
        e = {"per_serie": f["ds"].max(), "global": gmax}.get(end, end)
        grid = pd.DataFrame(
            {"unique_id": uid, "ds": pd.date_range(s, e, freq=freq_alias)}
        )
        f = f[(f["ds"] >= pd.Timestamp(s)) & (f["ds"] <= pd.Timestamp(e))]
        merged = grid.merge(f.assign(unique_id=uid), on=["unique_id", "ds"], how="outer")
        out.append(merged)
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )


def _frames_daily():
    a = pd.DataFrame(
        {"ds": pd.to_datetime(["2024-01-03", "2024-01-05", "2024-01-09"]),
         "y": [1.0, 2.0, 3.0]}
    )
    b = pd.DataFrame(
        {"ds": pd.to_datetime(["2024-01-01", "2024-01-02"]), "y": [4.0, 5.0]}
    )
    return {"A": a, "B": b}


@pytest.mark.parametrize(
    "start,end",
    [
        ("per_serie", "per_serie"),
        ("per_serie", "global"),
        ("global", "global"),
        ("global", "per_serie"),
    ],
)
def test_fill_gaps_daily_modes(spark, start, end):
    frames = _frames_daily()
    rows = [
        (uid, r.ds.date(), r.y) for uid, f in frames.items() for r in f.itertuples()
    ]
    df = _panel(spark, rows)
    got = _collect(fill_gaps(df, "D", start=start, end=end))
    exp = _expected(frames, start, end, "D")
    assert len(got) == len(exp)
    assert list(got["unique_id"]) == list(exp["unique_id"])
    assert [str(d) for d in got["ds"]] == [str(d.date()) for d in exp["ds"]]
    pd.testing.assert_series_equal(
        got["y"], exp["y"], check_names=False, check_index=False
    )
    # generated rows are NULL-filled, observed rows are not
    assert got["y"].isna().equals(exp["y"].isna())


def test_fill_gaps_explicit_bounds_drop_outside(spark):
    frames = _frames_daily()
    rows = [
        (uid, r.ds.date(), r.y) for uid, f in frames.items() for r in f.itertuples()
    ]
    df = _panel(spark, rows)
    got = _collect(
        fill_gaps(df, "D", start=datetime.date(2024, 1, 2), end=datetime.date(2024, 1, 6))
    )
    exp = _expected(frames, "2024-01-02", "2024-01-06", "D")
    assert [str(d) for d in got["ds"]] == [str(d.date()) for d in exp["ds"]]
    pd.testing.assert_series_equal(
        got["y"], exp["y"], check_names=False, check_index=False
    )
    # the 2024-01-01 and 2024-01-09 input rows are gone
    assert str(got["ds"].min()) == "2024-01-02" and str(got["ds"].max()) == "2024-01-06"


def test_fill_gaps_hourly_timestamps(spark):
    rows = [
        ("A", datetime.datetime(2024, 1, 1, 0), 1.0),
        ("A", datetime.datetime(2024, 1, 1, 5), 2.0),
        ("B", datetime.datetime(2024, 1, 1, 2), 3.0),
    ]
    df = _panel(spark, rows, "unique_id string, ds timestamp, y double")
    got = _collect(fill_gaps(df, "2h", start="per_serie", end="per_serie"))
    # A: 0,2,4 on-grid plus the off-grid 05:00 observation kept
    a = got[got.unique_id == "A"]
    assert [d.hour for d in a["ds"]] == [0, 2, 4, 5]
    assert a["y"].tolist()[0] == 1.0 and a["y"].tolist()[-1] == 2.0
    assert a["y"].isna().tolist() == [False, True, True, False]
    b = got[got.unique_id == "B"]
    assert [d.hour for d in b["ds"]] == [2] and b["y"].tolist() == [3.0]


def test_fill_gaps_int_and_month_freqs(spark):
    df = _panel(
        spark,
        [("A", 4, 1.0), ("A", 10, 2.0), ("B", 7, 3.0)],
        "unique_id string, ds int, y double",
    )
    got = _collect(fill_gaps(df, 2, start="per_serie", end="global"))
    assert got[got.unique_id == "A"]["ds"].tolist() == [4, 6, 8, 10]
    assert got[got.unique_id == "B"]["ds"].tolist() == [7, 9]

    dfm = _panel(
        spark,
        [
            ("A", datetime.date(2024, 1, 1), 1.0),
            ("A", datetime.date(2024, 5, 1), 2.0),
        ],
    )
    gotm = _collect(fill_gaps(dfm, "MS", start="per_serie", end="per_serie"))
    assert [str(d) for d in gotm["ds"]] == [
        "2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01", "2024-05-01",
    ]
    assert gotm["y"].isna().tolist() == [False, True, True, True, False]


def test_fill_gaps_chunked_generation_matches_unchunked(spark):
    # 1000 steps with chunk=16 → 63 coarse rows; result identical to one-shot
    rows = [("A", datetime.date(2021, 1, 1), 0.0), ("A", datetime.date(2023, 9, 27), 1.0)]
    df = _panel(spark, rows)
    small = _collect(fill_gaps(df, "D", chunk=16))
    big = _collect(fill_gaps(df, "D", chunk=1 << 20))
    assert small["ds"].tolist() == big["ds"].tolist()
    assert len(small) == (datetime.date(2023, 9, 27) - datetime.date(2021, 1, 1)).days + 1


def test_fill_gaps_extra_columns_null_filled(spark):
    df = _panel(
        spark,
        [("A", datetime.date(2024, 1, 1), 1.0, "x"), ("A", datetime.date(2024, 1, 3), 2.0, "z")],
        "unique_id string, ds date, y double, tag string",
    )
    got = _collect(fill_gaps(df, "D"))
    assert got.columns.tolist() == ["unique_id", "ds", "y", "tag"]
    assert got["tag"].tolist() == ["x", None, "z"]


def test_fill_gaps_on_grid_fast_path(spark):
    frames = _frames_daily()
    rows = [
        (uid, r.ds.date(), r.y) for uid, f in frames.items() for r in f.itertuples()
    ]
    df = _panel(spark, rows)
    slow = _collect(fill_gaps(df, "D", start="per_serie", end="global"))
    fast = _collect(fill_gaps(df, "D", start="per_serie", end="global", on_grid=True))
    pd.testing.assert_frame_equal(slow, fast)
    # the fast path drops the union+distinct: no Union in its plan
    plan = (
        fill_gaps(df, "D", on_grid=True)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Union" not in plan
    assert "Union" in (
        fill_gaps(df, "D")._jdf.queryExecution().optimizedPlan().toString()
    )


def test_fill_gaps_plan_has_no_cartesian_or_window(spark):
    df = _panel(spark, [("A", datetime.date(2024, 1, 1), 1.0)])
    plan = fill_gaps(df, "D", start="global", end="global")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # limits come from aggs, never a raw-row window
