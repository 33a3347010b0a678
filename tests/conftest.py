import pytest


@pytest.fixture(scope="session")
def spark():
    from mlforecast_spark.utils import get_spark

    spark = get_spark("mlforecast-spark-tests", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def panel(spark):
    """Deterministic daily panel: 6 series, staggered lengths, no statics."""
    from mlforecast_spark.utils import generate_daily_series

    return generate_daily_series(spark, 6, 40, 80, seed=3).cache()


@pytest.fixture(scope="session")
def panel_static(spark):
    from mlforecast_spark.utils import generate_daily_series

    return generate_daily_series(
        spark, 4, 30, 60, n_static_features=2, seed=5
    ).cache()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    return duckdb.connect()


def assert_frames_match(sdf, ddf, float_cols=None, rtol=1e-6, atol=1e-9):
    """Order-insensitive comparison of a Spark result vs a pandas oracle."""
    import numpy as np
    import pandas as pd

    s = sdf.toPandas() if hasattr(sdf, "toPandas") else sdf
    d = ddf
    assert len(s) == len(d), f"rows {len(s)} vs {len(d)}"
    assert sorted(s.columns) == sorted(d.columns), (s.columns, d.columns)
    cols = sorted(s.columns)
    s = s[cols].copy()
    d = d[cols].copy()
    for c in cols:
        if str(s[c].dtype).startswith("datetime") or str(d[c].dtype).startswith("datetime"):
            s[c] = s[c].astype(str)
            d[c] = d[c].astype(str)
    s = s.sort_values(cols).reset_index(drop=True)
    d = d.sort_values(cols).reset_index(drop=True)
    for c in cols:
        a, b = s[c], d[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            a = pd.to_numeric(a, errors="coerce").astype(float)
            b = pd.to_numeric(b, errors="coerce").astype(float)
            ok = np.isclose(a, b, rtol=rtol, atol=atol) | (a.isna() & b.isna())
            assert ok.all(), f"col {c}: {int((~ok).sum())} diffs, e.g. {a[~ok].head(3).tolist()} vs {b[~ok].head(3).tolist()}"
        else:
            ok = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            assert ok.all(), f"col {c}: {int((~ok).sum())} diffs"
