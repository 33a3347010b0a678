"""Exact-name parity for the reference's public helpers: validate_df /
validate_update_df / validate_continuity / validate_update_start_dates,
get_conformal_method / compute_conformity_scores, TransferResult /
get_transfer_method_spec, get_default_conda_env — a reference user's
imports must resolve and behave the same."""

import pytest
from pyspark.sql import functions as F

from mlforecast_spark.data_validation import (
    validate_continuity,
    validate_df,
    validate_update_df,
    validate_update_start_dates,
)


def _clean_panel(spark):
    rows = []
    for uid in ("a", "b"):
        for d in range(1, 8):
            rows.append((uid, f"2024-01-0{d}", float(d)))
    return spark.createDataFrame(rows, "unique_id string, ds string, y double").select(
        "unique_id", F.to_date("ds").alias("ds"), "y"
    )


def test_validate_continuity_and_df(spark):
    clean = _clean_panel(spark)
    has_issues, bad = validate_continuity(clean)
    assert not has_issues and bad.count() == 0
    validate_df(clean)  # must not raise

    gapped = clean.filter(~((F.col("unique_id") == "a") & (F.dayofmonth("ds") == 4)))
    has_issues, bad = validate_continuity(gapped)
    assert has_issues
    assert [r["unique_id"] for r in bad.collect()] == ["a"]
    with pytest.raises(ValueError, match="missing or duplicate"):
        validate_df(gapped)

    duped = clean.union(clean.filter(F.col("unique_id") == "b").limit(1))
    has_issues, bad = validate_continuity(duped)
    assert has_issues
    assert [r["unique_id"] for r in bad.collect()] == ["b"]


def test_validate_update_start_dates_and_update_df(spark):
    last = spark.createDataFrame(
        [("a", "2024-01-07"), ("b", "2024-01-07")], "unique_id string, _last string"
    ).select("unique_id", F.to_date("_last").alias("_last"))

    good = spark.createDataFrame(
        [("a", "2024-01-08", 1.0), ("a", "2024-01-09", 2.0), ("b", "2024-01-08", 3.0)],
        "unique_id string, ds string, y double",
    ).select("unique_id", F.to_date("ds").alias("ds"), "y")
    has_issues, bad = validate_update_start_dates(good, "unique_id", "ds", last, "D")
    assert not has_issues
    validate_update_df(good, "unique_id", "ds", last, "D")  # must not raise

    # new series (not in last_dates) are allowed to start anywhere
    new_series = spark.createDataFrame(
        [("c", "2024-03-01", 1.0)], "unique_id string, ds string, y double"
    ).select("unique_id", F.to_date("ds").alias("ds"), "y")
    has_issues, _ = validate_update_start_dates(
        new_series, "unique_id", "ds", last, "D"
    )
    assert not has_issues

    skipping = spark.createDataFrame(
        [("a", "2024-01-10", 1.0)], "unique_id string, ds string, y double"
    ).select("unique_id", F.to_date("ds").alias("ds"), "y")
    has_issues, bad = validate_update_start_dates(
        skipping, "unique_id", "ds", last, "D"
    )
    assert has_issues and [r["unique_id"] for r in bad.collect()] == ["a"]
    with pytest.raises(ValueError, match="last date"):
        validate_update_df(skipping, "unique_id", "ds", last, "D")


def test_get_conformal_method():
    from mlforecast_spark.conformal import get_conformal_method

    fn = get_conformal_method("conformal_distribution")
    assert callable(fn)
    with pytest.raises(ValueError, match="not supported"):
        get_conformal_method("bootstrap")


def test_compute_conformity_scores(spark):
    from mlforecast_spark.conformal import compute_conformity_scores

    df = spark.createDataFrame(
        [("a", 10.0, 12.0, 1.5), ("b", 5.0, 4.0, 2.5)],
        "unique_id string, y double, m1 double, extra double",
    )
    out = compute_conformity_scores(df, ["m1"], "y").toPandas().set_index("unique_id")
    assert "y" not in out.columns
    assert out.loc["a", "m1"] == 2.0 and out.loc["b", "m1"] == 1.0
    signed = (
        compute_conformity_scores(df, ["m1"], "y", signed=True)
        .toPandas()
        .set_index("unique_id")
    )
    assert signed.loc["a", "m1"] == -2.0 and signed.loc["b", "m1"] == 1.0
    reordered = compute_conformity_scores(df, ["m1"], "y", feature_cols=["extra"])
    assert reordered.columns[-1] == "extra"


def test_transfer_method_spec_and_result(spark):
    from mlforecast_spark.transfer_conformal import (
        TransferResult,
        get_transfer_method_spec,
    )

    spec = get_transfer_method_spec("weighted_conformal")
    assert spec.needs_source_cs and spec.weighted
    spec = get_transfer_method_spec("recalibrate")
    assert spec.runs_target_cv and not spec.needs_source_cs
    with pytest.raises(ValueError, match="not supported"):
        get_transfer_method_spec("quantile_mapping")

    df = spark.range(1)
    r = TransferResult(cs_df=df)
    assert r.cs_df is df and not r.signed


def test_get_default_conda_env():
    from mlforecast_spark.flavor import (
        get_default_conda_env,
        get_default_pip_requirements,
    )

    env = get_default_conda_env()
    assert env["name"] and "conda-forge" in env["channels"]
    pips = [d for d in env["dependencies"] if isinstance(d, dict)][0]["pip"]
    assert pips == get_default_pip_requirements()
