from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from catabra_pandas_spark import merge_asof

from .conftest import assert_pdf_equal, to_sdf


def _frames(seed, n_left=400, n_right=150, n_groups=8):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_groups, n_left),
        "t": rng.uniform(0, 1000, n_left).round(1),
        "lval": rng.normal(size=n_left).round(3),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_groups, n_right),
        "t": rng.uniform(0, 1000, n_right).round(1),
        "rval": rng.normal(size=n_right).round(3),
    })
    # pandas tie-breaks duplicate right keys by row position, Spark has no
    # positions — keep (k, t) unique on the right so both agree
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas(spark, direction, allow_exact):
    left, right = _frames(seed=1)
    expected = pd.merge_asof(
        left.sort_values("t", kind="stable"), right.sort_values("t", kind="stable"),
        on="t", by="k", direction=direction, allow_exact_matches=allow_exact)
    out = merge_asof(
        to_sdf(spark, left), to_sdf(spark, right), on="t", by="k",
        direction=direction, allow_exact_matches=allow_exact).toPandas()
    assert_pdf_equal(out, expected, sort_by=["k", "t", "lval"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_tolerance(spark, direction):
    left, right = _frames(seed=2)
    expected = pd.merge_asof(
        left.sort_values("t", kind="stable"), right.sort_values("t", kind="stable"),
        on="t", by="k", direction=direction, tolerance=25.0)
    out = merge_asof(
        to_sdf(spark, left), to_sdf(spark, right), on="t", by="k",
        direction=direction, tolerance=25.0).toPandas()
    assert_pdf_equal(out, expected, sort_by=["k", "t", "lval"])


def test_asof_keyless_global(spark):
    left = pd.DataFrame({"t": [1.0, 5.0, 9.0], "x": [1, 2, 3]})
    right = pd.DataFrame({"t": [2.0, 6.0], "y": [10.0, 20.0]})
    out = merge_asof(to_sdf(spark, left), to_sdf(spark, right),
                     on="t").toPandas().sort_values("t")
    assert out["y"].tolist()[0] != out["y"].tolist()[0]  # t=1 -> no match (NaN)
    assert out["y"].tolist()[1:] == [10.0, 20.0]


def test_asof_null_left_key_gets_no_match(spark):
    left = pd.DataFrame({"k": [1, 1], "t": [5.0, np.nan], "x": [1, 2]})
    right = pd.DataFrame({"k": [1], "t": [1.0], "y": [7.0]})
    for direction in ("backward", "forward", "nearest"):
        out = merge_asof(to_sdf(spark, left), to_sdf(spark, right),
                         on="t", by="k", direction=direction).toPandas()
        got = out.sort_values("x")["y"].tolist()
        if direction == "forward":
            assert pd.isna(got[0])  # only right is at t=1 < 5
        else:
            assert got[0] == 7.0
        assert pd.isna(out.loc[out["x"] == 2, "y"]).all()


def test_asof_suffixes_and_collisions(spark):
    left = pd.DataFrame({"k": [1], "t": [5.0], "v": [1.0]})
    right = pd.DataFrame({"k": [1], "t": [4.0], "v": [9.0], "w": [3.0]})
    out = merge_asof(to_sdf(spark, left), to_sdf(spark, right), on="t", by="k")
    assert set(out.columns) == {"k", "t", "v", "v_r", "w"}
    row = out.toPandas().iloc[0]
    assert row["v"] == 1.0 and row["v_r"] == 9.0 and row["w"] == 3.0


def test_asof_duplicate_right_times_deterministic(spark):
    # two right rows tied on (k, t): the match is the max payload struct
    left = pd.DataFrame({"k": [1], "t": [10.0]})
    right = pd.DataFrame({"k": [1, 1], "t": [4.0, 4.0], "y": [2.0, 8.0]})
    for _ in range(3):
        out = merge_asof(to_sdf(spark, left), to_sdf(spark, right),
                         on="t", by="k").toPandas()
        assert out["y"].tolist() == [8.0]


def test_asof_empty_right(spark):
    left = pd.DataFrame({"k": [1, 2], "t": [5.0, 6.0], "x": [1, 2]})
    right = spark.createDataFrame([], "k long, t double, y double")
    out = merge_asof(to_sdf(spark, left), right, on="t", by="k").toPandas()
    assert len(out) == 2 and out["y"].isna().all()


def test_asof_daytime_interval_key_matches_numeric(spark):
    """DayTimeIntervalType on-keys (reference dtype contract: 'anything
    comparable', /root/reference/catabra_pandas/resampling.py:45-47): the
    interval leg must produce EXACTLY the matches of the same data on a
    numeric seconds axis — exact_numeric_double extracts the full
    microsecond fraction (the truncating bigint cast would silently move
    sub-second matches).  Covers all directions, exact ties (planted key
    collisions), negative durations, numeric and datetime.timedelta
    tolerances."""
    import datetime

    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 120
    lmu = rng.integers(-5_000_000, 5_000_000, n_l)  # microsecond quanta
    rmu = rng.integers(-5_000_000, 5_000_000, n_r)
    lmu[:40] = rng.choice(rmu, 40)  # exact key ties
    left = pd.DataFrame({"k": rng.integers(0, 5, n_l), "s": lmu / 1e6,
                         "x": np.arange(n_l)})
    right = pd.DataFrame({"k": rng.integers(0, 5, n_r), "s": rmu / 1e6,
                          "y": rng.normal(size=n_r).round(3)})
    right = right.drop_duplicates(["k", "s"]).reset_index(drop=True)

    def as_itv(pdf):
        # interval endpoints built Spark-side (NaT-free data; see
        # conftest notes on timedelta64 schema merges)
        return to_sdf(spark, pdf).withColumn(
            "s", F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                                    F.col("s")))

    for direction in ("backward", "forward", "nearest"):
        for allow_exact in (True, False):
            for tol in (None, 1.5, datetime.timedelta(seconds=1.5)):
                kw = dict(on="s", by="k", direction=direction,
                          allow_exact_matches=allow_exact, tolerance=tol)
                base = merge_asof(to_sdf(spark, left), to_sdf(spark, right),
                                  **kw).toPandas()
                got = merge_asof(as_itv(left), as_itv(right), **kw).toPandas()
                a = base.sort_values("x").reset_index(drop=True)["y"]
                b = got.sort_values("x").reset_index(drop=True)["y"]
                assert a.fillna(-1e18).tolist() == b.fillna(-1e18).tolist(), \
                    (direction, allow_exact, tol)


def test_asof_timestamp_key_tolerance_seconds(spark):
    """Timestamp on-keys: tolerance is interpreted in SECONDS."""
    base = pd.Timestamp("2026-01-01 00:00:00")
    left = pd.DataFrame({
        "k": [1, 1],
        "t": [base + pd.Timedelta(minutes=10), base + pd.Timedelta(hours=3)],
        "x": [1, 2],
    })
    right = pd.DataFrame({
        "k": [1],
        "t": [base],
        "y": [7.0],
    })
    out = merge_asof(to_sdf(spark, left), to_sdf(spark, right),
                     on="t", by="k", tolerance=3600.0).toPandas()
    got = out.sort_values("x")["y"].tolist()
    assert got[0] == 7.0          # 10 min <= 1 h
    assert pd.isna(got[1])        # 3 h beyond tolerance
