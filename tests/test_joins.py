"""Differential tests for the temporal join operators.

asof_join is checked against ``pandas.merge_asof`` (the widely-trusted
reference implementation of backward as-of semantics) over randomized
inputs; range_join against a naive O(n*m) pandas cross filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from rapids_and_rivers_spark.operators.joins import (
    asof_join,
    asof_join_sliced,
    range_join,
)


def _random_frames(seed: int, n_left: int = 120, n_right: int = 90):
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_left),
            "lt": base + pd.to_timedelta(rng.randint(0, 500_000, n_left), unit="s"),
            "lval": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_right),
            "rt": base + pd.to_timedelta(rng.randint(0, 500_000, n_right), unit="s"),
            "rval": np.arange(n_right) * 10,
        }
    )
    # merge_asof demands unique, sorted times; jitter out duplicates
    left["lt"] = left["lt"] + pd.to_timedelta(rng.permutation(n_left), unit="us")
    right["rt"] = right["rt"] + pd.to_timedelta(rng.permutation(n_right), unit="us")
    return left, right


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    left, right = _random_frames(seed)
    sl = spark.createDataFrame(left).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    sr = spark.createDataFrame(right).withColumn("rt", F.col("rt").cast("timestamp_ntz"))

    got = (
        asof_join(sl, sr, by="k", left_time="lt", right_time="rt")
        .select("k", "lt", "lval", "rval")
        .toPandas()
        .sort_values(["k", "lt"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("lt"),
            right.sort_values("rt"),
            left_on="lt",
            right_on="rt",
            by="k",
            direction="backward",
        )[["k", "lt", "lval", "rval"]]
        .sort_values(["k", "lt"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_tolerance_and_strict(spark):
    left = pd.DataFrame(
        {"k": [1, 1, 1], "lt": pd.to_datetime(["2024-01-01 00:00:10",
                                               "2024-01-01 00:01:00",
                                               "2024-01-01 00:10:00"]), "lval": [1, 2, 3]}
    )
    right = pd.DataFrame(
        {"k": [1], "rt": pd.to_datetime(["2024-01-01 00:00:10"]), "rval": [99]}
    )
    sl = spark.createDataFrame(left).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    sr = spark.createDataFrame(right).withColumn("rt", F.col("rt").cast("timestamp_ntz"))

    # inclusive: equal-time right row matches; 60s tolerance drops the 10min row
    got = (
        asof_join(sl, sr, "k", "lt", "rt", tolerance_seconds=60)
        .orderBy("lval")
        .select("rval")
        .toPandas()["rval"]
        .tolist()
    )
    assert got[0] == 99 and got[1] == 99 and pd.isna(got[2])
    # strict: the equal-time row no longer matches
    got_strict = (
        asof_join(sl, sr, "k", "lt", "rt", strict=True)
        .orderBy("lval")
        .select("rval")
        .toPandas()["rval"]
        .tolist()
    )
    assert pd.isna(got_strict[0]) and got_strict[1] == 99 and got_strict[2] == 99


def test_asof_join_rejects_column_collision(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01"]), "x": [1]})
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df.withColumnRenamed("t", "rt"), "k", "t", "rt")


def test_asof_join_rejects_same_time_name(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01"]), "x": [1]})
    )
    with pytest.raises(ValueError, match="alias"):
        asof_join(df, df.withColumnRenamed("x", "y"), "k", "t", "t")


def test_asof_join_duplicate_time_tiebreak_is_deterministic(spark):
    """Several right rows at the same (key, time): the max payload struct
    wins — the same winner on every run regardless of input order."""
    left = pd.DataFrame(
        {"k": [1], "lt": pd.to_datetime(["2024-01-01 00:01:00"]), "lval": [0]}
    )
    dup = pd.DataFrame(
        {
            "k": [1] * 4,
            "rt": pd.to_datetime(["2024-01-01 00:00:00"] * 4),
            "rval": [30, 10, 40, 20],
        }
    )
    sl = spark.createDataFrame(left).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    for order in ([0, 1, 2, 3], [3, 2, 1, 0], [2, 0, 3, 1]):
        sr = spark.createDataFrame(dup.iloc[order]).withColumn(
            "rt", F.col("rt").cast("timestamp_ntz")
        )
        got = asof_join(sl, sr, "k", "lt", "rt").select("rval").collect()
        assert [r.rval for r in got] == [40]


@pytest.mark.parametrize("seed,strict", [(1, False), (7, True), (42, False)])
def test_asof_join_sliced_matches_plain(spark, seed, strict):
    """The time-sliced hot-key variant must be semantically identical to
    the per-key-window asof_join, including strict mode and slices with
    no right rows (carry-in inheritance)."""
    left, right = _random_frames(seed)
    sl = spark.createDataFrame(left).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    sr = spark.createDataFrame(right).withColumn("rt", F.col("rt").cast("timestamp_ntz"))
    cols = ["k", "lt", "lval", "rval", "rt"]
    plain = sorted(
        map(tuple, asof_join(sl, sr, "k", "lt", "rt", strict=strict).select(*cols).collect())
    )
    # 1h slices over the ~6-day span -> many slices, most without right rows
    sliced = sorted(
        map(
            tuple,
            asof_join_sliced(
                sl, sr, "k", "lt", "rt", slice_seconds=3600, strict=strict
            ).select(*cols).collect(),
        )
    )
    assert sliced == plain


def test_asof_hot_key_stress_within_budget(spark):
    """Verdict #9: 1e5 rows on ONE key — differential vs pandas merge_asof
    for both variants, inside a wall-clock budget."""
    import time

    rng = np.random.RandomState(3)
    n_left, n_right = 100_000, 10_000
    base = pd.Timestamp("2024-01-01")
    # unique microsecond offsets keep merge_asof's tie semantics out of play
    lt_off = rng.choice(500_000_000, size=n_left, replace=False)
    rt_off = rng.choice(500_000_000, size=n_right, replace=False)
    left = pd.DataFrame(
        {"k": 0, "lt": base + pd.to_timedelta(lt_off, unit="us"),
         "lval": np.arange(n_left)}
    )
    right = pd.DataFrame(
        {"k": 0, "rt": base + pd.to_timedelta(rt_off, unit="us"),
         "rval": np.arange(n_right) * 10}
    )
    sl = spark.createDataFrame(left).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    sr = spark.createDataFrame(right).withColumn("rt", F.col("rt").cast("timestamp_ntz"))
    want = (
        pd.merge_asof(
            left.sort_values("lt"), right.sort_values("rt"),
            left_on="lt", right_on="rt", by="k", direction="backward",
        )[["lval", "rval"]]
        .sort_values("lval").reset_index(drop=True)
    )
    budget_seconds = 120
    for fn in (
        lambda: asof_join(sl, sr, "k", "lt", "rt"),
        lambda: asof_join_sliced(sl, sr, "k", "lt", "rt", slice_seconds=30),
    ):
        t0 = time.time()
        got = (
            fn().select("lval", "rval").toPandas()
            .sort_values("lval").reset_index(drop=True)
        )
        elapsed = time.time() - t0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert elapsed < budget_seconds, f"hot-key asof took {elapsed:.1f}s"


def test_range_join_rejects_nonpositive_bucket(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01"]), "x": [1]})
    )
    r = df.withColumnRenamed("t", "rt").withColumnRenamed("x", "y")
    for bad in (0.0, -5.0):
        with pytest.raises(ValueError, match="bucket_seconds"):
            range_join(df, r, "k", "t", "rt", 0.0, 10.0, bucket_seconds=bad)


def test_range_join_quotes_odd_column_names(spark):
    """Time columns whose names need backtick quoting must work."""
    left = pd.DataFrame(
        {"k": [1], "left time": pd.to_datetime(["2024-01-01 00:00:00"]), "lval": [1]}
    )
    right = pd.DataFrame(
        {"k": [1], "right-time": pd.to_datetime(["2024-01-01 00:00:30"]), "rval": [2]}
    )
    sl = spark.createDataFrame(left).withColumn(
        "left time", F.col("left time").cast("timestamp_ntz")
    )
    sr = spark.createDataFrame(right).withColumn(
        "right-time", F.col("right-time").cast("timestamp_ntz")
    )
    got = range_join(
        sl, sr, "k", "left time", "right-time", 0.0, 60.0
    ).select("lval", "rval").collect()
    assert [(r.lval, r.rval) for r in got] == [(1, 2)]


@pytest.mark.parametrize("lower,upper", [(-300.0, 0.0), (0.0, 120.0), (-60.0, 60.0)])
def test_range_join_matches_naive(spark, lower, upper):
    left, right = _random_frames(11, 80, 80)
    sl = spark.createDataFrame(left).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    sr = spark.createDataFrame(right).withColumn("rt", F.col("rt").cast("timestamp_ntz"))
    got = (
        range_join(
            sl,
            sr,
            by="k",
            left_time="lt",
            right_time="rt",
            lower_seconds=lower,
            upper_seconds=upper,
        )
        .select("lval", "rval")
        .toPandas()
        .sort_values(["lval", "rval"])
        .reset_index(drop=True)
    )
    naive = left.merge(right, on="k")
    gap = (naive["rt"] - naive["lt"]).dt.total_seconds()
    naive = naive[(gap >= lower) & (gap <= upper)][["lval", "rval"]]
    naive = naive.sort_values(["lval", "rval"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, naive, check_dtype=False)


def test_range_join_rejects_bad_bounds(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01"]), "x": [1]})
    )
    with pytest.raises(ValueError):
        range_join(df, df.withColumnRenamed("t", "rt").withColumnRenamed("x", "y"),
                   "k", "t", "rt", 10.0, 0.0)


def test_asof_join_sliced_supports_map_payload(spark):
    """Map-typed right payloads skip the orderable tiebreak in the plain
    variant; the sliced variant must accept them identically (max_by on
    time alone) instead of failing to order a struct containing a map."""
    sl = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00")], "k int, lt string"
    ).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    sr = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", {"a": "1"})],
        "k int, rt string, rmap map<string,string>",
    ).withColumn("rt", F.col("rt").cast("timestamp_ntz"))
    for fn in (asof_join, asof_join_sliced):
        kwargs = {"slice_seconds": 60} if fn is asof_join_sliced else {}
        got = fn(sl, sr, "k", "lt", "rt", **kwargs).collect()
        assert len(got) == 1 and got[0].rmap == {"a": "1"}
