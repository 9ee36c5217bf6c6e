"""KMV distinct sketch: accuracy band, exact small-group fallback,
partitioning invariance (the determinism property HLL lacks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rapids_and_rivers_spark.operators.sketch import kmv_sketch


def _corpus(spark):
    big = [("big", f"value-{i}") for i in range(2000)]
    # duplicates must not affect the sketch (distinct-value semantics)
    big += [("big", f"value-{i}") for i in range(500)]
    small = [("small", f"v-{i}") for i in range(10)]
    return spark.createDataFrame(big + small, "g string, v string")


def test_kmv_estimate_within_band(spark):
    rows = {r.g: r for r in kmv_sketch(_corpus(spark), ["g"], "v", k=64).collect()}
    big = rows["big"]
    assert big.n_seen == 64 and big.uk is not None
    # standard error of KMV is ~1/sqrt(k-2) ≈ 12.7%; allow 3 sigma
    assert 2000 * 0.6 < big.estimate < 2000 * 1.4


def test_kmv_small_group_exact_fallback(spark):
    rows = {r.g: r for r in kmv_sketch(_corpus(spark), ["g"], "v", k=64).collect()}
    small = rows["small"]
    assert small.uk is None
    assert small.n_seen == 10 and small.estimate == 10.0


def test_kmv_partitioning_invariant(spark):
    df = _corpus(spark)
    a = kmv_sketch(df.repartition(1), ["g"], "v", k=64).collect()
    b = kmv_sketch(df.repartition(17, F.col("v")), ["g"], "v", k=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
