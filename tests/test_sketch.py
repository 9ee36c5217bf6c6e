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


# --- count-min sketch --------------------------------------------------------


def _skewed_keys(spark):
    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(200)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates(spark):
    from rapids_and_rivers_spark.operators.sketch import cms_build, cms_estimate

    df = _skewed_keys(spark)
    # deliberately tiny width => collisions guaranteed; one-sided error
    # must still hold for every key
    sketch = cms_build(df, "k", width=16, depth=3)
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {
        r.k: r.est
        for r in cms_estimate(
            df.select("k").distinct(), sketch, "k", width=16, depth=3
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # the heavy hitter dominates its row cells => estimate stays close
    assert est["hot"] >= 500


def test_cms_merge_equals_whole(spark):
    """Cell-wise SUM of two halves' sketches == the whole corpus sketch —
    the mergeability that lets executors/days combine without raw keys."""
    from rapids_and_rivers_spark.operators.sketch import cms_build

    df = _skewed_keys(spark).withColumn("half", F.monotonically_increasing_id() % 2)
    whole = cms_build(df, "k", width=32, depth=4)
    parts = [
        cms_build(df.filter(F.col("half") == i), "k", width=32, depth=4)
        for i in (0, 1)
    ]
    merged = (
        parts[0].unionByName(parts[1]).groupBy("row", "col").agg(
            F.sum("cnt").alias("cnt")
        )
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_estimate_missing_key_is_zero_or_collision(spark):
    from rapids_and_rivers_spark.operators.sketch import cms_build, cms_estimate

    df = _skewed_keys(spark)
    sketch = cms_build(df, "k", width=1024, depth=4)
    unseen = spark.createDataFrame([("never-seen",)], "k string")
    (row,) = cms_estimate(unseen, sketch, "k", width=1024, depth=4).collect()
    # wide sketch, 201 distinct keys: the unseen key's 4 cells are almost
    # surely collision-free in at least one row
    assert row.est == 0


# --- HyperLogLog -------------------------------------------------------------


def test_hll_estimate_within_band(spark):
    from rapids_and_rivers_spark.operators.sketch import hll_estimate, hll_registers

    df = _corpus(spark)
    regs = hll_registers(df, ["g"], "v", p=6)
    rows = {r.g: r for r in hll_estimate(regs, ["g"], p=6).collect()}
    # rsd for m=64 is 1.04/8 = 13%; allow 3 sigma
    assert 2000 * 0.6 < rows["big"].hll_estimate < 2000 * 1.4
    # small group lands in the linear-counting branch: near-exact
    assert 10 * 0.5 <= rows["small"].hll_estimate <= 10 * 1.5
    assert rows["big"].n_registers <= 64


def test_hll_registers_merge_equals_whole(spark):
    """Union of corpora == elementwise register max (mergeability)."""
    from rapids_and_rivers_spark.operators.sketch import hll_registers

    df = _corpus(spark)
    half_a = df.filter(F.crc32(F.col("v")) % 2 == 0)
    half_b = df.filter(F.crc32(F.col("v")) % 2 == 1)
    merged = (
        hll_registers(half_a, ["g"], "v", p=6)
        .unionByName(hll_registers(half_b, ["g"], "v", p=6))
        .groupBy("g", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    whole = hll_registers(df, ["g"], "v", p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_partitioning_invariant(spark):
    from rapids_and_rivers_spark.operators.sketch import hll_estimate, hll_registers

    df = _corpus(spark)
    a = hll_estimate(hll_registers(df.repartition(1), ["g"], "v"), ["g"]).collect()
    b = hll_estimate(
        hll_registers(df.repartition(17, F.col("v")), ["g"], "v"), ["g"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
