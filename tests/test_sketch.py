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


class TestQuantileSample:
    def test_sample_quantile_rank_error_bound(self, spark):
        """The est_p50 from a k=128 hash sample must sit near the true
        median in RANK: the fraction of rows below it within 0.5 ± 0.15
        (sampling error O(1/sqrt(k)) ~ 0.044; 0.15 is a loose 3+ sigma
        regression floor)."""
        from rapids_and_rivers_spark.operators import sketch as K
        from rapids_and_rivers_spark.sources import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(
            F.col("value").isNotNull()
        )
        sk = K.quantile_sample(ev, ["event_type"], "event_id", "value", k=128)
        est = sk.select(
            "event_type",
            K.quantile_from_sample(F.col("vals"), F.col("n"), 0.5).alias("q"),
        )
        joined = (
            ev.join(F.broadcast(est), "event_type")
            .groupBy("event_type")
            .agg(
                F.avg(
                    F.when(F.col("value") <= F.col("q"), 1.0).otherwise(0.0)
                ).alias("frac_below")
            )
            .collect()
        )
        assert joined
        for r in joined:
            assert 0.35 <= r.frac_below <= 0.65, (r.event_type, r.frac_below)

    def test_sample_is_exactly_mergeable(self, spark):
        """union + re-truncate of two halves' samples == whole-corpus
        sample — the mergeability that lets per-partition/per-day
        sketches combine without raw rows."""
        from rapids_and_rivers_spark.operators import sketch as K
        from rapids_and_rivers_spark.sources import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(
            F.col("value").isNotNull()
        )
        k = 32

        def sample_pairs(df):
            hashed = df.select(
                "event_type",
                K.kmv_hash(F.col("event_id").cast("string")).alias("h"),
                F.col("value").cast("double").alias("v"),
            )
            from pyspark.sql import Window

            w = Window.partitionBy("event_type").orderBy("h")
            rows = (
                hashed.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= k)
                .collect()
            )
            out = {}
            for r in rows:
                out.setdefault(r.event_type, []).append((r.h, r.v))
            return {g: sorted(p) for g, p in out.items()}

        whole = sample_pairs(ev)
        a = sample_pairs(ev.filter(F.col("event_id") % 2 == 0))
        b = sample_pairs(ev.filter(F.col("event_id") % 2 == 1))
        merged = {
            g: sorted(a.get(g, []) + b.get(g, []))[:k]
            for g in set(a) | set(b)
        }
        assert merged == whole

    def test_quantile_sample_partitioning_invariant(self, spark):
        from rapids_and_rivers_spark.operators import sketch as K
        from rapids_and_rivers_spark.sources import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(
            F.col("value").isNotNull()
        )
        a = sorted(
            (r.event_type, r.n, tuple(r.vals))
            for r in K.quantile_sample(
                ev.repartition(1), ["event_type"], "event_id", "value", k=64
            ).collect()
        )
        b = sorted(
            (r.event_type, r.n, tuple(r.vals))
            for r in K.quantile_sample(
                ev.repartition(13, F.col("event_id")),
                ["event_type"], "event_id", "value", k=64,
            ).collect()
        )
        assert a == b
