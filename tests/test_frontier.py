"""Round-9 additions: Pareto frontier (skyline) + mergeable streaming
dual, ER survivorship, cluster-safe splits, rolling HLL windows.

Same discipline as the round-8 test file: hand-computable correctness,
the claimed algebraic property (mergeability / leakage invariant)
pinned explicitly, replay idempotence for the stateful stage.
"""

import tempfile

from pyspark.sql import functions as F

from rapids_and_rivers_spark.operators.frontier import skyline_2d, skyline_merge
from rapids_and_rivers_spark.streaming.duals import (
    skyline_foreach_batch,
    skyline_from_store,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id int, x long, y long")


def test_skyline_hand_case(spark):
    # frontier of {(1,5),(2,4),(3,3),(4,9),(2,6),(5,1)} minimizing both:
    # (1,5) no smaller-x; (2,4) beats (1,5)? no—(1,5) has x<2,y=5>4 so
    # (2,4) survives; (3,3) survives; (4,9) dominated by (1,5);
    # (2,6) dominated by (2,4) same-x smaller-y; (5,1) survives.
    rows = [(1, 1, 5), (2, 2, 4), (3, 3, 3), (4, 4, 9), (5, 2, 6), (6, 5, 1)]
    got = {r.id for r in skyline_2d(_pts(spark, rows), bucket_width=2).collect()}
    assert got == {1, 2, 3, 6}


def test_skyline_duplicates_and_ties(spark):
    # exact duplicate frontier points BOTH survive (neither strictly
    # dominates); same-x non-minimal y dies; y-tie across larger x dies
    # (x strictly larger, y equal -> dominated)
    rows = [(1, 1, 5), (2, 1, 5), (3, 1, 7), (4, 2, 5)]
    got = {r.id for r in skyline_2d(_pts(spark, rows), bucket_width=10).collect()}
    assert got == {1, 2}


def test_skyline_bucket_width_invariant(spark):
    # the bucket width is a physical knob, never a semantic one
    rows = [(i, (i * 37) % 101, (i * 91) % 97) for i in range(1, 200)]
    a = sorted(r.id for r in skyline_2d(_pts(spark, rows), bucket_width=1).collect())
    b = sorted(r.id for r in skyline_2d(_pts(spark, rows), bucket_width=7).collect())
    c = sorted(r.id for r in skyline_2d(_pts(spark, rows), bucket_width=1000).collect())
    assert a == b == c and len(a) > 0


def test_skyline_mergeability(spark):
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the
    algebraic law the streaming dual rests on."""
    rows = [(i, (i * 53) % 211, (i * 17) % 193) for i in range(1, 400)]
    df = _pts(spark, rows)
    a, b = df.filter(F.col("id") % 2 == 0), df.filter(F.col("id") % 2 == 1)
    direct = sorted(tuple(r) for r in skyline_2d(df, bucket_width=16).collect())
    merged = sorted(
        tuple(r)
        for r in skyline_merge(
            skyline_2d(a, bucket_width=16).unionByName(
                skyline_2d(b, bucket_width=16)
            ),
            bucket_width=16,
        ).collect()
    )
    assert direct == merged


def test_skyline_stream_equals_batch_and_replay(spark):
    rows = [(i, (i * 53) % 211, (i * 17) % 193) for i in range(1, 400)]
    df = _pts(spark, rows)
    store = tempfile.mkdtemp(prefix="rars_t_sky_")
    stage = skyline_foreach_batch(store, bucket_width=16)
    stage(df.filter(F.col("id") % 3 == 0), 0)
    stage(df.filter(F.col("id") % 3 == 1), 1)
    stage(df.filter(F.col("id") % 3 == 2), 2)
    got = sorted(tuple(r) for r in skyline_from_store(spark, store, bucket_width=16).collect())
    want = sorted(tuple(r) for r in skyline_2d(df, bucket_width=16).collect())
    assert got == want and len(want) > 0
    # at-least-once replay of epoch 1 must change nothing
    stage(df.filter(F.col("id") % 3 == 1), 1)
    again = sorted(tuple(r) for r in skyline_from_store(spark, store, bucket_width=16).collect())
    assert again == want


def test_cluster_safe_split_no_leakage(spark):
    """The invariant the query exists for: every near-dup cluster lands
    in exactly ONE split (assignment is a function of the rep)."""
    from rapids_and_rivers_spark.catalog import _neardup_blocked
    from rapids_and_rivers_spark.operators import dedup as D
    from rapids_and_rivers_spark.operators import text as T
    from rapids_and_rivers_spark.sources import load_table

    emb = _neardup_blocked(load_table(spark, "/root/testdata/sf0.001", "embeddings"))
    sd = D.semantic_dedup(
        emb, emb_col="embedding", id_col="vec_id", block_col="blk",
        threshold=0.4,
    )
    bucket = T.token_hash_bucket(F.col("rep_id").cast("string"), 100)
    assigned = sd.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"),
    )
    spans = (
        assigned.groupBy("rep_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0
    # and the naive per-doc split WOULD leak on this data (the hole the
    # operator closes) — at least one multi-member cluster straddles
    naive = T.token_hash_bucket(F.col("vec_id").cast("string"), 100)
    naive_assigned = sd.withColumn(
        "split",
        F.when(naive < 90, "train").when(naive < 95, "val").otherwise("test"),
    )
    multi = naive_assigned.groupBy("rep_id").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n"),
    )
    assert multi.filter((F.col("n") > 1) & (F.col("n_splits") > 1)).count() > 0
