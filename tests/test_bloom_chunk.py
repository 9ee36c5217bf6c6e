"""Bloom-filter join pruning, RAG chunking, char entropy, z-order key."""

import math

import pytest
from pyspark.sql import functions as F

from rapids_and_rivers_spark.operators import bloomjoin as B
from rapids_and_rivers_spark.operators import text as T


# --------------------------------------------------------------------------
# bloom filter
# --------------------------------------------------------------------------


def test_bloom_params_sizing():
    m, k = B.bloom_params(1000, 0.01)
    assert m % 64 == 0
    # textbook ~9.6 bits/item, ~7 hashes at 1% fpp
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        B.bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        B.bloom_params(100, 1.5)


def test_bloom_no_false_negatives_and_fp_bound(spark):
    members = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    num_bits, num_hashes = B.bloom_params(1000, 0.01)
    words = B.bloom_build(members, "k", num_bits, num_hashes)
    assert len(words) == num_bits // 64

    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    hits = probe.filter(
        B.bloom_might_contain(words, F.col("k"), num_bits, num_hashes)
    )
    hit_set = {r["k"] for r in hits.collect()}
    true_set = {r["k"] for r in members.collect()}
    in_range = {v for v in true_set if v < 20000}
    # zero false negatives
    assert in_range <= hit_set
    # false-positive rate within 5x of the target (generous CI margin)
    fps = len(hit_set - true_set)
    non_members = 20000 - len(in_range)
    assert fps / non_members < 0.05, f"fp rate {fps / non_members:.4f}"


def test_bloom_filter_join_exact(spark):
    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 17).alias("v")
    )
    small = spark.range(0, 200).select((F.col("id") * 13).alias("sk"))
    got = (
        B.bloom_filter_join(big, small, "k", "sk", expected_items=200)
        .select("k", "v")
        .collect()
    )
    want = big.join(small, big["k"] == small["sk"]).select("k", "v").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


# --------------------------------------------------------------------------
# chunking
# --------------------------------------------------------------------------


def _chunk_df(spark, texts, chunk_size=5, stride=3):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return T.chunk_documents(
        df, chunk_size=chunk_size, stride=stride
    ).orderBy("doc_id", "chunk_idx")


def test_chunk_documents_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    rows = _chunk_df(spark, [text]).collect()
    # starts 1, 4, 7, 10 -> 4 chunks
    assert [r["tok_start"] for r in rows] == [1, 4, 7, 10]
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["chunk_tokens"] for r in rows] == [5, 5, 4, 1]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3 t4"
    # overlap: chunk i+1 repeats the last chunk_size-stride tokens of chunk i
    assert rows[1]["chunk_text"].split()[:2] == rows[0]["chunk_text"].split()[3:]
    # every token position appears in at least one chunk
    covered = set()
    for r in rows:
        start = r["tok_start"]
        covered.update(range(start, start + r["chunk_tokens"]))
    assert covered == set(range(1, 11))


def test_chunk_documents_short_doc_single_chunk(spark):
    rows = _chunk_df(spark, ["one two"]).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "one two"
    assert rows[0]["chunk_tokens"] == 2


def test_chunk_documents_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError):
        T.chunk_documents(df, stride=-1)


# --------------------------------------------------------------------------
# char entropy
# --------------------------------------------------------------------------


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, "")],
        "doc_id long, text string",
    )
    bound = df.select("doc_id", T.text_chars(F.col("text")).alias("__chars"))
    rows = {
        r["doc_id"]: r["h"]
        for r in bound.select(
            "doc_id", T.char_entropy(F.col("__chars")).alias("h")
        ).collect()
    }
    assert rows[0] == 0.0  # single symbol
    assert rows[1] == 1.0  # two symbols, uniform
    assert rows[2] == 2.0  # four symbols, uniform
    assert rows[3] is None  # empty -> NULL, not -0.0


def test_char_entropy_skewed(spark):
    # p = [3/4, 1/4] -> H = 0.75*log2(4/3) + 0.25*2
    expect = round(-(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25)), 4)
    df = spark.createDataFrame([(0, "aaab")], "doc_id long, text string")
    bound = df.select(T.text_chars(F.col("text")).alias("__chars"))
    [row] = bound.select(T.char_entropy(F.col("__chars")).alias("h")).collect()
    assert row["h"] == expect


# --------------------------------------------------------------------------
# z-order interleave
# --------------------------------------------------------------------------


def test_zorder_interleave_known_values(spark):
    from rapids_and_rivers_spark.sources import morton_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x int, y int"
    )
    rows = df.select(
        "x", "y", morton_key([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in rows}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1  # x bits occupy even positions
    assert got[(0, 1)] == 2  # y bits occupy odd positions
    # x=3 (0b11), y=5 (0b101): z = interleave -> 1*1 + 2*1 + 4*1 + 8*0 + 16*0 + 32*1
    assert got[(3, 5)] == 0b100111


def test_write_zordered_bounds_both_dims(spark, tmp_path):
    """Each z-ordered output file must be a bounded rectangle in BOTH
    dimensions — the data-skipping property a single-column sort can't
    give the second column."""
    from rapids_and_rivers_spark.sources import write_zordered

    n, side = 4096, 64  # uniform 64x64 grid
    df = spark.range(n).select(
        (F.col("id") % side).cast("int").alias("x"),
        (F.col("id") / side).cast("int").alias("y"),
    )
    path = str(tmp_path / "zord")
    write_zordered(df, path, ["x", "y"], bits=6, num_files=16)

    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("rx"),
            (F.max("y") - F.min("y")).alias("ry"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    assert len(per_file) == 16
    assert sum(r["cnt"] for r in per_file) == n
    # 16 files over a 64x64 Morton curve -> each file covers a 16x16
    # quadrant (range 15); allow boundary slop from range-sampling splits
    for r in per_file:
        assert r["rx"] <= 32, f"x range {r['rx']} too wide"
        assert r["ry"] <= 32, f"y range {r['ry']} too wide"


def test_morton_key_validation(spark):
    from rapids_and_rivers_spark.sources import morton_key

    with pytest.raises(ValueError):
        morton_key([])
    with pytest.raises(ValueError):
        morton_key([F.col("a"), F.col("b")], bits=32)  # 64 bits > 63
