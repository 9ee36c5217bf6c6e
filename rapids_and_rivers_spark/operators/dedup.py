"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design:
- exact dedup is a hash groupBy (one shuffle on the fingerprint);
- MinHash/SimHash signatures are per-row expressions (no shuffle);
  candidate generation goes through LSH *band buckets* — an equi-join on
  (band, band_hash) — so the pair space is |bucket|², never |corpus|²;
- verification (exact Jaccard / hamming) runs only on candidate pairs.

All signature math uses ``xxhash64`` (JVM, codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rapids_and_rivers_spark.operators.similarity import cosine
from rapids_and_rivers_spark.operators.text import normalized, tokens


# --- exact ------------------------------------------------------------------


def exact_groups(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts: fingerprint, keeper id, count."""
    return (
        df.select(F.md5(F.col(col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n"))
    )


# --- shingles & MinHash ------------------------------------------------------


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    toks = tokens(normalized(col))
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per seed, the min of xxhash64(seed, shingle).

    num_hashes independent permutations approximated by seeded xxhash64 —
    standard practice (Broder's MinHash with k hash functions).
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(i), s)))
            for i in range(num_hashes)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.nullif(union, F.lit(0)).cast("double")


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    ndigits: int = 4,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, Jaccard-verified.

    rows/band = num_hashes/bands; a pair is a candidate when ANY band's
    sub-signature hashes equal. Candidates are then verified with exact
    Jaccard over the shingle sets and filtered at ``threshold``.

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(col), shingle_n).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
    # bands carry only (id, band, band_hash) — the wide shingle arrays are
    # NOT duplicated through the explode/join (joined back per candidate)
    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("sig")[i]
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = base.select("id", "shingles")
    verified = (
        candidates.join(
            shingle_sets.select(
                F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            shingle_sets.select(
                F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")
            ),
            "id_b",
        )
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), ndigits))
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    shingle_n: int = 3,
    threshold: float = 0.2,
    ndigits: int = 4,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs within blocking groups.

    Inverted-index formulation: explode shingles, self-join on
    (block, shingle) to count intersections per pair, then
    ``|a∩b| / (|a|+|b|-|a∩b|)``. Exact for any ``threshold > 0`` (pairs
    sharing no shingle have Jaccard 0 and can never qualify), and far
    cheaper than a block-wise cross join: the pair space is generated
    only where shingles actually collide. Blocking on ``block_col``
    additionally bounds hot shingles (at scale: block on a cheap key —
    source, length bucket, simhash prefix).

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        word_shingles(F.col(col), shingle_n).alias("shingles"),
    ).withColumn("sz", F.size("shingles"))
    ex = base.select("id", "block", "sz", F.explode("shingles").alias("sh"))
    l, r = ex.alias("l"), ex.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.sh") == F.col("r.sh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sz").alias("sz_a"),
            F.col("r.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        ndigits,
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash of the token multiset: bit k is set when more token hashes
    have bit k set than not (Charikar's similarity hash).

    Single pass over the tokens: each hash expands to its bit vector once
    and a ``zip_with`` accumulator sums per-bit counts — O(tokens·bits)
    adds instead of ``bits`` separate filter passes over the token array.
    """
    hashes = F.transform(tokens(normalized(col)), lambda t: F.xxhash64(t))
    n = F.size(hashes)
    ks = F.sequence(F.lit(0), F.lit(bits - 1))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                ks,
                lambda k: F.call_function("shiftright", h, k)
                .bitwiseAND(F.lit(1))
                .cast("int"),
            ),
            lambda a, b: a + b,
        ),
    )
    sig = F.lit(0).cast("long")
    for k in range(bits):
        bit = (counts[k] * 2 > n).cast("long")
        if k == 63:
            # avoid signed-overflow of 1<<63: set the sign bit directly
            sig = sig.bitwiseOR(F.when(bit == 1, F.lit(-(1 << 63))).otherwise(F.lit(0)))
        else:
            sig = sig.bitwiseOR(bit * F.lit(1 << k))
    return sig


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation by the pigeonhole principle: split the 64-bit
    signature into ``chunks`` pieces; any pair within ``max_hamming``
    must agree on at least one whole chunk when ``max_hamming < chunks``
    — so candidates come from equi-joins on (chunk_index, chunk_value),
    never a cross product. With ``max_hamming >= chunks`` recall is
    approximate (pairs whose differing bits spread across every chunk are
    missed); raise ``chunks`` for exact recall at higher distances.
    """
    width = 64 // chunks
    mask = (1 << width) - 1
    base = df.select(F.col(id_col).alias("id"), simhash(F.col(col)).alias("sig"))
    chunked = base.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("sig"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "sig", "cc.chunk", "cc.chunk_val")
    l, r = chunked.alias("l"), chunked.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            hamming64(F.col("l.sig"), F.col("r.sig")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding near-dup -------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.95,
    ndigits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold).

    Blocking on ``block_col`` (cluster/label/LSH bucket) bounds the pair
    space; pass None for full pairwise (test scale only).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
        (F.col(block_col) if block_col else F.lit(0)).alias("block"),
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine(F.col("l.emb"), F.col("r.emb")), ndigits).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
