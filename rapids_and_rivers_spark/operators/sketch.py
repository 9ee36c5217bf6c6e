"""Mergeable sketches over md5-derived hashes: KMV distinct-count and
count-min frequency estimation.

The KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al., "On
Synopses for Distinct-Value Estimation Under Multiset Operations",
SIGMOD 2007) estimates |distinct| from the k-th smallest normalized hash:
``estimate = (k-1) / u_k``. Unlike HyperLogLog (Spark's
``approx_count_distinct``), a KMV over a FIXED hash is fully
deterministic — two engines hashing with md5 produce bit-identical
sketches, which makes it oracle-checkable cross-engine AND
retry/repartition-stable at 100 TB (no RNG, no accumulation-order
dependence).

Scale shape: one partial-aggregating shuffle per group (Spark plans the
per-partition bottom-k before the exchange via partial min-heap
aggregation of ``collect_list`` → here we keep it simpler and exact:
filter-to-candidates first with a cheap per-group rank — see
:func:`kmv_sketch`). Sketch size is k × 8 bytes per group — mergeable
(union = merge + re-truncate), the property that lets a 1000-executor
cluster combine per-partition sketches without touching raw values.

Determinism: the hash value is the first 13 hex chars of md5 (52 bits —
EXACTLY representable in a double, so the normalized fraction and the
estimate divide identically in any IEEE-754 engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: 2^52 — the hash domain size for 13 hex chars
KMV_DOMAIN = float(1 << 52)


def kmv_hash(col: Column) -> Column:
    """52-bit integer hash: first 13 hex chars of md5, base-16 decoded.

    52 bits keeps the value exactly representable as a double in ANY
    engine — the cross-engine determinism contract of this sketch.
    """
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("bigint")


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct estimate: ``(group…, n_seen, uk, estimate)``.

    ``uk`` is the k-th smallest distinct hash (the sketch boundary —
    an exact BIGINT, bit-comparable across engines); ``estimate`` is
    ``(k-1) / (uk / 2^52)``. Groups with fewer than ``k`` distinct values
    fall back to the EXACT distinct count (estimate = n_seen, uk = NULL)
    — the standard KMV small-cardinality exactness property.

    Plan: distinct (one shuffle, partial agg) → per-group rank on the
    hash (shuffle on group key; the rank window is per-group, never
    global) → k-th row pick + group rollup. With very few, very large
    groups the rank window concentrates each group's distinct hashes in
    one partition (sort spills, stays correct); the production
    refinement for billions-distinct groups is a salted two-phase
    bottom-k (per-(group, salt) bottom-k, merge, re-truncate — KMV
    sketches are mergeable by construction).
    """
    hashed = df.select(*group_cols, kmv_hash(F.col(value_col)).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = hashed.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.max(F.when(F.col("rk") == k, F.col("h"))).alias("uk"),
        )
        .select(
            *group_cols,
            "n_seen",
            "uk",
            F.when(
                F.col("uk").isNotNull(),
                F.round(F.lit(float(k - 1)) / (F.col("uk") / F.lit(KMV_DOMAIN)), 4),
            )
            .otherwise(F.col("n_seen").cast("double"))
            .alias("estimate"),
        )
    )


# --- count-min sketch --------------------------------------------------------


def cms_position(key: Column, row: int, width: int) -> Column:
    """Deterministic cell column for hash row ``row``: 52-bit md5-derived
    hash of ``row:key`` mod width — same cross-engine determinism
    contract as :func:`kmv_hash` (DuckDB recomputes it bit-identically)."""
    return F.pmod(
        kmv_hash(F.concat_ws(":", F.lit(str(row)), key)), F.lit(width)
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a sparse
    ``(row, col, cnt)`` cell table of ``depth × width`` counters.

    One explode (depth cells per input row) + one keyed groupBy with
    map-side partial agg — the sketch is ≤ depth·width rows regardless
    of input size, and MERGEABLE: summing two corpora's cell tables
    yields exactly the whole-corpus sketch (pinned by test), which is
    how 1000 executors / N days of stream combine without raw keys.
    """
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_position(F.col(key_col), i, width).alias("col"),
                )
                for i in range(depth)
            ]
        )
    ).alias("cell")
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(cells, w.cast("long").alias("w"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for each key row: ``est = min over rows of
    cnt[row][h_row(key)]`` — never an underestimate (CMS one-sided error
    guarantee, pinned by test). The join is an equi-join of |keys|·depth
    probe rows against the ≤ depth·width-row sketch (broadcastable)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_position(F.col(key_col), i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


# --- HyperLogLog -------------------------------------------------------------


def hll_bucket_rho(col: Column, p: int = 6) -> tuple[Column, Column]:
    """The per-row HLL observation as JVM Column expressions:
    ``(bucket, rho)`` — low ``p`` hash bits select the register, rho is
    the leading-zero count of the remaining ``52-p`` bits plus one,
    computed with integer/string ops (``length(bin(w))`` is the bit
    length — no floating log, no engine drift). Shared by the batch
    register builder and the streaming state handler so both paths hash
    identically."""
    m = 1 << p
    wbits = 52 - p
    h = kmv_hash(col)
    w = F.shiftrightunsigned(h, p)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return h.bitwiseAND(F.lit(m - 1)), rho.cast("int")


def hll_estimate_py(registers: list[int], p: int = 6) -> tuple[int, float]:
    """Driver/Python twin of :func:`hll_estimate` for the streaming state
    handler: identical constants, identical IEEE ops (the 2^-M sum is
    exact, see hll_estimate), half-up rounding to match ``F.round``.
    Input is the DENSE register array (zeros included); returns
    ``(n_registers, estimate)``."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    m = 1 << p
    alpha = 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m)
    present = [r for r in registers if r > 0]
    zeros = m - len(present)
    sum_inv = sum(2.0 ** -r for r in present) + float(zeros)
    raw = alpha * m * m / sum_inv
    if raw <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / zeros)
    else:
        est = raw
    rounded = float(
        Decimal(repr(est)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )
    return len(present), rounded


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """Per-group HyperLogLog register table ``(group…, bucket, m_j)``
    (Flajolet et al. 2007) over the same deterministic 52-bit md5 hash
    as :func:`kmv_hash` — so unlike Spark's ``approx_count_distinct``
    (xxhash64-based HLL++, opaque binary sketch) the registers are
    recomputable bit-for-bit by ANY engine, including the DuckDB oracle.

    bucket = low ``p`` bits; rho = leading-zero count of the remaining
    ``52-p`` bits + 1 (computed with integer/string ops — ``length(bin(w))``
    is the bit length — no floating log, no engine drift). The register
    table is ≤ 2^p rows per group and MERGEABLE by ``max`` per bucket
    (union of corpora = elementwise register max — pinned by test), the
    property that lets 1000 executors / N days of stream combine
    per-partition sketches of 8·2^p bytes instead of raw keys.
    """
    bucket, rho = hll_bucket_rho(F.col(value_col), p)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 6,
) -> DataFrame:
    """Collapse a register table into ``(group…, n_registers, hll_estimate)``.

    ``E = alpha_m * m^2 / (sum_j 2^-M_j)`` with the standard small-range
    linear-counting correction ``E <= 2.5m and V>0 -> m*ln(m/V)``
    (V = empty registers). Determinism note: every ``2^-M_j`` term is an
    exact binary fraction and the whole sum spans ≤ 52 bits of mantissa,
    so the sum is EXACT (order-independent) in IEEE-754 — both engines
    take the same correction branch and divide the same numbers; the only
    libm call (ln, in the sparse branch) is guarded by ``round(…, 2)``.
    One groupBy of an ≤ 2^p-rows-per-group table — negligible at any scale.
    """
    m = 1 << p
    alpha = 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("sum_present"),
        F.count(F.lit(1)).alias("n_registers"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    sum_inv = F.col("sum_present") + zeros.cast("double")
    raw = F.lit(alpha) * F.lit(m) * F.lit(m) / sum_inv
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_registers").cast("long").alias("n_registers"),
        F.round(est, 2).alias("hll_estimate"),
    )


# --- theta sketch set operations ---------------------------------------------


def theta_bottom_k(df: DataFrame, value_col: str, k: int = 64) -> DataFrame:
    """Bottom-k distinct-hash sample of one set: the theta sketch's
    sample set (Dasgupta et al., "Theta Sketch Framework", 2016 — the
    KMV sketch generalized to set algebra).

    Plans as distinct (one partial-agg shuffle) then
    ``TakeOrderedAndProject`` via ``orderBy().limit(k)`` — every
    partition contributes its local bottom-k, the driver merges k-sized
    heaps; no global sort, no single-partition window. The result is a
    ≤ k-row DataFrame: the sketch. Identical md5-hash contract as
    :func:`kmv_hash`, so any IEEE-754 engine rebuilds it bit-for-bit.
    """
    return (
        df.select(kmv_hash(F.col(value_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def theta_setops(
    spark,
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch set algebra between two sets: distinct-count
    estimates for A, B, A∪B, A∩B, A\\B from two bottom-k sketches.

    The two sketches are collected to the coordinator — BOUNDED by
    construction (≤ k 8-byte longs each, independent of data size; the
    same collect class as the bloom bitmap / IVF codebook) — and the set
    algebra runs on the samples, exactly how production theta sketches
    merge at a query coordinator (the raw data is never touched again):

    - ``theta_x = (k-th smallest hash)/2^52`` if the set has ≥ k distinct
      values, else 1.0 (sketch exact, estimate = true count);
    - union:        theta = min(theta_a, theta_b);
                    est = |{h in Sa ∪ Sb : h < theta}| / theta
    - intersection: est = |{h in Sa ∩ Sb : h < theta}| / theta
    - difference:   est = |{h in Sa \\ Sb : h < theta}| / theta

    Estimates are exact whenever both sketches are exact (theta = 1).
    Output: one row ``(k, n_a, n_b, theta_scaled, est_a, est_b,
    est_union, est_intersect, est_diff_ab)`` — theta_scaled is the
    52-bit-integer theta boundary (exact BIGINT; NULL when both exact),
    estimates rounded to 2.
    """
    # bounded-collect: theta_bottom_k keeps <= k hashes per side
    sa = [r["h"] for r in theta_bottom_k(df_a, value_col, k).collect()]
    # bounded-collect: theta_bottom_k keeps <= k hashes per side
    sb = [r["h"] for r in theta_bottom_k(df_b, value_col, k).collect()]
    row = theta_setops_from_samples(sa, sb, k)
    schema = (
        "k int, n_a int, n_b int, theta_scaled bigint, est_a double, "
        "est_b double, est_union double, est_intersect double, "
        "est_diff_ab double"
    )
    return spark.createDataFrame([row], schema=schema)


def theta_setops_from_samples(sa: list[int], sb: list[int], k: int) -> dict:
    """The coordinator-side theta set algebra on two bottom-k samples —
    shared by the batch operator and the streaming dual (whose state IS
    the sample list). See :func:`theta_setops` for the estimator
    definitions.
    """

    from rapids_and_rivers_spark.operators.linalg import _half_up

    def theta_of(s: list[int]) -> float:
        return (max(s) / KMV_DOMAIN) if len(s) >= k else 1.0

    ta, tb = theta_of(sa), theta_of(sb)
    theta = min(ta, tb)
    bound = theta * KMV_DOMAIN

    def est_below(hs) -> float:
        # strictly below theta: with theta = k-th smallest of the SAME
        # set this leaves k-1 samples -> the classic (k-1)/u_k estimator
        # HALF-UP rounding (not Python's banker's round) to match the
        # SQL round() both the oracle and F.round use at .xx5 boundaries.
        n = sum(1 for h in hs if h < bound)
        return _half_up(n / theta, 2)

    def est_one(s: list[int], t: float) -> float:
        if t >= 1.0:
            return float(len(s))
        return _half_up((k - 1) / t, 2)

    A, B = set(sa), set(sb)
    return {
        "k": k,
        "n_a": len(sa),
        "n_b": len(sb),
        "theta_scaled": int(bound) if theta < 1.0 else None,
        "est_a": est_one(sa, ta),
        "est_b": est_one(sb, tb),
        "est_union": est_below(A | B),
        "est_intersect": est_below(A & B),
        "est_diff_ab": est_below(A - B),
    }


# --- quantile sample sketch --------------------------------------------------


def quantile_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-group QUANTILE sketch: a deterministic uniform row sample of
    size ``k`` selected by md5-hash order on the ROW KEY
    (``kmv_hash(id)``), kept as ``(group…, n, vals)`` with ``vals`` the
    sampled values sorted ascending.

    This completes the mergeable sketch family — distinct (KMV / HLL /
    theta), frequency (CMS), moment (AMS F2) — with quantiles, using
    the same md5 contract: the classical streaming quantile sketches
    (Greenwald-Khanna, t-digest, KLL) are ORDER-SENSITIVE (merge/insert
    order changes the summary), which makes them retry- and
    partitioning-unstable on a cluster and impossible to oracle-check
    cross-engine. A fixed-hash bottom-k row sample is none of those
    things: it is a uniform sample (md5 is a fixed pseudo-random
    permutation of the key space) with standard sample-quantile error
    O(1/sqrt(k)), it is MERGEABLE exactly (union two samples, re-take
    the bottom-k by hash — associative, commutative, idempotent), and
    any engine with md5 rebuilds it bit-for-bit.

    Scale shape: one per-group rank window over the hashed rows
    (group-keyed shuffle, never global), ``rk <= k`` filter, one
    rollup. State per group is ``k`` doubles forever. The streaming
    dual (:func:`rapids_and_rivers_spark.streaming.duals.quantile_sample_stream`)
    keeps the same bottom-k in keyed state.
    """
    hashed = df.select(
        *group_cols,
        kmv_hash(F.col(id_col).cast("string")).alias("h"),
        F.col(value_col).cast("double").alias("v"),
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n"),
            F.sort_array(F.collect_list("v")).alias("vals"),
        )
    )


def quantile_from_sample(vals_col: Column, n_col: Column, p: float) -> Column:
    """Type-1 (inverted-CDF) sample quantile as a Column expression:
    ``vals[ceil(p * n)]`` (1-based, p in (0, 1]) — a single array index,
    no interpolation, so the estimate is one of the sampled values and
    reproduces exactly in any engine. Shared by the batch query, the
    streaming dual's readout, and the SQL oracle."""
    idx = F.greatest(F.lit(1), F.ceil(F.lit(p) * n_col).cast("int"))
    return F.element_at(vals_col, idx)
