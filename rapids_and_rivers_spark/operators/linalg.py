"""Distributed embedding linear algebra: quantized Gram matrix
accumulation and driver-side principal-component extraction.

The scale shape is the classic one (it is exactly how Spark MLlib's
``RowMatrix.computePrincipalComponents`` works): the n x d embedding
matrix never moves — each partition accumulates a d x d Gramian partial
(``X^T X``) locally, the partials sum through one (i, j)-keyed
aggregation of d^2 rows per partition, and the tiny d x d result
(d=64 -> 4096 entries, independent of n) is collected to the driver
where the eigenvector work is O(d^2) — trivially bounded, like the bloom
bitmap / IVF codebook collects.

Cross-engine determinism: components are QUANTIZED to integers
(``floor(x * scale)``) before the outer product, so every Gram entry is
an EXACT integer sum — partitioning-, order-, and engine-invariant (the
same trick as the centroid operator in
:mod:`rapids_and_rivers_spark.operators.similarity`). The power
iteration on top rounds each iterate to 8 decimals (half-up, matching
SQL ``round``), which re-synchronizes any 1-ulp summation drift between
engines each round — an oracle engine unrolling the same iterations in
SQL reproduces the component bit-for-bit at the rounded precision.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _half_up(x: float, ndigits: int) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-ndigits), rounding=ROUND_HALF_UP)
    )


def quantized_gram(
    df: DataFrame, vec_col: str, dim: int, scale: int = 1000
) -> DataFrame:
    """Upper-triangle quantized Gramian: ``(i, j, gsum)`` for i <= j with
    ``gsum = sum_rows floor(x_i*scale) * floor(x_j*scale)`` — exact
    BIGINTs (|q| <= ~scale, so 100 B rows fit int64 with headroom).

    mapInPandas accumulates one numpy int64 d x d partial per Arrow
    batch (a single BLAS-shaped ``Q.T @ Q``, no per-row Python), emits
    d(d+1)/2 upper-triangle rows per PARTITION, and one keyed agg sums
    partials — the shuffle carries partitions x d^2 rows, never data.
    """
    import numpy as np

    def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for b in batches:
            if len(b) == 0:
                continue
            q = np.floor(
                np.stack(b[vec_col].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            g += q.T @ q
            seen = True
        if not seen:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame({"i": iu, "j": ju, "g": g[iu, ju]})

    parts = df.select(vec_col).mapInPandas(acc, schema="i int, j int, g long")
    return parts.groupBy("i", "j").agg(F.sum("g").alias("gsum"))


def power_component(
    gram_rows: list[tuple[int, int, int]], dim: int, iters: int = 2
) -> tuple[list[float], float]:
    """Top principal direction by ``iters`` power-method rounds over the
    integer Gramian, each iterate normalized and rounded HALF-UP to 8
    decimals (the cross-engine re-synchronization point — SQL ``round``
    and this helper agree digit-for-digit).

    Start vector 1/sqrt(d) uniform — for d a power of 4 that is an exact
    binary double (d=64 -> 0.125). Plain Python O(d^2) per round on
    driver-side data that is bounded by construction. Returns
    ``(component, eigenvalue_estimate)`` where the estimate is the
    Rayleigh-style ||G v|| of the LAST un-normalized iterate (in
    quantized-integer units).
    """
    g = [[0] * dim for _ in range(dim)]
    for i, j, s in gram_rows:
        g[i][j] = s
        g[j][i] = s
    v = [1.0 / math.sqrt(dim)] * dim
    norm = 0.0
    for _ in range(iters):
        u = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        norm = math.sqrt(sum(x * x for x in u))
        v = [_half_up(x / norm, 8) for x in u]
    return v, norm


def project_on(
    df: DataFrame, vec_col: str, component: list[float], scale: int = 1000
) -> DataFrame:
    """Per-row projection onto a (driver-computed, literal-broadcast)
    component: ``proj = sum_i (floor(x_i*scale)/scale) * v_i`` — the same
    quantization as the Gramian, so an oracle engine reproduces the dot
    exactly (modulo terminal rounding by the caller).

    Pure ``zip_with``/``aggregate`` Column expression: JVM-side, no
    shuffle, no UDF — the component rides into the plan as a literal
    array (64 doubles), the moral equivalent of a broadcast join against
    a 1-row dimension.
    """
    lit_v = F.array(*[F.lit(float(c)) for c in component])
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale).cast("double") / scale,
    )
    return df.withColumn(
        "proj",
        F.aggregate(
            F.zip_with(q, lit_v, lambda x, v: x * v),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )


def linreg_sufficient_stats(df):
    """The nine sufficient statistics of a 2-feature + intercept linear
    regression as ONE map-side-combined aggregation over quantized
    integer columns ``(qv, dv, yv)`` -> a single row of DECIMAL(38,0)
    exact sums (n, sq, sd, sy, sqq, sqd, sdd, sqy, sdy).

    This is the d=3 specialization of :func:`quantized_gram`'s shape:
    the corpus never moves, 9 scalars do — and the statistics are
    MERGEABLE (component-wise +), which is what makes the streaming
    dual a per-epoch partial write + exact decimal sum at read time.
    """
    from pyspark.sql import functions as F

    dec = "decimal(38,0)"
    q = df.select(
        F.col("qv").cast(dec).alias("qv"),
        F.col("dv").cast(dec).alias("dv"),
        F.col("yv").cast(dec).alias("yv"),
    )
    return q.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("qv").alias("sq"),
        F.sum("dv").alias("sd"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("qv") * F.col("qv")).alias("sqq"),
        F.sum(F.col("qv") * F.col("dv")).alias("sqd"),
        F.sum(F.col("dv") * F.col("dv")).alias("sdd"),
        F.sum(F.col("qv") * F.col("yv")).alias("sqy"),
        F.sum(F.col("dv") * F.col("yv")).alias("sdy"),
    )


def linreg_solve(stats_df):
    """Cramer's-rule 3x3 solve of the normal equations over a 1-row
    sufficient-statistics frame: every determinant expands in
    DECIMAL(38,0) (exact integers), floats appear only in the final
    ratios. Returns ``(n bigint, b0, b1, b2 double)`` UNROUNDED in
    quantized units — callers de-quantize and round once.

    Exact-arithmetic bound, stated not guessed: determinant terms grow
    like n^3 * (q_max^2 * d_max^2) ~ 2.5e5 * n^3, so DECIMAL(38,0)
    stays exact up to n ~ 7e10 rows (multi-TB of lineitem) and
    OVERFLOWS (Spark: null) beyond. The 100-TB path keeps the same
    one-pass distributed accumulator — the 9 exact partials are what
    shuffles either way — and moves only the final 3x3 solve to the
    driver on the 9 collected scalars (a bounded collect) via LAPACK;
    this in-plan decimal tier is the bit-reproducible configuration
    the cross-engine oracle gates.
    """
    from pyspark.sql import functions as F

    n, sq, sd, sy = F.col("n"), F.col("sq"), F.col("sd"), F.col("sy")
    sqq, sqd, sdd = F.col("sqq"), F.col("sqd"), F.col("sdd")
    sqy, sdy = F.col("sqy"), F.col("sdy")
    det = (
        n * (sqq * sdd - sqd * sqd)
        - sq * (sq * sdd - sd * sqd)
        + sd * (sq * sqd - sd * sqq)
    ).cast("double")
    det0 = (
        sy * (sqq * sdd - sqd * sqd)
        - sq * (sqy * sdd - sqd * sdy)
        + sd * (sqy * sqd - sqq * sdy)
    ).cast("double")
    det1 = (
        n * (sqy * sdd - sqd * sdy)
        - sy * (sq * sdd - sd * sqd)
        + sd * (sq * sdy - sd * sqy)
    ).cast("double")
    det2 = (
        n * (sqq * sdy - sqy * sqd)
        - sq * (sq * sdy - sd * sqy)
        + sy * (sq * sqd - sd * sqq)
    ).cast("double")
    return stats_df.select(
        F.col("n").cast("long").alias("n"),
        (det0 / det).alias("b0"),
        (det1 / det).alias("b1"),
        (det2 / det).alias("b2"),
    )
