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
iteration on top is ALSO exact-integer per iterate (matvec + max-abs
rescale, :func:`power_component_int`), so an oracle engine unrolling
the same rounds in SQL reproduces the component bit-for-bit — floats
appear only in the terminal norm/projection divisions, which are
single IEEE ops on identical operands in both engines.
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


def power_component_int(
    gram_rows: list[tuple[int, int, int]],
    dim: int,
    iters: int = 2,
    vscale: int = 10**8,
) -> tuple[list[int], float, float]:
    """Top principal direction by ``iters`` power-method rounds over the
    integer Gramian — EVERY iterate is exact integer arithmetic, so a
    SQL engine unrolling the same rounds reproduces the final vector
    bit-for-bit regardless of summation order (no float appears until
    the terminal norm).

    Per round (all exact, Python bignum / SQL HUGEINT):

    - ``U_i = sum_j g_ij * V_j``            (exact integer matvec)
    - ``M   = max_i |U_i|``                  (order-invariant)
    - ``V'_i = sign(U_i) * (|U_i| * vscale // M)``  (rescale to
      ``[-vscale, vscale]``; trunc == floor on the non-negative
      operands, sidestepping SQL-vs-Python division semantics)

    The rescale replaces per-round float normalization: power iteration
    only needs the direction, and dividing by the max keeps magnitudes
    bounded (``|V| <= vscale``) so the next matvec cannot overflow —
    at vscale=1e8 and 100 B quantized rows the matvec terms stay well
    inside 128-bit. Start vector is the all-ones integer (same
    direction as the uniform 1/sqrt(d) start).

    Returns ``(W, nrm, lam)``: the final integer iterate, its float
    L2 norm (``W/nrm`` is the unit component; ``sum W_i^2`` is exact
    and <= d * vscale^2, so the int->double conversion is the same
    round-to-nearest in every engine), and a Rayleigh-style eigenvalue
    estimate ``||G W_prev|| / ||W_prev||`` in quantized-integer units.

    This is the exactness discipline of :func:`linreg_solve` (Cramer
    over DECIMAL sufficient statistics) applied to the power method:
    exact integers inside, floats only at the boundary. Supersedes the
    earlier round-to-8-decimals re-sync, which stopped absorbing
    64-term float-sum order differences once Gramian magnitudes crossed
    ~1e11 (the sf1 drift found by the scale sweep).
    """
    g = [[0] * dim for _ in range(dim)]
    for i, j, s in gram_rows:
        g[i][j] = int(s)
        g[j][i] = int(s)
    v = [1] * dim
    lam = 0.0
    for _ in range(iters):
        u = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        lam = math.sqrt(sum(x * x for x in u)) / math.sqrt(
            sum(x * x for x in v)
        )
        m = max(abs(x) for x in u)
        if m == 0:
            return [0] * dim, 0.0, 0.0
        v = [(1 if x >= 0 else -1) * (abs(x) * vscale // m) for x in u]
    nrm = math.sqrt(sum(x * x for x in v))
    return v, nrm, lam


def power_component(
    gram_rows: list[tuple[int, int, int]], dim: int, iters: int = 2
) -> tuple[list[float], float]:
    """Float view of :func:`power_component_int`: the unit top component
    and a Rayleigh eigenvalue estimate. Callers that must match a SQL
    oracle bit-for-bit should use the integer form + one terminal
    division instead (see ``embedding_pca_project``)."""
    w, nrm, lam = power_component_int(gram_rows, dim, iters=iters)
    if nrm == 0.0:
        return [0.0] * dim, 0.0
    return [x / nrm for x in w], lam


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


def project_on_exact(
    df: DataFrame,
    vec_col: str,
    w_int: list[int],
    nrm: float,
    scale: int = 1000,
) -> DataFrame:
    """Bit-reproducible per-row projection onto an INTEGER component
    iterate ``W`` (from :func:`power_component_int`): the dot product
    ``sum_i floor(x_i*scale) * W_i`` folds in exact int64 (order
    invariant — |qv| <= scale, |W| <= 1e8, d=64 terms stay < 2^53), and
    the only floats are the two terminal divisions
    ``dot / nrm / scale`` — single IEEE ops on identical operands in
    every engine, so a SQL oracle computing
    ``CAST(sum(qv*w) AS DOUBLE) / nm / scale`` reproduces ``proj``
    bit-for-bit before any display rounding.

    Same JVM-side shape as :func:`project_on`: the component rides in
    as a 64-long literal array; zip_with/aggregate, no shuffle, no UDF.
    """
    lit_w = F.array(*[F.lit(int(c)) for c in w_int])
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale).cast("long"),
    )
    dot = F.aggregate(
        F.zip_with(q, lit_w, lambda x, w: x * w),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return df.withColumn(
        "proj", dot.cast("double") / F.lit(float(nrm)) / F.lit(float(scale))
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
