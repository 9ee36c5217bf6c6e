"""Similarity search over embedding columns (``array<float>``).

Two tiers:
- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against all candidates. Correct baseline at any scale where
  |queries| is modest; the candidate side stays partitioned, no shuffle.
- :func:`lsh_topk` — random-hyperplane LSH: bucket both sides by sign
  bits, join per bucket, rank within. At 100 TB this replaces the full
  cross product with |bucket| joins; planes are deterministic literals so
  results are reproducible and oracle-checkable in principle.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM-side array
expressions, no Python/Arrow transfer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def centroid_terms(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Distributed element-wise centroid accumulation:
    ``(group, pos, qsum, n)`` with ``centroid[pos] ≈ qsum / (scale·n)``.

    The vector column is position-exploded and summed per (group, dim) —
    the classic distributed-centroid shape (posexplode → two-phase
    partial aggregation; the shuffle carries one row per (partition,
    group, dim), never raw vectors).

    Elements are quantized to ``floor(x·scale)`` BEFORE summation so the
    per-dimension sums are exact integers: the result is independent of
    partitioning, accumulation order, and engine — float summation is
    not (partial-agg order differs run to run), which is exactly what
    makes naive float centroids unverifiable and retry-unstable. The
    float→double cast and the double multiply are IEEE-exact in any
    engine, so the floor is deterministic too. For the numeric centroid
    itself (e.g. Lloyd iterations) see :func:`lloyd_codebook`, which
    works in full float precision where bit-stability isn't required.
    """
    ex = df.select(
        F.col(group_col), F.posexplode(as_double_array(F.col(vec_col))).alias("pos", "x")
    )
    return ex.groupBy(group_col, "pos").agg(
        F.sum(F.floor(F.col("x") * scale)).cast("bigint").alias("qsum"),
        F.count(F.lit(1)).alias("n"),
    )


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    ndigits: int = 4,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest candidates.

    Expects ``queries(query_id, q_emb)`` and ``candidates(neighbor_id,
    c_emb)`` with ``array<double>`` embeddings. The query side is
    broadcast; ranking is per-query (no global sort). Cosine is rounded
    before ranking so ordering is reproducible across engines; ties break
    on candidate id.
    """
    q = queries.withColumn("q_nrm", norm(F.col("q_emb")))
    c = candidates.withColumn("c_nrm", norm(F.col("c_emb")))
    paired = c.crossJoin(F.broadcast(q))
    # norms precomputed per row (not per pair): cosine costs ONE array pass
    # dot via the Arrow-batched sequential-fold kernel (dot_rows) —
    # bit-identical to the HOF fold; the per-pair interpreted fold
    # dominated the verify stage (guide §4.2)
    cos = F.round(
        dot_rows(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm")),
        ndigits,
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(cand_id))
    return (
        paired.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, cand_id, "cos")
    )


def _deterministic_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (LCG-based, no library RNG) so the
    bucketing is identical on every run/engine."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            plane.append((state / float(1 << 31)) * 2.0 - 1.0)
        # unit-normalize for numeric sanity
        length = math.sqrt(sum(x * x for x in plane)) or 1.0
        planes.append([x / length for x in plane])
    return planes


def lsh_bucket_multi(
    col: Column, dim: int, plane_sets: list[list[list[float]]]
) -> Column:
    """Sign-bit bucket ids for SEVERAL plane sets in ONE Arrow-batched
    numpy kernel — returns ``array<long>``, one bucket per plane set.

    The previous form built every plane dot as a Catalyst fold over a
    dim-literal array; at bands x planes x dim literals (e.g. the
    4-table LSH index: 24 x 64 = 1536 nodes PER SIDE) Catalyst
    analysis cost ~4 s of driver time per query at under 1 s of actual
    work (profiled on sim_ann_lsh), and the interpreted fold paid again
    at run time. This kernel is bit-identical to that fold: the
    accumulation below runs ELEMENT-SEQUENTIALLY (``acc += X[:, j] *
    p[j]``, one IEEE-754 double mul+add per element in the fold's
    left-to-right order, vectorized across ROWS only), so every dot —
    and therefore every sign bit and bucket id — matches the old
    expression and the unrolled SQL oracles exactly. NULL vectors map
    to NULL, like the old fold's NULL propagation.

    INPUT CONTRACT (hard-fails, not NULL-propagation — ADVICE r11):
    vectors must be uniform-length (= ``dim``) with non-null elements;
    a ragged array or a null element raises in ``np.vstack``/``astype``
    and fails the task, where the replaced fold would have yielded a
    NULL bucket. Only a whole-row NULL vector maps to NULL.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sets = [[list(map(float, p)) for p in ps] for ps in plane_sets]

    @pandas_udf("array<long>")
    def _buckets(v):
        if not len(v):
            return pd.Series([], dtype=object)
        mask = v.notna().to_numpy()
        out = np.empty(len(v), dtype=object)
        if mask.any():
            X = np.vstack(v[mask].to_numpy()).astype(np.float64, copy=False)
            buckets = np.zeros((int(mask.sum()), len(sets)), dtype=np.int64)
            for s, planes in enumerate(sets):
                for i, plane in enumerate(planes):
                    acc = np.zeros(X.shape[0], dtype=np.float64)
                    # element-sequential: the exact left-fold order of
                    # the SQL/Catalyst dot (bit-for-bit reproducible)
                    for j in range(dim):
                        acc += X[:, j] * plane[j]
                    buckets[:, s] |= (acc > 0).astype(np.int64) << i
            rows = iter(buckets.tolist())
            for k, m in enumerate(mask):
                out[k] = next(rows) if m else None
        return pd.Series(out)

    return _buckets(col)


def lsh_bucket(col: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-bit bucket id from random hyperplanes (deterministic planes,
    Arrow-batched numpy kernel — see :func:`lsh_bucket_multi`)."""
    return F.element_at(
        lsh_bucket_multi(col, dim, [_deterministic_planes(dim, n_planes, seed)]),
        1,
    )


def dot_rows(a: Column, b: Column) -> Column:
    """Pair dot product as ONE Arrow-batched numpy kernel, bit-identical
    to :func:`dot`'s Catalyst fold: the accumulation runs
    ELEMENT-SEQUENTIALLY (``acc += A[:, j] * B[:, j]`` — one IEEE-754
    double mul+add per element in the fold's left-to-right order,
    vectorized across ROWS only), so the result double — and any
    rounding applied to it downstream — matches the interpreted
    ``F.aggregate`` fold and the SQL oracles' sequential
    ``list_inner_product`` exactly. NULL on either side -> NULL (the
    fold's NULL propagation). Use on candidate-verify paths where the
    per-pair interpreted fold dominates (guide §4.2); the HOF form
    stays fine for per-query-row work.

    INPUT CONTRACT (hard-fails, not NULL-propagation — ADVICE r11): both
    arrays must be uniform-length within a batch with non-null FINITE
    elements (the embedding contract everywhere in this package; the
    length is taken from the data, not a parameter). A ragged array or a
    null element raises in ``np.vstack``/``astype`` and fails the task —
    unlike the replaced ``F.aggregate`` fold, which zip_with-null-padded
    its way to a NULL result. Only a whole-row NULL on either side maps
    to NULL. Non-finite elements produce the same NaN the fold would
    (the result row is carried as an object scalar, so Arrow does not
    coerce a genuine NaN to SQL NULL)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(va, vb):
        if not len(va):
            return pd.Series([], dtype="float64")
        mask = (va.notna() & vb.notna()).to_numpy()
        acc = np.empty(0, dtype=np.float64)
        if mask.any():
            A = np.vstack(va[mask].to_numpy()).astype(np.float64, copy=False)
            B = np.vstack(vb[mask].to_numpy()).astype(np.float64, copy=False)
            acc = np.zeros(A.shape[0], dtype=np.float64)
            # element-sequential: the exact left-fold order (see above)
            for j in range(A.shape[1]):
                acc += A[:, j] * B[:, j]
        if not np.isnan(acc).any():
            # fast path (every finite-embedding caller): float64 buffer,
            # NaN marks exactly the NULL-input rows — unambiguous
            # because no computed dot is NaN
            if mask.all():
                return pd.Series(acc)
            out = np.full(len(va), np.nan)
            out[mask] = acc
            return pd.Series(out).where(pd.Series(mask), None)
        # genuine NaN dot (non-finite inputs): an Arrow-backed series
        # with an EXPLICIT validity mask, so None marks only the
        # NULL-input rows — both a float64 and an object buffer go
        # through ``pa.Array.from_pandas``, which coerces NaN to SQL
        # NULL and would drift from the fold's NaN answer
        # (ADVICE r11, similarity.py:221)
        import pyarrow as pa

        vals = np.zeros(len(va), dtype=np.float64)
        vals[mask] = acc
        return pd.Series(
            pa.array(vals, mask=~mask), dtype=pd.ArrowDtype(pa.float64())
        )

    return _dot(a, b)


def lloyd_codebook(
    sample: list[list[float]],
    dim: int,
    n_cells: int,
    iters: int = 8,
    seed: int = 13,
    quantize: int | None = None,
) -> list[list[float]]:
    """Spherical k-means codebook from a (small, driver-side) sample:
    init = first ``n_cells`` sample vectors, then ``iters`` Lloyd passes
    (assign by max dot against unit centroids; centroid = normalized
    member mean; empty cells keep their previous centroid). Pure numpy on
    a kilobyte-scale sample — deterministic for a deterministic sample.
    Degenerate samples (< n_cells rows) pad with deterministic planes.

    ``quantize=q`` snaps every centroid element (init and each update) to
    the 1/q grid via half-up flooring (``floor(x*q + 0.5)/q`` — identical
    semantics in numpy and ANSI SQL). This makes the whole iteration
    CROSS-ENGINE reproducible: summation-order float drift between
    engines (numpy pairwise vs SQL sequential) is absorbed by the grid at
    every step instead of compounding across iterations — the property
    that lets a DuckDB oracle recompute the identical codebook and give
    the IVF queries a full value oracle (VERDICT r3 task 8). Use a power
    of two (e.g. 1024) so grid points are exactly representable.
    """
    import numpy as np

    def snap(arr):
        if quantize is None:
            return arr
        return np.floor(arr * quantize + 0.5) / quantize

    X = np.asarray(sample, dtype=np.float64).reshape(-1, dim)
    if len(X):
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        X = X / norms[:, None]
    cents = [list(map(float, snap(v))) for v in X[:n_cells]]
    if len(cents) < n_cells:
        cents += _deterministic_planes(dim, n_cells - len(cents), seed)
    C = np.asarray(cents, dtype=np.float64)
    for _ in range(iters if len(X) else 0):
        # assignment dots snapped to the shared grid (SCORE_GRID) so the
        # SQL oracle's unrolled iterations assign identically
        assign = snap_scores(X @ C.T).argmax(axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                length = np.linalg.norm(m)
                if length > 0:
                    C[j] = snap(m / length)
    return [list(map(float, c)) for c in C]


def codebook_sample_order(cand_id: str = "neighbor_id", seed: int = 13) -> Column:
    """The deterministic, ENGINE-AGNOSTIC sample ordering for codebook
    training: ``md5('s{seed}-' || id)``. Spark's ``md5`` and DuckDB's
    ``md5`` produce the same lowercase hex for the same string, so both
    engines select and order the identical sample — unlike ``xxhash64``,
    which only Spark computes."""
    return F.md5(F.concat(F.lit(f"s{seed}-"), F.col(cand_id).cast("string")))


def build_codebook_table(
    candidates: DataFrame,
    dim: int,
    n_cells: int = 16,
    lloyd_iters: int = 8,
    seed: int = 13,
    sample_per_cell: int = 32,
    cand_id: str = "neighbor_id",
    emb_col: str = "c_emb",
    quantize: int | None = 1024,
) -> DataFrame:
    """OFFLINE codebook producer for the 100 TB IVF mode: one linear
    hash-ordered TakeOrdered sample pass over the corpus (kilobytes
    collected), spherical k-means on the driver, returned as a
    ``(cell int, centroid array<double>)`` stats DataFrame meant to be
    SAVED (parquet) and reused — the corpus pass happens once; every
    later :func:`ivf_topk` call loads n_cells rows instead of re-sampling
    a 100 TB table. Deterministic for fixed (seed, corpus); the md5-based
    sample order (:func:`codebook_sample_order`) and optional ``quantize``
    grid make it reproducible by a pure-SQL oracle in ANY engine.
    """
    sampled = (
        candidates.select(cand_id, emb_col)
        .orderBy(codebook_sample_order(cand_id, seed))
        .limit(sample_per_cell * n_cells)
        .collect()
    )
    cents = lloyd_codebook(
        [list(r[emb_col]) for r in sampled], dim, n_cells, lloyd_iters, seed,
        quantize=quantize,
    )
    spark = candidates.sparkSession
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell int, centroid array<double>"
    )


def codebook_from_table(codebook_df: DataFrame) -> list[list[float]]:
    """Load a saved ``(cell, centroid)`` stats table back into the literal
    codebook :func:`ivf_topk` expects. Collects n_cells rows (KB-scale,
    by construction) ordered by cell id."""
    # bounded-collect: n_cells codebook rows by construction
    return [
        list(r["centroid"]) for r in codebook_df.orderBy("cell").collect()
    ]


#: grid for comparison/ranking dot products in the IVF path: every dot
#: used for an argmax or a probe ordering is snapped to floor(x*GRID+0.5)
#: before comparing, in numpy, Spark Column AND the DuckDB oracle, so a
#: near-tie within cross-engine summation-order drift (BLAS pairwise vs
#: sequential folds, ~1e-15) resolves by the EXPLICIT deterministic
#: tiebreak (cell id) identically everywhere instead of flipping with
#: the engine. 1e6 is coarse enough that drift almost never straddles a
#: grid boundary and fine enough that real score gaps stay resolved.
SCORE_GRID = 1_000_000


def snap_scores(arr):
    """numpy side of the ranking-dot snap (see :data:`SCORE_GRID`)."""
    import numpy as np

    return np.floor(arr * SCORE_GRID + 0.5)


def snap_dot_col(c: Column) -> Column:
    """Spark Column side of the ranking-dot snap (see :data:`SCORE_GRID`)."""
    return F.floor(c * F.lit(float(SCORE_GRID)) + F.lit(0.5)).cast("long")


def assign_cells(
    df: DataFrame, codebook: list[list[float]], emb_col: str = "c_emb"
) -> DataFrame:
    """Add the IVF ``cell`` column: 1-based argmax-dot coarse-centroid
    assignment against the codebook (dots snapped to :data:`SCORE_GRID`,
    ties -> first/lowest cell). The building block shared by
    :func:`ivf_topk`, the streaming inverted-file ingest, and — via the
    identical snap in SQL — the full-value DuckDB oracle of the
    sim_ann_ivf queries.

    Vectorized as one Arrow-batched numpy matmul per batch — the
    HOF-expression formulation (an ``aggregate`` fold per cell per row)
    evaluates interpreted outside whole-stage codegen, measured ~10x
    slower at 2k x 16 x 64. Only the embedding column crosses the Arrow
    boundary; the codebook rides in the closure (KB-scale).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebook, dtype=np.float64).T  # (dim, n_cells)

    @pandas_udf("int")
    def _cell(v):
        if not len(v):
            return pd.Series([], dtype="int32")
        X = np.vstack(v.to_numpy())
        return pd.Series(snap_scores(X @ C).argmax(axis=1) + 1, dtype="int32")

    return df.withColumn("cell", _cell(F.col(emb_col)).cast("long"))


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 13,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    ndigits: int = 4,
    lloyd_iters: int = 8,
    sample_per_cell: int = 32,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: an inverted file over coarse cells.

    Every candidate is assigned to its nearest of ``n_cells`` coarse
    centroids (the IVF cell); each query probes its ``nprobe`` nearest
    cells and ranks only those candidates. At scale this is the classic
    IVF trade: the candidate side is hash-partitioned by cell (one
    shuffle, reusable across query batches), and each query scans
    ``nprobe/n_cells`` of the corpus instead of all of it.

    The codebook is spherical k-means (:func:`lloyd_codebook`) over a
    deterministic hash-ordered sample of ``sample_per_cell * n_cells``
    candidate vectors — a single TakeOrdered heap pass (linear, no
    shuffle, kilobytes collected). Pass ``codebook`` to skip sampling
    entirely and train from a pre-materialized sample/stats table — the
    right call at 100 TB where even one extra corpus pass matters.

    Measured recall@5 on the sf0.001 driver embeddings (near-random
    directions, the worst case for sublinear ANN — see
    tests/test_ann_recall.py for the regime discussion): with the default
    8 Lloyd iterations, 0.69 inline / 0.73 with the quantized codebook
    table, at nprobe/n_cells=25% probe cost. Clustered real-world
    embeddings score far higher at the same cost. The regression floors
    are pinned at 0.65 (inline) / 0.70 (codebook table).
    """
    if codebook is not None:
        cents = codebook
        if len(cents) != n_cells:
            raise ValueError(f"codebook has {len(cents)} cells, expected {n_cells}")
    else:
        sampled = (
            candidates.select(cand_id, "c_emb")
            .orderBy(codebook_sample_order(cand_id, seed))
            .limit(sample_per_cell * n_cells)
            .collect()
        )
        cents = lloyd_codebook(
            [list(r["c_emb"]) for r in sampled], dim, n_cells, lloyd_iters, seed
        )

    # candidates: argmax cell (array_position is 1-based; ties -> first)
    c = assign_cells(candidates, cents, emb_col="c_emb")
    return ivf_probe_rank(
        queries, c, cents, k=k, nprobe=nprobe, query_id=query_id,
        cand_id=cand_id, ndigits=ndigits,
    )


def probe_cells_col(col: Column, cents: list[list[float]], nprobe: int) -> Column:
    """Top-``nprobe`` probe cells (1-based ``array<int>``) for each
    vector in ``col`` — ONE Arrow-batched numpy argsort per batch, the
    assign_cells kernel applied to the probe side. The pre-kernel
    formulation built an F.array of n_cells fold-dots over n_cells x
    dim literal expressions (16 x 64 = 1024 literals in the IVF
    queries), and Catalyst analysis of that tree cost ~2 s per query at
    1.3 s of actual work (profiled on sim_ann_ivf_codebook, round 11
    batch 4). Dots snap to :data:`SCORE_GRID` exactly like
    :func:`assign_cells` and the SQL oracles — the grid is what makes
    numpy's pairwise summation and the oracle's sequential fold agree —
    and ties keep the old ``reverse(array_sort)`` semantics: equal
    snapped score -> HIGHER cell first (the +frac key below, fractions
    < 1 against integer-valued snapped scores). Shared by
    :func:`ivf_probe_rank` and :func:`knn_self_join`'s flat probe tier.

    ACCEPTED TOLERANCE (ADVICE r11): snapped-score agreement between
    BLAS pairwise summation and a sequential fold is exact UNLESS a raw
    dot lands within ~1 ulp of a ``(m + 0.5) / SCORE_GRID`` boundary,
    where the two summation orders could round the snap to adjacent
    integers and flip a probe-cell choice. Such boundaries are not
    exactly representable in binary, so with the grid-quantized
    codebooks used everywhere here the event requires an adversarial
    dot; it has never been observed across the sf0.01/sf0.1/sf1 oracle
    sweeps and the KNN_SF1_DIFF differential. Callers needing a hard
    guarantee must quantize inputs so dots are exact (the
    ``quantize=1024`` codebook path)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cents, dtype=np.float64).T  # (dim, n_cells)
    n_cells = len(cents)
    cell_frac = (np.arange(1, n_cells + 1)) / (n_cells + 2.0)

    @pandas_udf("array<int>")
    def _probe_cells(v):
        if not len(v):
            return pd.Series([], dtype=object)
        X = np.vstack(v.to_numpy())
        S = snap_scores(X @ C)  # (n, n_cells), integer-valued floats
        order = np.argsort(-(S + cell_frac), axis=1, kind="stable")
        top = (order[:, :nprobe] + 1).astype("int32")
        return pd.Series(list(top))

    return _probe_cells(col)


def ivf_probe_rank(
    queries: DataFrame,
    assigned: DataFrame,
    cents: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    ndigits: int = 4,
) -> DataFrame:
    """The query half of the IVF path over an ALREADY-ASSIGNED candidate
    table ``(cand_id, c_emb, cell)`` — shared verbatim by batch
    :func:`ivf_topk` and the streaming inverted-file index dual, so the
    probe-selection and ranking semantics cannot drift between them
    (one formula, the tokenizer-dual lesson). Probe dots snap to
    :data:`SCORE_GRID` exactly like :func:`assign_cells` and the DuckDB
    oracle."""

    c = assigned.withColumn("c_nrm", norm(F.col("c_emb")))
    q = (
        queries.withColumn("__probe", probe_cells_col(F.col("q_emb"), cents, nprobe))
        .withColumn("q_nrm", norm(F.col("q_emb")))
        .select(
            query_id,
            "q_emb",
            "q_nrm",
            F.explode(F.col("__probe")).alias("cell"),
        )
    )
    paired = c.join(F.broadcast(q), "cell")
    # dot via the Arrow-batched sequential-fold kernel (dot_rows) —
    # bit-identical to the HOF fold; the per-pair interpreted fold
    # dominated the verify stage (guide §4.2)
    cos = F.round(
        dot_rows(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm")),
        ndigits,
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(cand_id))
    return (
        paired.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, cand_id, "cos")
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    ndigits: int = 4,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Standard L-tables OR-construction: each of ``n_tables`` independent
    plane sets buckets both sides; a candidate is considered if it shares
    a bucket with the query in ANY table (the equi-join key is
    ``(table, bucket)``, duplicate pairs collapse in the per-query
    ranking). Measured recall@5 on the sf0.001 driver embeddings
    (near-random directions — the hardest regime; see
    tests/test_ann_recall.py): single-table sign-LSH ~0.20, the default
    4 tables x 6 planes 0.35 while touching ~L/2^planes of the corpus
    per query; the regression floor is pinned at 0.30. On clustered
    real-world embeddings the same construction scores far higher. At
    scale the bucket join stays hash-partitioned — no broadcast of the
    candidate side, no cross product; recall tunes with
    (n_tables, n_planes) at predictable cost.
    """

    # all n_tables bucket ids from ONE Arrow-batched kernel call per
    # side (bit-identical to the per-table fold — lsh_bucket_multi),
    # then posexplode into (table, bucket); the old per-table
    # literal-tree form cost ~4 s of Catalyst analysis per query
    plane_sets = [
        _deterministic_planes(dim, n_planes, seed=42 + t)
        for t in range(n_tables)
    ]

    def tabled(df: DataFrame, emb: str) -> DataFrame:
        exploded = df.select(
            *df.columns,
            F.posexplode(lsh_bucket_multi(F.col(emb), dim, plane_sets)).alias(
                "table", "bucket"
            ),
        )
        return exploded

    q = tabled(queries.withColumn("q_nrm", norm(F.col("q_emb"))), "q_emb")
    c = tabled(candidates.withColumn("c_nrm", norm(F.col("c_emb"))), "c_emb")
    paired = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .select(query_id, cand_id, "q_emb", "c_emb", "q_nrm", "c_nrm")
        .dropDuplicates([query_id, cand_id])
    )
    # dot via the Arrow-batched sequential-fold kernel (dot_rows) —
    # bit-identical to the HOF fold; the per-pair interpreted fold
    # dominated the verify stage (guide §4.2)
    cos = F.round(
        dot_rows(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm")),
        ndigits,
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(cand_id))
    return (
        paired.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, cand_id, "cos")
    )


# --- product quantization (PQ) -----------------------------------------------


def lloyd_codebook_l2(
    sample: list[list[float]],
    dim: int,
    k: int,
    iters: int = 4,
    seed: int = 13,
    quantize: int = 1024,
) -> list[list[float]]:
    """PLAIN (non-spherical) k-means codebook on RAW vectors — the PQ
    sub-quantizer (Jégou, Douze & Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011 train their sub-codebooks with
    exactly this). Differs from :func:`lloyd_codebook` in two ways that
    matter for PQ: no normalization anywhere (subvector MAGNITUDE is
    information the inner-product reconstruction needs), and assignment
    by minimum L2 distance, expressed as ``argmax(dot(x,c) -
    0.5*||c||^2)`` so the SQL oracle can mirror it with inner products
    only. Same cross-engine grid contract as lloyd_codebook: centroids
    snap to the 1/quantize grid after init and every update; assignment
    scores snap to SCORE_GRID; ||c||^2 of grid centroids is EXACT in
    doubles (sums of multiples of quantize^-2), so both engines penalize
    identically.
    """
    import numpy as np

    def snap_grid(arr):
        return np.floor(arr * quantize + 0.5) / quantize

    X = np.asarray(sample, dtype=np.float64).reshape(-1, dim)
    cents = [list(map(float, snap_grid(v))) for v in X[:k]]
    if len(cents) < k:
        cents += _deterministic_planes(dim, k - len(cents), seed)
    C = np.asarray(cents, dtype=np.float64)
    for _ in range(iters if len(X) else 0):
        scores = snap_scores(X @ C.T - 0.5 * (C**2).sum(axis=1))
        assign = scores.argmax(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = snap_grid(members.mean(axis=0))
    return [list(map(float, c)) for c in C]


def pq_min_subspaces(corpus_n: int, k_cells: int, dim: int) -> int:
    """Minimal subspace count ``m`` whose total code bits satisfy the
    corpus-scaled rule ``m * log2(k_cells) >= 2 * log2(corpus_n)``.

    The rule is empirical but sharp (ANN_RECALL_SF1.json, round 8): the
    sf0.001 code shape (m=4, k=8 -> 12 bits) holds recall 0.6+ on a few
    hundred vectors but COLLAPSES to 0.093 recall@10 at a 20k-vector
    corpus, because 2^12 distinct codes over 20k points makes ~5 points
    per code cell — ADC can no longer order them. Doubling bits past
    2*log2(n) keeps expected code collisions ~O(1): 4 B/vec restores
    0.404, 8 B/vec 0.669 at sf1. ``m`` is clamped to a divisor-friendly
    ceiling of ``dim`` (PQ needs dim % m == 0; callers round to the
    nearest divisor)."""
    import math

    if corpus_n <= 1:
        return 1
    bits_per_sub = max(1, int(math.log2(k_cells)))
    need = 2.0 * math.log2(corpus_n)
    return min(dim, max(1, math.ceil(need / bits_per_sub)))


def pq_code_bits_check(
    m: int, k_cells: int, corpus_n: int, dim: int, action: str = "warn"
) -> bool:
    """Enforce the corpus-scaled PQ code-bits rule (see
    :func:`pq_min_subspaces`). Returns True when ``m * log2(k_cells)``
    carries enough bits for ``corpus_n``; otherwise warns (default) or
    raises with the derived minimal ``m`` — the r7 ``rerank<=topk``
    contract-raise idiom applied to the r8 measurement finding."""
    import math
    import warnings

    bits = m * max(1, int(math.log2(k_cells)))
    need = 2.0 * math.log2(corpus_n) if corpus_n > 1 else 0.0
    if bits >= need:
        return True
    msg = (
        f"under-bit PQ: m={m}, k_cells={k_cells} carries {bits} code bits "
        f"but a corpus of {corpus_n} vectors needs >= {need:.1f} "
        f"(rule: m*log2(k_cells) >= 2*log2(corpus); measured collapse "
        f"ANN_RECALL_SF1.json — recall 0.093 at 12 bits / 20k vectors). "
        f"Use m >= {pq_min_subspaces(corpus_n, k_cells, dim)} "
        f"(rounded to a divisor of dim={dim}) or raise k_cells."
    )
    if action == "raise":
        raise ValueError(msg)
    warnings.warn(msg, stacklevel=3)
    return False


def pq_codebooks(
    sample: list[list[float]],
    dim: int,
    m: int = 4,
    k_cells: int = 8,
    iters: int = 4,
    seed: int = 13,
    quantize: int = 1024,
) -> list[list[list[float]]]:
    """Train the ``m`` per-subspace PQ codebooks from one driver-side
    sample: slice each sample vector into ``m`` contiguous subvectors of
    ``dim/m`` dims and run :func:`lloyd_codebook_l2` independently per
    subspace (the defining PQ factorization — the code space is the
    CARTESIAN PRODUCT k^m of tiny per-subspace codebooks, so 8^4 = 4096
    effective cells cost 4x8 centroids of 16 floats)."""
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return [
        lloyd_codebook_l2(
            [list(v)[s * sub : (s + 1) * sub] for v in sample],
            sub,
            k_cells,
            iters,
            seed,
            quantize,
        )
        for s in range(m)
    ]


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    m: int = 4,
    k_cells: int = 8,
    topk: int = 5,
    seed: int = 13,
    iters: int = 4,
    sample_n: int = 256,
    quantize: int = 1024,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    ndigits: int = 4,
    codebooks: list[list[list[float]]] | None = None,
    rerank: int = 0,
    rerank_scale: int = 1000,
    corpus_n: int | None = None,
    bits_action: str = "warn",
) -> DataFrame:
    """PQ + ADC approximate top-k by inner product (Jégou et al. 2011):
    every candidate compresses to ``m`` one-byte codes (its nearest
    sub-centroid per subspace — dim doubles -> m bytes, the memory
    factor that makes billion-vector search fit in RAM at 100 TB), and
    each query scores candidates WITHOUT touching the original vectors:
    Asymmetric Distance Computation sums m lookup-table entries
    ``lut[q][s][code]`` precomputed once per query batch.

    Scale shape: encoding is one Arrow-batched numpy matmul per batch
    (only the embedding column crosses Arrow; codebooks ride the
    closure, KB-scale); the query set is collected once (bounded by
    design — ADC serves a query BATCH against a huge corpus, so the LUT
    is nq x m x k doubles); scoring is a posexplode of nq scalars per
    candidate plus a per-query top-k window — no join carries vectors.

    Determinism: codes come from SCORE_GRID-snapped L2 scores (ties ->
    lowest cell), ADC sums in fixed subspace order, ranking snaps the
    ADC and tie-breaks on the candidate id — the same contract that
    gives the IVF queries their full-value DuckDB oracle
    (catalog._pq_oracle_sql unrolls the identical per-subspace k-means
    and replays every code and lookup).

    Output: ``(query_id, neighbor_id, score double)`` — the SAME schema
    in both modes (ADVICE r5: callers toggling ``rerank`` must not see a
    column/type change). Without rerank, ``score`` is the approximate
    ADC inner product rounded to ``ndigits``; with rerank it is the
    exact quantized integer inner product (cast to double — the
    ``floor(v*rerank_scale)`` products keep it integral and < 2^53, so
    the cast is lossless and bit-stable).

    ``rerank=R`` (R > topk) adds the exact re-ranking stage of
    IVFADC+R (Jégou, Tavenard, Douze & Amsaleg, "Searching in one
    billion vectors", ICASSP 2011): the ADC pass keeps a top-``R``
    shortlist per query, the shortlist (nq*R rows — KB-scale) is
    BROADCAST back against the candidates (corpus stays in place, no
    shuffle), and the final top-``topk`` is ordered by the EXACT
    quantized inner product ``sum floor(q_i*s)*floor(c_i*s)`` — an
    integer every engine reproduces bit-for-bit, so the reranked mode
    keeps the full value oracle while recall@topk rises to the ADC's
    recall@R.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sub = dim // m
    # the r8 measurement finding promoted into the operator: an
    # under-bit code shape silently collapses recall as the corpus
    # grows (0.093 at 12 bits / 20k vectors), so the shape is checked
    # against the ACTUAL corpus size here — warn by default,
    # bits_action="raise" for hard enforcement; pass corpus_n to skip
    # the count when the caller already knows it
    pq_code_bits_check(
        m,
        k_cells,
        candidates.count() if corpus_n is None else int(corpus_n),
        dim,
        action=bits_action,
    )
    if codebooks is None:
        sampled = (
            candidates.select(cand_id, "c_emb")
            .orderBy(codebook_sample_order(cand_id, seed))
            .limit(sample_n)
            .collect()
        )
        codebooks = pq_codebooks(
            [list(r["c_emb"]) for r in sampled], dim, m, k_cells, iters, seed,
            quantize,
        )
    CB = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    penal = [0.5 * (C**2).sum(axis=1) for C in CB]

    # bounded-collect: the PQ query batch — callers pass a
    # broadcast-scale query set (the brute_force_topk contract)
    qrows = queries.select(query_id, "q_emb").collect()
    qids = [r[query_id] for r in qrows]
    Q = np.asarray([list(r["q_emb"]) for r in qrows], dtype=np.float64)
    # LUT[(qi, s, cell)] = dot(q_sub, centroid) — nq x m x k doubles
    lut = np.stack(
        [Q[:, s * sub : (s + 1) * sub] @ CB[s].T for s in range(m)], axis=1
    )

    @pandas_udf("array<double>")
    def _adc(v):
        if not len(v):
            return pd.Series([], dtype=object)
        X = np.vstack(v.to_numpy())
        out = np.zeros((len(X), len(Q)))
        for s in range(m):
            xs = X[:, s * sub : (s + 1) * sub]
            codes = snap_scores(xs @ CB[s].T - penal[s]).argmax(axis=1)
            out += lut[:, s, codes].T  # fixed subspace order = SQL's + chain
        return pd.Series(list(out))

    qid_arr = F.array(*[F.lit(q) for q in qids])
    exploded = (
        candidates.withColumn("__adcs", _adc(F.col("c_emb")))
        .select(cand_id, F.posexplode("__adcs").alias("__qi", "__adc"))
        .select(
            F.element_at(qid_arr, F.col("__qi") + 1).alias(query_id),
            F.col(cand_id),
            F.col("__adc"),
        )
    )
    w = W.partitionBy(query_id).orderBy(
        snap_dot_col(F.col("__adc")).desc(), F.col(cand_id)
    )
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    if rerank and rerank <= topk:
        # a positive rerank no bigger than topk is a no-op shortlist —
        # silently returning un-reranked first-pass scores would mask a
        # caller bug (ADVICE r6), so reject it loudly
        raise ValueError(
            f"rerank ({rerank}) must exceed topk ({topk}) to widen the "
            "shortlist; pass rerank=0 to skip the exact rerank stage"
        )
    if not rerank:
        return ranked.filter(F.col("rn") <= topk).select(
            query_id, cand_id, F.round("__adc", ndigits).alias("score")
        )
    # IVFADC+R exact re-rank: broadcast the nq*R shortlist against the
    # candidates (corpus unshuffled), score with the exact quantized
    # integer inner product, keep topk under (ip DESC, cand_id)
    shortlist = ranked.filter(F.col("rn") <= rerank).select(query_id, cand_id)
    qz = lambda c: F.transform(c, lambda x: F.floor(x * rerank_scale))
    ip = F.aggregate(
        F.zip_with(qz(F.col("q_emb")), qz(F.col("c_emb")), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    paired = (
        candidates.join(F.broadcast(shortlist), cand_id)
        .join(F.broadcast(queries.select(query_id, "q_emb")), query_id)
        .withColumn("ip", ip)
    )
    w2 = W.partitionBy(query_id).orderBy(F.col("ip").desc(), F.col(cand_id))
    return (
        paired.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= topk)
        .select(query_id, cand_id, F.col("ip").cast("double").alias("score"))
    )


def build_pq_codebook_table(
    candidates: DataFrame,
    dim: int,
    m: int = 16,
    k_cells: int = 16,
    iters: int = 4,
    seed: int = 13,
    sample_n: int = 256,
    quantize: int = 1024,
    cand_id: str = "neighbor_id",
    emb_col: str = "c_emb",
) -> DataFrame:
    """OFFLINE PQ codebook producer — the PQ twin of
    :func:`build_codebook_table`: one hash-ordered sample pass, all m
    sub-quantizers trained on the driver, returned as a
    ``(subspace int, cell int, centroid array<double>)`` stats
    DataFrame meant to be SAVED (parquet) and reloaded — at 100 TB the
    corpus pays the sample pass once, and every later
    :func:`pq_topk` call loads m*k_cells KB-scale rows instead of
    re-sampling. Deterministic for fixed (seed, corpus); grid-quantized
    so it survives a parquet round-trip bit-exactly (pinned by test).
    """
    sampled = (
        candidates.select(cand_id, emb_col)
        .orderBy(codebook_sample_order(cand_id, seed))
        .limit(sample_n)
        .collect()
    )
    books = pq_codebooks(
        [list(r[emb_col]) for r in sampled], dim, m, k_cells, iters, seed,
        quantize,
    )
    spark = candidates.sparkSession
    return spark.createDataFrame(
        [
            (s, i, c)
            for s, cb in enumerate(books)
            for i, c in enumerate(cb)
        ],
        "subspace int, cell int, centroid array<double>",
    )


def pq_codebooks_from_table(codebook_df: DataFrame) -> list[list[list[float]]]:
    """Load a saved ``(subspace, cell, centroid)`` stats table back into
    the literal codebook list :func:`pq_topk` expects. Collects
    m*k_cells rows (KB-scale by construction) ordered by (subspace,
    cell)."""
    # bounded-collect: m*k_cells codebook rows by construction
    rows = codebook_df.orderBy("subspace", "cell").collect()
    books: list[list[list[float]]] = []
    for r in rows:
        while len(books) <= r["subspace"]:
            books.append([])
        books[r["subspace"]].append(list(r["centroid"]))
    return books


def mmr_rerank(
    queries: DataFrame,
    candidates: DataFrame,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_q: str = "q_emb",
    vec_c: str = "c_emb",
    k_pool: int = 10,
    k_out: int = 5,
    lam: float = 0.7,
    scale: int = 1000,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): per query, greedily pick ``k_out`` of the top-``k_pool``
    candidates maximizing ``lam*rel - (1-lam)*max_sim_to_selected`` —
    the diversity-aware retrieval stage of a RAG / training-data
    pipeline (near-identical passages shouldn't all make the context).

    Determinism is EXACT, not rounded: vectors are quantized to
    ``floor(x*scale)`` integers, so every dot product and squared norm
    is an exact BIGINT; ``rel = dot/sqrt(n2q*n2c)`` and the MMR score
    are then single IEEE operations on identical numbers in any engine —
    the greedy argmax (ties broken on candidate id) is bit-reproducible,
    which is what lets a SQL oracle unroll the same ``k_out`` picks.

    Scale shape: relevance is one broadcast(queries) x candidates pass
    with per-query top-``k_pool`` rank windows (query-keyed, no global
    sort); the greedy runs per query over a ``k_pool``-row group via
    applyInPandas — O(k_pool^2) integer dots per query, embarrassingly
    parallel across queries, candidate embeddings only shuffled for
    pool members (k_pool rows per query, not the corpus).
    """
    import pandas as pd

    quant = lambda c: F.transform(
        as_double_array(c), lambda x: F.floor(x * scale).cast("bigint")
    )
    sq_norm = lambda c: F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    q = queries.select(
        F.col(query_id).alias("qid"), quant(F.col(vec_q)).alias("qv")
    ).withColumn("qn2", sq_norm(F.col("qv")))
    c = candidates.select(
        F.col(cand_id).alias("cid"), quant(F.col(vec_c)).alias("cv")
    ).withColumn("cn2", sq_norm(F.col("cv")))
    qdot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    paired = c.join(F.broadcast(q)).withColumn(
        "rel",
        qdot / F.sqrt((F.col("qn2") * F.col("cn2")).cast("double")),
    )
    w = W.partitionBy("qid").orderBy(F.desc("rel"), "cid")
    pool = (
        paired.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k_pool)
        .select("qid", "cid", "rel", "cv", "cn2")
    )

    out_schema = "qid long, rank int, cid long, rel double, score double"

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("cid").reset_index(drop=True)
        n = len(pdf)
        Q = np.stack(pdf["cv"].to_numpy()).astype(np.int64)
        n2 = pdf["cn2"].to_numpy().astype(np.int64)
        rel = pdf["rel"].to_numpy()
        dots = Q @ Q.T
        # exact: int64 dots/norm-products < 2^53 convert losslessly
        sims = dots.astype(np.float64) / np.sqrt(
            np.outer(n2, n2).astype(np.float64)
        )
        cids = pdf["cid"].to_numpy()
        selected: list[int] = []
        rows = []
        remaining = list(range(n))
        for rank in range(1, min(k_out, n) + 1):
            best, best_score = None, None
            for i in remaining:
                ms = max((sims[i][j] for j in selected), default=0.0)
                score = lam * rel[i] - (1.0 - lam) * ms if selected else rel[i]
                if (
                    best is None
                    or score > best_score
                    or (score == best_score and cids[i] < cids[best])
                ):
                    best, best_score = i, score
            selected.append(best)
            remaining.remove(best)
            rows.append(
                {
                    "qid": int(pdf["qid"].iloc[0]),
                    "rank": rank,
                    "cid": int(cids[best]),
                    "rel": float(rel[best]),
                    "score": float(best_score),
                }
            )
        return pd.DataFrame(rows)

    return pool.groupBy("qid").applyInPandas(greedy, schema=out_schema)


def two_level_probe_cells(
    targets: DataFrame,
    codebook: list[list[float]],
    nprobe: int,
    emb_col: str = "t_emb",
    n_super: int | None = None,
    super_probe: int | None = None,
    seed: int = 13,
) -> DataFrame:
    """Two-level IVF probe selection (VERDICT r10 task 2): pick each
    target's ``nprobe`` cells by scoring a coarse-over-coarse quantizer
    first, instead of scoring every centroid.

    The round-10 KNN_PROBED_SCALE measurement showed the fixed-nprobe
    tier bending to top-end alpha 1.32: with ``cells ~ n/48``, flat
    probe selection scores all centroids per target — O(n · cells) =
    O(n²/48), the last super-linear term in the probed-kNN path. Here
    the ``n_cells`` centroids are themselves clustered into
    ``n_super ~ sqrt(n_cells)`` super-centroids (same deterministic
    grid-snapped Lloyd, driver-side over KB of centroids); each target
    scores the supers — O(sqrt(cells)) — takes its top ``super_probe``
    supers, and scores only their member centroids — O(super_probe ·
    cells/sqrt(cells)). Selection cost per target drops from O(cells)
    to O(sqrt(cells)), total O(n · sqrt(cells)).

    Honest asymptote: with ``cells ∝ corpus`` (the constant-cluster
    sizing), per-target selection is O(sqrt(cells)) = O(sqrt(n)) — the
    TOTAL is O(n^1.5), sub-quadratic but not linear. Its constant is
    tiny (~5 dot-equivalents per member cell), so scoring
    (O(nprobe · cluster) per target, truly linear) dominates until
    cells ~ 10^5; past that the named successor is a LOG-DEPTH
    quantizer tree (recursive coarse-over-coarse — the faiss
    IVF-HNSW coarse quantizer pattern), which this two-level layout
    extends naturally.

    Vectorized end to end: one Arrow batch -> two snapped int64-keyed
    GEMMs (targets x supers, then a padded gather of member centroids
    and an einsum) — no per-row Python. Tie-breaks replicate the flat
    expression path exactly (snapped score desc, HIGHER cell id wins),
    so at any (n_cells, nprobe) where both paths see identical member
    sets the probe lists agree; the selection itself is approximate in
    the standard IVF sense (a cell whose super lost can be missed) —
    the recall cost is measured, not asserted, by
    tools/knn_probed_scale.py's fixed_shape_recall metric.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebook, dtype=np.float64)
    n_cells = len(C)
    if n_super is None:
        n_super = max(2, int(round(math.sqrt(n_cells))))
    if super_probe is None:
        # constant super fan-out keeps selection O(sqrt(cells)) per
        # target (member lists are ~cells/supers ~ sqrt(cells) each);
        # the floor of 4 is the recall knob: 2 supers halved the
        # fixed-tier recall vs flat selection in the first measurement,
        # 4 covers ~4*sqrt(cells) member cells for a ~2x selection cost
        super_probe = max(
            4, math.ceil(4 * nprobe * n_super / max(1, n_cells))
        )
    super_probe = min(super_probe, n_super)
    dim = C.shape[1]
    # super-codebook: the same deterministic grid-snapped Lloyd, run on
    # the centroids themselves (driver-side, KB-scale)
    S = np.asarray(
        lloyd_codebook([list(c) for c in C], dim, n_super, 4, seed,
                       quantize=1024),
        dtype=np.float64,
    )
    # assign each centroid to its super (snapped argmax, ties -> lowest
    # super — the assign_cells convention), then pad member lists
    cassign = snap_scores(C @ S.T).argmax(axis=1)
    members = [np.nonzero(cassign == s)[0] for s in range(n_super)]
    M = max(1, max(len(m) for m in members))
    mem_pad = np.full((n_super, M), n_cells, dtype=np.int64)  # pad -> dummy
    for s, m in enumerate(members):
        mem_pad[s, : len(m)] = m
    Cext = np.vstack([C, np.zeros((1, dim))])  # dummy row for pads
    k_super = np.int64(n_super + 1)
    k_cell = np.int64(n_cells + 2)

    # when the chosen supers' padded member lists cover as much as the
    # whole codebook, two-level stops paying (measured: the
    # nprobe=cells/4 "fraction" tier probed EVERY super and the padded
    # gather cost 2.6x flat) — score all cells in one GEMM instead;
    # still one vectorized Arrow batch, just without the gather
    flat_all = super_probe * M >= n_cells

    @pandas_udf("array<long>")
    def _probe(v):
        if not len(v):
            return pd.Series([], dtype=object)
        X = np.vstack(v.to_numpy()).astype(np.float64)
        b = len(X)
        if flat_all:
            s = snap_scores(X @ C.T).astype(np.int64)
            key = s * k_cell + np.arange(1, n_cells + 1, dtype=np.int64)
            order = np.argsort(-key, axis=1)[:, :nprobe]
            return pd.Series(
                [[int(c) + 1 for c in order[i]] for i in range(b)],
                dtype=object,
            )
        # level 1: snapped scores vs supers; composite int key makes the
        # sort a single argsort with the higher-id tiebreak built in
        sk = snap_scores(X @ S.T).astype(np.int64) * k_super + np.arange(
            n_super, dtype=np.int64
        )
        top_s = np.argsort(-sk, axis=1)[:, :super_probe]
        # level 2: gather member cells of the chosen supers — in row
        # sub-batches so the (rows x super_probe*M x dim) gather stays
        # ~256 MB even when the super codebook is unbalanced (M is the
        # LARGEST member list; an unbounded gather OOM-killed a worker
        # at 1024 cells in measurement)
        spm = super_probe * M
        sub = max(64, int(256e6 // (spm * dim * 8)))
        rows = []
        for lo in range(0, b, sub):
            hi = min(lo + sub, b)
            cells0 = mem_pad[top_s[lo:hi]].reshape(hi - lo, -1)
            cand = Cext[cells0]  # (sub, spm, dim)
            s2 = snap_scores(
                np.einsum("bd,bkd->bk", X[lo:hi], cand)
            ).astype(np.int64)
            valid = cells0 < n_cells
            key2 = np.where(
                valid, s2 * k_cell + cells0 + 1, np.int64(-(2**62))
            )
            order = np.argsort(-key2, axis=1)[:, :nprobe]
            for i in range(hi - lo):
                sel = cells0[i, order[i]]
                rows.append([int(c) + 1 for c in sel if c < n_cells])
        return pd.Series(rows, dtype=object)

    return (
        targets.withColumn("__cells", _probe(F.col(emb_col)))
        .withColumn("cell", F.explode("__cells"))
        .drop("__cells")
        .withColumn("cell", F.col("cell").cast("long"))
    )


def knn_self_join(
    df: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int | None = None,
    scale: int = 1000,
    codebook: list[list[float]] | None = None,
    seed: int = 13,
    sample_per_cell: int = 32,
    lloyd_iters: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload: str | None = None,
    payload_type: str = "long",
    batch_rows: int = 1024,
    target_salts: int = 8,
) -> DataFrame:
    """Distributed k-nearest-neighbor SELF-join with IVF-cell blocking:
    every vector finds its ``k`` most-cosine-similar OTHER vectors
    without any corpus-sized driver materialization — the candidate
    side is partitioned by coarse cell, each target probes its
    ``nprobe`` nearest cells (``nprobe=None`` probes ALL cells: exact
    kNN, the audit/test mode), and scoring is one int64 GEMM per
    (probe-cell group x Arrow chunk) inside a cogrouped applyInPandas.
    Driver memory is O(codebook) — the only collect is the
    ``sample_per_cell * n_cells``-row codebook sample (KB-scale, the
    same bounded class as :func:`ivf_topk`).

    Exactness contract: a pair's similarity
    ``dot(floor(x*scale)) / sqrt(n2_t * n2_c)`` depends only on the
    pair, and the per-cell local top-k under the total order
    ``(sim DESC, c ASC)`` is a superset-preserving prefix of the global
    order — so with ``nprobe = n_cells`` the window-merged global top-k
    equals brute force bit-for-bit (what keeps the full value oracle).
    At corpus scale, drop ``nprobe`` below ``n_cells`` for the classic
    IVF trade and raise ``n_cells`` so one cell's candidate block
    (corpus/n_cells rows) fits an executor; skewed cells rebalance via
    AQE like any other keyed cogroup.

    Executor-memory contract (ADVICE r5): a cogrouped applyInPandas
    materializes each group's BOTH sides as pandas frames before the
    chunked GEMM runs, so the probe side is additionally salted into
    ``target_salts`` hash sub-groups per cell (candidates replicate
    across salts — the standard blocked-matmul replication trade).
    Per-task memory is therefore
    ``O(probes_per_cell / target_salts + corpus / n_cells)`` — in exact
    mode, where every target probes every cell, that is
    ``O(corpus / target_salts + corpus / n_cells)`` rather than the
    unsalted ``O(corpus)``. Results are salt-invariant bit-for-bit:
    each target meets ALL of a cell's candidates exactly once, and the
    per-group local top-k under the same total order merges identically
    in the global window (pinned by test). At 100 TB raise
    ``target_salts`` with the corpus alongside ``n_cells``.

    Output: ``(t, c, sim, rk)`` with ``rk`` 1..k per target — plus
    ``t_payload``/``c_payload`` columns when ``payload`` names a column
    to carry through both sides (saves two corpus-sized joins to
    re-attach e.g. labels).
    """
    import numpy as np
    import pandas as pd

    exact = nprobe is None or nprobe >= n_cells
    # NULL/short-vector guard (the minhash NULL-signature precedent): a
    # null or wrong-dim embedding would crash the Arrow-batch np.stack
    # executor-side (and the codebook sample); such rows can be neither
    # neighbors nor targets
    df = df.filter(F.col(emb_col).isNotNull() & (F.size(F.col(emb_col)) == dim))
    if codebook is None:
        sampled = (
            df.select(id_col, emb_col)
            .orderBy(codebook_sample_order(id_col, seed))
            .limit(sample_per_cell * n_cells)
            .collect()
        )
        codebook = lloyd_codebook(
            [list(r[emb_col]) for r in sampled],
            dim,
            n_cells,
            lloyd_iters,
            seed,
            quantize=1024,
        )
    pay_t = [F.col(payload).alias("t_pay")] if payload else []
    pay_c = [F.col(payload).alias("c_pay")] if payload else []

    cand = assign_cells(
        df.select(
            F.col(id_col).alias("c"), *pay_c, F.col(emb_col).alias("c_emb")
        ),
        codebook,
        emb_col="c_emb",
    )
    targets = df.select(
        F.col(id_col).alias("t"), *pay_t, F.col(emb_col).alias("t_emb")
    )
    if exact:
        # probe everything: no per-target probe scoring needed — one
        # explode over the cell spine replicates each target n_cells ways
        probes = targets.withColumn(
            "cell", F.explode(F.sequence(F.lit(1), F.lit(n_cells)))
        ).withColumn("cell", F.col("cell").cast("long"))
    elif n_cells > 64:
        # at corpus-scaled cell counts (cells ~ n/48) flat selection is
        # the O(n · cells) term that bent KNN_PROBED_SCALE to alpha 1.32
        # — route through the two-level quantizer, O(n · sqrt(cells))
        probes = two_level_probe_cells(targets, codebook, nprobe)
    else:
        # flat probe selection via the shared Arrow kernel
        # (probe_cells_col) — identical snapped scores and
        # higher-cell-first tie order as the literal-tree
        # reverse(array_sort) form it replaces, without its n_cells x
        # dim literal nodes of Catalyst analysis per query
        probes = targets.withColumn(
            "cell",
            F.explode(probe_cells_col(F.col("t_emb"), codebook, nprobe)),
        ).withColumn("cell", F.col("cell").cast("long"))

    pay_fields = (
        f", t_pay {payload_type}, c_pay {payload_type}" if payload else ""
    )
    pair_schema = f"t long, c long, sim double{pay_fields}"

    def score_cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {f.split()[0]: [] for f in pair_schema.split(", ")}
            )
        cq = np.floor(
            np.stack(right["c_emb"].to_numpy()).astype(np.float64) * scale
        ).astype(np.int64)
        c_n2 = (cq * cq).sum(axis=1)
        c_ids = right["c"].to_numpy().astype(np.int64)
        c_pay = right["c_pay"].to_numpy() if payload else None
        kk = min(k, len(right))
        chunks = []
        for lo in range(0, len(left), batch_rows):
            sub = left.iloc[lo : lo + batch_rows]
            tq = np.floor(
                np.stack(sub["t_emb"].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            t_n2 = (tq * tq).sum(axis=1)
            dots = tq @ cq.T  # exact int64 GEMM
            sims = dots.astype(np.float64) / np.sqrt(
                np.outer(t_n2, c_n2).astype(np.float64)
            )
            t_ids = sub["t"].to_numpy().astype(np.int64)
            t_pay = sub["t_pay"].to_numpy() if payload else None
            for i in range(len(sub)):
                row = sims[i].copy()
                row[c_ids == t_ids[i]] = -np.inf  # self never a neighbor
                # local top-k by (sim desc, c asc): stable lexsort,
                # last key primary — the same total order the global
                # merge window uses, so the local prefix is exact
                top = np.lexsort((c_ids, -row))[:kk]
                top = top[row[top] > -np.inf]
                d = {
                    "t": np.full(len(top), t_ids[i]),
                    "c": c_ids[top],
                    "sim": row[top],
                }
                if payload:
                    d["t_pay"] = np.full(len(top), t_pay[i])
                    d["c_pay"] = c_pay[top]
                chunks.append(pd.DataFrame(d))
        if not chunks:
            return pd.DataFrame(
                {f.split()[0]: [] for f in pair_schema.split(", ")}
            )
        return pd.concat(chunks, ignore_index=True)

    salts = max(1, int(target_salts))
    probes = probes.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("t")), F.lit(salts)).cast("int")
    )
    cand = cand.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("salt", F.col("salt").cast("int"))
    pairs = (
        probes.groupBy("cell", "salt")
        .cogroup(cand.groupBy("cell", "salt"))
        .applyInPandas(score_cell, schema=pair_schema)
    )
    w = W.partitionBy("t").orderBy(F.col("sim").desc(), F.col("c"))
    out_cols = ["t", "c", "sim", F.row_number().over(w).alias("rk")]
    if payload:
        out_cols += ["t_pay", "c_pay"]
    return pairs.select(*out_cols).filter(F.col("rk") <= k)


def sq8_codes(vec: Column, absmax: float, levels: int = 127) -> Column:
    """Symmetric 8-bit scalar-quantization codes for one vector column:
    ``clamp(floor(v * levels / absmax + 0.5), -levels, levels)`` per
    component (faiss ``ScalarQuantizer`` QT_8bit_uniform family — ONE
    global trained range, not per-dimension, so the code stream is a
    plain int8 tensor and the comparator is a raw integer dot).

    Every step (two IEEE-exact double ops, half-up floor, clamp) is
    reproduced bit-for-bit by any engine that evaluates the same
    expression order, which is what gives :func:`sq8_topk` its full
    value oracle."""
    lv = float(levels)
    am = float(absmax) if absmax else 1.0
    return F.transform(
        vec,
        lambda v: F.least(
            F.lit(int(levels)).cast("bigint"),
            F.greatest(
                F.lit(-int(levels)).cast("bigint"),
                F.floor(v * F.lit(lv) / F.lit(am) + F.lit(0.5)),
            ),
        ),
    )


def sq8_topk(
    queries: DataFrame,
    candidates: DataFrame,
    topk: int = 5,
    rerank: int = 0,
    rerank_scale: int = 1000,
    levels: int = 127,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
) -> DataFrame:
    """SQ8 (8-bit scalar quantization) approximate top-k by inner
    product, completing the quantized-ANN ladder next to LSH / IVF / PQ:
    each vector compresses 4:1 (float32 -> int8) under ONE global range
    trained on the candidate corpus, and the first-pass score is the raw
    integer dot of the code vectors — the memory/bandwidth tier faiss
    ships as ``SQ8`` and vector DBs default to when PQ's codebook
    training is too heavy for the refresh rate.

    Scale shape: training is a single global max-abs aggregate (one
    scalar crosses the driver); query codes ride the plan as an array
    literal (the brute_force_topk broadcast-batch contract), so scoring
    is a per-candidate ``transform`` + integer dot inside whole-stage
    codegen — no join, no shuffle, no Python until the final per-query
    top-k window. ``rerank=R`` adds the IVFADC+R-style exact stage
    (Jégou et al. ICASSP'11): broadcast the nq*R shortlist, rescore with
    the exact quantized integer inner product, keep ``topk``.

    Determinism: codes are half-up floors of two IEEE-exact double ops
    (:func:`sq8_codes`); both score passes are int64 sums (|code| <=
    levels, products < 2^53) — every engine reproduces them
    bit-for-bit, so both modes keep a FULL value oracle
    (catalog._sq8_oracle_sql mirrors the same expression order).

    Output: ``(query_id, neighbor_id, score double)`` in both modes
    (the pq_topk schema contract): without rerank ``score`` is the
    integer code dot, with rerank the exact quantized inner product —
    both integral doubles, cast lossless.
    """
    # bounded-collect: one global scalar (the trained SQ range)
    am = candidates.agg(
        F.max(
            F.aggregate(
                F.col("c_emb"),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            )
        )
    ).collect()[0][0]
    if not am:
        am = 1.0

    # bounded-collect: the query batch (brute_force_topk contract)
    qrows = (
        queries.select(query_id, sq8_codes(F.col("q_emb"), am, levels).alias("qc"))
        .collect()
    )
    qid_arr = F.array(*[F.lit(r[query_id]) for r in qrows])
    qcode_arr = F.array(
        *[F.array(*[F.lit(int(v)) for v in r["qc"]]) for r in qrows]
    )

    int_dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    coded = candidates.withColumn("cc", sq8_codes(F.col("c_emb"), am, levels))
    exploded = (
        coded.withColumn(
            "__adcs", F.transform(qcode_arr, lambda qc: int_dot(qc, F.col("cc")))
        )
        .select(cand_id, F.posexplode("__adcs").alias("__qi", "__adc"))
        .select(
            F.element_at(qid_arr, F.col("__qi") + 1).alias(query_id),
            F.col(cand_id),
            F.col("__adc"),
        )
    )
    w = W.partitionBy(query_id).orderBy(F.col("__adc").desc(), F.col(cand_id))
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    if rerank and rerank <= topk:
        # a positive rerank no bigger than topk is a no-op shortlist —
        # silently returning un-reranked first-pass scores would mask a
        # caller bug (ADVICE r6), so reject it loudly
        raise ValueError(
            f"rerank ({rerank}) must exceed topk ({topk}) to widen the "
            "shortlist; pass rerank=0 to skip the exact rerank stage"
        )
    if not rerank:
        return ranked.filter(F.col("rn") <= topk).select(
            query_id, cand_id, F.col("__adc").cast("double").alias("score")
        )
    # broadcast the nq*R shortlist back against the corpus (candidates
    # stay in place — no vector ever crosses the ranking shuffle)
    shortlist = ranked.filter(F.col("rn") <= rerank).select(query_id, cand_id)
    qz = lambda c: F.transform(c, lambda x: F.floor(x * rerank_scale))
    paired = (
        candidates.join(F.broadcast(shortlist), cand_id)
        .join(F.broadcast(queries.select(query_id, "q_emb")), query_id)
        .withColumn("ip", int_dot(qz(F.col("q_emb")), qz(F.col("c_emb"))))
    )
    w2 = W.partitionBy(query_id).orderBy(F.col("ip").desc(), F.col(cand_id))
    return (
        paired.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= topk)
        .select(query_id, cand_id, F.col("ip").cast("double").alias("score"))
    )


def binary_codes(vec: Column, dim: int, word_bits: int = 32) -> Column:
    """1-bit (sign) binary-quantization codes: component ``i`` contributes
    bit ``1`` when ``v[i] >= 0``, packed big-endian into ``dim/word_bits``
    int64 words — the binary-quantization tier vector stores ship for
    32x memory compression (sign of a centered/rotated embedding keeps
    most of the angular information; Charikar's SRP with axis-aligned
    planes).

    Words hold ``word_bits`` (default 32) bits each so the ``acc*2 + bit``
    fold never exceeds 2^32 — ANSI-overflow-safe in any engine — and the
    pack is a pure integer fold over a slice: bit-reproducible, which is
    what gives :func:`binary_topk` its full value oracle.  ``dim`` must be
    a multiple of ``word_bits``.
    """
    if dim % word_bits:
        raise ValueError(f"dim {dim} not a multiple of word_bits {word_bits}")
    words = []
    for w in range(0, dim, word_bits):
        bits = F.slice(vec, w + 1, word_bits)
        words.append(
            F.aggregate(
                bits,
                F.lit(0).cast("bigint"),
                lambda acc, x: acc * 2
                + F.when(x >= 0, F.lit(1).cast("bigint")).otherwise(
                    F.lit(0).cast("bigint")
                ),
            )
        )
    return F.array(*words)


def hamming_words(a: Column, b: Column) -> Column:
    """Total Hamming distance between two packed-word code arrays:
    ``sum(bit_count(xor(word_a, word_b)))`` — pure JVM bit ops inside
    whole-stage codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def binary_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    topk: int = 5,
    rerank: int = 0,
    rerank_scale: int = 1000,
    word_bits: int = 32,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
) -> DataFrame:
    """Binary-quantization (1-bit) approximate top-k, the most compressed
    rung of the quantized-ANN ladder (brute -> SQ8 -> PQ -> 1-bit): each
    vector packs to ``dim`` SIGN BITS (32x smaller than float32), the
    first-pass score is ``dim - hamming`` over the packed words — xor +
    bit_count inside whole-stage codegen, the cheapest comparator that
    exists — and ``rerank=R`` restores accuracy with the exact quantized
    integer inner product of the top-R shortlist (the two-stage
    binary-quantization + rescore design vector DBs ship for RAM-resident
    search over disk-resident vectors).

    Scale shape: NO training at all (the sign needs no range, no
    codebook, no sample) so ingest never blocks on a fit; query codes
    ride the plan as an array literal (the brute_force_topk broadcast-
    batch contract), candidates stay partitioned in place — no join, no
    shuffle, no Python until the final per-query top-k window, and the
    only bytes the first pass touches per candidate are dim/8.

    Determinism: the pack is an integer fold, both score passes are
    int64 sums — bit-reproducible in any engine, so both modes keep a
    FULL value oracle (catalog._binary_oracle_sql replays the identical
    fold and both passes).

    Output: ``(query_id, neighbor_id, score double)`` in both modes (the
    pq_topk/sq8_topk schema contract): without rerank ``score`` is the
    Hamming similarity ``dim - distance``, with rerank the exact
    quantized inner product — both integral doubles, cast lossless.
    """
    # bounded-collect: the query batch (brute_force_topk contract)
    qrows = (
        queries.select(
            query_id,
            binary_codes(F.col("q_emb"), dim, word_bits).alias("qc"),
        )
        .collect()
    )
    qid_arr = F.array(*[F.lit(r[query_id]) for r in qrows])
    qcode_arr = F.array(
        *[F.array(*[F.lit(int(v)) for v in r["qc"]]) for r in qrows]
    )

    coded = candidates.withColumn(
        "cc", binary_codes(F.col("c_emb"), dim, word_bits)
    )
    exploded = (
        coded.withColumn(
            "__sims",
            F.transform(
                qcode_arr,
                lambda qc: F.lit(dim).cast("bigint")
                - hamming_words(qc, F.col("cc")),
            ),
        )
        .select(cand_id, F.posexplode("__sims").alias("__qi", "__sim"))
        .select(
            F.element_at(qid_arr, F.col("__qi") + 1).alias(query_id),
            F.col(cand_id),
            F.col("__sim"),
        )
    )
    w = W.partitionBy(query_id).orderBy(F.col("__sim").desc(), F.col(cand_id))
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    if rerank and rerank <= topk:
        # a positive rerank no bigger than topk is a no-op shortlist —
        # silently returning un-reranked first-pass scores would mask a
        # caller bug (ADVICE r6), so reject it loudly
        raise ValueError(
            f"rerank ({rerank}) must exceed topk ({topk}) to widen the "
            "shortlist; pass rerank=0 to skip the exact rerank stage"
        )
    if not rerank:
        return ranked.filter(F.col("rn") <= topk).select(
            query_id, cand_id, F.col("__sim").cast("double").alias("score")
        )
    int_dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qz = lambda c: F.transform(c, lambda x: F.floor(x * rerank_scale))
    shortlist = ranked.filter(F.col("rn") <= rerank).select(query_id, cand_id)
    paired = (
        candidates.join(F.broadcast(shortlist), cand_id)
        .join(F.broadcast(queries.select(query_id, "q_emb")), query_id)
        .withColumn("ip", int_dot(qz(F.col("q_emb")), qz(F.col("c_emb"))))
    )
    w2 = W.partitionBy(query_id).orderBy(F.col("ip").desc(), F.col(cand_id))
    return (
        paired.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= topk)
        .select(query_id, cand_id, F.col("ip").cast("double").alias("score"))
    )


def matryoshka_topk(
    queries: DataFrame,
    candidates: DataFrame,
    prefix_dim: int,
    topk: int = 5,
    rerank: int = 0,
    scale: int = 1000,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
) -> DataFrame:
    """Matryoshka (prefix-truncation) approximate top-k: score the first
    ``prefix_dim`` components only, then exact-rerank the top-R shortlist
    at full dimension — the adaptive-retrieval pattern for
    Matryoshka-representation embeddings (Kusupati et al., NeurIPS 2022:
    MRL-trained vectors pack coarse-to-fine information front-first, so a
    dim/4 prefix preserves ranking quality at 1/4 the compute and
    bandwidth). For non-MRL embeddings the prefix is still an unbiased
    random projection — recall floors are pinned per corpus in
    tests/test_ann_recall.py.

    Scale shape: zero training; the stage-1 scan reads ``prefix_dim``
    components per candidate (with columnar layouts this is genuinely
    less I/O, not just less arithmetic); query prefixes ride the plan as
    an array literal, candidates never shuffle; the rerank is the
    standard broadcast-shortlist second pass.

    Determinism: both passes are int64 sums of ``floor(v*scale)``
    products (< 2^53) — bit-reproducible, FULL value oracle
    (catalog._matryoshka_oracle_sql).

    Output: ``(query_id, neighbor_id, score double)`` in both modes:
    without rerank ``score`` is the quantized prefix inner product, with
    rerank the quantized full-dimension inner product.
    """
    int_dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qz = lambda c: F.transform(c, lambda x: F.floor(x * scale))

    # bounded-collect: the query batch (brute_force_topk contract)
    qrows = (
        queries.select(
            query_id,
            qz(F.slice(F.col("q_emb"), 1, prefix_dim)).alias("qp"),
        )
        .collect()
    )
    qid_arr = F.array(*[F.lit(r[query_id]) for r in qrows])
    qpre_arr = F.array(
        *[F.array(*[F.lit(int(v)) for v in r["qp"]]) for r in qrows]
    )

    pre = candidates.withColumn(
        "cp", qz(F.slice(F.col("c_emb"), 1, prefix_dim))
    )
    exploded = (
        pre.withColumn(
            "__ips", F.transform(qpre_arr, lambda qp: int_dot(qp, F.col("cp")))
        )
        .select(cand_id, F.posexplode("__ips").alias("__qi", "__ip"))
        .select(
            F.element_at(qid_arr, F.col("__qi") + 1).alias(query_id),
            F.col(cand_id),
            F.col("__ip"),
        )
    )
    w = W.partitionBy(query_id).orderBy(F.col("__ip").desc(), F.col(cand_id))
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    if rerank and rerank <= topk:
        # a positive rerank no bigger than topk is a no-op shortlist —
        # silently returning un-reranked first-pass scores would mask a
        # caller bug (ADVICE r6), so reject it loudly
        raise ValueError(
            f"rerank ({rerank}) must exceed topk ({topk}) to widen the "
            "shortlist; pass rerank=0 to skip the exact rerank stage"
        )
    if not rerank:
        return ranked.filter(F.col("rn") <= topk).select(
            query_id, cand_id, F.col("__ip").cast("double").alias("score")
        )
    shortlist = ranked.filter(F.col("rn") <= rerank).select(query_id, cand_id)
    paired = (
        candidates.join(F.broadcast(shortlist), cand_id)
        .join(F.broadcast(queries.select(query_id, "q_emb")), query_id)
        .withColumn("ip", int_dot(qz(F.col("q_emb")), qz(F.col("c_emb"))))
    )
    w2 = W.partitionBy(query_id).orderBy(F.col("ip").desc(), F.col(cand_id))
    return (
        paired.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= topk)
        .select(query_id, cand_id, F.col("ip").cast("double").alias("score"))
    )
