"""Training-data selection: DSIR-style hashed n-gram importance weights.

DSIR (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023) scores every raw-pool document by how much
more likely its features are under a TARGET distribution (the data you
want more of — a benchmark, a trusted domain) than under the RAW pool
distribution: ``log w(d) = Σ_features ln(p_target(f) / p_raw(f))`` with
features hashed into a fixed bucket space so both distributions are
dense count vectors, then resamples by weight.

Scale design: the two distributions are ONE bucket-keyed aggregation
each over token postings (the bucket space is a constant — here 1024 —
so the per-bucket log-ratio table is KB-sized and BROADCAST to the
scoring join no matter how large the corpus is). Scoring is one
broadcast hash join postings→ratios plus a per-doc average — no
pairwise anything, no driver data path beyond two scalar totals (the
same bounded-collect class as bm25_scores' N/avgdl).

The build/score split (:func:`dsir_ratio_table` /
:func:`dsir_score_with`) exists for the streaming ingest gate: the
ratio table is FROZEN from an offline pool and applied per micro-batch
(streaming/duals.dsir_gate_foreach_batch) — the deployment shape of
importance-weighted ingest.

Determinism: buckets come from the 52-bit md5 hash
(:func:`~rapids_and_rivers_spark.operators.sketch.kmv_hash` — DuckDB
recomputes them bit-identically); add-1 smoothing keeps every ratio
finite; ``ln`` drift across libms is ~1 ulp per call and the per-doc
AVERAGE is rounded to 4 digits, far above the ~1e-14 accumulated error,
and ranking downstream must order by the ROUNDED score (see
rrf_search_fusion's rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rapids_and_rivers_spark.operators.sketch import kmv_hash
from rapids_and_rivers_spark.operators.text import tokens


def _postings(
    df: DataFrame,
    text_col: str,
    buckets: int,
    id_col: str | None = None,
    extra_cols: list[str] | None = None,
    is_target: Column | None = None,
) -> DataFrame:
    keep = [F.col(c) for c in (extra_cols or [])]
    if id_col is not None:
        keep = [F.col(id_col).alias("id")] + keep
    if is_target is not None:
        keep.append(is_target.alias("is_tgt"))
    toked = df.select(
        *keep, F.explode_outer(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token").isNotNull() & (F.length("token") > 0))
    return toked.withColumn(
        "bucket", F.pmod(kmv_hash(F.col("token")), F.lit(buckets))
    )


def dsir_ratio_table(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    buckets: int = 1024,
) -> tuple[DataFrame, float]:
    """Offline half of DSIR: the per-bucket log-ratio table
    ``(bucket, lr)`` (≤ ``buckets`` rows — KB-sized, broadcastable) plus
    the DEFAULT log-ratio for buckets never seen in the offline pool
    (both smoothed counts at 1 — what a frozen-table gate must apply to
    novel tokens). Two bounded scalar collects for the totals."""
    post = _postings(df, text_col, buckets, is_target=is_target)
    raw_counts = post.groupBy("bucket").agg(F.count(F.lit(1)).alias("raw_c"))
    tgt_counts = (
        post.filter(F.col("is_tgt"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tgt_c"))
    )
    raw_total = post.count()
    tgt_total = post.filter(F.col("is_tgt")).count()
    import math

    default_lr = math.log(1.0 / float(tgt_total + buckets)) - math.log(
        1.0 / float(raw_total + buckets)
    )
    ratios = raw_counts.join(tgt_counts, "bucket", "left").select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("tgt_c"), F.lit(0)) + F.lit(1.0))
                / F.lit(float(tgt_total + buckets))
            )
            - F.log(
                (F.col("raw_c") + F.lit(1.0)) / F.lit(float(raw_total + buckets))
            )
        ).alias("lr"),
    )
    return ratios, default_lr


def dsir_score_with(
    df: DataFrame,
    ratios: DataFrame,
    default_lr: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
    buckets: int = 1024,
    ndigits: int = 4,
) -> DataFrame:
    """Online half of DSIR: score documents against a PRE-BUILT ratio
    table (broadcast join on the bucket; buckets absent from the table —
    tokens never seen offline — take ``default_lr``). Works identically
    on batch and per-micro-batch DataFrames: one postings pass, one
    per-doc average."""
    post = _postings(df, text_col, buckets, id_col=id_col, extra_cols=extra_cols)
    scored = post.join(F.broadcast(ratios), "bucket", "left").withColumn(
        "lr", F.coalesce(F.col("lr"), F.lit(default_lr))
    )
    group = ["id"] + [c for c in (extra_cols or [])]
    return (
        scored.groupBy(*group)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("lr"), ndigits).alias("dsir_score"),
        )
        .withColumnRenamed("id", id_col)
    )


def dsir_scores(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
    buckets: int = 1024,
    ndigits: int = 4,
) -> DataFrame:
    """Per-document DSIR importance score over hashed unigram features.

    ``is_target`` marks the rows defining the target distribution (they
    are still scored — a sane scorer ranks them high, which the catalog
    query's test asserts). Output: ``(id[, extra…], n_tokens,
    dsir_score)`` where dsir_score is the rounded per-token average
    log-ratio ``avg_t ln(p_target(bucket(t)) / p_raw(bucket(t)))`` —
    length-normalized so long documents aren't favored. Composition of
    :func:`dsir_ratio_table` over ``df`` itself and
    :func:`dsir_score_with` (the default-lr path is unreachable here:
    every scored bucket is in the table by construction).
    """
    ratios, default_lr = dsir_ratio_table(
        df, is_target, text_col=text_col, buckets=buckets
    )
    return dsir_score_with(
        df,
        ratios,
        default_lr,
        text_col=text_col,
        id_col=id_col,
        extra_cols=extra_cols,
        buckets=buckets,
        ndigits=ndigits,
    )


def negative_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    buckets: int = 64,
    exclude_pairs: DataFrame | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    each document draws ``k`` pseudo-random negatives from a
    bucket-representative pool, with known near-duplicates EXCLUDED (the
    classic false-negative trap — a near-dup sampled as a "negative"
    teaches the embedding model to push duplicates apart).

    Mechanics: docs hash into ``buckets`` pools; each pool's
    representative is its min id (one KB-scale broadcast table). Draw
    ``j`` for a doc lands in pool ``md5(id:j) % buckets`` — an RNG-free
    draw, so the sample is retry/partition/engine-stable (the property
    that lets the catalog query carry a FULL value oracle, and that
    makes training-data builds reproducible). Self-matches are dropped;
    ``exclude_pairs`` (e.g. a near-dup pair table from any dedup
    operator) is applied as an unordered-pair anti-join.

    Scale shape: one groupBy for the representative table (broadcast), a
    k-way per-row explode, one broadcast join, one anti-join keyed on
    the pair — no pairwise anything.

    Output: (id, slot, neg_id), slot in 1..k (slots that drew the doc's
    own pool or a near-dup are absent — callers wanting exactly-k can
    redraw with a second pass over missing slots).
    """
    from rapids_and_rivers_spark.sources.tables import spread

    ids = spread(df, id_col).select(F.col(id_col).alias("id"))
    reps = (
        ids.withColumn(
            "bucket", F.pmod(kmv_hash(F.col("id").cast("string")), F.lit(buckets))
        )
        .groupBy("bucket")
        .agg(F.min("id").alias("neg_id"))
    )
    draws = ids.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("slot"),
                        F.pmod(
                            kmv_hash(
                                F.concat(
                                    F.col("id").cast("string"),
                                    F.lit(":"),
                                    F.lit(str(j)),
                                )
                            ),
                            F.lit(buckets),
                        ).alias("bucket"),
                    )
                    for j in range(1, k + 1)
                ]
            )
        ).alias("d"),
    ).select("id", F.col("d.slot").alias("slot"), F.col("d.bucket").alias("bucket"))
    cand = draws.join(F.broadcast(reps), "bucket").filter(
        F.col("neg_id") != F.col("id")
    )
    if exclude_pairs is not None:
        dup = exclude_pairs.select(
            F.least("id_a", "id_b").alias("lo"), F.greatest("id_a", "id_b").alias("hi")
        ).distinct()
        cand = cand.join(
            dup,
            (F.least(F.col("id"), F.col("neg_id")) == F.col("lo"))
            & (F.greatest(F.col("id"), F.col("neg_id")) == F.col("hi")),
            "left_anti",
        )
    return cand.select("id", "slot", "neg_id")


def mix_weights(per_src: DataFrame, tau: float = 0.7) -> DataFrame:
    """Temperature-based sampling weights from a per-source count table
    ``(source, n_docs, n_tokens)``: raw token share, tempered share
    p_i^(1/tau) renormalized, and the boost factor.

    The corpus total and the partition function are 1-row scalar
    aggregates collected driver-side (bounded-collect; crossJoining the
    1-row aggregates would plan BroadcastNestedLoopJoin). Shared by the
    batch ``source_mix_temperature`` catalog query AND the streaming
    mixture dual — the counts are exact integers, so any caller merging
    partials by + reproduces the batch weights bit-for-bit.
    """
    # bounded-collect: 1-row global aggregate (corpus total). SUM over an
    # empty/all-null table is NULL -> short-circuit to an empty weight
    # table instead of float(None) (ADVICE r6).
    total_row = per_src.agg(F.sum("n_tokens")).first()[0]
    empty = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.lit(None).cast("double").alias("p_raw"),
        F.lit(None).cast("double").alias("p_temp"),
        F.lit(None).cast("double").alias("boost"),
    ).limit(0)
    if total_row is None or float(total_row) <= 0.0:
        return empty
    total = float(total_row)
    # bounded-collect: 1-row global aggregate (partition function)
    z = float(
        per_src.agg(
            F.sum(F.pow(F.col("n_tokens") / F.lit(total), F.lit(1.0 / tau)))
        ).first()[0]
    )
    p_raw = F.col("n_tokens") / F.lit(total)
    tempered = F.pow(p_raw, F.lit(1.0 / tau)) / F.lit(z)
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(tempered, 6).alias("p_temp"),
        # a source whose documents are all empty-text has p_raw = 0:
        # 0/0 would be NaN, so the boost is defined only where p_raw > 0
        # (ADVICE r6)
        F.round(
            F.when(p_raw > 0, tempered / p_raw).otherwise(F.lit(None)), 4
        ).alias("boost"),
    )


def kcenter_greedy(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> list[tuple[int, int, int | None]]:
    """Greedy k-center diversity selection (Gonzalez 1985; the coreset
    construction Sener & Savarese ICLR'18 use for active learning):
    start from the minimum id, then k-1 times pick the point FARTHEST
    from the chosen set — the classic 2-approximation that training-data
    curation uses to pick maximally diverse exemplars.

    Exactness: components quantize to floor(x*scale) integers (the
    embedding_centroids idiom), distances are exact integer squared
    euclidean, and the per-round argmax is a total order
    (mind DESC, id) — every selection decision is engine-invariant, no
    floats anywhere.

    Scale: each round is one map over the corpus (zip_with/aggregate
    against the new center's broadcast literal) + one TakeOrdered(1) —
    k bounded collects of ONE row each (the IVF-codebook collect
    class), never a pairwise matrix. The running min-distance column is
    the standard trick that keeps greedy k-center O(n·k·d).

    Returns the selection trace ``[(sel_round, center_id, radius)]``
    where radius is the exact squared distance that made the center the
    farthest point (None for the seed) — the k-center cost curve.

    ``k`` must not exceed the number of distinct quantized points: once
    every point is at distance 0 from the chosen set, the argmax ties at
    0 and later rounds re-select the minimum id (radius 0). That fallback
    is deliberate — the oracle unrolls a FIXED k steps, and both engines
    walk the same tie, so a stop-early branch here would desync them.
    """
    q = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
        ).alias("qv"),
    ).persist()
    # persist-scope: in-function — q feeds every round's distance map;
    # unpersisted before return

    def dist_to(center_vec: list[int]):
        lit_vec = F.array([F.lit(int(v)) for v in center_vec])
        return F.aggregate(
            F.zip_with(F.col("qv"), lit_vec, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # bounded-collect: one seed row (the k-center start, deterministic
    # minimum id)
    seed_rows = q.orderBy("id").limit(1).collect()
    if not seed_rows:
        q.unpersist()
        return []
    seed = seed_rows[0]
    trace: list[tuple[int, int, int | None]] = [(1, seed["id"], None)]
    # persist-scope: per-round handle — without materializing the running
    # min, round r re-evaluates all r-1 stacked distance layers and the
    # claimed O(n·k·d) silently becomes O(n·k²·d); each round's collect
    # materializes its frame, then the previous round's cache is dropped
    cur = q.withColumn("mind", dist_to(seed["qv"])).persist()
    prev = None
    for rnd in range(2, k + 1):
        # bounded-collect: one argmax row per round (k rows total)
        far = cur.orderBy(F.desc("mind"), "id").limit(1).collect()[0]
        trace.append((rnd, far["id"], int(far["mind"])))
        nxt = cur.withColumn(
            "mind", F.least(F.col("mind"), dist_to(far["qv"]))
        ).persist()  # persist-scope: per-round handle (see above)
        if prev is not None:
            prev.unpersist()
        prev, cur = cur, nxt
    q.unpersist()
    if prev is not None:
        prev.unpersist()
    cur.unpersist()
    return trace


def pps_systematic(
    items: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    n_per_group: int = 10,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling per group —
    the survey-sampling classic (Madow 1949) as one Catalyst plan, and
    the INTEGER-EXACT alternative to A-ES weighted reservoirs (whose
    ``u^(1/w)`` keys are libm-dependent and engine-drift-prone):

    walk the group's items in a fixed total order (``id_col``),
    accumulate integer weights ``c``, and select every item whose
    cumulative span crosses one of ``n`` equally-spaced thresholds —
    i.e. where ``floor(c*n/T) > floor((c-w)*n/T)`` with ``T`` the
    group total. Inclusion probability is proportional to weight (the
    PPS property); items heavier than ``T/n`` are selected with
    certainty and absorb multiple slots (reported in ``slots``); at
    most ``n`` items are selected per group. Every comparison is int64
    (``c*n`` at 100 TB: 1e13 tokens x n=10 << 2^63), so the sample is
    engine-invariant — no RNG, no libm, reproducible forever from the
    data alone.

    Plan shape: one group-partitioned cumulative-sum window in id
    order plus a broadcast-scale per-group total join — the
    pack_training_sequences window class (per-group sequential scan;
    groups are sources/shards, so per-partition volume is bounded by
    shard sizing, and the selection itself adds nothing global).

    Output: ``(group, id, weight, slots)`` for selected items only,
    ``slots >= 1`` = how many of the n quanta the item absorbed.
    """
    from pyspark.sql import Window as W

    g, i = F.col(group_col), F.col(id_col)
    w = F.col(weight_col).cast("long")
    n = F.lit(int(n_per_group)).cast("long")
    cum = F.sum(w).over(
        W.partitionBy(g).orderBy(i).rowsBetween(W.unboundedPreceding, 0)
    )
    totals = items.groupBy(g.alias("__g")).agg(
        F.sum(w).cast("long").alias("__total")
    )
    staged = (
        items.select(g.alias(group_col), i.alias(id_col), w.alias(weight_col))
        .withColumn("__cum", cum)
        .join(
            F.broadcast(totals),
            F.col(group_col) == F.col("__g"),
        )
        .filter(F.col("__total") > 0)
    )
    # INTEGER division (SQL `div`), not floor(a/b): `/` on longs is
    # double division, and c*n at 100 TB (1e13 tokens x n=10 = 1e14)
    # exceeds double's 2^53 exact-integer range — floor would misround
    # exactly where the corpus is big enough to matter
    hi = F.expr(
        f"(__cum * CAST({int(n_per_group)} AS BIGINT)) div __total"
    )
    lo = F.expr(
        f"((__cum - CAST({weight_col} AS BIGINT)) * "
        f"CAST({int(n_per_group)} AS BIGINT)) div __total"
    )
    return (
        staged.withColumn("slots", (hi - lo).cast("long"))
        .filter(F.col("slots") > 0)
        .select(group_col, id_col, weight_col, "slots")
    )
