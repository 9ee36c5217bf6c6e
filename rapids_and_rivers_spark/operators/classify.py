"""Naive Bayes text-classifier TRAINING on mergeable sufficient statistics.

The missing half of the engine's classifier story: ``text.
hashed_linear_score`` runs a trained model over the corpus (inference),
but pretraining pipelines also need to TRAIN the quality/domain filter
itself — the fastText-style classifier CCNet (Wenzek et al., LREC 2020)
and the GPT-3 data work train against a curated positive class and then
score the crawl. Multinomial Naive Bayes is the canonical corpus-scale
trainer for that job because its "training" is exactly one aggregation:

    counts[c][b] = number of tokens of class c hashing to feature b
    docs[c]      = number of documents of class c

Both tables are component-wise ADDABLE across shards/epochs (the
linreg/Bradley-Terry sufficient-statistics property), which is what
makes the streaming dual exact: train once per micro-batch, merge by +.

Cross-engine exactness (the q2/BT lesson, memory:
exact-integer-aggregates-for-cross-engine-compares): classification
sums per-token log-likelihoods, and float SUMS are order-dependent, so
a DuckDB oracle would drift from Spark if scores were doubles. Weights
are therefore QUANTIZED ONCE to int64 micro-nats —

    w[c][b]  = floor(ln((counts[c][b] + 1) / (total_c + D)) * 1e6 + 0.5)
    prior[c] = floor(ln(docs[c] / total_docs) * 1e6 + 0.5)

(Laplace add-one smoothing over D hashed buckets) — and every document
score is a pure INTEGER sum ``prior[c] + Σ_b n_b * w[c][b]``: order-free,
bit-equal in any engine. The single ``ln`` per (class, bucket) is
evaluated on exact integer ratios in both engines; the 1e-6 grid
absorbs sub-ulp libm differences (the lloyd_codebook quantize
argument). Argmax ties break to the lexicographically smaller class.

Feature hashing rides ``text.token_hash_bucket`` (md5-prefix mod D),
the same engine-agnostic bucket function the inference pass and its
oracle already share.

At 100 TB: training is one map-side-combinable groupBy over the token
stream producing a (|classes| x D)-row table — KBs, broadcast
everywhere; classification is one broadcast join + integer agg per
document, no shuffle of the corpus beyond the per-doc bucket counts.

Reference anchor: extension surface (SURVEY §2 pipeline family) next to
linreg_price_model / bt_supplier_strength; the reference engine has no
model fitting — the parity target is the mergeable-statistics shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rapids_and_rivers_spark.operators.text import token_hash_bucket, tokens

LOG_MICRO = 1_000_000


def nb_sufficient_stats(
    docs: DataFrame,
    text_col: str = "text",
    class_col: str = "source",
    n_buckets: int = 64,
):
    """Corpus -> the two MERGEABLE tables Naive Bayes needs:
    ``counts (cls, bucket, cnt)`` and ``cls_docs (cls, n_docs)``."""
    toks = docs.select(
        F.col(class_col).alias("cls"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = (
        toks.withColumn("bucket", token_hash_bucket(F.col("tok"), n_buckets))
        .groupBy("cls", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cls_docs = docs.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return counts, cls_docs


def nb_model(counts: DataFrame, cls_docs: DataFrame, n_buckets: int = 64):
    """Sufficient statistics -> the integer micro-nat model:
    ``weights (cls, bucket, w)`` over the FULL class x bucket grid
    (unseen buckets get the smoothed floor) and ``priors (cls, prior)``.
    Both are |classes| x D rows — broadcast-sized at any corpus scale."""
    spark = counts.sparkSession
    grid = cls_docs.select("cls").crossJoin(
        spark.range(n_buckets).select(F.col("id").cast("long").alias("bucket"))
    )
    totals = counts.groupBy("cls").agg(F.sum("cnt").alias("total"))
    weights = (
        grid.join(counts, ["cls", "bucket"], "left")
        .join(totals, "cls", "left")
        .select(
            "cls",
            "bucket",
            F.floor(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("total"), F.lit(0)) + F.lit(float(n_buckets)))
                )
                * F.lit(float(LOG_MICRO))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("w"),
        )
    )
    # bounded-collect: 1-row global aggregate (total corpus docs)
    total_docs = cls_docs.agg(F.sum("n_docs")).first()[0]
    priors = cls_docs.select(
        "cls",
        F.floor(
            F.log(F.col("n_docs") / F.lit(float(total_docs)))
            * F.lit(float(LOG_MICRO))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("prior"),
    )
    return weights, priors


def nb_doc_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-document hashed-feature counts ``(id, bucket, n)`` — the
    tokenize-once representation the classifier scores from (and the
    streaming dual stores per epoch so no document tokenizes twice)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.withColumn("bucket", token_hash_bucket(F.col("tok"), n_buckets))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def nb_classify(
    doc_ids: DataFrame,
    doc_buckets: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
) -> DataFrame:
    """Argmax class per document: ``(id, pred, score)`` with score in
    integer micro-nats. ``doc_ids`` must carry every document (zero-token
    documents classify on priors alone); ties -> lexicographically
    smaller class. The weight/prior joins broadcast (|classes| x D
    rows); the corpus never shuffles beyond its per-doc bucket counts."""
    tok_scores = (
        doc_buckets.join(F.broadcast(weights), "bucket")
        .groupBy("id", "cls")
        .agg(F.sum(F.col("n") * F.col("w")).alias("tok_score"))
    )
    scored = (
        doc_ids.crossJoin(F.broadcast(priors))
        .join(tok_scores, ["id", "cls"], "left")
        .select(
            "id",
            "cls",
            (F.col("prior") + F.coalesce(F.col("tok_score"), F.lit(0)))
            .cast("long")
            .alias("score"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("id").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("cls").alias("pred"), "score")
    )
