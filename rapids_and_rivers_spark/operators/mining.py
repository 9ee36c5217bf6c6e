"""Pattern-mining operators: market-basket association rules and
decision-stump training on mergeable integer sufficient statistics.

Reference parity note: the reference (navikt/rapids-and-rivers) is a
Kafka event-bus library with no data operators — these extend the
engine's training-data / analytics surface (SURVEY.md §2.6 extension
surface), following the repo's exactness discipline: integer counts
everywhere, a single IEEE double division only at the output boundary,
deterministic tiebreaks on (score, name, value).

Scale design (the round-5 blocking law):

- ``association_rules``: candidate pairs are generated per-BASKET by an
  equi-join on the basket key — fan-out is C(k,2) for a basket with k
  distinct frequent items, never |items|² — after an apriori prune
  (only items with support >= min_item_support enter the pair join;
  Agrawal & Srikant VLDB'94). Item marginals broadcast. The basket
  total is one bounded scalar collect (the pagerank-N class).
- decision stump: the sufficient statistic is the (feature, value) ->
  (n, pos) count grid — O(Σ|distinct values|) rows independent of row
  count, mergeable by integer sum (the linreg/BT/NB pattern), so the
  streaming dual re-derives the stump from accumulated counts without
  re-reading data. Split scoring compares exact integer-derived
  rationals via one double division each (numerators in DECIMAL(38,0)
  — counts² x counts exceeds BIGINT beyond ~3e6 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = [
    "association_rules",
    "rules_from_counts",
    "stump_stats",
    "best_stump",
]


def rules_from_counts(
    item_counts: DataFrame,
    pair_counts: DataFrame,
    n_baskets: int,
    min_item_support: int = 2,
    min_pair_support: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Derive rules from pre-aggregated counts — the shared core of
    :func:`association_rules` and the streaming dual's store reader.

    ``item_counts``: (item, c_item); ``pair_counts``: (ia, ib, c_ab)
    with ia < ib. Counts are exact integers (the mergeable sufficient
    statistic); support/confidence thresholds and the one-division
    exactness rule apply here so batch and stream share the formula
    verbatim.
    """
    frequent = item_counts.filter(
        F.col("c_item") >= F.lit(int(min_item_support))
    )
    pairs = pair_counts.filter(F.col("c_ab") >= F.lit(int(min_pair_support)))
    directed = pairs.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"), "c_ab"
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"), F.col("ia").alias("consequent"), "c_ab"
        )
    )
    ca = frequent.select(F.col("item").alias("antecedent"), F.col("c_item").alias("c_a"))
    cb = frequent.select(F.col("item").alias("consequent"), F.col("c_item").alias("c_b"))
    n = F.lit(int(n_baskets)).cast("long")
    conf = F.col("c_ab").cast("double") / F.col("c_a").cast("double")
    lift = (F.col("c_ab") * n).cast("double") / (
        F.col("c_a") * F.col("c_b")
    ).cast("double")
    return (
        directed.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .withColumn("confidence", F.round(conf, 4))
        .withColumn("lift", F.round(lift, 4))
        .filter(conf >= F.lit(float(min_confidence)))
        .select(
            "antecedent", "consequent", "c_ab", "c_a", "c_b", "confidence", "lift"
        )
    )


def association_rules(
    basket_items: DataFrame,
    n_baskets: int,
    basket_col: str = "basket",
    item_col: str = "item",
    min_item_support: int = 2,
    min_pair_support: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Association rules ``antecedent -> consequent`` over 1- and
    2-itemsets with support / confidence / lift.

    ``basket_items`` must already be DISTINCT (basket, item) rows —
    dedup belongs to the caller, which knows whether its source can
    repeat (the streaming dual's monotone store dedups across epochs).
    ``n_baskets`` is the caller-supplied basket universe size (a
    bounded metadata-cheap count, like pagerank's N).

    Exactness: support counts are exact integers; ``confidence`` and
    ``lift`` are each ONE double division of exact integer products
    (c_ab * n fits BIGINT to ~3e9 baskets), so every engine that
    rounds to nearest reproduces them bit-for-bit; output rounds to 4
    digits like the PMI family.
    """
    bi = basket_items.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    )
    # apriori prune: an infrequent item cannot appear in a frequent
    # pair — drop it BEFORE the per-basket self-join
    item_counts = bi.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("c_item")
    )
    frequent = item_counts.filter(F.col("c_item") >= F.lit(int(min_item_support)))
    bif = bi.join(F.broadcast(frequent.select("item")), "item")
    a, b = bif.alias("a"), bif.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    return rules_from_counts(
        item_counts,
        pairs,
        n_baskets,
        min_item_support=min_item_support,
        min_pair_support=min_pair_support,
        min_confidence=min_confidence,
    )


def stump_stats(
    df: DataFrame, feature_cols: list[str], label_col: str = "y"
) -> DataFrame:
    """Reduce rows to the decision stump's MERGEABLE sufficient
    statistic: exact integer ``(feature, value) -> (n, pos)`` counts.

    ``feature_cols`` must be integer-valued (ordinal) columns and
    ``label_col`` a 0/1 integer. The grid has Σ|distinct values| rows
    — independent of |df| — and merges across partitions, epochs, or
    clusters by plain integer sum, which is what lets the streaming
    dual train continually without revisiting data.
    """
    # NULL feature values are dropped per feature: a NULL is not a
    # threshold candidate, and engines disagree on NULL window order
    # (Spark NULLS FIRST vs DuckDB NULLS LAST) — admitting them would
    # silently diverge every cumulative prefix from the oracle
    parts = [
        df.filter(F.col(c).isNotNull())
        .groupBy(
            F.lit(c).alias("feature"), F.col(c).cast("long").alias("value")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(label_col).cast("long")).cast("long").alias("pos"),
        )
        for c in feature_cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def best_stump(stats: DataFrame, top_k: int = 10) -> DataFrame:
    """Rank threshold splits ``feature <= value`` by exact-count Gini
    gain; return the best ``top_k`` with leaf statistics.

    Minimizing weighted Gini impurity is equivalent to maximizing

        score = (posL² + negL²)/nL + (posR² + negR²)/nR

    (drop the constant N). Both terms are put over the common
    denominator nL*nR: the numerator is exact in DECIMAL(38,0)
    (counts² x counts ~ N³ = 1e38 headroom past 4e12 rows), the
    denominator exact in BIGINT, and the score is ONE double division
    of those exact integers — bit-reproducible in any
    round-to-nearest engine, no float accumulation anywhere.
    Deterministic tiebreak: (score DESC, feature, value).
    """
    per_f = (
        stats.groupBy("feature", "value")
        .agg(F.sum("n").alias("n"), F.sum("pos").alias("pos"))
    )
    totals = per_f.groupBy("feature").agg(
        F.sum("n").alias("tn"), F.sum("pos").alias("tpos")
    )
    wcum = (
        W.partitionBy("feature")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cand = (
        per_f.withColumn("nl", F.sum("n").over(wcum))
        .withColumn("posl", F.sum("pos").over(wcum))
        .join(F.broadcast(totals), "feature")
        .filter(F.col("nl") < F.col("tn"))  # right leaf must be non-empty
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    negl = dec("nl") - dec("posl")
    nr = dec("tn") - dec("nl")
    posr = dec("tpos") - dec("posl")
    negr = nr - posr
    num = (dec("posl") * dec("posl") + negl * negl) * nr + (
        posr * posr + negr * negr
    ) * dec("nl")
    den = dec("nl") * nr
    return (
        cand.withColumn(
            "score", num.cast("double") / den.cast("double")
        )
        .select(
            "feature",
            F.col("value").alias("threshold"),
            F.col("nl").alias("n_left"),
            F.col("posl").alias("pos_left"),
            (F.col("tn") - F.col("nl")).alias("n_right"),
            (F.col("tpos") - F.col("posl")).alias("pos_right"),
            F.round(F.col("score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "feature", "threshold")
        .limit(top_k)
    )
