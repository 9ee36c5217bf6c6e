"""Retrieval & language-model quality operators over the document corpus.

Three components a training-data pipeline runs next to dedup/quality:

- :func:`inverted_postings` — the inverted index (token → document
  posting list + document frequency): the backbone of lexical retrieval
  and of decontamination-by-term lookups.
- :func:`bm25_scores` — Okapi BM25 scoring of documents against a query
  term set using corpus statistics (df, avgdl) computed distributed.
- :func:`bigram_logprob` — corpus-trained bigram language-model score
  per document (average log P(w_i | w_{i-1})) — the perplexity-style
  quality filter of CCNet/Gopher pipelines, here with the corpus itself
  as the LM training set (swap the count tables for an external LM's
  tables in production).

Scale shapes: everything is tokenize-once + explode + keyed aggregation
(map-side partial aggs on token keys); the only joins are equi-joins on
token (bigram), and the corpus-level scalars (N, avgdl) collapse to
1-row literals — no global sorts, no UDFs, no driver-side loops.
Posting lists are emitted as sorted comma-joined strings capped at
``max_postings`` (a real index shards them; the cap keeps any one row
bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def doc_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, token) — lowercase whitespace tokens with position."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "token"),
    ).filter(F.length("token") > 0)


def inverted_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 20,
    min_df: int = 1,
) -> DataFrame:
    """Inverted index: per token, document frequency, total term count,
    and the first ``max_postings`` doc ids (sorted) as a comma-joined
    string (string form keeps the value engine-comparable; a production
    index keeps the array and shards it).

    One explode + one groupBy(token) — the partial agg collapses each
    map task's postings before the shuffle; `slice` bounds the row size
    so a stop-word's posting list cannot blow up a task.
    """
    tf = (
        doc_tokens(df, text_col, id_col)
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, max_postings),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 4,
) -> DataFrame:
    """Okapi BM25 (Robertson & Zaragoza 2009) of every document against a
    fixed query term set; returns (doc_id, n_hits, score) for documents
    matching at least one term.

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1) — the Lucene-style
    non-negative variant. N and avgdl collapse to driver scalars (two
    1-row aggregates over row-group stats / the token table), df comes
    from one token-keyed aggregation, and scoring is an equi-join of the
    per-doc tf rows of the query terms only (the scan is pre-filtered to
    the query vocabulary, so the join side is tiny at any corpus size).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = doc_tokens(df, text_col, id_col)
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = df.count()
    avgdl = doclen.agg(F.avg("dl")).first()[0]
    qt = [t.lower() for t in query_terms]
    tf = (
        toks.filter(F.col("token").isin(qt))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return bm25_from_parts(tf, doclen, n_docs, avgdl, k1, b, ndigits)


def bm25_from_parts(
    tf: DataFrame,
    doclen: DataFrame,
    n_docs: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 4,
) -> DataFrame:
    """BM25 scoring core shared by the batch query and the streaming
    index dual: takes the already-built parts — per-doc query-term
    frequencies ``tf(doc_id, token, tf)``, document lengths
    ``doclen(doc_id, dl)``, and the two corpus scalars — and applies the
    Okapi formula with the Lucene-style non-negative idf. ONE
    implementation of the formula, so the dual can never drift from the
    batch semantics (the gram_stream lesson)."""
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(dfreq, "token")
        .join(doclen, "doc_id")
        .withColumn(
            "term_score",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.round(F.sum("term_score"), ndigits).alias("score"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 4,
) -> DataFrame:
    """Corpus-trained bigram LM score per document: the average
    ln P(w_i | w_{i-1}) with MLE probabilities from the corpus's own
    bigram/unigram counts — the perplexity-filter shape (CCNet trains
    KenLM on a reference corpus; the count-table join below is identical
    with external tables substituted).

    Returns (doc_id, n_bigrams, avg_logprob) for documents with ≥ 1
    bigram. Two token-keyed aggregations build the LM; scoring is one
    equi-join on the bigram key + one per-doc aggregation. MLE on the
    training corpus itself never hits unseen bigrams, so no smoothing
    term is needed for this in-corpus variant.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # consecutive pairs via zip_with on the array and its tail — stays a
    # Column expression, no posexplode self-join
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    doc_bigrams = df.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("bigram")
    )
    bigram_counts = doc_bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("c2")
    )
    unigram_counts = (
        doc_tokens(df, text_col, id_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    # P(w2|w1) = c(w1 w2) / c(w1); the trailing token of each doc also
    # counts in c1, matching the plain MLE convention
    lm = bigram_counts.join(
        unigram_counts.withColumnRenamed("token", "w1"),
        F.split(F.col("bigram"), " ")[0] == F.col("w1"),
    ).select("bigram", (F.log(F.col("c2") / F.col("c1"))).alias("lp"))
    return (
        doc_bigrams.join(lm, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), ndigits).alias("avg_logprob"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    depth: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    ``rrf(d) = Σ_lists 1/(k + rank_list(d))`` over each ranker's top
    ``depth`` results — the standard score-free way to combine lexical
    (BM25) and secondary (QL / dense) retrieval lists, robust to
    incomparable score scales.

    Scale shape: each ranking is cut to its top ``depth`` FIRST with
    ``orderBy(...).limit(depth)`` — Spark plans that as a parallel
    per-partition heap + driver merge (TakeOrderedAndProject), so the
    partition-less row_number window that assigns ranks runs over a
    BOUNDED ``depth``-row input (the shape the repo's plan auditor
    accepts structurally; an unbounded global window is the flagged
    anti-pattern). The fused groupBy touches ≤ lists·depth rows.

    Determinism: callers must pass PRE-ROUNDED scores (e.g. bm25_scores'
    round-4 output) — ranks derive from (score DESC, id) compares, and
    raw libm-drifting floats could swap near-ties across engines. With
    ≤ 2 lists the contribution sum is a single IEEE addition
    (commutative — aggregation order cannot matter); more lists ride on
    round(…, 6).

    Output: (id, rrf_score, n_lists), one row per doc appearing in any
    top-``depth`` list.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = []
    for r in rankings:
        top = (
            r.select(id_col, score_col)
            .orderBy(F.desc(score_col), id_col)
            .limit(depth)
        )
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        parts.append(
            top.select(
                id_col,
                (F.lit(1.0) / (F.lit(float(k)) + F.row_number().over(w))).alias(
                    "contrib"
                ),
            )
        )
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    return fused.groupBy(id_col).agg(
        F.round(F.sum("contrib"), 6).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )


def ql_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 4,
) -> DataFrame:
    """Maximum-likelihood query-likelihood score: the fraction of a
    document's tokens that are query terms, ``Σ_t tf(t,d) / |d|`` — the
    smoothing-free LM baseline (Ponte & Croft, SIGIR 1998 family). Kept
    deliberately un-BM25-like as the second opinion for
    :func:`rrf_fuse`; exact rational arithmetic (int/int in doubles)
    plus round-4 makes it bit-stable cross-engine. Same pre-filtered
    scale shape as :func:`bm25_scores`: only query-vocabulary postings
    ever reach the join."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = doc_tokens(df, text_col, id_col)
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qt = [t.lower() for t in query_terms]
    hits = (
        toks.filter(F.col("token").isin(qt))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    return hits.join(doclen, "doc_id").select(
        "doc_id",
        F.round(F.col("qtf") / F.col("dl").cast("double"), ndigits).alias("score"),
    )


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted index: one (token, doc_id, pos) row per
    token occurrence, positions being RAW split-array indices (empty
    tokens are dropped from the postings but do not renumber later
    positions — both engines see the identical index).

    This is the index layout phrase and proximity queries need; the
    non-positional :func:`inverted_postings` stays the cheaper layout
    for bag-of-words scoring. At 100 TB the postings table partitions
    by token (query terms prune by key); positions add one int per
    occurrence, the standard Lucene-style cost."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "token"))
        .filter(F.length("token") > 0)
    )


def phrase_adjacency(postings: DataFrame) -> DataFrame:
    """Exact 2-token phrase occurrences from a positional index: ONE
    self-equi-join on (doc, pos+1) — the classic positional-postings
    merge (Manning, Raghavan & Schütze IR ch. 2). Returns one row per
    occurrence: (doc_id, w1, w2, pos). For a CONCRETE phrase query the
    same join runs with each side pre-filtered to one token — the
    postings key prunes the scan; nothing here is corpus × corpus."""
    p1, p2 = postings.alias("p1"), postings.alias("p2")
    return p1.join(
        p2,
        (F.col("p1.doc_id") == F.col("p2.doc_id"))
        & (F.col("p2.pos") == F.col("p1.pos") + 1),
    ).select(
        F.col("p1.doc_id").alias("doc_id"),
        F.col("p1.token").alias("w1"),
        F.col("p2.token").alias("w2"),
        F.col("p1.pos").alias("pos"),
    )
