"""Hand-computed checks for the retrieval/LM-quality operators
(operators/retrieval.py) — the DuckDB oracles cover the corpus-scale
cross-engine match; these pin the math on a corpus small enough to
verify by hand."""

import math

import pytest

from rapids_and_rivers_spark.operators import retrieval as R


@pytest.fixture()
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark window"),
            (2, "window batch"),
            (3, "other words here"),
        ],
        "doc_id long, text string",
    )


def test_inverted_postings(spark, tiny_docs):
    rows = {r.token: r for r in R.inverted_postings(tiny_docs).collect()}
    assert rows["spark"].df == 1 and rows["spark"].total_tf == 2
    assert rows["window"].df == 2 and rows["window"].postings == "1,2"
    assert rows["batch"].postings == "2"
    # cap: posting string never exceeds max_postings entries
    capped = R.inverted_postings(tiny_docs, max_postings=1).collect()
    assert all(len(r.postings.split(",")) <= 1 for r in capped)


def test_bm25_scores_by_hand(spark, tiny_docs):
    got = {r.doc_id: r for r in R.bm25_scores(tiny_docs, ["spark", "batch"]).collect()}
    assert set(got) == {1, 2}  # doc 3 matches no term
    n, avgdl = 3.0, (3 + 2 + 3) / 3.0
    k1, b = 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1].n_hits == 1
    assert got[1].score == pytest.approx(round(bm25(2, 1, 3), 4), abs=1e-4)
    assert got[2].score == pytest.approx(round(bm25(1, 1, 2), 4), abs=1e-4)


def test_bigram_logprob_by_hand(spark):
    # corpus: "a b a b" + "a b" => bigrams: (a b)x3, (b a)x1
    # unigrams: a x3, b x3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in R.bigram_logprob(df).collect()}
    lp_ab = math.log(3 / 3)  # P(b|a) = c(a b)/c(a) = 3/3
    lp_ba = math.log(1 / 3)  # P(a|b) = 1/3
    assert got[1].n_bigrams == 3
    assert got[1].avg_logprob == pytest.approx(
        round((2 * lp_ab + lp_ba) / 3, 4), abs=1e-4
    )
    assert got[2].n_bigrams == 1
    assert got[2].avg_logprob == pytest.approx(round(lp_ab, 4), abs=1e-4)


def test_single_token_and_empty_docs_are_excluded(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    assert {r.doc_id for r in R.bigram_logprob(df).collect()} == {3}
    with pytest.raises(ValueError, match="non-empty"):
        R.bm25_scores(df, [])


# --- reciprocal-rank fusion --------------------------------------------------


def test_rrf_fuse_agreement_wins(spark):
    """A doc ranked top by BOTH lists outscores docs top in only one:
    1/(k+1)+1/(k+2) > 1/(k+1) for any k."""
    from rapids_and_rivers_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (1, 0.5), (4, 0.1)], "doc_id long, score double"
    )
    rows = {r.doc_id: r for r in rrf_fuse([a, b], k=60).collect()}
    # docs 1 and 2 appear in both lists
    assert rows[1].n_lists == 2 and rows[2].n_lists == 2
    assert rows[3].n_lists == 1 and rows[4].n_lists == 1
    # 1: ranks (1,2); 2: ranks (2,1) -> identical fused score
    assert rows[1].rrf_score == rows[2].rrf_score
    assert rows[1].rrf_score > rows[3].rrf_score
    expected = round(1 / 61 + 1 / 62, 6)
    assert rows[1].rrf_score == expected


def test_rrf_fuse_depth_cuts_lists(spark):
    """Docs below the depth cutoff never contribute."""
    from rapids_and_rivers_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], "doc_id long, score double"
    )
    out = {r.doc_id for r in rrf_fuse([a], depth=3).collect()}
    assert out == {0, 1, 2}


def test_ql_scores_fraction(spark):
    from rapids_and_rivers_spark.operators.retrieval import ql_scores

    df = spark.createDataFrame(
        [(1, "spark spark other word"), (2, "nothing relevant here")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.score for r in ql_scores(df, ["spark"]).collect()}
    assert rows == {1: 0.5}


def test_ccnet_tiers_are_balanced_per_source(spark):
    """CCNet bucketing invariants on the real documents table: within
    every source the head/middle/tail tiers differ in size by at most 1
    (ntile(3) contract), every scored doc gets exactly one tier, and the
    worst head score is >= the best tail score (the cut is monotone in
    the LM score)."""
    from rapids_and_rivers_spark import catalog

    out = catalog.queries()["ccnet_perplexity_buckets"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for source, rows in by_source.items():
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rows:
            sizes[r.tier] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (source, sizes)
        worst_head = min(r.avg_logprob for r in rows if r.tier == "head")
        best_tail = max(r.avg_logprob for r in rows if r.tier == "tail")
        assert worst_head >= best_tail, source
