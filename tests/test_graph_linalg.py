"""Unit tests for triangle counting, theta set-ops, and the quantized
Gramian / power-iteration PCA operators."""

import math

import pytest

from pyspark.sql import functions as F

from rapids_and_rivers_spark.operators import graph as G
from rapids_and_rivers_spark.operators import linalg as LA
from rapids_and_rivers_spark.operators import sketch as K


def test_triangles_known_graph(spark):
    # K4 on {1,2,3,4} plus a pendant 5: every K4 node sits on 3 triangles,
    # the pendant on none; 4 triangles total counted once each -> sum 12.
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r["node"]: (r["deg"], r["tri"]) for r in G.triangles(df).collect()}
    assert out[1] == (3, 3) and out[2] == (3, 3) and out[3] == (3, 3)
    assert out[4] == (4, 3)
    assert out[5] == (1, 0)


def test_triangles_input_orientation_and_self_loops_canonicalized(spark):
    # duplicated reverse edges and self-loops must not change the result
    tri = [(1, 2), (2, 3), (3, 1)]
    noisy = tri + [(b, a) for a, b in tri] + [(1, 1), (2, 2)]
    df = spark.createDataFrame(noisy, "src int, dst int")
    out = {r["node"]: r["tri"] for r in G.triangles(df).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_theta_setops_exact_when_small(spark):
    # below k both sketches are exact: estimates equal true set algebra
    a = spark.createDataFrame([(f"a{i}",) for i in range(30)], "v string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(20, 40)], "v string"
    )
    row = K.theta_setops(spark, a, b, "v", k=64).collect()[0]
    assert row["n_a"] == 30 and row["n_b"] == 20
    assert row["theta_scaled"] is None
    assert row["est_a"] == 30.0 and row["est_b"] == 20.0
    assert row["est_union"] == 40.0
    assert row["est_intersect"] == 10.0
    assert row["est_diff_ab"] == 20.0


def test_theta_setops_estimates_within_rse(spark):
    # k=64 -> relative standard error ~ 1/sqrt(k-2) ~ 12.7%; allow 4 RSE
    n = 2000
    a = spark.createDataFrame([(f"x{i}",) for i in range(n)], "v string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(n // 2, n // 2 + n)], "v string"
    )
    row = K.theta_setops(spark, a, b, "v", k=64).collect()[0]
    rse4 = 4 / math.sqrt(62)
    assert abs(row["est_a"] - n) / n < rse4
    assert abs(row["est_union"] - 1.5 * n) / (1.5 * n) < rse4


def test_quantized_gram_matches_numpy(spark):
    import numpy as np

    rng = [[(-1) ** (i + j) * ((i * 7 + j * 3) % 11) / 10.0 for j in range(4)]
           for i in range(6)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(rng)],
        "id long, vec array<float>",
    )
    got = {
        (r["i"], r["j"]): r["gsum"]
        for r in LA.quantized_gram(df, "vec", dim=4, scale=1000).collect()
    }
    # the column is array<float>: quantization sees float32-rounded values
    q = np.floor(
        np.array(rng, dtype=np.float32).astype(np.float64) * 1000
    ).astype(np.int64)
    expect = q.T @ q
    for i in range(4):
        for j in range(i, 4):
            assert got[(i, j)] == expect[i][j]


def test_power_component_converges_to_dominant_eigvec(spark):
    import numpy as np

    # diag-dominant integer gram with a clear top direction
    g = np.array(
        [[100, 10, 0, 0], [10, 90, 5, 0], [0, 5, 20, 2], [0, 0, 2, 10]],
        dtype=np.int64,
    )
    rows = [(i, j, int(g[i][j])) for i in range(4) for j in range(i, 4)]
    v, lam = LA.power_component(rows, dim=4, iters=25)
    w, vec = np.linalg.eigh(g.astype(np.float64))
    top = vec[:, -1]
    if top[0] < 0:
        top = -top
    assert abs(abs(sum(a * b for a, b in zip(v, top))) - 1.0) < 1e-3
    assert abs(lam - w[-1]) / w[-1] < 1e-2


def test_project_on_matches_manual_dot(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125])], "id long, vec array<float>"
    )
    v = [0.5, 0.5, -0.5]
    got = LA.project_on(df, "vec", v, scale=1000).collect()[0]["proj"]
    q = [math.floor(x * 1000) / 1000 for x in [0.5, -0.25, 0.125]]
    assert got == pytest.approx(sum(a * b for a, b in zip(q, v)), abs=1e-12)


def test_mmr_rerank_prefers_diverse_over_redundant(spark):
    from rapids_and_rivers_spark.operators.similarity import mmr_rerank

    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "query_id long, q_emb array<float>"
    )
    # c10 most relevant; c11 a near-clone of c10; c12 less relevant but
    # orthogonal to c10 -> MMR must pick c12 second, plain top-k would not
    c = spark.createDataFrame(
        [
            (10, [0.99, 0.1, 0.0, 0.0]),
            (11, [0.98, 0.12, 0.0, 0.0]),
            (12, [0.6, 0.0, 0.8, 0.0]),
        ],
        "cand_id long, c_emb array<float>",
    )
    out = {
        r["rank"]: r["cid"]
        for r in mmr_rerank(q, c, k_pool=3, k_out=3, lam=0.5).collect()
    }
    assert out[1] == 10
    assert out[2] == 12
    assert out[3] == 11


def test_mmr_first_pick_is_plain_relevance_topk(spark):
    from rapids_and_rivers_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
        as_double_array,
    )
    from rapids_and_rivers_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    mmr = {
        r["qid"]: r["cid"]
        for r in mmr_rerank(q, c, k_pool=10, k_out=1).collect()
    }
    bf = brute_force_topk(
        q.select("query_id", as_double_array(F.col("q_emb")).alias("q_emb")),
        c.select(
            F.col("cand_id").alias("neighbor_id"),
            as_double_array(F.col("c_emb")).alias("c_emb"),
        ),
        k=1,
    )
    exact = {r["query_id"]: r["neighbor_id"] for r in bf.collect()}
    assert mmr == exact


def test_ppr_concentrates_near_seed(spark):
    from rapids_and_rivers_spark.operators import graph as G

    # two triangles bridged by one edge, seed inside the left one. A
    # path/bipartite graph shows walk-parity oscillation at finite
    # iterations, so assert the parity-robust property instead: every
    # node in the seed's cluster out-ranks every node across the bridge.
    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in und] + [(b, a, 1.0) for a, b in und],
        "src int, dst int, weight double",
    )
    reset = spark.createDataFrame([(1, 1.0)], "node int, r double")
    pr = {
        r["node"]: r["pr"]
        for r in G.pagerank(edges, iters=6, reset=reset).collect()
    }
    assert min(pr[1], pr[2], pr[3]) > max(pr[4], pr[5], pr[6])
    # total mass stays ~1 (restart conserves probability)
    assert abs(sum(pr.values()) - 1.0) < 1e-6


def test_ppr_uniform_reset_equals_standard_pagerank(spark):
    from rapids_and_rivers_spark.operators import graph as G

    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in und] + [(b, a, 1.0) for a, b in und],
        "src int, dst int, weight double",
    )
    n = 4
    uniform = spark.createDataFrame(
        [(i, 1.0 / n) for i in range(1, n + 1)], "node int, r double"
    )
    ppr = {
        r["node"]: r["pr"]
        for r in G.pagerank(edges, iters=3, reset=uniform).collect()
    }
    std = {r["node"]: r["pr"] for r in G.pagerank(edges, iters=3).collect()}
    for k in std:
        assert abs(ppr[k] - std[k]) < 1e-12


def test_linreg_normal_equations_recovers_exact_plane(spark, tmp_path):
    """y = 40 + 2*qty + 0.07*d100 (in price units) generated exactly on
    a quantized grid must be recovered exactly by the Cramer solve —
    the determinant algebra is integer-exact, so betas are not
    approximate when the data is noiseless."""
    import os

    from pyspark.sql import functions as F

    from rapids_and_rivers_spark import catalog

    rows = [
        (float(q), d / 100.0, 40.0 + 2.0 * q + 0.07 * (d))
        for q in range(1, 21)
        for d in range(0, 11)
    ]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_extendedprice double"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    out = catalog.linreg_price_model(spark, sf).collect()[0]
    assert out["n"] == 220
    assert out["beta0"] == 40.0
    assert out["beta_qty"] == 2.0
    assert out["beta_disc100"] == 7.0  # 0.07 price units per discount point


def test_power_component_int_matches_duckdb_unroll():
    """Cross-engine exactness pin: the integer power iterates (matvec +
    max-abs rescale) computed by power_component_int must equal a DuckDB
    HUGEINT unroll of the same two rounds VERBATIM — the invariant the
    embedding_pca_project oracle depends on at sf1 Gramian magnitudes
    (where the earlier round-to-8-decimals re-sync drifted)."""
    import random

    import duckdb

    rng = random.Random(7)
    dim = 8
    # sf1-scale magnitudes: gram entries up to ~2e11
    rows = [
        (i, j, rng.randint(-(2 * 10**11), 2 * 10**11))
        for i in range(dim)
        for j in range(i, dim)
    ]
    w, nrm, _ = LA.power_component_int(rows, dim=dim, iters=2)

    con = duckdb.connect()
    con.execute("CREATE TABLE gram0 (i INT, j INT, g BIGINT)")
    con.executemany("INSERT INTO gram0 VALUES (?, ?, ?)", rows)
    got = con.execute(
        """
        WITH gram AS (
          SELECT i, j, g FROM gram0
          UNION ALL
          SELECT j AS i, i AS j, g FROM gram0 WHERE i < j
        ),
        u1 AS (SELECT i, sum(CAST(g AS HUGEINT)) AS u FROM gram GROUP BY i),
        m1 AS (SELECT max(abs(u)) AS m FROM u1),
        v1 AS (SELECT i, (CASE WHEN u < 0 THEN -1 ELSE 1 END)
                      * ((abs(u) * CAST(100000000 AS HUGEINT)) // m) AS v
               FROM u1, m1),
        u2 AS (SELECT gram.i AS i, sum(CAST(gram.g AS HUGEINT) * v1.v) AS u
               FROM gram JOIN v1 ON gram.j = v1.i GROUP BY gram.i),
        m2 AS (SELECT max(abs(u)) AS m FROM u2),
        w2 AS (SELECT i, (CASE WHEN u < 0 THEN -1 ELSE 1 END)
                      * ((abs(u) * CAST(100000000 AS HUGEINT)) // m) AS w
               FROM u2, m2)
        SELECT i, w FROM w2 ORDER BY i
        """
    ).fetchall()
    assert [int(x) for _, x in got] == w
    assert nrm == math.sqrt(sum(x * x for x in w))


def test_power_component_int_zero_gram_guard():
    w, nrm, lam = LA.power_component_int([(0, 0, 0)], dim=3, iters=2)
    assert w == [0, 0, 0] and nrm == 0.0 and lam == 0.0


def test_project_on_exact_matches_manual_dot(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125])], "id long, vec array<float>"
    )
    w = [70000000, -50000000, 30000000]
    nrm = math.sqrt(sum(x * x for x in w))
    got = LA.project_on_exact(df, "vec", w, nrm, scale=1000).collect()[0]["proj"]
    q = [math.floor(x * 1000) for x in [0.5, -0.25, 0.125]]
    assert got == sum(a * b for a, b in zip(q, w)) / nrm / 1000.0
