"""Round-10: epoch-store compaction for the remaining store families
(VERDICT r9 #3 — ER record store, graph adjacency/edge stores,
membership/index stores grew one directory per epoch forever).

Test discipline mirrors tests/test_frontier.py's assoc-compaction
section: a CONTROL run without compaction and a compacted run must be
reader-identical, post-compaction ingest must keep working (the
anti-join/LWW/delta contracts), and the long-run test pins the actual
lifecycle claim — file counts stay bounded over 50+ epochs while the
derived result stays exactly equal to batch.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _count_dirs(root, prefix):
    if not os.path.isdir(root):
        return 0
    return sum(1 for d in os.listdir(root) if d.startswith(prefix))


def _count_files(root):
    n = 0
    for _r, _d, files in os.walk(root):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


# --------------------------------------------------------------------------
# ER store
# --------------------------------------------------------------------------

_ER_ROWS = [
    (1, "Acme Corporation Oslo Norway registered office"),
    (2, "Acme Corporation Oslo Norway registered offices"),  # near-dup of 1
    (3, "Globex Industries Bergen Norway headquarters west"),
    (4, "Globex Industries Bergen Norway headquarter west"),  # near-dup of 3
    (5, "Initech Solutions Trondheim Norway branch north"),
    (6, "Acme Corporation Oslo Norway registered offic"),  # near-dup of 1/2
    (7, "Umbrella Research Stavanger Norway lab facility"),
]


def _er_batch(spark, ids):
    rows = [(i, t) for i, t in _ER_ROWS if i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_er_compaction_contract_invisible(spark):
    """er_compact_store folds every channel (records epoch dirs,
    ssj_* and snm_* v-dirs); er_current_entities is identical before
    and after, post-compaction ingest still resolves cross-epoch
    near-dups, and a replay after compaction stays idempotent."""
    from rapids_and_rivers_spark.streaming.duals import (
        er_compact_store,
        er_current_entities,
        er_index_foreach_batch,
    )

    out_a = tempfile.mkdtemp(prefix="rars_t_erc_a_")
    out_b = tempfile.mkdtemp(prefix="rars_t_erc_b_")
    for out in (out_a, out_b):
        stage = er_index_foreach_batch(out)
        stage(_er_batch(spark, {1, 3}), 0)
        stage(_er_batch(spark, {2, 5}), 1)
        if out == out_b:
            er_compact_store(spark, out_b, through_epoch=1)
        # post-compaction ingest: docs 4 and 6 must still pair with
        # their epoch-0/1 partners through the compacted indexes
        stage(_er_batch(spark, {4, 6, 7}), 2)
    want = sorted(
        tuple(r) for r in er_current_entities(spark, out_a).collect()
    )
    got = sorted(
        tuple(r) for r in er_current_entities(spark, out_b).collect()
    )
    assert got == want and len(want) > 0
    # the cross-compaction near-dup families actually resolved
    assert any(n > 1 for (_c, n, _m) in want)
    assert _count_files(out_b) < _count_files(out_a)
    # one records epoch dir from the fold + one from the new epoch
    assert _count_dirs(os.path.join(out_b, "records"), "epoch=") == 2
    for sub in ("ssj_prefix", "ssj_shingles", "ssj_pairs",
                "snm_pairs", "snm_touched"):
        assert _count_dirs(os.path.join(out_b, sub), "v") == 2, sub
    # replay of the post-compaction epoch is still idempotent
    stage(_er_batch(spark, {4, 6, 7}), 2)
    again = sorted(
        tuple(r) for r in er_current_entities(spark, out_b).collect()
    )
    assert again == want
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)


# --------------------------------------------------------------------------
# triangles: the 50+ epoch lifecycle run (VERDICT r9 #3 "done" bar)
# --------------------------------------------------------------------------


def test_triangles_longrun_50_epochs_bounded_files(spark):
    """52 epochs of delta edges with triangles_compact_store every 10
    epochs (watermark = last committed epoch - 1, honoring the
    at-least-once safety contract): epoch-directory counts stay
    BOUNDED (never more than compaction-interval + 1 per store), and
    the final snapshot still equals batch graph.triangles over the
    union of every edge ever ingested."""
    from rapids_and_rivers_spark.operators.graph import triangles
    from rapids_and_rivers_spark.streaming.duals import (
        read_latest_tricounts,
        triangles_foreach_batch,
    )
    from rapids_and_rivers_spark.streaming.duals import (
        triangles_compact_store,
    )

    state_dir = tempfile.mkdtemp(prefix="rars_t_tric_")
    stage = triangles_foreach_batch(state_dir, expected_adj_rows=1000)
    all_edges = []
    max_epoch_dirs = 0
    n_epochs = 52
    compact_every = 10
    for e in range(n_epochs):
        # epoch e adds (e, e+1) and (e, e+2); epoch e+1's (e+1, e+2)
        # closes triangle {e, e+1, e+2} — every epoch both extends the
        # graph and closes a cross-epoch triangle
        batch = [(e, e + 1), (e, e + 2)]
        all_edges.extend(batch)
        stage(spark.createDataFrame(batch, "src long, dst long"), e)
        if e > 0 and e % compact_every == 0:
            # strictly below the last committed epoch: a replay of
            # epoch e itself must find its own dirs intact
            triangles_compact_store(spark, state_dir, through_epoch=e - 1)
        for sub, pre in (("edges", "epoch="), ("adj", "epoch="),
                         ("counts", "v")):
            max_epoch_dirs = max(
                max_epoch_dirs,
                _count_dirs(os.path.join(state_dir, sub), pre),
            )
    triangles_compact_store(spark, state_dir, through_epoch=n_epochs - 1)
    # bounded: interval worth of live dirs + the compacted one (+1 for
    # the counts store, whose prune keeps one snapshot per fold)
    assert max_epoch_dirs <= compact_every + 2, max_epoch_dirs
    assert _count_dirs(os.path.join(state_dir, "edges"), "epoch=") == 1
    assert _count_dirs(os.path.join(state_dir, "adj"), "epoch=") == 1
    assert _count_dirs(os.path.join(state_dir, "counts"), "v") == 1
    got = {
        (r.node, r.deg, r.tri)
        for r in read_latest_tricounts(spark, state_dir).collect()
    }
    batch_df = spark.createDataFrame(all_edges, "src long, dst long")
    want = {(r.node, r.deg, r.tri) for r in triangles(batch_df).collect()}
    assert got == want and len(want) > 0
    # the long chain really closed one triangle per epoch transition
    assert sum(r[2] for r in want) > 0
    shutil.rmtree(state_dir, ignore_errors=True)


def test_triangles_post_compaction_ingest_and_replay(spark):
    """After compaction, the NEXT epoch's delta anti-join (epoch <
    current over compacted rows) and adjacency probes still see the
    full prior graph; replaying that epoch changes nothing."""
    from rapids_and_rivers_spark.operators.graph import triangles
    from rapids_and_rivers_spark.streaming.duals import (
        read_latest_tricounts,
        triangles_compact_store,
        triangles_foreach_batch,
    )

    state_dir = tempfile.mkdtemp(prefix="rars_t_trip_")
    stage = triangles_foreach_batch(state_dir, expected_adj_rows=1000)
    stage(spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"), 0)
    stage(spark.createDataFrame([(3, 4)], "src long, dst long"), 1)
    triangles_compact_store(spark, state_dir, through_epoch=1)
    # (1,3) closes triangle {1,2,3} against compacted adjacency; the
    # duplicate (2,3) must be caught by the anti-join over compacted
    # edges (epoch value 1 < 2)
    closing = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    stage(closing, 2)
    got = {
        (r.node, r.deg, r.tri)
        for r in read_latest_tricounts(spark, state_dir).collect()
    }
    union = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "src long, dst long"
    )
    want = {(r.node, r.deg, r.tri) for r in triangles(union).collect()}
    assert got == want
    stage(closing, 2)  # replay
    again = {
        (r.node, r.deg, r.tri)
        for r in read_latest_tricounts(spark, state_dir).collect()
    }
    assert again == want
    shutil.rmtree(state_dir, ignore_errors=True)


# --------------------------------------------------------------------------
# kcore / pagerank: union edge log + latest-only snapshots
# --------------------------------------------------------------------------


def test_kcore_compaction_invisible(spark):
    from rapids_and_rivers_spark.streaming.duals import (
        kcore_compact_store,
        kcore_foreach_batch,
        read_latest_core,
    )

    ring = [(i, (i + 1) % 6) for i in range(6)]
    out_a = tempfile.mkdtemp(prefix="rars_t_kcc_a_")
    out_b = tempfile.mkdtemp(prefix="rars_t_kcc_b_")
    for out in (out_a, out_b):
        stage = kcore_foreach_batch(out, k=2, rounds=3)
        stage(spark.createDataFrame(ring[:3], "src long, dst long"), 0)
        stage(spark.createDataFrame(ring[3:5], "src long, dst long"), 1)
        if out == out_b:
            kcore_compact_store(spark, out_b, through_epoch=1)
        # the ring-closing edge arrives post-compaction: every node
        # enters the 2-core only if the compacted edge log is intact
        stage(spark.createDataFrame(ring[5:], "src long, dst long"), 2)
    want = sorted(tuple(r) for r in read_latest_core(spark, out_a).collect())
    got = sorted(tuple(r) for r in read_latest_core(spark, out_b).collect())
    assert got == want and len(want) == 6
    assert _count_dirs(os.path.join(out_b, "edges"), "v") == 2
    assert _count_dirs(os.path.join(out_b, "core"), "v") == 2
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)


def test_pagerank_compaction_invisible(spark):
    from rapids_and_rivers_spark.streaming.duals import (
        pagerank_compact_store,
        pagerank_foreach_batch,
        read_latest_ranks,
    )

    e1 = [("a", "b", 2.0), ("b", "a", 2.0), ("b", "c", 1.0), ("c", "b", 1.0)]
    e2 = [("c", "d", 1.0), ("d", "c", 1.0)]
    out_a = tempfile.mkdtemp(prefix="rars_t_prc_a_")
    out_b = tempfile.mkdtemp(prefix="rars_t_prc_b_")
    for out in (out_a, out_b):
        stage = pagerank_foreach_batch(out, iters_per_epoch=2)
        stage(
            spark.createDataFrame(e1, "src string, dst string, weight double"),
            0,
        )
        if out == out_b:
            pagerank_compact_store(spark, out_b, through_epoch=0)
        stage(
            spark.createDataFrame(e2, "src string, dst string, weight double"),
            1,
        )
    want = {r.node: r.pr for r in read_latest_ranks(spark, out_a).collect()}
    got = {r.node: r.pr for r in read_latest_ranks(spark, out_b).collect()}
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)


# --------------------------------------------------------------------------
# minhash index + IVF postings
# --------------------------------------------------------------------------


def test_minhash_compaction_invisible(spark):
    from rapids_and_rivers_spark.streaming.duals import (
        minhash_compact_store,
        minhash_index_foreach_batch,
        read_epoch_table,
    )

    body = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank today"
    )
    b1 = [(1, body), (2, body.replace("lazy", "sleepy")),
          (3, "completely different words about spark windows and state "
              "stores here")]
    b2 = [(20, body.replace("today", "tonight")),
          (21, "another unrelated document mentioning joins shuffles and "
               "partitions only")]
    b3 = [(30, body.replace("quick", "swift"))]  # pairs with 1/2/20
    outs = {}
    for tag in ("a", "b"):
        idx = tempfile.mkdtemp(prefix=f"rars_t_mhc_{tag}_i_")
        pairs = tempfile.mkdtemp(prefix=f"rars_t_mhc_{tag}_p_")
        stage = minhash_index_foreach_batch(idx, pairs, threshold=0.3)
        stage(spark.createDataFrame(b1, "doc_id long, text string"), 0)
        stage(spark.createDataFrame(b2, "doc_id long, text string"), 1)
        if tag == "b":
            minhash_compact_store(spark, idx, pairs, through_epoch=1)
        stage(spark.createDataFrame(b3, "doc_id long, text string"), 2)
        outs[tag] = sorted(
            tuple(r) for r in read_epoch_table(spark, pairs).collect()
        )
        if tag == "b":
            assert _count_dirs(idx, "") >= 0
            assert _count_dirs(os.path.join(idx, "bands"), "v") == 2
            assert _count_dirs(pairs, "v") == 2
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(pairs, ignore_errors=True)
    assert outs["a"] == outs["b"] and len(outs["a"]) > 0
    # the post-compaction doc really matched an epoch-0 doc through the
    # compacted band index
    assert any(a == 1 and b == 30 for (a, b, _j) in outs["b"])


def test_ivf_compaction_invisible(spark):
    import numpy as np

    from rapids_and_rivers_spark.streaming.duals import (
        ivf_compact_store,
        ivf_index_foreach_batch,
        ivf_query_from_index,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(80, 64).round(3)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(80)]
    cands = spark.createDataFrame(rows, "neighbor_id long, c_emb array<double>")
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(5)],
        "query_id long, q_emb array<double>",
    )

    def run(compact):
        idx = tempfile.mkdtemp(prefix="rars_t_ivfc_")
        stage = ivf_index_foreach_batch(idx, dim=64, n_cells=8)
        stage(cands.filter(F.col("neighbor_id") % 3 == 0), 0)
        stage(cands.filter(F.col("neighbor_id") % 3 == 1), 1)
        if compact:
            ivf_compact_store(spark, idx, through_epoch=1)
        stage(cands.filter(F.col("neighbor_id") % 3 == 2), 2)
        got = sorted(
            tuple(r)
            for r in ivf_query_from_index(
                spark, idx, queries, k=5, nprobe=3
            ).collect()
        )
        dirs = _count_dirs(os.path.join(idx, "postings"), "epoch=")
        shutil.rmtree(idx, ignore_errors=True)
        return got, dirs

    want, dirs_a = run(compact=False)
    got, dirs_b = run(compact=True)
    assert got == want and len(want) == 25  # 5 queries x k=5
    assert dirs_b == 2 < dirs_a


# --------------------------------------------------------------------------
# label propagation: union edge log + latest-only snapshots (ADVICE r10)
# --------------------------------------------------------------------------


def test_label_prop_compaction_invisible(spark):
    """label_prop_compact_store was the only compactor without a
    dedicated contract-invisibility test (ADVICE r10): same shape as
    the kcore test — a CONTROL run and a compacted run must read
    identically, with the ring-closing edge arriving POST-compaction so
    the labels only converge if the folded edge log is intact."""
    from rapids_and_rivers_spark.streaming.duals import (
        label_prop_compact_store,
        label_prop_foreach_batch,
        read_latest_labels,
    )

    ring = [(i, (i + 1) % 6, 1.0) for i in range(6)]
    out_a = tempfile.mkdtemp(prefix="rars_t_lpc_a_")
    out_b = tempfile.mkdtemp(prefix="rars_t_lpc_b_")
    schema = "src long, dst long, weight double"
    for out in (out_a, out_b):
        stage = label_prop_foreach_batch(out, iters_per_epoch=3)
        stage(spark.createDataFrame(ring[:3], schema), 0)
        stage(spark.createDataFrame(ring[3:5], schema), 1)
        if out == out_b:
            label_prop_compact_store(spark, out_b, through_epoch=1)
        stage(spark.createDataFrame(ring[5:], schema), 2)
    want = sorted(tuple(r) for r in read_latest_labels(spark, out_a).collect())
    got = sorted(tuple(r) for r in read_latest_labels(spark, out_b).collect())
    assert got == want and len(want) == 6
    assert _count_dirs(os.path.join(out_b, "edges"), "v") == 2
    assert _count_dirs(os.path.join(out_b, "labels"), "v") == 2
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)


# --------------------------------------------------------------------------
# compaction watermark manifest (ADVICE r10): a replay of a FOLDED epoch
# must refuse loudly instead of silently overwriting folded history
# --------------------------------------------------------------------------


def test_compaction_watermark_refuses_folded_epoch_replay(spark):
    from rapids_and_rivers_spark.streaming.duals import (
        compaction_watermark,
        kcore_compact_store,
        kcore_foreach_batch,
        read_latest_core,
    )

    ring = [(i, (i + 1) % 6) for i in range(6)]
    out = tempfile.mkdtemp(prefix="rars_t_wmg_")
    try:
        stage = kcore_foreach_batch(out, k=2, rounds=3)
        stage(spark.createDataFrame(ring[:3], "src long, dst long"), 0)
        stage(spark.createDataFrame(ring[3:5], "src long, dst long"), 1)
        kcore_compact_store(spark, out, through_epoch=1)
        assert compaction_watermark(os.path.join(out, "edges")) == 1
        # contract-violating replay of folded epoch 1: must raise, and
        # must NOT touch the compacted edge log
        import pytest

        with pytest.raises(RuntimeError, match="compacted through epoch 1"):
            stage(spark.createDataFrame(ring[3:5], "src long, dst long"), 1)
        # the legitimate next epoch still ingests fine
        stage(spark.createDataFrame(ring[5:], "src long, dst long"), 2)
        assert read_latest_core(spark, out).count() == 6
    finally:
        shutil.rmtree(out, ignore_errors=True)


# --------------------------------------------------------------------------
# compaction SCHEDULING policy (VERDICT r10 task 5): size-pressure
# trigger wired into the stage — bounded dirs over a long run, derived
# result identical to the never-compacted control
# --------------------------------------------------------------------------


def test_auto_compaction_bounds_dirs_over_long_run(spark):
    from rapids_and_rivers_spark.streaming.duals import (
        auto_compacting,
        kcore_compact_store,
        kcore_foreach_batch,
        read_latest_core,
        store_version_dirs,
    )

    n = 24
    ring = [(i, (i + 1) % n) for i in range(n)]
    out_a = tempfile.mkdtemp(prefix="rars_t_apc_a_")
    out_b = tempfile.mkdtemp(prefix="rars_t_apc_b_")
    max_dirs = 6
    peak_b = 0
    for out in (out_a, out_b):
        stage = kcore_foreach_batch(out, k=2, rounds=2)
        if out == out_b:
            stage = auto_compacting(
                stage,
                lambda sp, through: kcore_compact_store(sp, out_b, through),
                watch_roots=[os.path.join(out_b, "edges")],
                max_version_dirs=max_dirs,
            )
        for e in range(n):
            stage(spark.createDataFrame(ring[e : e + 1], "src long, dst long"), e)
            if out == out_b:
                peak_b = max(
                    peak_b, store_version_dirs(os.path.join(out_b, "edges"))
                )
    # policy keeps the edge log bounded: never more than max_dirs + 1
    # (the trigger fires AFTER the epoch that crosses the threshold)
    assert peak_b <= max_dirs + 1, peak_b
    assert store_version_dirs(os.path.join(out_a, "edges")) == n
    # reader contract: identical derived cores, and the ring closes
    want = sorted(tuple(r) for r in read_latest_core(spark, out_a).collect())
    got = sorted(tuple(r) for r in read_latest_core(spark, out_b).collect())
    assert got == want and len(want) == n
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)


def test_semdedup_clustered_compaction_invisible(spark):
    """The round-11 dual's store under its compactor + the scheduling
    wrapper: ingest 3 epochs with max_version_dirs=1 (trigger fires
    mid-stream), derived keep-list identical to the never-compacted
    control, dirs bounded."""
    from pyspark.sql import functions as F

    from rapids_and_rivers_spark.sources import load_table
    from rapids_and_rivers_spark.streaming.duals import (
        auto_compacting,
        semdedup_clustered_compact_store,
        semdedup_clustered_foreach_batch,
        semdedup_clustered_keep_list,
        store_version_dirs,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    outs = {}
    for mode in ("control", "compacted"):
        idx = tempfile.mkdtemp(prefix=f"rars_t_sdc_{mode}_")
        stage = semdedup_clustered_foreach_batch(idx, dim=64, threshold=0.4)
        if mode == "compacted":
            stage = auto_compacting(
                stage,
                lambda sp, through, idx=idx: semdedup_clustered_compact_store(
                    sp, idx, through
                ),
                watch_roots=[os.path.join(idx, "pairs")],
                max_version_dirs=1,
            )
        for e in range(3):
            stage(emb.filter(F.col("vec_id") % 3 == e), e)
        outs[mode] = (
            idx,
            sorted(
                tuple(r)
                for r in semdedup_clustered_keep_list(spark, idx).collect()
            ),
        )
    assert outs["control"][1] == outs["compacted"][1]
    assert len(outs["control"][1]) == emb.count()
    assert store_version_dirs(
        os.path.join(outs["compacted"][0], "pairs")
    ) < store_version_dirs(os.path.join(outs["control"][0], "pairs"))
    for idx, _ in outs.values():
        shutil.rmtree(idx, ignore_errors=True)
