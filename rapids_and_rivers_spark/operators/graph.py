"""Iterative graph analytics over edge DataFrames: fixed-iteration
PageRank (power method).

Why fixed-iteration: a convergence loop needs a driver-side norm check
per round (an action); a FIXED iteration count keeps the whole
computation one lazy plan, makes the result bit-deterministic in shape
(the driver's oracle can unroll the same number of rounds in SQL), and
is how production rank jobs actually run (k passes per day over the
crawl graph, warm-started from yesterday's ranks). The per-iteration
cost is one equi-join (ranks ⋈ edges on src) + one keyed aggregation
(contributions by dst) — both partitioned on node keys, no global
structure anywhere. Edges are normalized (weight / out-weight) ONCE and
cached; at 100 TB the edge table is the big operand and re-deriving it
per iteration would dominate, so the normalize-then-iterate split is the
load-bearing design choice.

Companion to the connected-components operators in
:mod:`rapids_and_rivers_spark.operators.dedup` (min-label + star
contraction): CC answers "which docs are the same"; PageRank answers
"which nodes matter" — quality/centrality propagation over crawl-link
or purchase graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    num_nodes: int | None = None,
    init_ranks: DataFrame | None = None,
    reset: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank after ``iters`` power-method rounds:
    ``pr'(v) = (1-d)/N + d * Σ_{u→v} (w_uv / out_w(u)) * pr(u)``.

    ``edges`` is a DIRECTED edge list; for an undirected graph pass both
    orientations (which also guarantees no dangling nodes — every node
    then has out-edges; nodes missing from the contribution sum still
    get teleport mass via the left join). N (node count) is ONE scalar:
    pass ``num_nodes`` if the caller already knows it, else it is
    counted once up front — a bounded driver-side collect of a single
    long, the same class as the bloom-bitmap/codebook collects the plan
    auditor whitelists. (A 1-row broadcast-join alternative constant-
    folds into a BroadcastNestedLoopJoin, which the auditor rejects.)

    Determinism: initial rank 1/N, teleport (1-d)/N and the damping
    factor are all plain IEEE double ops an oracle engine reproduces;
    the only engine-sensitive part is contribution-sum ORDER (float
    addition is non-associative), which drifts at ~1e-15 relative per
    round — callers compare ranks rounded (the catalog query rounds
    ``pr*N`` to 4 digits).

    Output: (node, pr) — raw probabilities summing to ~1.
    """
    if reset is not None and init_ranks is not None:
        raise ValueError(
            "pass either reset (personalized teleport) or init_ranks "
            "(warm start), not both — the personalized branch would "
            "silently ignore init_ranks"
        )
    both = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    out_w = both.groupBy("src").agg(F.sum("w").alias("out_w"))
    # persist-scope: returned plan — multiple consumers in the lazy plan this
    # function returns; the caller materializes once, LRU reclaims after
    norm = (
        both.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    nodes = norm.select(F.col("src").alias("node")).distinct()
    n = float(num_nodes if num_nodes is not None else nodes.count())
    d = F.lit(damping)
    teleport = (F.lit(1.0) - d) / F.lit(n)
    if reset is not None:
        # PERSONALIZED PageRank (random walk with restart): the teleport
        # returns to the ``reset`` distribution (node, r), sum(r) = 1,
        # instead of uniform — rank becomes proximity to the seed set
        # (the recommendation / local-cluster primitive). Init at the
        # reset vector; nodes off the seed set teleport nothing.
        # rv is a cheap projection over the already-persisted ``norm``
        # lineage; no persist of its own (a persist here would leak — the
        # returned plan is lazy, so there is no sound unpersist point).
        rv = nodes.join(reset.select("node", "r"), "node", "left").select(
            "node", F.coalesce(F.col("r"), F.lit(0.0)).alias("r")
        )
        ranks = rv.select("node", F.col("r").alias("pr"))
        for _ in range(iters):
            contrib = (
                norm.join(ranks, norm["src"] == ranks["node"])
                .groupBy("dst")
                .agg(F.sum(F.col("p") * F.col("pr")).alias("c"))
            )
            ranks = rv.join(
                contrib, rv["node"] == contrib["dst"], "left"
            ).select(
                "node",
                (
                    (F.lit(1.0) - d) * F.col("r")
                    + d * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
        return ranks
    if init_ranks is not None:
        # WARM START — the incremental mode: k passes per day over the
        # crawl graph resume from yesterday's converged ranks (new nodes
        # enter at the uniform prior via the left join). Iterating from
        # a warm start composes exactly: warm(iters=j) after (iters=i)
        # walks the identical float path as a cold iters=i+j run —
        # pinned by test.
        ranks = nodes.join(
            init_ranks.select("node", "pr"), "node", "left"
        ).select(
            "node", F.coalesce(F.col("pr"), F.lit(1.0) / F.lit(n)).alias("pr")
        )
    else:
        ranks = nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("pr"))
    for _ in range(iters):
        contrib = (
            norm.join(ranks, norm["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("pr")).alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (teleport + d * F.coalesce(F.col("c"), F.lit(0.0))).alias("pr"),
        )
    return ranks


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact per-node triangle counts via DEGREE-ORDERED edge orientation
    (the node-iterator / compact-forward scheme: Latapy 2008; Suri &
    Vassilvitskii's MapReduce formulation, WWW 2011).

    Orient every undirected edge from its lower endpoint to its higher
    endpoint under the total order ``(degree(n), n)``. Each triangle then
    has exactly ONE node with two out-edges (its minimum under the
    order), so wedges built from out-edge pairs count every triangle
    exactly once — and the wedge fan-out per node is bounded by the
    ORIENTED out-degree, which is O(sqrt(m)) for any graph. That bound is
    the load-bearing scale property: on a power-law graph a naive
    two-path join explodes on hub nodes (deg² wedges); orientation caps
    the hubs because a hub's edges point INTO it from almost everywhere.

    Plan shape: degree agg (node-keyed) → two self-equi-joins
    (wedge build on the common endpoint, then closure check on the
    (v, w) pair key) → per-node explode + count. Every join is an
    equi-join on node/pair keys; nothing quadratic, no global structure.

    Input: undirected edge list, either one or both orientations
    (canonicalized internally; self-loops dropped). Output:
    ``(node, degree, tri)`` for every node with degree ≥ 1, where ``tri``
    is the number of triangles through the node.
    """
    # persist-scope: returned plan — multiple consumers in the lazy plan this
    # function returns; the caller materializes once, LRU reclaims after
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    keyed = (
        und.join(da, und["a"] == F.col("da.node"))
        .join(db, und["b"] == F.col("db.node"))
        .select("a", "b", F.col("da.deg").alias("dega"), F.col("db.deg").alias("degb"))
    )
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    # persist-scope: returned plan — multiple consumers in the lazy plan this
    # function returns; the caller materializes once, LRU reclaims after
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("deghi"),
    ).persist()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # wedge (u; v, w) with v before w under the order — out-edge pairs of u
    v_first = (F.col("e1.deghi") < F.col("e2.deghi")) | (
        (F.col("e1.deghi") == F.col("e2.deghi")) & (F.col("e1.hi") < F.col("e2.hi"))
    )
    wedges = e1.join(e2, (F.col("e1.lo") == F.col("e2.lo")) & v_first).select(
        F.col("e1.lo").alias("u"), F.col("e1.hi").alias("v"), F.col("e2.hi").alias("w")
    )
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select(
        F.explode(F.array("u", "v", "w")).alias("node")
    )
    counts = tri.groupBy("node").agg(F.count(F.lit(1)).alias("tri"))
    return deg.join(counts, "node", "left").select(
        "node", "deg", F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri")
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman 1983; the fixed-iteration
    form of Batagelj-Zaversnik): each round drops nodes of induced
    degree < k and recomputes degrees on the induced subgraph — one
    degree agg + two node-keyed semi-join filters per round, the plan
    an iterative graph system runs per superstep. ``edges`` must carry
    BOTH orientations of an undirected graph (the graph_kcore catalog
    query's construction).

    Why fixed rounds (not to-fixpoint): one lazy plan, deterministic
    shape, oracle-unrollable — the pagerank/label_propagation rule.
    Core membership CASCADES (removing one node can strip a distant
    chain), which is also why the streaming dual recomputes the peel
    over the accumulated graph per epoch instead of patching locally —
    see ``kcore_foreach_batch``.

    Output: ``(node, deg)`` survivors with final induced degree >= k.
    Each round references the previous round's edges three times, so
    every round persists — lineage recompute otherwise compounds
    3^rounds (measured 34 s -> ~5 s on the catalog query).
    """
    # persist-scope: returned plan — multiple consumers in the lazy plan this
    # function returns; the caller materializes once, LRU reclaims after
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select("src")
        e = (
            e.join(alive, "src")
            .join(alive.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            # persist-scope: per-round handle — each round references the
            # previous round's edges three times (see docstring); the final
            # round's frame feeds the returned plan
            .persist()
        )
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= k)
        .select(F.col("src").alias("node"), "deg")
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan, Albert & Kumara
    2007) with DETERMINISTIC tie-breaks: every node starts as its own
    label; each round, every node adopts the label carrying the maximum
    total incident edge weight among its neighbors, ties broken toward
    the lexicographically smaller label. Fixed ``iters`` rounds (see the
    module docstring for why fixed-iteration).

    Asynchronous LPA (the common formulation) is order-dependent and
    therefore unreproducible on a cluster; the synchronous + total-order
    tie-break variant here is partition-, retry-, and engine-invariant —
    with integer edge weights the neighbor sums are EXACT in doubles, so
    an oracle engine reproduces every adoption decision bit-for-bit (no
    rounding anywhere).

    Per round: one node-keyed equi-join (labels ⋈ edges) + one
    (node, label)-keyed agg + one per-node rank window — all partitioned
    on node keys. Pass both orientations for undirected graphs.

    ``init_labels`` (node, label) WARM-STARTS the propagation — the
    incremental mode mirroring :func:`pagerank`'s ``init_ranks``: nodes
    absent from the snapshot (new arrivals) start as their own label.
    Every round is a deterministic function of (labels, edges), so the
    same composition law holds exactly: warm(j) after cold(i) equals
    cold(i+j) on a static graph — pinned by test, and what makes the
    streaming dual's epoch math exact.

    Output: (node, label) after ``iters`` rounds.
    """
    # persist-scope: returned plan — multiple consumers in the lazy plan this
    # function returns; the caller materializes once, LRU reclaims after
    both = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    ).persist()
    nodes = both.select(F.col("src").alias("node")).distinct()
    if init_labels is not None:
        labels = nodes.join(
            init_labels.select("node", "label"), "node", "left"
        ).select("node", F.coalesce("label", "node").alias("label"))
    else:
        labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        nb = (
            both.join(labels, both["src"] == labels["node"])
            .groupBy(F.col("dst").alias("nd"), "label")
            .agg(F.sum("w").alias("wsum"))
        )
        w_rank = Window.partitionBy("nd").orderBy(F.desc("wsum"), "label")
        labels = (
            nb.withColumn("rk", F.row_number().over(w_rank))
            .filter(F.col("rk") == 1)
            .select(F.col("nd").alias("node"), "label")
        )
    return labels


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Link prediction over an undirected graph: common-neighbor count
    and Adamic-Adar affinity (Adamic & Adar 2003) for every NON-adjacent
    candidate pair that shares at least one neighbor.

    ``edges`` must carry BOTH orientations (the kcore/label-prop
    contract). Candidates come from one two-hop equi-join through the
    shared neighbor z — fan-out per z is deg(z)², so callers bound the
    hub degree when building ``edges`` (the triangles kNN-cap idiom);
    nothing here is all-pairs. Existing edges and self-pairs are
    anti-joined out (link PREDICTION scores absent edges only).

    Exactness — the NB integer-micro-nat trick applied to AA: the usual
    ``Σ_z 1/ln(deg z)`` is a float SUM whose partition order an engine
    does not fix, so instead each neighbor z contributes the INTEGER
    ``round(weight_scale / ln(deg z))`` micro-units (one deterministic
    double op per distinct degree value — bit-identical in any IEEE
    engine) and the pair score is an order-free exact integer sum.

    Output: (node_a, node_b, common_neighbors, aa_micro) with
    node_a < node_b.
    """
    # .distinct() ENFORCES the deduplicated-edge contract instead of
    # documenting it (ADVICE r8): duplicate rows silently inflate deg,
    # common_neighbors and aa_micro — one extra shuffle on the edge
    # projection, cheap next to the two-hop join it feeds.
    # persist-scope: returned plan — e feeds FOUR consumers (degree agg,
    # both two-hop sides, the existing-edge anti-join)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # one integer micro-weight per shared neighbor: deterministic scalar
    # double math (lit / ln) then HALF_UP round — never a float SUM
    wz = deg.select(
        F.col("src").alias("z"),
        F.when(
            F.col("deg") >= 2,
            F.round(F.lit(float(weight_scale)) / F.log(F.col("deg").cast("double")), 0),
        )
        .otherwise(F.lit(float(weight_scale)))
        .cast("long")
        .alias("w_micro"),
    )
    a = e.select(F.col("dst").alias("na"), F.col("src").alias("z"))
    b = e.select(F.col("src").alias("z2"), F.col("dst").alias("nb"))
    # no broadcast hint on wz: it has one row per NODE, which outgrows
    # broadcast capacity on crawl-scale graphs — the join is keyed on z
    # (already the two-hop join key, so co-partitioned) and AQE still
    # auto-broadcasts when the vertex set is actually small
    cand = (
        a.join(b, (F.col("z") == F.col("z2")) & (F.col("na") < F.col("nb")))
        .join(wz, "z")
        .groupBy(F.col("na").alias("node_a"), F.col("nb").alias("node_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("w_micro").cast("long").alias("aa_micro"),
        )
    )
    existing = e.select(
        F.col("src").alias("node_a"), F.col("dst").alias("node_b")
    )
    return cand.join(existing, ["node_a", "node_b"], "left_anti")


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from the seed set, levels
    0..``max_hops``.

    ``edges`` must carry both orientations; ``seeds`` is a (node)
    DataFrame. Classic frontier expansion — per hop ONE equi-join of the
    current frontier against edges plus one anti-join against the
    visited set, the plan Pregel runs per superstep; hop count is
    bounded so the whole walk is ``max_hops`` joins, no driver-side
    convergence check. Nodes reached at several hops keep the MINIMUM
    (frontier nodes are anti-joined out as soon as visited, so each node
    is labeled exactly once, at its first — minimal — hop).

    Output: (node, hop) — exact integers, engine-independent.
    """
    # .distinct() enforces the dedup contract (ADVICE r8); for BFS dup
    # edges only waste work (the frontier is distinct'd per hop), but
    # one shuffle on the persisted projection keeps the API honest.
    # (e is joined once per hop; without the persist the caller's edge
    # construction re-runs max_hops times and the level lineage
    # compounds — measured 2032 -> ~40 shuffles at sf0.001.)
    # persist-scope: returned plan
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    frontier = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    # persist-scope: per-level handle — each level feeds BOTH the next
    # frontier join and the final union; the last level's frame feeds the
    # returned plan, LRU reclaims after the caller materializes
    frontier = frontier.persist()
    visited = frontier.withColumn("hop", F.lit(0))
    levels = [visited]
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .persist()  # persist-scope: per-level handle (see above)
        )
        lvl = nxt.withColumn("hop", F.lit(h))
        levels.append(lvl)
        visited = visited.unionByName(lvl)
        frontier = nxt
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out
