"""Bradley-Terry preference-strength training (integer-exact MM).

The preference-data operator of the pipeline family: given pairwise
contests (A beat B), estimate a latent strength per player via the
Bradley-Terry model's minorization-maximization update (Hunter 2004,
"MM algorithms for generalized Bradley-Terry models"):

    theta_i  <-  W_i / sum_j ( n_ij / (theta_i + theta_j) )

where W_i = wins of i and n_ij = games between i and j. This is the
standard fit for preference/comparison data (the same model family
behind pairwise human-preference ranking), and at pipeline scale the
inputs reduce to two tiny MERGEABLE tables — per-pair game counts and
per-player win counts — so the expensive corpus pass happens once and
the MM rounds run on |players|-sized data.

Cross-engine exactness (the q2 lesson, memory:
exact-integer-aggregates-for-cross-engine-compares): the textbook
update divides floats, and float SUMS are order-dependent, so a DuckDB
oracle would drift from Spark. Here strengths are int64 MICRO-units
(theta0 = 1_000_000) and each round is pure integer arithmetic:

    term_ij  = (n_ij * 10^12) DIV (theta_i + theta_j)   -- int64, exact
    denom_i  = SUM_j term_ij                            -- int sum: order-free
    theta_i' = GREATEST((W_i * 10^12) DIV denom_i, 1)   -- zero-win floor

Every quantity is an exact integer, so Spark and the unrolled SQL
oracle agree bit for bit at every round. Bounds: n_ij * 10^12 and
W_i * 10^12 stay under 2^63 while n_ij, W_i < ~9.2e6; above that
(extreme corpus scale) switch the two products to DECIMAL(38,0) —
the linreg_price_model pattern.

Reference anchor: extension surface (SURVEY §2 pipeline family) next
to linreg_price_model's closed-form training; the reference engine has
no model fitting — the parity target is the mergeable-statistics
shape its aggregations establish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000
SCALE = 10**12


def bt_contests(lines: DataFrame) -> DataFrame:
    """Per-order supplier contests from ``(o, s, p)`` rows (order key,
    player key, integer score): every pair of distinct players inside
    one order plays one game, won by the higher score — ties go to the
    smaller player key (a documented deterministic tie-break; float
    scores are the caller's bug, pass integer cents).

    Returns ``(i, j, w)`` with ``i < j`` and ``w`` the winner. ONE
    self-equi-join on the order key; players-per-order is bounded (7
    suppliers per TPC-H order), so pair volume is linear in orders.
    """
    a, b = lines.alias("a"), lines.alias("b")
    return a.join(
        b,
        (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
    ).select(
        F.col("a.s").alias("i"),
        F.col("b.s").alias("j"),
        F.when(F.col("a.p") >= F.col("b.p"), F.col("a.s"))
        .otherwise(F.col("b.s"))
        .alias("w"),
    )


def bt_sufficient_stats(contests: DataFrame):
    """Contests -> the two MERGEABLE tables the MM rounds need:
    ``games (i, j, n)`` with ``i < j`` and ``wins (s, wn)``. Both are
    component-wise addable across shards/epochs (the linreg
    sufficient-statistics property), which is what makes the streaming
    dual exact.

    ONE corpus pass: the per-pair reduction carries each pair's win
    split (``wi``; ``wj = n - wi`` since every game is won by i or j),
    materialized via ``localCheckpoint`` so both returned tables are
    projections of one computed |player-pairs|-sized frame. The
    previous shape aggregated ``contests`` twice, and because the two
    results are materialized by separate actions downstream (epoch
    writes, checkpoint jobs), each one re-executed the full contest
    self-join — two corpus passes for one reduction (profiled on
    stream_bt_strength: the contest-join stage ran twice per epoch).
    ``wins`` keeps the original row contract (players with >= 1 win),
    and the values are identical integer counts."""
    pairs = (
        contests.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("w") == F.col("i"), 1).otherwise(0)
            ).cast("long").alias("wi"),
        )
        .localCheckpoint()
    )
    games = pairs.select("i", "j", "n")
    wins = (
        pairs.select(F.col("i").alias("s"), F.col("wi").alias("x"))
        .unionByName(
            pairs.select(
                F.col("j").alias("s"), (F.col("n") - F.col("wi")).alias("x")
            )
        )
        .groupBy("s")
        .agg(F.sum("x").cast("long").alias("wn"))
        .filter(F.col("wn") > 0)
    )
    return games, wins


def bt_mm_ratings(games: DataFrame, wins: DataFrame, rounds: int = 3) -> DataFrame:
    """Run ``rounds`` integer-exact MM updates and return
    ``(s, wins, games, rating)`` — rating in int64 micro-units.

    Scale shape: the round loop never touches the corpus — ``games`` is
    |player-pairs|-sized and each round is two broadcast-sized
    equi-joins plus one integer-keyed agg, unrolled into a single plan
    (the pagerank_purchase_graph round pattern). Zero-win players floor
    at rating 1 (GREATEST guard), so no round divides by zero: a games
    edge always has at least one past winner on it.
    """
    # Materialize the sufficient statistics ONCE and truncate lineage
    # (guide §3.3/§5 — "materialising an intermediate truncates the
    # plan"): the unrolled MM plan references games twice per round and
    # the previous round's ratings four times (ti/tj joins + the union),
    # so the formatted physical plan grows ~4x per round (measured
    # 26,400 lines at rounds=3) and EVERY broadcast build of a round's
    # ratings re-executed the whole upstream contest chain as its own
    # job (profiled: five repeated 46-task denom stages + two 32-task
    # contest-join stages, wall 18.6 s of which ~9 s was driver
    # planning). localCheckpoint cuts the lineage at the
    # |player-pairs|-sized boundary — the corpus pass runs exactly once
    # and each round's plan stays constant-size. (Plain persist() was
    # measured 4x SLOWER in r9 — InMemoryRelation blocks exchange reuse
    # while the lineage still re-plans; checkpointing removes the
    # lineage itself, which is the actual cost.)
    games = games.localCheckpoint()
    wins = wins.localCheckpoint()
    players = (
        games.select(F.col("i").alias("s"))
        .unionByName(games.select(F.col("j").alias("s")))
        .distinct()
    )
    r = players.withColumn("th", F.lit(MICRO).cast("long"))
    for _ in range(rounds):
        e = (
            games.join(
                F.broadcast(r.select(F.col("s").alias("i"), F.col("th").alias("ti"))),
                "i",
            )
            .join(
                F.broadcast(r.select(F.col("s").alias("j"), F.col("th").alias("tj"))),
                "j",
            )
            .withColumn(
                "term",
                F.expr(f"n * CAST({SCALE} AS BIGINT) DIV (ti + tj)"),
            )
        )
        denom = (
            e.select(F.col("i").alias("s"), "term")
            .unionByName(e.select(F.col("j").alias("s"), "term"))
            .groupBy("s")
            .agg(F.sum("term").alias("denom"))
        )
        r = (
            denom.join(F.broadcast(wins), "s", "left")
            .select(
                "s",
                F.greatest(
                    F.expr(
                        f"coalesce(wn, CAST(0 AS BIGINT)) * CAST({SCALE} AS BIGINT)"
                        # denom is also floored at 1: if a round inflated
                        # some theta enough that EVERY term for a node
                        # floors to 0, Spark's DIV would yield NULL while
                        # DuckDB's // raises — a cross-engine divergence
                        # on pathological preference data (ADVICE r6).
                        # The oracle SQL carries the identical guard.
                        " DIV greatest(denom, CAST(1 AS BIGINT))"
                    ),
                    F.lit(1).cast("long"),
                ).alias("th"),
            )
        )
        # per-round lineage cut: round k+1's broadcast of r builds from
        # the materialized |players|-sized table instead of re-executing
        # rounds 1..k (the plan-growth note above)
        r = r.localCheckpoint()
    plays = (
        games.select(F.col("i").alias("s"), "n")
        .unionByName(games.select(F.col("j").alias("s"), "n"))
        .groupBy("s")
        .agg(F.sum("n").alias("games"))
    )
    return (
        r.join(plays, "s")
        .join(F.broadcast(wins), "s", "left")
        .select(
            "s",
            F.coalesce(F.col("wn"), F.lit(0).cast("long")).alias("wins"),
            F.col("games").cast("long").alias("games"),
            F.col("th").cast("long").alias("rating"),
        )
    )
