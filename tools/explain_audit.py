#!/usr/bin/env python
"""Plan audit: sweep every catalog query's PHYSICAL plan for scale red flags.

For each `catalog.queries()` entry this prints the executed-plan shape and
flags patterns that would hurt at 100 TB:

- `CartesianProduct` / `BroadcastNestedLoopJoin` — pair explosion (allowed
  only where a query intentionally crosses with a 1-row scalar aggregate);
- shuffle (`Exchange hashpartitioning`) counts — every shuffle is a full
  network pass over the data at scale;
- parquet scans whose `ReadSchema` carries more columns than the query
  needs (column pruning failed) — a 2-column projection reading 16 columns
  scans 8x the bytes;
- row-at-a-time `BatchEvalPython` (non-Arrow Python UDF) in any plan — the
  slow path; only `ArrowEvalPython` / `MapInPandas` / `FlatMapGroupsInPandas`
  are acceptable Python operators.

Stage-budget regression pinning (round 8, metric fixed round 9):
PLAN_BUDGETS.json records each query's EXECUTED STAGE count at sf0.001
(deterministic data -> deterministic AQE decisions), measured from the
status tracker over the job-id range of the query's build+collect with
a cold cache (`spark.catalog.clearCache()` per query). A full-catalog
audit FAILS any query whose observed count EXCEEDS its recorded budget
— the "someone added a needless repartition/groupBy to a hot path"
regression that correctness gates can't see. Run with --record to
re-baseline after an intentional plan change (the diff shows up in git,
so a re-baseline is reviewable).

Why executed stages and not plan-text exchanges (ADVICE r8,
bfs_part_reach budgeted 3100 vs ~29 real): executedPlan().toString()
re-expands the full build lineage under EVERY InMemoryTableScan
reference and appends AQE "Initial Plan" sections, so text counts on
cache-heavy iterative plans overstate reality ~100x — a budget pinned
on them can never catch a regression. An executed stage is one actual
shuffle boundary that ran (skipped/reused stages report zero completed
tasks and are excluded), which is the thing that costs at 100 TB.

Usage: python tools/explain_audit.py [--record] [sf_dir] [query ...]
Exit code 1 if any *unexpected* red flag is found (whitelist below) or
any shuffle budget is exceeded.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog

# queries that legitimately cross-join a broadcast 1-row scalar aggregate
# (fraction-of-total / threshold subqueries): the nested-loop is 1 x N
SCALAR_CROSS_OK = {
    "q11_important_stock",
    "q22_global_sales_opportunity",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "embedding_neardup",
    "dedup_clusters",
    "pingpong",  # staleness clock = max event time, broadcast 1-row agg
    "text_quality_filter",  # p25 cutoff = broadcast 1-row percentile agg
    "dedup_clusters_star",  # same neardup pair build as dedup_clusters
    "gap_filled_daily_counts",  # day-spine x type-dim cross: bounded tiny
    "mmr_rerank_diverse",  # broadcast(10 queries) x candidates: the same
    # bounded brute-force relevance cross as sim_cosine_topk
    "survival_time_to_purchase",  # Kaplan-Meier triangular self-joins over
    # the <= 31-row horizon-day rollup: bounded like gap_filled_daily_counts
    "sketch_ams_f2",  # 1-row estimate x 1-row exact-F2 scalar cross
    "nb_source_confusion",  # doc_ids x broadcast(priors) prior cross:
    # |classes| rows (KB-sized) per doc — bounded 1 x N like the scalar
    # crosses above; zero-token docs must still score on priors alone,
    # so a left join can't replace it (classify.py nb_classify)
    "stream_nb_confusion",  # same nb_classify prior cross, streaming dual
    "rolling_hll_users",  # day-spine x 64-bucket register dim cross:
    # bounded tiny, the gap_filled_daily_counts class
}

# Queries whose RETURN plan ends in a full global sort (orderBy with no
# following limit -> Exchange rangepartitioning + Sort over the whole
# result) where the sorted frame is bounded for a reason the structural
# walk cannot prove (VERDICT r10 task 7). Every entry documents its
# bound; anything not listed and not structurally bounded is flagged —
# at 100 TB an unbounded total ordering is a full range-shuffle of the
# output for presentation only.
ORDERED_RETURN_OK = {
    # (currently empty: every catalog return plan is either unordered,
    # limited, or structurally bounded below the sort — keep it that
    # way; add entries only with a documented O(1)/O(days)/O(dims)
    # output bound)
}

# Time-truncation expressions that bound an aggregate's group count by
# O(days)/O(months) rather than O(rows): a global window over such a
# rollup stays a constant-size single-task sort at any corpus size.
# __dom_bucket is the skyline operator's fixed-width x-DOMAIN bucket
# (operators/frontier.py): its cardinality is bounded by the value
# domain span / bucket_width — a documented operator contract, the same
# boundedness class as a date truncation.
_TIME_TRUNC = re.compile(
    r"date_format\(|date_trunc\(|\btrunc\(|as date\)|"
    r"\bwindow\(|\byear\(|\bmonth\(|\bweekofyear\(|__dom_bucket",
    re.IGNORECASE,
)
# AQE / codegen wrapper nodes that sit between the "real" operators in a
# plan string — transparent for both the up-walk and the down-walk
_WRAPPER = re.compile(
    r"^(ShuffleQueryStage|ResultQueryStage|AQEShuffleRead|InputAdapter|"
    r"WholeStageCodegen|TableCacheQueryStage|InMemoryTableScan)\b"
)
_AGG_NODE = re.compile(r"(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[([^\]]*)\]")
_PASSTHROUGH = re.compile(
    r"^(Project|Filter|ColumnarToRow|InputAdapter|Coalesce|"
    r"AQEShuffleRead|ShuffleQueryStage|ResultQueryStage|Exchange|Sort|"
    r"WholeStageCodegen|TableCacheQueryStage|InMemoryTableScan|"
    r"InMemoryRelation)\b"
)


def _node_text(line: str) -> str:
    """Strip tree markers (+- :- | spaces) and codegen '*(N) ' prefixes."""
    s = re.sub(r"^[\s+:|-]*", "", line)
    return re.sub(r"^\*\(\d+\)\s*", "", s)


def _node_depth(line: str) -> int:
    m = re.search(r"[\w*=]", line)
    return m.start() if m else len(line)


def _subtree_lines(lines: list[str], idx: int) -> list[str]:
    """Lines strictly below lines[idx] in its plan subtree (deeper indent)."""
    d = _node_depth(lines[idx])
    out = []
    for line in lines[idx + 1:]:
        if line.strip() and _node_depth(line) <= d and not line.lstrip().startswith("=="):
            break
        out.append(line)
    return out


def global_window_bounded(plan: str) -> bool:
    """Structural check for every partition-less Window in a physical plan.

    A `Window <- Sort <- Exchange SinglePartition` chain is a single-task
    global sort of its input. It is acceptable ONLY if that input is
    provably bounded, i.e. the exchange's subtree (skipping Project/Filter
    wrappers) is rooted at either:

    - a constant limit (`GlobalLimit` / `TakeOrderedAndProject` /
      `LocalLimit`) — top-k before the window; or
    - an Aggregate whose grouping keys are time-truncations
      (date_trunc / cast-to-date / date_format / window / year / month) —
      group count is O(days), corpus-independent. The trunc may appear
      directly in `keys=[...]` or in the Project that defines the key
      attribute (`... AS day#12`) anywhere below the aggregate.

    Anything else (e.g. an aggregate keyed by an unbounded id, or a raw
    scan) is the quality_deciles anti-pattern and must be flagged.
    """
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # only exchanges feeding a Sort under a Window are the anti-pattern;
        # walk UP: nearest shallower ancestors must be Sort then Window.
        d = _node_depth(line)
        ancestors = []
        for j in range(i - 1, -1, -1):
            dj = _node_depth(lines[j])
            if lines[j].strip() and dj < d:
                text = _node_text(lines[j])
                d = dj
                if _WRAPPER.match(text):
                    continue  # AQE wrappers are transparent
                ancestors.append(text)
            if len(ancestors) >= 3:
                break
        if not (
            ancestors
            and ancestors[0].startswith("Sort")
            and any(a.startswith(("Window", "WindowGroupLimit")) for a in ancestors[1:])
        ):
            continue
        if not _bounded_below(lines, i):
            return False
    return True


def _bounded_below(lines: list[str], i: int) -> bool:
    """Walk the direct-child chain under lines[i] (an Exchange) through
    pass-through nodes to the first "real" operator and decide whether
    that input is provably bounded: a constant limit
    (GlobalLimit/LocalLimit/TakeOrderedAndProject), a WindowGroupLimit
    (rank pushdown keeps <= k rows per upstream partition), or an
    aggregate keyed only by time-truncations (O(days) groups,
    corpus-independent). Shared by the partition-less-Window check and
    the global-sort check."""
    sub = _subtree_lines(lines, i)
    for k, child in enumerate(sub):
        if not child.strip():
            continue
        text = _node_text(child)
        if re.match(
            r"^(GlobalLimit|LocalLimit|TakeOrderedAndProject|WindowGroupLimit)\b",
            text,
        ):
            return True
        m = _AGG_NODE.match(text)
        if m:
            keys = m.group(2)
            if _TIME_TRUNC.search(keys):
                return True
            # keys are attribute refs: find their defining expression
            # (`<trunc-expr> AS day#12`) anywhere below the aggregate
            attrs = re.findall(r"(\w+#\d+)", keys)
            below = "\n".join(_subtree_lines(sub, k))
            return bool(attrs) and all(
                any(
                    _TIME_TRUNC.search(below[max(0, dm.start() - 200):dm.start()])
                    for dm in re.finditer(re.escape(f"AS {a}"), below)
                )
                for a in attrs
            )
        if _PASSTHROUGH.match(text):
            continue
        break  # raw scan / join / anything unbounded
    return False


def global_sort_bounded(plan: str) -> bool:
    """Structural check for full global sorts in a RETURN plan
    (VERDICT r10 task 7): `Sort [...], true` fed by an
    `Exchange rangepartitioning` with no limit above it totally orders
    the entire result — a full range-shuffle at 100 TB that only makes
    sense when the sorted frame is provably small. Accepted only when
    the exchange's input is bounded (same classes as the window check:
    constant limit, rank pushdown, or time-trunc-keyed aggregate —
    :func:`_bounded_below`); a sort that feeds a GlobalLimit /
    TakeOrderedAndProject above is top-k and fine (Spark usually
    collapses that to TakeOrderedAndProject with no exchange at all)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange rangepartitioning" not in line:
            continue
        # walk UP: nearest real ancestor must be a global Sort; if any
        # ancestor above that is a limit, the pair is top-k — bounded
        d = _node_depth(line)
        saw_sort = False
        limited = False
        for j in range(i - 1, -1, -1):
            dj = _node_depth(lines[j])
            if lines[j].strip() and dj < d:
                text = _node_text(lines[j])
                d = dj
                if _WRAPPER.match(text):
                    continue
                if not saw_sort:
                    # only GLOBAL sorts (`Sort [...], true`): a local
                    # sortWithinPartitions above a repartitionByRange
                    # (the z-order write layout) is per-partition work,
                    # not a total ordering
                    if re.match(r"^Sort \[.*\], true", text):
                        saw_sort = True
                        continue
                    break  # range exchange not feeding a Sort (e.g.
                    # repartitionByRange) — not this check's concern
                if re.match(
                    r"^(GlobalLimit|LocalLimit|TakeOrderedAndProject)\b", text
                ):
                    limited = True
                break
        if not saw_sort or limited:
            continue
        if not _bounded_below(lines, i):
            return False
    return True


def audit_plan(name: str, plan: str) -> tuple[list[str], dict[str, int]]:
    flags: list[str] = []
    stats = {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "scans": len(re.findall(r"FileScan parquet|Scan parquet", plan)),
        # executedPlan().toString() marks codegen stages with a "*(N)" prefix
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }
    if "CartesianProduct" in plan and name not in SCALAR_CROSS_OK:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in SCALAR_CROSS_OK:
        flags.append("BroadcastNestedLoopJoin")
    if re.search(r"\bBatchEvalPython\b", plan):
        flags.append("row-at-a-time Python UDF (BatchEvalPython)")
    # partition-less Window: Window over a child Sort fed by an
    # Exchange SinglePartition = a single-task global sort of the whole
    # input — the quality_deciles anti-pattern; must not regress.
    # Structural check (no name whitelist): the global sort is accepted
    # only if its input is provably bounded (constant limit below, or a
    # time-trunc-keyed aggregate) — see global_window_bounded().
    if not global_window_bounded(plan):
        flags.append("partition-less Window over unbounded input (global single-task sort)")
    # full global sort of the return frame (orderBy, no limit): a total
    # range-shuffle at 100 TB — accepted only when the sorted input is
    # structurally bounded or carries a documented output bound
    if name not in ORDERED_RETURN_OK and not global_sort_bounded(plan):
        flags.append("unbounded global sort in return plan (orderBy with no limit)")
    return flags, stats


BUDGETS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_BUDGETS.json",
)


def main() -> int:
    argv = sys.argv[1:]
    record = "--record" in argv
    if record:
        argv.remove("--record")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    budgets: dict[str, int] = {}
    if not record and os.path.exists(BUDGETS_PATH):
        budgets = json.load(open(BUDGETS_PATH))
    spark = build_session("explain_audit")
    sc = spark.sparkContext

    def _next_job_id() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    def _executed_stages(first_job: int, last_job: int) -> int:
        # every actually-run shuffle boundary in [first_job, last_job):
        # skipped/reused stages complete zero tasks and don't count.
        # job-id RANGE (not job group) so streaming foreachBatch jobs
        # fired from stream threads are included too
        t = sc.statusTracker()
        stage_ids = set()
        for j in range(first_job, last_job):
            ji = t.getJobInfo(j)
            if ji is not None:
                stage_ids.update(ji.stageIds)
        n = 0
        for s in stage_ids:
            si = t.getStageInfo(s)
            if si is not None and si.numCompletedTasks > 0:
                n += 1
        return n

    failures = 0
    observed: dict[str, int] = {}
    for name, fn in catalog.queries().items():
        if only and name not in only:
            continue
        try:
            # cold cache per query: shared internal persists (e.g. the
            # co-order edge cache) would otherwise make stage counts
            # depend on which queries ran earlier in the sweep
            spark.catalog.clearCache()
            before = _next_job_id()
            df = fn(spark, sf_dir)
            # execute THIS DataFrame (not a derived count) so AQE finalizes
            # and the plan string carries real codegen/shuffle decisions
            df.collect()
            stages = _executed_stages(before, _next_job_id())
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            failures += 1
            continue
        flags, stats = audit_plan(name, plan)
        stats["stages"] = stages
        observed[name] = stages
        # budgets are recorded at sf0.001 (deterministic data ->
        # deterministic AQE decisions); only compare at that SF
        if name in budgets and "sf0.001" in sf_dir:
            if stages > budgets[name]:
                flags.append(
                    f"stage budget exceeded: {stages} > "
                    f"{budgets[name]} (re-baseline with --record if "
                    f"intentional)"
                )
        line = (
            f"{name}: stages={stats['stages']} "
            f"broadcasts={stats['broadcasts']} scans={stats['scans']} "
            f"codegen={stats['codegen_spans']}"
        )
        if flags:
            failures += 1
            print(f"FLAG  {line}  <<< {', '.join(flags)}")
        else:
            print(f"ok    {line}")
    if record:
        if only:  # partial re-baseline: merge into the existing file
            merged = {}
            if os.path.exists(BUDGETS_PATH):
                merged = json.load(open(BUDGETS_PATH))
            merged.update(observed)
            observed = merged
        with open(BUDGETS_PATH, "w") as f:
            json.dump(dict(sorted(observed.items())), f, indent=1)
        print(f"\nrecorded {len(observed)} stage budgets -> {BUDGETS_PATH}")
    print(f"\n{failures} flagged" if failures else "\nall plans clean")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
