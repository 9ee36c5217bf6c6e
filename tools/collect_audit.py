#!/usr/bin/env python
"""Source-level driver-materialization audit.

The plan auditor (tools/explain_audit.py) reads PHYSICAL plans — but
`.toPandas()` / `.collect()` / `.toLocalIterator()` happen before any
plan exists, so a corpus-sized driver materialization is structurally
invisible to it (the round-4 `label_noise_knn` defect class). This
checker walks the package SOURCE (AST) instead and flags every such
call unless it is provably bounded:

Structural proof (fluent receiver chain, outermost-in):
- the chain contains a `.limit(...)` / `.take(...)` / `.head(...)`
  link — an explicit row bound sits between the data and the driver; or
- the chain contains `.agg(...)` with NO `.groupBy(...)` link — a
  global aggregate is one row by definition. (`groupBy().agg()` does
  NOT qualify: group count is unbounded in general.)

Annotation (for sites whose bound lives outside the expression — a
codebook table that is n_cells rows by construction, a bitmap whose key
domain is a constant, a d^2 Gramian): a `# bounded-collect: <reason>`
comment on the call or within two lines above it. The annotation is an
assertion with a stated reason, reviewable in place — NOT a name
whitelist in this file, so a new unbounded collect anywhere in the
package fails the gate until its author either restructures or writes
down why it is bounded.

Second rule — persist hygiene (VERDICT r6 #2: `cs`/`pairs` leaked in
`stream_triangles_copurchase` after the same class was fixed for BPE a
round earlier, so the class recurs and needs a gate): every
`.persist()` / `.cache()` call must either

- be assigned to a name that is `.unpersist()`ed somewhere in the same
  enclosing function, or
- carry a `# persist-scope: <reason>` annotation on the call or within
  three lines above it — the reviewable assertion that the cache is
  MEANT to outlive the function (a session-shared corpus cache, a
  subtree the returned plan still references and the caller will
  materialize, a rolling loop handle released through an alias).

Usage: python tools/collect_audit.py [package_dir]
Exit 1 if any unproven, unannotated call is found.

Third rule — BOUND VERIFICATION (``--fail-on-growth``, VERDICT r9 #7):
the static pass verifies an annotation EXISTS; it cannot verify the
bound it asserts (a "bounded-collect: vocab" whose frame silently
became corpus-sized would still pass). The growth mode runs a real
workload (catalog queries against a parquet dir) with
``DataFrame.collect``/``toPandas`` instrumented, attributes every
driver materialization to its package callsite, resolves that site's
annotation to a row CEILING from the class table below, and fails if
any observed collect exceeded its ceiling. Ceilings are set an order
of magnitude above the legitimate value of each class at gate scale
(sf0.001-sf0.01), so they trip on a class violation (corpus-sized
rows flowing through a "vocab" or "scalar" site), not on noise.

Usage: python tools/collect_audit.py --fail-on-growth [sf_dir] [query ...]
(defaults: sf_dir=/root/testdata/sf0.001, queries=catalog.DRIVER_GATE)
Exit 1 if any instrumented collect exceeded its class ceiling.
"""

from __future__ import annotations

import ast
import os
import sys

FLAGGED_METHODS = {"collect", "toPandas", "toLocalIterator"}
BOUNDING_LINKS = {"limit", "take", "head"}
ANNOTATION = "bounded-collect:"
PERSIST_METHODS = {"persist", "cache"}
PERSIST_ANNOTATION = "persist-scope:"


def chain_links(node: ast.expr) -> list[str]:
    """Method/attribute names along a fluent receiver chain, outermost
    first, ending with the root name if any: ``a.b(x).c().collect`` ->
    ['c', 'b', 'a']."""
    links: list[str] = []
    cur = node
    while True:
        if isinstance(cur, ast.Call):
            cur = cur.func
        elif isinstance(cur, ast.Attribute):
            links.append(cur.attr)
            cur = cur.value
        elif isinstance(cur, ast.Name):
            links.append(cur.id)
            return links
        else:
            return links


def structurally_bounded(receiver: ast.expr) -> bool:
    links = chain_links(receiver)
    if any(l in BOUNDING_LINKS for l in links):
        return True
    if "agg" in links and "groupBy" not in links and "groupby" not in links:
        return True
    return False


def annotated(lines: list[str], start_lineno: int, end_lineno: int) -> bool:
    lo = max(0, start_lineno - 4)  # the call lines and three lines above
    return any(
        ANNOTATION in lines[i]
        for i in range(lo, min(end_lineno, len(lines)))
    )


def _persist_annotated(lines: list[str], start_lineno: int, end_lineno: int) -> bool:
    lo = max(0, start_lineno - 4)
    return any(
        PERSIST_ANNOTATION in lines[i]
        for i in range(lo, min(end_lineno, len(lines)))
    )


def _assigned_names(node: ast.Call, parents: dict[ast.AST, ast.AST]) -> set[str]:
    """Names a persist call's result is directly bound to: walks up
    through the assignment statement wrapping the call (if the call IS
    the assigned value, not a sub-expression of something bigger)."""
    cur: ast.AST = node
    parent = parents.get(cur)
    if isinstance(parent, ast.Assign) and parent.value is cur:
        return {
            t.id for t in parent.targets if isinstance(t, ast.Name)
        }
    if isinstance(parent, ast.AnnAssign) and parent.value is cur and isinstance(
        parent.target, ast.Name
    ):
        return {parent.target.id}
    return set()


def _unpersisted_names(scope: ast.AST) -> set[str]:
    """Names ``n`` for which ``n.unpersist(...)`` appears in scope."""
    out: set[str] = set()
    for n in ast.walk(scope):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "unpersist"
            and isinstance(n.func.value, ast.Name)
        ):
            out.add(n.func.value.id)
    return out


def audit_persists(
    tree: ast.AST, lines: list[str], path: str
) -> list[tuple[str, int, str]]:
    parents: dict[ast.AST, ast.AST] = {}
    for parent in ast.walk(tree):
        for child in ast.iter_child_nodes(parent):
            parents[child] = parent
    # enclosing function per node (innermost def wins)
    out = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in PERSIST_METHODS
            and not node.args  # .cache() on non-DataFrames takes args
        ):
            continue
        if _persist_annotated(lines, node.lineno, node.end_lineno or node.lineno):
            continue
        scope: ast.AST = node
        while scope in parents and not isinstance(
            scope, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Module)
        ):
            scope = parents[scope]
        names = _assigned_names(node, parents)
        if names & _unpersisted_names(scope):
            continue
        out.append(
            (
                path,
                node.lineno,
                f".{node.func.attr}() "
                + (
                    f"bound to {'/'.join(sorted(names))} "
                    if names
                    else "(unbound chain link) "
                )
                + "never .unpersist()ed in its function and no "
                f"'{PERSIST_ANNOTATION}' annotation",
            )
        )
    return out


def audit_source(src: str, path: str = "<src>") -> list[tuple[str, int, str]]:
    """Return (path, lineno, description) for every unproven call."""
    tree = ast.parse(src)
    lines = src.splitlines()
    out = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in FLAGGED_METHODS
        ):
            continue
        if structurally_bounded(node.func.value):
            continue
        if annotated(lines, node.lineno, node.end_lineno or node.lineno):
            continue
        root = chain_links(node.func.value)
        out.append(
            (
                path,
                node.lineno,
                f".{node.func.attr}() on "
                f"{'.'.join(reversed(root)) or '<expr>'} — not limit/"
                f"global-agg bounded and no '{ANNOTATION}' annotation",
            )
        )
    out.extend(audit_persists(tree, lines, path))
    return out


# --- growth mode: verify the asserted bound classes at runtime -----------

# keyword -> row ceiling; FIRST match on the lowercased annotation text
# wins, so list the tight classes before the loose ones. Each ceiling is
# ~10x the legitimate value of its class at gate scale: a "vocab" that
# has silently become corpus-sized blows through 262144 long before the
# corpus does at 100 TB, while honest drift (a vocab growing 2x) stays
# inside.
CEILING_CLASSES: list[tuple[str, int]] = [
    ("limit(1)", 64),
    ("scalar", 64),
    ("1-row", 64),
    ("one global", 64),
    ("one seed row", 64),
    ("one argmax row", 1024),          # k rounds x 1 row
    ("query batch", 65536),
    ("codebook", 65536),
    ("theta_bottom_k", 65536),
    ("gramian", 65536),
    ("bitmap", 65536),
    ("word_idx", 65536),
    ("stratum", 65536),
    ("vocab", 262144),
    ("token counts", 262144),
    ("bucket", 1 << 20),
    ("touched", 1 << 20),
]
# sites with no (or an unrecognized) annotation still get a hard global
# ceiling — structurally-bounded limit()/agg() sites never approach it,
# and anything that does is corpus-sized by definition
DEFAULT_CEILING = 1_000_000


def ceiling_for(annotation_text: str | None) -> int:
    if annotation_text:
        low = annotation_text.lower()
        for kw, cap in CEILING_CLASSES:
            if kw in low:
                return cap
    return DEFAULT_CEILING


def _site_annotation(path: str, lineno: int) -> str | None:
    """The bounded-collect annotation text near a runtime callsite.
    The frame's lineno may point anywhere inside a multi-line fluent
    chain, so the search window is wider than the static pass's
    (3 above the statement): 8 above .. 4 below."""
    try:
        with open(path) as f:
            lines = f.read().splitlines()
    except OSError:
        return None
    lo, hi = max(0, lineno - 9), min(len(lines), lineno + 4)
    for i in range(lo, hi):
        if ANNOTATION in lines[i]:
            return lines[i].split(ANNOTATION, 1)[1].strip()
    return None


def run_growth_audit(workload, pkg_roots: list[str]) -> dict:
    """Run ``workload()`` with DataFrame.collect/toPandas instrumented;
    return {(abs_path, lineno): max_rows_observed} for every callsite
    inside ``pkg_roots``. Pure mechanism — the caller applies
    :func:`ceiling_for` to judge the observations (and the test suite
    drives it with a degenerate fixture)."""
    import traceback

    # patch every class that OWNS a collect/toPandas implementation:
    # pyspark 4 routes the base pyspark.sql.DataFrame methods through
    # the classic (or connect) subclass, so patching only the base
    # never intercepts anything
    from pyspark.sql import DataFrame as _Base

    targets = [_Base]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _Classic

        targets.append(_Classic)
    except ImportError:
        pass
    targets = [
        t
        for t in targets
        if "collect" in t.__dict__ or "toPandas" in t.__dict__
    ]

    roots = [os.path.abspath(r) + os.sep for r in pkg_roots]
    observed: dict[tuple[str, int], int] = {}

    def _site():
        for fr in reversed(traceback.extract_stack()):
            p = os.path.abspath(fr.filename)
            if "collect_audit" in p:
                continue
            if any(p.startswith(r) for r in roots):
                return (p, fr.lineno)
        return None

    saved: list[tuple[type, str, object]] = []

    def _record(result_len):
        s = _site()
        if s is not None:
            observed[s] = max(observed.get(s, 0), result_len)

    def _wrap(cls, name):
        if name not in cls.__dict__:
            return
        orig = cls.__dict__[name]

        def wrapped(df, *a, **kw):
            out = orig(df, *a, **kw)
            _record(len(out))
            return out

        saved.append((cls, name, orig))
        setattr(cls, name, wrapped)

    for t in targets:
        _wrap(t, "collect")
        _wrap(t, "toPandas")
    try:
        workload()
    finally:
        for cls, name, orig in saved:
            setattr(cls, name, orig)
    return observed


def judge_observations(observed: dict) -> list[tuple[str, int, int, int, str]]:
    """(path, lineno, rows, ceiling, annotation) for every observation
    over its class ceiling."""
    violations = []
    for (path, lineno), rows in sorted(observed.items()):
        ann = _site_annotation(path, lineno)
        cap = ceiling_for(ann)
        if rows > cap:
            violations.append((path, lineno, rows, cap, ann or "<none>"))
    return violations


def growth_main(argv: list[str]) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from rapids_and_rivers_spark import catalog
    from rapids_and_rivers_spark.session import build_session

    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    names = argv[1:] or list(catalog.DRIVER_GATE)
    qs = catalog.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown query names: {unknown}")
        return 2
    spark = build_session("collect_growth_audit")
    pkg = os.path.join(repo, "rapids_and_rivers_spark")

    def workload():
        for n in names:
            qs[n](spark, sf_dir).count()
            print(f"ran   {n}", flush=True)

    observed = run_growth_audit(workload, [pkg])
    for (path, lineno), rows in sorted(observed.items(), key=lambda kv: -kv[1]):
        ann = _site_annotation(path, lineno)
        cap = ceiling_for(ann)
        rel = os.path.relpath(path, pkg)
        print(f"obs   {rel}:{lineno}  rows={rows}  ceiling={cap}  [{ann or '<no annotation>'}]")
    violations = judge_observations(observed)
    for path, lineno, rows, cap, ann in violations:
        rel = os.path.relpath(path, pkg)
        print(
            f"GROWTH  {rel}:{lineno}  collected {rows} rows > ceiling "
            f"{cap} for bound class [{ann}]"
        )
    print(
        f"\n{len(violations)} bound-class violations"
        if violations
        else f"\nall {len(observed)} observed collect sites inside their "
        "bound-class ceilings"
    )
    return 1 if violations else 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--fail-on-growth":
        return growth_main(sys.argv[2:])
    pkg = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "rapids_and_rivers_spark",
        )
    )
    findings = []
    for dirpath, _dirnames, filenames in os.walk(pkg):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            with open(p) as f:
                findings.extend(audit_source(f.read(), os.path.relpath(p, pkg)))
    for path, lineno, msg in findings:
        print(f"FLAG  {path}:{lineno}  {msg}")
    print(
        f"\n{len(findings)} unbounded driver collects"
        if findings
        else "\nall driver collects bounded or annotated"
    )
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
