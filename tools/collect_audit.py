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


def main() -> int:
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
