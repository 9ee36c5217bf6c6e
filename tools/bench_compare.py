#!/usr/bin/env python
"""Matched-pair comparison of two bench artifacts.

Cross-round bench totals are only meaningful over the INTERSECTION of
queries present in both artifacts (summing different query sets produced
the round-2 apples-to-oranges ratio flagged in ADVICE.md). This tool
reads two BENCH_full.json-style files (or driver BENCH_r{N}.json files,
falling back to regex-parsing the truncated ``tail`` string) and prints
the matched-set totals, the ratio, and the largest per-query deltas.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    # r4+ artifacts carry per-query medians-of-N — the load-robust number
    # (VERDICT r3 "What's wrong" #3); prefer them over single-pass times
    if isinstance(data.get("queries_median"), dict):
        return {k: float(v) for k, v in data["queries_median"].items()}
    if isinstance(data.get("queries"), dict):
        return {k: float(v) for k, v in data["queries"].items()}
    parsed = data.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return {k: float(v) for k, v in parsed["queries"].items()}
    tail = data.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
    # drop non-query numeric keys that can appear in the tail
    drop = {"value", "sf", "n", "rc", "cpus", "streaming_msgs_per_sec"}
    return {k: float(v) for k, v in pairs if k not in drop}


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    old, new = load_queries(old_path), load_queries(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        sys.exit("no common queries between the two artifacts")
    s_old = sum(old[k] for k in common)
    s_new = sum(new[k] for k in common)
    print(
        f"matched queries: {len(common)} "
        f"(old has {len(old)}, new has {len(new)})"
    )
    print(
        f"old {s_old:.1f}s  new {s_new:.1f}s  ratio new/old = {s_new / s_old:.2f}"
    )
    deltas = sorted(common, key=lambda k: new[k] - old[k])
    print("largest improvements (old -> new):")
    for k in deltas[:top_n]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}")
    print("largest regressions (old -> new):")
    for k in deltas[-top_n:][::-1]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}")


if __name__ == "__main__":
    main()
