#!/usr/bin/env python
"""One-off scanner: list every batch query whose executed plan contains an
unpartitioned (global) Window / WindowGroupLimit node, with the node line —
input for the bounded-window lint whitelist (r10 VERDICT item 3)."""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def toplevel_groups(s: str) -> list[str]:
    """Split the argument tail of a plan node into its top-level
    [...] groups (nested brackets stay inside their group)."""
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _is_sort_group(g: str) -> bool:
    return " ASC" in g or " DESC" in g


def global_window_lines(plan: str) -> list[str]:
    """A Window prints [exprs], [part?], [order?] — both optional — and a
    WindowGroupLimit prints [part?], [order], fn, k. Group COUNT alone is
    ambiguous (partitioned-no-order and global-ordered both show 2 groups
    on Window), so classify the groups: an order group carries ASC/DESC
    sort markers, a partition group is bare attribute refs."""
    out = []
    for line in plan.splitlines():
        ls = line.strip().lstrip("+-: *")
        if ls.startswith("Window ") or ls.startswith("WindowGroupLimit "):
            node = ls.split(" ", 1)[0]
            groups = toplevel_groups(ls[len(node):])
            if node == "Window":
                tail = groups[1:]  # group 0 is always the window exprs
            else:
                tail = groups
            # partitioned iff some tail group is a non-sort group
            partitioned = any(not _is_sort_group(g) for g in tail if g)
            if not partitioned:
                out.append(ls[:400])
    return out


if __name__ == "__main__":
    from flink_realtime_data_eng_spark import registry

    from flink_realtime_data_eng_spark.session import get_spark
    spark = get_spark("window-scan")
    spark.sparkContext.setLogLevel("ERROR")
    names = sorted(set(registry.QUERIES) - registry.STREAMING_DEMOS)
    if len(sys.argv) > 1:
        names = sys.argv[1:]
    hits = {}
    for name in names:
        try:
            df = registry.QUERIES[name](spark, "/root/testdata/sf0.001")
            plan = df._jdf.queryExecution().executedPlan().toString()
            plan = plan.split("== Initial Plan ==")[0]
            g = global_window_lines(plan)
            if g:
                hits[name] = g
                print(f"{name}: {len(g)} global window(s)")
                for l in g:
                    print(f"    {l}")
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:120]}")
    print(f"\n{len(hits)} queries with global windows / {len(names)}")
