#!/usr/bin/env python
"""Plan sweep at an arbitrary SF (r9 VERDICT task 4): rebuild every benched
query's executed-plan string exactly the way tests/test_plan_lint.py does
(pre-execution AQE plan), count exchanges, and diff against the sf0.001
budgets in tests/shuffle_budgets.json.

AQE can legitimately pick different physical shapes two decades up
(broadcast-threshold flips, skew splits), so a diff here is a REVIEW
item, not automatically a bug — the output lists every query whose sf0.1
exchange count differs from its recorded budget, with the NLJ flag.

Usage: python tools/plan_sweep.py [sf_dir=/root/testdata/sf0.1]
Writes PLAN_SWEEP_<base>.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from flink_realtime_data_eng_spark import registry
    from flink_realtime_data_eng_spark.session import get_test_spark

    spark = get_test_spark()
    spark.sparkContext.setLogLevel("ERROR")
    budgets = json.load(open(os.path.join(_HERE, "tests",
                                          "shuffle_budgets.json")))
    batch = sorted(set(registry.QUERIES) - registry.STREAMING_DEMOS)
    out, diffs = {}, {}
    for name in batch:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            plan = plan.split("== Initial Plan ==")[0]
            n = plan.count("Exchange ")
            nlj = ("CartesianProduct" in plan
                   or "BroadcastNestedLoopJoin" in plan)
            out[name] = {"exchanges": n, "nlj": nlj,
                         "budget": budgets.get(name)}
            if budgets.get(name) is not None and n != budgets[name]:
                diffs[name] = (n, budgets[name])
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            diffs[name] = ("ERROR", budgets.get(name))
        print(f"{name}: {out[name]}", flush=True)
    base = os.path.basename(os.path.normpath(sf_dir)).replace(".", "")
    path = os.path.join(_HERE, f"PLAN_SWEEP_{base}.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "plans": out, "diffs": diffs}, f,
                  indent=1, sort_keys=True)
    print(f"\nwrote {path}: {len(out)} plans, {len(diffs)} diffs vs budget")
    for name, (n, b) in sorted(diffs.items()):
        print(f"  {name}: sf-swept={n} budget={b}")


if __name__ == "__main__":
    main()
