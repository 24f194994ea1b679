#!/usr/bin/env python
"""Print (registered, driver-verified, pending) from CORRECTNESS_r*.json.

Both the r4 and r5 judges had to recompute these numbers by hand; this
makes the round-close bookkeeping a one-liner:

    python tools/coverage.py            # summary line
    python tools/coverage.py --pending  # also list never-verified query names
"""

from __future__ import annotations

import glob
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, _HERE)
    from flink_realtime_data_eng_spark import registry

    registered = list(registry.QUERIES)
    verified: dict[str, int] = {}
    failed_ever: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            ok = res.get("hash_match") is True or (
                res.get("hash_match") is None and not res.get("err")
                and res.get("spark_rows") is not None)
            if ok:
                verified[name] = max(verified.get(name, 0), rnd)
            else:
                failed_ever[name] = max(failed_ever.get(name, 0), rnd)
    pending = [n for n in registered if n not in verified]
    stale = sorted(set(verified) - set(registered))
    print(
        f"registered={len(registered)} driver-verified={len([n for n in registered if n in verified])} "
        f"pending={len(pending)} ever-failed={len([n for n in registered if n in failed_ever and n not in verified])}"
    )
    if stale:
        print(f"verified-but-no-longer-registered={len(stale)}: {', '.join(stale)}")
    if "--pending" in sys.argv:
        for n in pending:
            print(f"  pending: {n}")


if __name__ == "__main__":
    main()
