#!/usr/bin/env python
"""Print (registered, hash-verified, rows-only, pending, expired) coverage.

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
    from tools.query_hashes import content_hashes, load as load_ledger

    registered = list(registry.QUERIES)
    hash_green: dict[str, int] = {}   # hash_match is True
    rows_only: dict[str, int] = {}    # no oracle: hash_match None, no err
    failed_ever: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if res.get("hash_match") is True:
                hash_green[name] = max(hash_green.get(name, 0), rnd)
            elif (res.get("hash_match") is None and not res.get("err")
                  and res.get("spark_rows") is not None):
                rows_only[name] = max(rows_only.get(name, 0), rnd)
            else:
                failed_ever[name] = max(failed_ever.get(name, 0), rnd)

    # A green only counts while the query's code is unchanged since the
    # green (query_hashes.json ledger; r6 ADVICE: x_ivf_topk's r5 green
    # predates its r6 re-algorithm and must not count). No ledger → fall
    # back to raw correctness history, mirroring __spark_entry__ (a
    # missing file must not read as total verification loss).
    ledger = load_ledger()
    expired = []
    if ledger:
        cur = content_hashes()
        expired = sorted(
            n for n in list(hash_green) + list(rows_only)
            if ledger.get(n, {}).get("green_hash") != cur.get(n))
        for n in expired:
            hash_green.pop(n, None)
            rows_only.pop(n, None)

    pending = [n for n in registered
               if n not in hash_green and n not in rows_only]
    gone = sorted((set(hash_green) | set(rows_only)) - set(registered))
    print(
        f"registered={len(registered)} "
        f"hash-verified={len([n for n in registered if n in hash_green])} "
        f"rows-only={len([n for n in registered if n in rows_only])} "
        f"pending={len(pending)} "
        f"greens-expired-by-code-change={len([n for n in expired if n in registered])} "
        f"ever-failed-unrecovered={len([n for n in registered if n in failed_ever and n not in hash_green and n not in rows_only])}"
    )
    if gone:
        print(f"verified-but-no-longer-registered={len(gone)}: {', '.join(gone)}")
    if "--pending" in sys.argv:
        for n in pending:
            print(f"  pending: {n}")


if __name__ == "__main__":
    main()
