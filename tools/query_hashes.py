#!/usr/bin/env python
"""Per-query content-hash ledger — driver greens expire when code changes.

The r6 ADVICE found the gap: `x_ivf_topk`'s algorithm changed in r6
(driver-local sample training) but its only driver-green row is r5
(pre-change), and both `tools/coverage.py` and `__spark_entry__`'s
verification-order ranking counted that stale green as evidence. This
ledger closes it: `query_hashes.json` records, per query, the md5 of its
(function source + oracle SQL) plus the hash the last driver green
applied to. A green is only live while the current hash equals the
green hash; editing a query silently re-queues it for driver
verification (never-verified sorts first in `__spark_entry__.queries()`).

Round ritual:
    python tools/query_hashes.py absorb CORRECTNESS_r07.json  # round START,
        before any edits — greens in that file apply to the committed code
    python tools/query_hashes.py update    # round CLOSE (and after any
        mid-round edit) — re-hash everything; changed queries lose greens
    python tools/query_hashes.py changed   # list stale/pending names

Limitations (documented, not hidden): the hash covers the query function
body and its oracle, not transitively-called helpers — a helper-only
change (e.g. `functions/similarity.py` internals) must be expired by
hand via `expire NAME...`. That is the same granularity the ADVICE asked
for ("e.g., track a per-query content hash").
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(_HERE, "query_hashes.json")


def content_hashes() -> dict[str, str]:
    sys.path.insert(0, _HERE)
    from flink_realtime_data_eng_spark import registry

    out: dict[str, str] = {}
    for name, fn in registry.QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        oracle = registry.ORACLES.get(name, "")
        out[name] = hashlib.md5(
            (src + "\x00" + oracle).encode()).hexdigest()[:16]
    return out


def load() -> dict[str, dict]:
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return json.load(f)
    return {}


def save(ledger: dict[str, dict]) -> None:
    with open(LEDGER, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1, sort_keys=True)
        f.write("\n")


def cmd_update() -> None:
    cur = content_hashes()
    ledger = load()
    changed, added = [], []
    for name, h in cur.items():
        row = ledger.get(name)
        if row is None:
            ledger[name] = {"hash": h, "green_hash": None}
            added.append(name)
        elif row["hash"] != h:
            row["hash"] = h
            if row.get("green_hash") not in (None, h):
                row["green_hash"] = None
                changed.append(name)
    for name in set(ledger) - set(cur):
        del ledger[name]
    save(ledger)
    print(f"updated {LEDGER}: {len(cur)} queries, "
          f"{len(added)} new, {len(changed)} greens expired"
          + (f" ({', '.join(changed)})" if changed else ""))


def cmd_absorb(path: str) -> None:
    with open(path) as f:
        results = json.load(f)
    ledger = load()
    greens = 0
    for name, res in results.items():
        if res.get("hash_match") is True and name in ledger:
            ledger[name]["green_hash"] = ledger[name]["hash"]
            greens += 1
    save(ledger)
    print(f"absorbed {path}: {greens} greens pinned to current hashes")


def cmd_expire(names: list[str]) -> None:
    ledger = load()
    for name in names:
        if name in ledger:
            ledger[name]["green_hash"] = None
            print(f"expired {name}")
        else:
            print(f"unknown query: {name}", file=sys.stderr)
    save(ledger)


def cmd_changed() -> None:
    cur = content_hashes()
    ledger = load()
    for name, h in cur.items():
        row = ledger.get(name)
        if row is None or row.get("green_hash") != h:
            why = ("never-green" if row is None or row.get("green_hash") is None
                   else "code-changed-since-green")
            print(f"{name}\t{why}")


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "changed"
    if cmd == "update":
        cmd_update()
    elif cmd == "absorb":
        cmd_absorb(sys.argv[2])
    elif cmd == "expire":
        cmd_expire(sys.argv[2:])
    elif cmd == "changed":
        cmd_changed()
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
