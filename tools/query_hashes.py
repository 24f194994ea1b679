#!/usr/bin/env python
"""Per-query content-hash ledger — driver greens expire when code changes.

The r6 ADVICE found the gap: `x_ivf_topk`'s algorithm changed in r6
(driver-local sample training) but its only driver-green row is r5
(pre-change), and both `tools/coverage.py` and `__spark_entry__`'s
verification-order ranking counted that stale green as evidence. This
ledger closes it: `query_hashes.json` records, per query, the md5 of its
content plus the hash the last driver verification applied to. A green
is only live while the current hash equals the green hash; editing a
query silently re-queues it for driver verification (never-verified
sorts first in `__spark_entry__.queries()`).

Content hash = the query function's source + its oracle SQL + the
source of every DIRECTLY-CALLED function defined in this package
(resolved by AST over the function body against its globals, one level
deep). The one-level closure is what catches the common edit shape —
the 2-line `q*` wrappers delegating to `plans/relational.py`, the `x_*`
wrappers delegating to `functions/*.py` — without recursing into the
whole package (a deep closure would expire every green on any library
touch). Deeper helper-only changes still need a manual `expire`.

Round ritual:
    python tools/query_hashes.py absorb CORRECTNESS_r07.json  # round START,
        BEFORE any edits — greens in that file apply to the committed code.
        Refuses if the product tree is dirty (a post-edit absorb would pin
        unverified code as green); --force overrides.
    python tools/query_hashes.py update    # round CLOSE (and after any
        mid-round edit) — re-hash everything; changed queries lose greens
    python tools/query_hashes.py changed   # list stale/pending names
    python tools/query_hashes.py rehash    # after editing THIS hashing
        scheme: re-identify current code under the new scheme, preserving
        greens that were pinned to current code under the old one
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(_HERE, "query_hashes.json")
_PKG = "flink_realtime_data_eng_spark"


def _callee_sources(fn) -> list[str]:
    """Sources of package functions the query function calls directly."""
    import textwrap
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except Exception:
        return []
    g = dict(getattr(fn, "__globals__", {}))
    # Registry convention imports helpers INSIDE the query body
    # (`from .operators import incremental`); resolve those bindings too,
    # else the most common delegation shape would escape the hash.
    import importlib
    pkg = getattr(fn, "__module__", "").rsplit(".", 1)[0] or None
    for node in ast.walk(tree):
        try:
            if isinstance(node, ast.ImportFrom):
                mod = importlib.import_module(
                    "." * node.level + (node.module or ""), pkg)
                for alias in node.names:
                    bound = getattr(mod, alias.name, None)
                    if bound is None:
                        # `from .operators import incremental` names a
                        # SUBMODULE, invisible to getattr until imported.
                        # With module=None (`from . import X`) the dotted
                        # name is ".X", NOT "..X" — the old concat
                        # produced the latter and silently bound the
                        # package instead, making the hash depend on
                        # whether some OTHER code had already imported
                        # the submodule (r8: x_kafka_standin_stream
                        # drifted after tests imported kafka_standin).
                        try:
                            bound = importlib.import_module(
                                "." * node.level
                                + (node.module + "." if node.module else "")
                                + alias.name, pkg)
                        except Exception:
                            bound = mod
                    g.setdefault(alias.asname or alias.name, bound)
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    g.setdefault(alias.asname or alias.name.split(".")[0],
                                 importlib.import_module(alias.name))
        except Exception:
            continue
    seen, out = set(), []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        obj = None
        f = node.func
        if isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name):
            mod = g.get(f.value.id)
            obj = getattr(mod, f.attr, None) if mod is not None else None
        elif isinstance(f, ast.Name):
            obj = g.get(f.id)
        if obj is None or not callable(obj):
            continue
        if not getattr(obj, "__module__", "").startswith(_PKG):
            continue
        key = f"{obj.__module__}.{getattr(obj, '__qualname__', '')}"
        if key in seen:
            continue
        seen.add(key)
        try:
            out.append(inspect.getsource(obj))
        except (OSError, TypeError):
            # Stable identifier — repr() would embed the per-process
            # memory address and spuriously expire every green in any
            # source-less environment (r7 ADVICE).
            out.append(key)
    return sorted(out)


def content_hashes() -> dict[str, str]:
    sys.path.insert(0, _HERE)
    from flink_realtime_data_eng_spark import registry

    out: dict[str, str] = {}
    for name, fn in registry.QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        parts = [src, registry.ORACLES.get(name, "")] + _callee_sources(fn)
        out[name] = hashlib.md5(
            "\x00".join(parts).encode()).hexdigest()[:16]
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


def _product_tree_dirty() -> list[str]:
    # tools/query_hashes.py is included: editing the hashing scheme
    # itself changes what every hash means, so an absorb after such an
    # edit would pin greens against hashes the driver never saw.
    paths = [f"{_PKG}/", "__spark_entry__.py", "tools/query_hashes.py"]
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--"] + paths,
            cwd=_HERE, capture_output=True, text=True, timeout=30)
        return [ln for ln in out.stdout.splitlines() if ln.strip()]
    except Exception:
        return []


def _product_changed_since_results(path: str) -> list[str]:
    """Product files committed AFTER the commit that produced the results
    file (r9 ADVICE): the clean-tree gate proves the working tree matches
    HEAD, but not that HEAD is the code the driver ran — commits landing
    between the driver run and the absorb would pin greens onto code the
    driver never saw. The results file's own last-touch commit is the
    best available generation-time marker."""
    paths = [f"{_PKG}/", "__spark_entry__.py", "tools/query_hashes.py"]
    try:
        base = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", os.path.basename(path)],
            cwd=_HERE, capture_output=True, text=True, timeout=30
        ).stdout.strip()
        if not base:
            return []  # results file never committed (fresh driver drop)
        out = subprocess.run(
            ["git", "diff", "--name-only", base, "HEAD", "--"] + paths,
            cwd=_HERE, capture_output=True, text=True, timeout=30)
        return [ln for ln in out.stdout.splitlines() if ln.strip()]
    except Exception:
        return []


def cmd_absorb(path: str, force: bool = False) -> None:
    dirty = _product_tree_dirty()
    if dirty and not force:
        print("REFUSING absorb: product tree is dirty — a correctness file "
              "produced against committed code must not pin greens onto "
              "edited code. Commit/stash first, or pass --force.\n  "
              + "\n  ".join(dirty[:10]), file=sys.stderr)
        sys.exit(1)
    drifted = _product_changed_since_results(path)
    if drifted and not force:
        print("REFUSING absorb: product files changed in commits AFTER the "
              "results file landed — these greens were measured on older "
              "code. Pass --force only if you know the changed files touch "
              "no absorbed query.\n  " + "\n  ".join(drifted[:10]),
              file=sys.stderr)
        sys.exit(1)
    with open(path) as f:
        results = json.load(f)
    ledger = load()
    cur = content_hashes()
    greens = rows_only = 0
    for name, res in results.items():
        if name not in ledger:
            # A green for a query added after the last `update` must
            # not be dropped silently (r7 ADVICE): auto-add the row at
            # its current hash — the dirty-tree gate above already
            # guarantees current code == the code the driver verified.
            if name in cur:
                ledger[name] = {"hash": cur[name], "green_hash": None}
                print(f"note: {name} was missing from the ledger — "
                      "auto-added at its current content hash")
            else:
                print(f"warning: {name} appears in {path} but is not a "
                      "registered query; skipping", file=sys.stderr)
                continue
        if res.get("hash_match") is True:
            ledger[name]["green_hash"] = ledger[name]["hash"]
            greens += 1
        elif (res.get("hash_match") is None and not res.get("err")
              and res.get("spark_rows") is not None):
            # rows-only verification expires on code change exactly like
            # a hash green (weaker evidence, same staleness semantics)
            ledger[name]["green_hash"] = ledger[name]["hash"]
            rows_only += 1
    save(ledger)
    print(f"absorbed {path}: {greens} hash greens + {rows_only} rows-only "
          "pinned to current hashes")


def cmd_expire(names: list[str]) -> None:
    ledger = load()
    for name in names:
        if name in ledger:
            ledger[name]["green_hash"] = None
            print(f"expired {name}")
        else:
            print(f"unknown query: {name}", file=sys.stderr)
    save(ledger)


def cmd_rehash() -> None:
    """Migrate the ledger across a change to the hashing scheme itself:
    a query whose green was pinned to its CURRENT code (green_hash ==
    hash under the old scheme) stays green under the new scheme — the
    code is unchanged, only its identifier moved."""
    cur = content_hashes()
    ledger = load()
    kept = dropped = 0
    for name, h in cur.items():
        row = ledger.get(name)
        if row is None:
            ledger[name] = {"hash": h, "green_hash": None}
            continue
        was_green_on_current = row.get("green_hash") == row.get("hash")
        row["hash"] = h
        if was_green_on_current and row.get("green_hash") is not None:
            row["green_hash"] = h
            kept += 1
        elif row.get("green_hash") is not None:
            row["green_hash"] = None
            dropped += 1
    for name in set(ledger) - set(cur):
        del ledger[name]
    save(ledger)
    print(f"rehashed: {kept} greens migrated, {dropped} stale greens "
          "dropped (were already not-on-current-code)")


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
        cmd_absorb(sys.argv[2], force="--force" in sys.argv)
    elif cmd == "expire":
        cmd_expire(sys.argv[2:])
    elif cmd == "rehash":
        cmd_rehash()
    elif cmd == "changed":
        cmd_changed()
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
