"""Synthetic stream-fixture generators (SURVEY §2.1 S3-S5).

The reference's generators are driver-side Java threads writing one CSV file
per record (audit trail: datasource/FileStreamDataGenerator.java:35-110;
browser events: chapter6/BrowserStreamDataGenerator.java:30-97) or producing
to Kafka (datasource/KafkaStreamDataGenerator.java:30-105). Field
vocabularies are fixed (users Tom/Harry/Bob; entities Customer/SalesRep;
operations Create/Modify/Query/Delete; actions Login/ViewVideo/ViewLink/
ViewReview/Logout) with random choice per record.

These Python ports are deterministic (seeded RNG, explicit base timestamp —
never wall clock) so streaming tests replay identical inputs. Records are
quoted CSV exactly like the reference's ``"a","b",...`` lines
(FileStreamDataGenerator.java:80-88), one file per record by default — the
shape the file-monitor source S1 expects.
"""

from __future__ import annotations

import random
from pathlib import Path

USERS = ["Tom", "Harry", "Bob"]
ENTITIES = ["Customer", "SalesRep"]
OPERATIONS = ["Create", "Modify", "Query", "Delete"]
ACTIONS = ["Login", "ViewVideo", "ViewLink", "ViewReview", "Logout"]


def _write(path: Path, lines: list[str]) -> None:
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


def audit_records(n: int = 100, seed: int = 42,
                  base_ts_ms: int = 1_700_000_000_000,
                  step_ms: int = 1000) -> list[str]:
    """S3 record lines: (id, user, entity, operation, ts_ms, duration, count)
    per FileStreamDataGenerator.java:58-76; quoted CSV per :80-88."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        ts = base_ts_ms + i * step_ms
        rec = [str(i), rng.choice(USERS), rng.choice(ENTITIES),
               rng.choice(OPERATIONS), str(ts),
               str(rng.randint(1, 10)), str(rng.randint(1, 4))]
        out.append(",".join(f'"{v}"' for v in rec))
    return out


def browser_records(n: int = 100, seed: int = 42,
                    base_ts_ms: int = 1_700_000_000_000,
                    step_ms: int = 1000) -> list[str]:
    """S5 record lines: (id, user, action, ts_ms) per
    BrowserStreamDataGenerator.java:60-75."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        ts = base_ts_ms + i * step_ms
        rec = [str(i), rng.choice(USERS), rng.choice(ACTIONS), str(ts)]
        out.append(",".join(f'"{v}"' for v in rec))
    return out


def generate_audit_files(out_dir: str, n: int = 100, seed: int = 42,
                         base_ts_ms: int = 1_700_000_000_000,
                         step_ms: int = 1000,
                         records_per_file: int = 1) -> list[str]:
    """S3: write audit-trail CSV files (default one record per file, like the
    reference). Returns the file paths in creation order."""
    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    lines = audit_records(n, seed, base_ts_ms, step_ms)
    paths = []
    for fi in range(0, len(lines), records_per_file):
        p = d / f"audit_{fi // records_per_file:05d}.csv"
        _write(p, lines[fi:fi + records_per_file])
        paths.append(str(p))
    return paths


def generate_browser_files(out_dir: str, n: int = 100, seed: int = 42,
                           base_ts_ms: int = 1_700_000_000_000,
                           step_ms: int = 1000,
                           records_per_file: int = 1) -> list[str]:
    """S5: write browser-event CSV files (one record per file by default)."""
    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    lines = browser_records(n, seed, base_ts_ms, step_ms)
    paths = []
    for fi in range(0, len(lines), records_per_file):
        p = d / f"browser_{fi // records_per_file:05d}.csv"
        _write(p, lines[fi:fi + records_per_file])
        paths.append(str(p))
    return paths


def kafka_producer_records(n: int = 100, seed: int = 42,
                           base_ts_ms: int = 1_700_000_000_000,
                           step_ms: int = 1000) -> list[tuple[str, str]]:
    """S4 (KafkaStreamDataGenerator.java:85-88): (key=ts, value=csv line)
    pairs ready for a Kafka producer — same audit record as S3."""
    lines = audit_records(n, seed, base_ts_ms, step_ms)
    return [(line.split(",")[4].strip('"'), line) for line in lines]
