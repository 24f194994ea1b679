"""Reference-parity operators (SURVEY.md §2), Spark-first.

Each module maps a family of reference constructs to declarative DataFrame
plans — Catalyst supplies the physical strategy (pushdown, partial aggs,
broadcast/SMJ selection, AQE skew handling); nothing here hand-schedules.
"""

from . import (joins, projections, ranking, rollup, skew, split_merge,  # noqa: F401
               stateful, stats, windows)
