"""Reference-parity operators (SURVEY.md §2), Spark-first.

Each module maps a family of reference constructs to declarative DataFrame
plans — Catalyst supplies the physical strategy (pushdown, partial aggs,
broadcast/SMJ selection, AQE skew handling); nothing here hand-schedules.
"""

from . import (bucketing, funnel, joins, projections, ranking, rollup, skew,  # noqa: F401
               split_merge, stateful, stats, windows)
