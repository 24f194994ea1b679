"""Streaming observability: capture per-micro-batch progress into rows.

Production streaming jobs are operated from their progress metrics
(rows/sec, batch durations, state size, watermark lag) — Flink exposes
these through its metrics registry and web UI; Structured Streaming
reports them as per-batch progress JSON. :class:`ProgressCapture` is a
``StreamingQueryListener`` that folds each progress event into a list
the driver can turn into a DataFrame and write to a metrics table —
the ops feed for dashboards and SLO alerts.

Input-row counts and batch ids are deterministic; durations/rates are
wall-clock (asserted only for presence in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = ("query_id string, run_id string, batch_id long, "
                   "num_input_rows long, duration_ms long, "
                   "watermark string, state_rows long")


class ProgressCapture(StreamingQueryListener):
    """Collect one row per micro-batch from every query on the session.

    Register with ``spark.streams.addListener(cap)``; call
    :meth:`to_df` after the run (and ``removeListener`` when done).
    The listener runs on the driver's listener bus — keep the handler
    allocation-light (it appends one small dict per batch).
    """

    def __init__(self) -> None:
        self.rows: list[dict] = []

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = 0
        for s in (p.stateOperators or []):
            try:
                state_rows += int(s.numRowsTotal)
            except Exception:
                pass
        self.rows.append({
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": int(p.batchId),
            "num_input_rows": int(p.numInputRows),
            "duration_ms": int(p.durationMs.get("triggerExecution", 0)
                               if p.durationMs else 0),
            "watermark": (p.eventTime or {}).get("watermark", ""),
            "state_rows": state_rows,
        })

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # ---------------------------------------------------------------------
    def to_df(self, spark: SparkSession) -> DataFrame:
        """The captured progress as a DataFrame (write it to the metrics
        table of your choice)."""
        if not self.rows:
            return spark.createDataFrame([], PROGRESS_SCHEMA)
        return spark.createDataFrame(self.rows, PROGRESS_SCHEMA)
