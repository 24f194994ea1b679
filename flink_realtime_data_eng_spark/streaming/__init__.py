"""Structured-Streaming forms of the reference pipelines.

- :mod:`pipelines` — windowed aggregations and the stream-stream join
  (streaming A1-A6, J1) plus chapter-2's end-to-end file pipeline.
- :mod:`stateful` — record-at-a-time keyed state machines ST1/ST2 via
  ``applyInPandasWithState``.
- :mod:`watermark` — W1 bounded-out-of-orderness wrapper and the W3
  late-data capture that Spark lacks natively.
"""

from . import pipelines, stateful, watermark  # noqa: F401
