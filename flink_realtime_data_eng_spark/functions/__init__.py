"""LLM-training-data pipeline functions (SURVEY §2.9 extension operators).

All hot paths are JVM-side expressions (split/regexp/md5/higher-order array
functions) — no Python in the per-row path; the only Pandas-UDF usage is the
multimodal decode plumbing where binary payloads genuinely need user code.
"""

from . import (contamination, dedup, filtering, graph,  # noqa: F401
               multimodal, packing, pii, similarity, sketches, text)
