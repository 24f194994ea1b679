"""PySpark-native analytics engine with the query/data-processing surface of
mattayes/flink-realtime-data-eng (Flink 1.19 DataStream training repo), rebuilt
Spark-first: DataFrame/SQL + Catalyst for relational work, Structured Streaming
for the streaming operators, Pandas UDFs only where built-ins cannot express
the semantics.

Layout
------
- ``session``      SparkSession builders (test + scale profiles)
- ``schemas``      explicit StructTypes + normalizing table loaders
- ``operators``    reference-parity operators (SURVEY.md §2): projections,
                   split/merge, windowed aggregations, joins, stateful analogs
- ``plans``        relational/TPC-H-style benchmark queries
- ``functions``    LLM-data-pipeline extensions: dedup, similarity search,
                   text analysis, multimodal column plumbing
- ``sources``      file-monitor / Kafka stream sources (S1/S2)
- ``sinks``        file / Kafka / console / memory / log sinks (K1-K4) +
                   checkpoint plumbing (ST3)
- ``generators``   deterministic audit/browser CSV fixture writers (S3-S5)
- ``streaming``    Structured Streaming pipelines (A1-A6, J1), keyed state
                   machines via applyInPandasWithState (ST1/ST2), watermarks
                   and late-data capture (W1/W3)
- ``registry``     the driver-contract query/oracle registry
"""

__version__ = "0.1.0"
