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
- ``sources``      file-monitor / Kafka stream sources + fixture generators
- ``streaming``    Structured Streaming pipelines, keyed state machines,
                   late-data capture
"""

__version__ = "0.1.0"
