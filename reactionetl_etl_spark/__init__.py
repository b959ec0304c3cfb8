"""reactionetl_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and
data-processing capabilities of the reference ETL pipeline
(`joshvernaz/reactionetl-etl`): scan → validate → clean → conform →
load → enrich → audit, incrementally — plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Design principles (see SURVEY.md §7):
- DataFrame / SQL first; Catalyst + AQE pick physical strategies.
- Broadcast small dimensions; one-pass joins instead of batched loops.
- Columnar parquet at rest; explicit schemas, never inference in prod.
- UDFs only where built-ins can't express semantics; always Arrow/pandas.
"""

__version__ = "0.1.0"
