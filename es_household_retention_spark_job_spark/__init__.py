"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference job ``alexlevene/es-household-retention-spark-job``.

The reference (``/root/reference/src/main/scala/HouseholdRetentionProcessing.scala``,
cited below as ``HRP``) is a Scala/Spark-2.1 batch ETL job that computes
monthly household retention history from Elasticsearch documents. This
package re-expresses its full operator surface Spark-first:

- ``sources``   — parquet/JSON readers, explicit schemas, TPC-H derivations
- ``operators`` — retention pipeline, gaps-and-islands, band joins, dedup,
                  similarity search, text analysis, multimodal plumbing
- ``functions`` — date/epoch helpers, hashing/shingling helpers
- ``sinks``     — keyed upsert (merge) parquet writer (HRP:297-302 analog)
- ``plans``     — explain/plan-inspection helpers
- ``streaming`` — Structured Streaming ingestion path (beyond-reference)

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
join strategy, and AQE handles skew/coalescing at scale.
"""

__version__ = "0.1.0"
