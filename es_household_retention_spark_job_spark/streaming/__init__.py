"""Structured Streaming surface (beyond-reference; SURVEY §2.9 notes the
reference is strictly batch — this module is the engine's streaming
ingestion + stateful-operator extension, built on the same typed schemas).

Modules:

* ``ingest`` — NDJSON file-source → explicit-schema typed stream → parquet
  append (the streaming twin of sources.json_docs).
* ``windows`` — watermarked tumbling and session windows over the events
  stream (late data dropped deterministically by the watermark).
* ``stateful`` — applyInPandasWithState custom operator (running
  per-household encounter state), the escape hatch for semantics the
  built-in windows can't express.

All tests drive these with ``trigger(availableNow=True)`` over file sources
— the same code path a production continuous stream takes, minus the
long-running trigger."""
