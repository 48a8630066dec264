"""ccer — Common-Crawl-scale Entity Resolution engine, PySpark-native.

A from-scratch record-linkage / match-merge engine with the query and
data-processing capabilities of the reference pipeline
(cometadata/reconcile-curation-in-cris-systems), re-expressed Spark-first:

- ``ccer.functions`` — pure deterministic kernels (text normalization,
  Jaro-Winkler / Levenshtein, name parsing, hashing). Usable from pandas
  UDFs and from plain Python in tests — the single-implementation,
  byte-identical invariant surface.
- ``ccer.operators`` — DataFrame → DataFrame operators: blocking,
  candidate-pair generation, vectorized pairwise scoring, connected
  components, dedup family, ANN, text stats, reference-parity linkage.
- ``ccer.sources`` — deterministic synthetic page/reference generators,
  checkpoint catalog (Iceberg when available, parquet fallback).
- ``ccer.plans`` — the staged, resumable pipeline + lineage/counters.
- ``ccer.streaming`` — incremental ingestion via Structured Streaming
  foreachBatch.

Everything is pyspark.sql DataFrame + Arrow-vectorized pandas UDFs; no
RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
