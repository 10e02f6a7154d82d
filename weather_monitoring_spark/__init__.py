"""weather_monitoring_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of the reference system
``MuhammedAdelTaha/Weather-Monitoring`` (a Kafka + Kafka-Streams + BitCask +
Parquet + Elasticsearch IoT telemetry pipeline) as one idiomatic PySpark
engine:

- Structured Streaming ingest (Kafka / file / rate / synthetic generator)
  -> normalized canonical schema -> partitioned Snappy Parquet archive.
- Latest-per-key serving view (the reference's BitCask KV semantics,
  tightened to deterministic max-by-sequence; SURVEY.md §1.4).
- Idempotent bulk-index sink shape (the reference's Elasticsearch path),
  written executor-side via ``foreachBatch``.
- A declared batch query surface (SURVEY.md §2.8 Q1-Q12) checked against a
  DuckDB oracle.
- Scale extensions: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  embedding similarity search, text analysis, multimodal column plumbing.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
partial aggregation and join selection; Python UDFs appear only where the
built-in operators genuinely cannot express the semantics (and then as
Arrow-vectorized pandas UDFs).
"""

__version__ = "0.1.0"
