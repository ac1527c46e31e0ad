"""donkey_spark — a PySpark-native fulltext index builder + BM25 query engine.

A brand-new engine (NOT a port) with the capability shape of aaalgo/donkey's
content-based search-engine-generator pipeline (extract → index → match →
rank), re-imagined Spark-first for fulltext retrieval over source-code
corpora, per the binding spec in BASELINE.json (north_rule / input_hint) and
the blueprint in SURVEY.md.

Layout:
    config      — constants (frozen tokenizer/BM25 spec) + SparkSession builder
    kernels/    — pure-numpy index kernels (delta, varint, PForDelta, blocks,
                  BM25, block-max WAND); no Spark imports
    functions/  — tokenizer (Arrow pandas_udf + JVM-expression twin)
    operators/  — DataFrame operators (doc ids, doc_terms, stats, postings)
    sources/    — corpus scan (fixed schema, Iceberg→Parquet fallback),
                  sha256 invariant
    plans/      — the two entry-point pipelines: build_index, topk query
    streaming/  — batch-incremental ingest mapping (Structured Streaming)
"""

__version__ = "0.1.0"
