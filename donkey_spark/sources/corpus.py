"""Corpus source — ops 1/2 (SURVEY §2.1).

Donkey ingests raw content through its `insert` RPC and re-verifies the
journal on replay `[donkey:src/donkey.cpp — unverified, SURVEY §0]`; here the
source is a table with the BASELINE.json input_hint schema
(repo, path, commit, lang, content), Iceberg first with a Parquet fallback
(Iceberg jars are absent in this image — SURVEY §7.4.4), plus the per-row
sha256(content) invariant, computed JVM-side (F.sha2 — no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
])


def scan_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read the corpus table with the fixed schema; fail on drift.

    `location` is either an Iceberg table identifier (catalog.db.tbl) or a
    Parquet path. Iceberg gives hidden partitioning + snapshot reads on a
    real cluster (`--packages org.apache.iceberg:iceberg-spark-runtime-...`);
    the Parquet fallback keeps the identical table contract offline.
    """
    if "/" not in location:
        try:
            df = spark.read.format("iceberg").load(location)
        except Exception as exc:  # jars absent in this image
            raise RuntimeError(
                f"Iceberg table {location!r} unreadable (runtime jars "
                "missing?); pass a parquet path instead") from exc
    else:
        df = spark.read.schema(CORPUS_SCHEMA).parquet(location)
    got = {f.name: f.dataType for f in df.schema.fields}
    for f in CORPUS_SCHEMA.fields:
        if f.name not in got or got[f.name] != f.dataType:
            raise ValueError(f"corpus schema drift on column {f.name!r}: "
                             f"{got.get(f.name)}")
    return df.select([f.name for f in CORPUS_SCHEMA.fields])


QUERIES_SCHEMA = T.StructType([
    T.StructField("query_id", T.IntegerType(), False),
    T.StructField("query", T.StringType(), False),
    T.StructField("k", T.IntegerType(), False),
])


def scan_queries(spark: SparkSession, location: str) -> DataFrame:
    """Op 6 — read the §Q query table (query_id, query, k) with the frozen
    schema; fail on drift (the query-set twin of scan_corpus)."""
    df = spark.read.schema(QUERIES_SCHEMA).parquet(location)
    got = {f.name: f.dataType for f in df.schema.fields}
    for f in QUERIES_SCHEMA.fields:
        if f.name not in got or got[f.name] != f.dataType:
            raise ValueError(f"query-set schema drift on column {f.name!r}: "
                             f"{got.get(f.name)}")
    return df.select([f.name for f in QUERIES_SCHEMA.fields])


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: the driver's documents.parquet (doc_id,text,lang,...) viewed
    as a corpus_files table (TESTDATA.md / FIXTURES.md §5). The synthetic
    commit is a function of doc_id so the PK stays deterministic."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"))


def check_sha256(corpus: DataFrame, ref_hashes: DataFrame,
                 raise_on_mismatch: bool = True) -> int:
    """Op 2 — per-row invariant sha256(content) == reference hash.

    Join on the logical PK; count mismatches AND rows missing from either
    side. JVM-side hash, sort-merge join at corpus scale (op 31)."""
    hashed = corpus.select("repo", "path", "commit",
                           F.sha2(F.col("content"), 256).alias("_h"))
    joined = hashed.join(ref_hashes, ["repo", "path", "commit"], "full_outer")
    bad = joined.where(
        F.col("_h").isNull() | F.col("sha256").isNull()
        | (F.col("_h") != F.col("sha256"))).count()
    if bad and raise_on_mismatch:
        raise ValueError(f"sha256 invariant violated on {bad} rows")
    return bad
