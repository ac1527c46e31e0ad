"""Iceberg source seam (sources/corpus.scan_corpus) — interface-level
coverage for the branch this image cannot execute for real (the
iceberg-spark-runtime jars are absent; SURVEY §7.4.4).

Three layers:
* the no-jars failure mode is CLEAN (actionable RuntimeError, not a
  py4j stack bomb) — runs always;
* the branch's schema contract (fixed column set/types, drift refused)
  via a mocked catalog reader — runs always;
* a real-catalog smoke test — skipped unless DONKEY_ICEBERG_TEST=1 and
  the session actually has the Iceberg runtime, i.e. launched like
      spark-submit --packages \
        org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> ...
  (on this image the import-fail path is what executes, by design).
"""

import os

import pytest

from donkey_spark.sources.corpus import CORPUS_SCHEMA, scan_corpus


def test_iceberg_branch_fails_cleanly_without_jars(spark):
    """No runtime jars: a table identifier must fail with the actionable
    message, not a raw py4j error."""
    with pytest.raises(RuntimeError, match="Iceberg table .* unreadable"):
        scan_corpus(spark, "catalog.db.corpus_files")


class _FakeIcebergReader:
    def __init__(self, df):
        self._df = df

    def load(self, location):
        return self._df


@pytest.fixture
def mock_iceberg(spark, monkeypatch):
    """Route spark.read.format('iceberg').load(...) to a canned DataFrame
    (the catalog mock); every other format passes through untouched."""
    reader_cls = type(spark.read)
    orig = reader_cls.format
    holder = {}

    def fake_format(self, fmt):
        if fmt == "iceberg":
            return _FakeIcebergReader(holder["df"])
        return orig(self, fmt)

    monkeypatch.setattr(reader_cls, "format", fake_format)
    return holder


def test_iceberg_branch_schema_contract(spark, mock_iceberg):
    """A conforming catalog table flows through the same frozen-schema
    projection as the parquet path (extra columns pruned, order fixed)."""
    rows = [("r1", "a.py", "c" * 40, "py", "def f(): pass", 9)]
    mock_iceberg["df"] = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, snapshot_extra int")
    got = scan_corpus(spark, "catalog.db.corpus_files")
    assert got.columns == [f.name for f in CORPUS_SCHEMA.fields]
    assert got.collect()[0]["content"] == "def f(): pass"


def test_iceberg_branch_refuses_schema_drift(spark, mock_iceberg):
    mock_iceberg["df"] = spark.createDataFrame(
        [("r1", "a.py", 7, "py", "x")],
        "repo string, path string, commit int, lang string, content string")
    with pytest.raises(ValueError, match="schema drift on column 'commit'"):
        scan_corpus(spark, "catalog.db.corpus_files")
    mock_iceberg["df"] = spark.createDataFrame(
        [("r1", "a.py", "py", "x")],
        "repo string, path string, lang string, content string")
    with pytest.raises(ValueError, match="schema drift on column 'commit'"):
        scan_corpus(spark, "catalog.db.corpus_files")


@pytest.mark.skipif(os.environ.get("DONKEY_ICEBERG_TEST") != "1",
                    reason="needs a session launched with the Iceberg "
                           "runtime (--packages) and a live catalog; set "
                           "DONKEY_ICEBERG_TEST=1 there")
def test_iceberg_real_catalog_roundtrip(spark, tmp_path):
    """Real-runtime smoke (cluster deployments): create a hadoop-catalog
    table with the corpus schema, write one row, scan it back through
    scan_corpus."""
    spark.conf.set("spark.sql.catalog.dk",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.dk.type", "hadoop")
    spark.conf.set("spark.sql.catalog.dk.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE TABLE dk.db.corpus_files (repo string, path string, "
              "commit string, lang string, content string) USING iceberg")
    spark.sql("INSERT INTO dk.db.corpus_files VALUES "
              "('r1', 'a.py', 'c1', 'py', 'def f(): pass')")
    got = scan_corpus(spark, "dk.db.corpus_files")
    assert got.count() == 1
