"""Index introspection (plans/info.py): the report must reflect every
writer's state — build, facets, upsert, backfill, deletes — without
touching postings."""

import pytest
from pyspark.sql import functions as F

from fixtures.gen_corpus import gen_corpus


def test_index_info_reflects_all_writers(spark, tmp_path):
    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.info import index_info
    from donkey_spark.plans.upsert import upsert_docs
    pdf = gen_corpus(100, seed=53)
    out = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64,
                facets=("lang",), positions=True)

    info = index_info(spark, out)
    assert info["n_docs"] == 100
    assert info["version"] == 3 and info["positions"]
    assert info["facets"] == ["lang"]
    assert info["n_tombstones"] == 0
    for tbl in ("docs", "segments", "dictionary", "positions"):
        assert info["tables"][tbl]["bytes"] > 0
        assert info["tables"][tbl]["files"] > 0
    assert "journal" not in info            # no epochs yet

    # one upsert + one facet backfill + one delete
    newv = pdf.iloc[:5].copy()
    newv["commit"] = "i" + newv["commit"].str.slice(1)
    newv["content"] = newv["content"] + " info_marker"
    upsert_docs(spark, out, spark.createDataFrame(newv))
    docs = spark.read.parquet(f"{out}/docs")
    add_facet(spark, out, "parity", values=docs.select(
        "doc_id", (F.col("doc_id") % 2).cast("string").alias("value")))
    # delete two docs DISJOINT from the upsert's replaced keys, so the
    # tombstone count is exactly 5 (old versions) + 2
    delete_docs(spark, out, spark.createDataFrame(
        pdf.iloc[50:52][["repo", "path", "commit"]]))

    info = index_info(spark, out)
    assert info["n_docs"] == 105
    assert info["facets"] == ["lang", "parity"]
    assert info["journal"] == {"stream_epochs": 0, "upserts": 1,
                               "facet_backfills": 1}
    assert info["n_tombstones"] == 5 + 2    # upsert's old versions + ids
    assert info["tables"]["docs"]["n_chunks"] == 2       # batch + u1
    active = info["dictionary_chunks"]["active"]
    assert "u1" in active and "facet_parity" in active

    with pytest.raises(ValueError, match="not an index"):
        index_info(spark, str(tmp_path / "nope"))
