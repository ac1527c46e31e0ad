"""On-disk index format guards (meta version + dictionary layout).

r3 changed the dictionary to per-chunk partials (dictionary/chunk=<c>/
bucket=<b>); these tests pin the r4 ADVICE fixes: writers fail fast
instead of mixing chunk=* partials into a pre-chunked (flat bucket=*)
dictionary root, meta records the format version, and readers refuse
a version from the future.
"""

import os
import shutil

import pytest

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def fmt_index(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    out = str(tmp_path_factory.mktemp("fmtidx"))
    corpus = spark.createDataFrame(gen_corpus(60, seed=7))
    build_index(spark, corpus, out, range_size=64)
    return out, corpus


def _flatten_dictionary(out: str) -> None:
    """Rewrite the dictionary dir into the pre-r3 flat bucket=* layout."""
    droot = f"{out}/dictionary"
    chunk = f"{droot}/chunk=batch"
    assert os.path.isdir(chunk)
    tmp = f"{out}/_flat_dict"
    shutil.move(chunk, tmp)
    shutil.rmtree(droot)
    shutil.move(tmp, droot)
    assert any(n.startswith("bucket=") for n in os.listdir(droot))


def test_meta_version_written_and_future_rejected(spark, fmt_index):
    from donkey_spark.config import META_VERSION
    from donkey_spark.plans.positions import POSITIONS_VERSION
    from donkey_spark.plans.query import Index
    out, _ = fmt_index
    m = spark.read.parquet(f"{out}/meta").collect()[0]
    # non-positional builds keep writing the base version (r5: version 3
    # is reserved for indexes carrying the positions side table)
    assert int(m["version"]) == META_VERSION
    # a future format version must fail fast, not misread silently
    rows = [tuple(m)]
    rows[0] = (POSITIONS_VERSION + 1,) + tuple(m)[1:]
    (spark.createDataFrame(rows, spark.read.parquet(f"{out}/meta").schema)
     .coalesce(1).write.mode("overwrite").parquet(f"{out}/meta"))
    with pytest.raises(ValueError, match="format version"):
        Index(spark, out)
    # restore for other tests in the module
    (spark.createDataFrame([tuple(m)],
                           spark.read.parquet(f"{out}/meta").schema)
     .coalesce(1).write.mode("overwrite").parquet(f"{out}/meta"))
    Index(spark, out)


def test_resume_refuses_flat_dictionary_layout(spark, fmt_index, tmp_path):
    """resume=True over a pre-chunked dictionary fails fast (writing
    chunk=* partials beside bucket=* dirs would break Hive discovery)."""
    from donkey_spark.plans.build import build_index
    out, corpus = fmt_index
    copy = str(tmp_path / "flat")
    shutil.copytree(out, copy)
    _flatten_dictionary(copy)
    with pytest.raises(ValueError, match="flat bucket"):
        build_index(spark, corpus, copy, range_size=64, resume=True)
    # a FRESH build migrates: the cleanup rewrites the dictionary in the
    # current chunked layout
    build_index(spark, corpus, copy, range_size=64)
    assert any(n.startswith("chunk=")
               for n in os.listdir(f"{copy}/dictionary"))


def test_stream_epoch_refuses_flat_dictionary_layout(spark, fmt_index,
                                                     tmp_path):
    from donkey_spark.streaming.ingest import _append_epoch
    out, corpus = fmt_index
    copy = str(tmp_path / "flatstream")
    shutil.copytree(out, copy)
    _flatten_dictionary(copy)
    with pytest.raises(ValueError, match="flat bucket"):
        _append_epoch(corpus.limit(5), 0, copy, "varint", 128)
