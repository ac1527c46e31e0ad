"""r6 focused tests: bucket-hash partitioning of the small-merge regime
(operators/postings.merge_partials_to_segments(bucket_partition=True)).

The optimization round switched small merges from hash(term, salt) — 1-2
fat tasks, each writing every bucket dir — to hash(bucket(term)): up to
n_buckets parallel tasks, exactly one file per bucket dir. These tests pin
(a) content equality between the two partitionings and (b) the one-file-
per-bucket layout of a small build.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from donkey_spark.kernels.blocks import decode_doc_ids, decode_tfs


@pytest.fixture(scope="module")
def feat(spark):
    rows = [
        (0, 5, ["aa", "bb"], [3, 2]),
        (1, 4, ["aa"], [4]),
        (70, 2, ["aa", "cc"], [1, 1]),
        (130, 7, ["bb", "cc"], [5, 2]),
        (131, 1, ["aa"], [1]),
        (199, 3, ["aa", "bb", "cc"], [1, 1, 1]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, dl int, terms array<string>, tfs array<int>")


def _decode_all(seg_rows, codec="varint"):
    out = {}
    for r in sorted(seg_rows, key=lambda r: (r["term"], r["salt"],
                                             r["block_id"])):
        key = (r["term"], r["salt"])
        ids = decode_doc_ids(bytes(r["docids_blob"]), codec)
        tfs = decode_tfs(bytes(r["tfs_blob"]), codec)
        dls = decode_tfs(bytes(r["dls_blob"]), codec)
        prev = out.setdefault(key, ([], [], []))
        prev[0].extend(ids.tolist())
        prev[1].extend(tfs.tolist())
        prev[2].extend(dls.tolist())
    return out


def test_bucket_partition_content_equals_term_salt(spark, feat):
    from donkey_spark.operators.postings import (
        build_partial_postings, merge_partials_to_segments)
    rsize, avgdl = 64, 4.0
    partials = build_partial_postings(feat.repartition(3), rsize)
    by_term_salt = _decode_all(
        merge_partials_to_segments(partials, avgdl, block_size=2,
                                   num_partitions=4,
                                   bucket_partition=False).collect())
    by_bucket = _decode_all(
        merge_partials_to_segments(partials, avgdl, block_size=2,
                                   num_partitions=4,
                                   bucket_partition=True).collect())
    assert by_bucket == by_term_salt


def test_small_build_writes_one_file_per_bucket(spark, tmp_path):
    from donkey_spark.plans.build import build_index
    rows = [(f"r{i % 3}", f"p/{i}", "c0", "py",
             f"alpha beta tok{i % 11} gamma{i % 5}") for i in range(200)]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    out = str(tmp_path / "idx")
    info = build_index(spark, corpus, out)
    assert info["n_docs"] == 200
    bucket_dirs = glob.glob(f"{out}/segments/chunk=0/bucket=*")
    assert bucket_dirs, "no bucket dirs written"
    for d in bucket_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"
