"""Focused tests for the two-stage posting build (stage B1 combiner +
stage B2 vectorized merge) — complements the end-to-end digest/rank tests
with a direct content check against the exploded reference path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from donkey_spark.kernels.blocks import decode_doc_ids, decode_tfs


@pytest.fixture(scope="module")
def feat(spark):
    # hand-built features: doc_id, dl, terms[], tfs[] across 3 ranges
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


def test_two_stage_equals_exploded_reference(spark, feat):
    from donkey_spark.operators.postings import (
        build_partial_postings, build_segments, merge_partials_to_segments)
    rsize, avgdl = 64, 4.0
    partials = build_partial_postings(feat.repartition(3), rsize)
    two = _decode_all(
        merge_partials_to_segments(partials, avgdl, block_size=2).collect())
    dt = (feat.select("doc_id", "dl",
                      F.explode(F.arrays_zip("terms", "tfs")).alias("e"))
          .select("doc_id", "dl", F.col("e.terms").alias("term"),
                  F.col("e.tfs").alias("tf")))
    ref = _decode_all(build_segments(dt, avgdl, rsize,
                                     block_size=2).collect())
    assert two == ref
    # spot-check absolute content
    assert two[("aa", 0)][0] == [0, 1]          # docs 0,1 in range 0
    assert two[("aa", 2)][0] == [131]
    assert two[("bb", 2)][0] == [130]


def test_partial_payloads_round_trip(spark, feat):
    from donkey_spark.operators.postings import build_partial_postings
    parts = build_partial_postings(feat.repartition(2), 64).collect()
    total = 0
    for r in parts:
        ids = decode_doc_ids(bytes(r["docids_blob"]))
        assert list(ids) == sorted(ids)
        assert (ids // 64 == r["salt"]).all()
        assert len(ids) == r["n"]
        total += r["n"]
    assert total == 11                           # total postings above


def test_two_stage_handles_docs_with_no_terms(spark):
    from donkey_spark.operators.postings import (
        build_partial_postings, merge_partials_to_segments)
    feat = spark.createDataFrame(
        [(0, 0, [], []), (1, 2, ["xx"], [2])],
        "doc_id long, dl int, terms array<string>, tfs array<int>")
    seg = merge_partials_to_segments(
        build_partial_postings(feat, 1024), 2.0).collect()
    assert len(seg) == 1 and seg[0]["term"] == "xx"
