"""Vectorized extractor kernel (kernels/exttok.py) — exact-equality tests.

The Arrow extractor must reproduce the frozen §T semantics (tokenize_py +
Counter) token-for-token, including the per-doc cap, length bounds, run
breaks at document boundaries, and the non-ASCII splice path; and a build
with extractor='arrow' must produce a byte-identical index.
"""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from donkey_spark.functions.tokenize import tokenize_py
from donkey_spark.kernels.exttok import extract_doc_features


def _expect(doc, cap=None):
    toks = tokenize_py(doc)
    if cap is not None:
        toks = toks[:cap]
    c = Counter(toks)
    return dict(c), sum(c.values())


def _check_batch(docs, cap=50_000):
    arr = pa.array(docs, pa.utf8())
    terms, tfs, dl = extract_doc_features(arr, cap=cap)
    t_l, f_l = terms.to_pylist(), tfs.to_pylist()
    for i, doc in enumerate(docs):
        want_tf, want_dl = _expect(doc, cap)
        got_tf = dict(zip(t_l[i], f_l[i]))
        assert got_tf == want_tf, f"doc {i}: {doc!r}"
        assert len(t_l[i]) == len(set(t_l[i]))        # unique terms
        assert int(dl[i]) == want_dl, f"dl mismatch doc {i}"


def test_exttok_edge_docs():
    _check_batch([
        "", "   \n\t  ", "(((|||)))==->",
        "x" * 70 + " ok_token",                   # over-long run dropped
        "ab" * 32,                                # exactly 64 chars — kept
        "ab" * 32 + "c",                          # 65 chars — dropped
        "a b c d",                                # all len-1 — dropped
        "def def def return",                     # tf > 1
        "edge_at_end",                            # token touches buffer end
        None,                                     # null → empty
        "UPPER lower MiXeD_case 123 _9",
    ])


def test_exttok_non_ascii_splice():
    # non-ASCII docs must take the reference path (NFC can move boundaries);
    # é NFC-composes to é, splitting the ASCII run
    docs = ["naïve café 日本語 x9",
            "abc déf ghi",                  # NFC: déf → ['abc','ghi']… via reference
            "plain ascii doc",
            "ascii then é accent",
            "Å ring"]                  # Å via combining ring
    _check_batch(docs)


def test_exttok_cap_is_per_doc_and_exact():
    # 30 tokens per doc, cap 8: only the FIRST 8 kept tokens count
    docs = [" ".join(f"t{j}_{j % 3}" for j in range(30)),
            " ".join("dup" for _ in range(30)),
            "aa " * 5]
    _check_batch(docs, cap=8)


def test_exttok_doc_boundary_runs_do_not_merge():
    # adjacent docs whose contents would concatenate into one token run:
    # run breaking at offsets must keep them separate
    docs = ["abc", "def", "", "ghi", "x", "yz"]
    _check_batch(docs)


def test_exttok_sliced_batch():
    # a sliced Arrow array has offset != 0 and a data buffer extending
    # beyond the slice — the kernel must rebase correctly
    arr = pa.array(["aaa bb", "cc dd", "ee ff", "gg hh"], pa.utf8())
    sl = arr.slice(1, 2)
    terms, tfs, dl = extract_doc_features(sl)
    assert terms.to_pylist() == [["cc", "dd"], ["ee", "ff"]]
    assert tfs.to_pylist() == [[1, 1], [1, 1]]
    assert list(dl) == [2, 2]


def test_exttok_random_corpus_matches_reference():
    from fixtures.gen_corpus import gen_corpus
    pdf = gen_corpus(200, seed=7)
    _check_batch(list(pdf["content"]))


def test_build_arrow_extractor_digest_identical(spark, tmp_path_factory):
    """extractor='arrow' must produce the exact same index bytes as the
    default python extractor (BASELINE.md determinism bar)."""
    from fixtures.gen_corpus import gen_corpus
    from donkey_spark.operators.postings import segments_digest
    from donkey_spark.plans.build import build_index

    corpus = spark.createDataFrame(gen_corpus(250, seed=11))
    digests, infos = [], []
    for i, ext in enumerate(("python", "arrow")):
        out = str(tmp_path_factory.mktemp(f"ext{i}"))
        infos.append(build_index(spark, corpus, out, range_size=64,
                                 extractor=ext))
        seg = spark.read.option("basePath", f"{out}/segments").parquet(
            f"{out}/segments")
        digests.append(segments_digest(seg.drop("chunk", "bucket")))
    assert digests[0] == digests[1]
    assert infos[0]["n_postings"] == infos[1]["n_postings"]
    assert infos[0]["avgdl"] == infos[1]["avgdl"]


def test_build_unknown_extractor_raises(spark):
    from donkey_spark.plans.build import build_index
    df = spark.createDataFrame(
        [("r", "p", "c", "py", "x")],
        "repo string, path string, commit string, lang string, "
        "content string")
    with pytest.raises(ValueError, match="unknown extractor"):
        build_index(spark, df, "/tmp/never", extractor="bogus")


def test_exttok_large_utf8_is_downcast_not_misread():
    """large_utf8 has int64 offsets; the byte kernel must downcast (or
    reject), never silently misread them as int32 (review r3)."""
    arr = pa.array(["alpha beta", "gamma delta"], pa.large_utf8())
    terms, tfs, dl = extract_doc_features(arr)
    assert terms.to_pylist() == [["alpha", "beta"], ["gamma", "delta"]]
    assert list(dl) == [2, 2]
    with pytest.raises(TypeError, match="utf8"):
        extract_doc_features(pa.array([1, 2]))


def test_exttok_cap_binds_on_non_ascii_splice_path():
    """A caller-supplied cap must bind in the reference splice path too,
    not only in the ASCII bulk pass (review r3)."""
    docs = ["alpha beta gamma delta epsilon",
            "é alpha beta gamma delta epsilon"]
    _check_batch(docs, cap=2)


def test_exttok_splice_preserves_surrounding_rows():
    """The O(exotic) Arrow slice+concat splice must leave every ASCII
    row's lists intact around patched rows at the edges and interior."""
    docs = ["é first", "aa bb", "é mid", "cc dd", "é last"]
    _check_batch(docs)
    docs2 = ["aa bb", "é x9", "cc dd"]
    _check_batch(docs2)


def test_scratch_pool_no_cross_batch_aliasing():
    """r5: the kernel's scratch-buffer reuse must never leak into RETURNED
    arrays — results from batch 1 must be bit-identical after batch 2
    overwrites the pool (zero-copy py_buffer wraps would alias)."""
    from donkey_spark.kernels.exttok import extract_doc_features
    import pyarrow as pa
    b1 = pa.array(["def foo(): return alpha_beta + 1",
                   "class Bar: pass", "x y zz a_longer_token"] * 50)
    b2 = pa.array(["completely different content here qq",
                   "other words entirely seven eight"] * 80)
    t1, f1, d1 = extract_doc_features(b1)
    snap_t = t1.to_pylist()
    snap_f = f1.to_pylist()
    snap_d = d1.tolist()
    extract_doc_features(b2)            # overwrites every scratch buffer
    assert t1.to_pylist() == snap_t
    assert f1.to_pylist() == snap_f
    assert d1.tolist() == snap_d
