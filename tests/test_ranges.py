"""Numeric range facets (§2.14 T25 — operators/ranges.py): trie
decomposition exactness, build/query tag parity, end-to-end filter
semantics vs brute force, composition with equality facets / bool
mode / tombstones, streaming-epoch parity, and the ANN range form."""

import random

import pytest
from pyspark.sql import functions as F

from donkey_spark.operators.facets import normalize_filter_spec
from donkey_spark.operators.ranges import (RANGE_STEP, append_range_terms,
                                           decompose_range,
                                           range_query_tags, sortable_long,
                                           value_tags)


# ---------------------------------------------------------------- trie math

def test_decompose_exactness_fuzz():
    """v in [lo, hi]  <=>  one of v's indexed tags is a query node tag —
    the single property that makes the filter correct; fuzzed across
    spans from 10 to 2^62 including negatives and the int64 edges."""
    rng = random.Random(42)
    cases = []
    for _ in range(1500):
        span = rng.choice([3, 50, 10**4, 10**9, 10**15, 1 << 61])
        lo = rng.randint(-span, span)
        cases.append((lo, lo + rng.randint(0, span)))
    cases += [(-(1 << 63), (1 << 63) - 1), (-(1 << 63), -(1 << 63)),
              ((1 << 63) - 1, (1 << 63) - 1), (0, 0), (-1, 1)]
    for lo, hi in cases:
        qt = set(range_query_tags("c", lo, hi))
        probes = {lo - 2, lo - 1, lo, lo + 1, (lo + hi) // 2,
                  hi - 1, hi, hi + 1,
                  random.randint(-(1 << 62), 1 << 62)}
        for v in probes:
            if not -(1 << 63) <= v < (1 << 63):
                continue
            hit = bool(qt & set(value_tags("c", v)))
            assert hit == (lo <= v <= hi), (lo, hi, v)


def test_decompose_disjoint_and_complete():
    rng = random.Random(7)
    for _ in range(300):
        lo = rng.randint(-500, 500)
        hi = lo + rng.randint(0, 1000)
        nodes = decompose_range(lo, hi)
        covered = sum((p_hi - p_lo + 1) << sh for sh, p_lo, p_hi in nodes)
        assert covered == hi - lo + 1          # disjoint + complete
    assert decompose_range(5, 4) == []


def test_node_count_bounded():
    """The Schindler–Diepenbroek bound: ≤ ~2·(2^step−1) nodes per level
    — never cardinality-dependent. 600 random wide ranges stay under
    the step-4/64-bit worst case."""
    rng = random.Random(3)
    worst = 0
    for _ in range(600):
        a = rng.randint(-(1 << 62), 1 << 62)
        b = rng.randint(-(1 << 62), 1 << 62)
        lo, hi = min(a, b), max(a, b)
        n = len(range_query_tags("c", lo, hi))
        worst = max(worst, n)
    bound = 2 * ((1 << RANGE_STEP) - 1) * (64 // RANGE_STEP - 1) \
        + (1 << RANGE_STEP)
    assert worst <= bound, (worst, bound)


def test_sortable_order_preserving():
    vals = sorted([-(1 << 63), -17, -1, 0, 1, 42, (1 << 63) - 1])
    mapped = [sortable_long(v) for v in vals]
    assert mapped == sorted(mapped)


def test_open_ends_and_spec_grammar():
    assert range_query_tags("c", None, None)           # full range
    assert normalize_filter_spec("c", {"range": [1, 2]}) == ("range", [1, 2])
    assert normalize_filter_spec("c", {"range": [None, 5]}) \
        == ("range", [None, 5])
    assert normalize_filter_spec("c", {"not": {"range": [1, 2]}}) \
        == ("not_range", [1, 2])
    # int64 edges are legal; anything beyond would wrap through
    # sortable_long into a silently-wrong trie node set (r5 review)
    assert normalize_filter_spec(
        "c", {"range": [-(1 << 63), (1 << 63) - 1]}) \
        == ("range", [-(1 << 63), (1 << 63) - 1])
    for bad in [{"range": [2, 1]}, {"range": [1.5, 2]}, {"range": [1]},
                {"range": [True, 2]}, {"not": {"rng": [1, 2]}},
                {"range": "x"},
                {"range": [0, 1 << 63]}, {"range": [-(1 << 63) - 1, 0]},
                {"not": {"range": [0, 1 << 70]}}]:
        with pytest.raises(ValueError):
            normalize_filter_spec("c", bad)


def test_spark_expression_matches_python_tags(spark):
    """append_range_terms (JVM hex/shift/xor expressions) must emit
    EXACTLY value_tags' strings — the build/query contract. Probes the
    int64 edges, both signs, and zero."""
    vals = [-(1 << 63), -(1 << 40) - 7, -255, -1, 0, 1, 16, 255,
            (1 << 40) + 3, (1 << 63) - 1, None]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    terms, tfs = append_range_terms(
        F.expr("cast(array() as array<string>)"),
        F.expr("cast(array() as array<int>)"), ("v",))
    got = df.select("v", terms.alias("terms"), tfs.alias("tfs")).collect()
    for r in got:
        if r.v is None:
            assert r.terms == [] and r.tfs == []
        else:
            assert r.terms == value_tags("v", r.v), r.v
            assert r.tfs == [1] * (64 // RANGE_STEP)


# ------------------------------------------------------------- end to end

QUERY = "table scan"


@pytest.fixture(scope="module")
def ridx(spark, tmp_path_factory):
    """A range-faceted index over sf0.001 documents with n_chars =
    length(content), plus the brute-force (key -> n_chars) truth."""
    from donkey_spark.plans import Index, build_index
    from donkey_spark.sources import documents_as_corpus
    out = str(tmp_path_factory.mktemp("rng") / "idx")
    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001") \
        .withColumn("n_chars", F.length("content"))
    build_index(spark, corpus, out, facets=("lang",),
                range_facets=("n_chars",))
    truth = {(r.repo, r.path): r.nc for r in corpus.select(
        "repo", "path", F.col("n_chars").alias("nc")).collect()}
    return Index(spark, out), truth


def _keys(rows):
    return {(r[4], r[5]) for r in rows}


def test_range_filter_vs_bruteforce(ridx):
    idx, truth = ridx
    base = idx.search_rows([(0, QUERY, 500)])
    for lo, hi in [(200, 400), (None, 250), (300, None), (0, 10**9)]:
        got = idx.search_rows([(0, QUERY, 500)],
                              filters={"n_chars": {"range": [lo, hi]}})
        want = {k for k in _keys(base)
                if (lo is None or truth[k] >= lo)
                and (hi is None or truth[k] <= hi)}
        assert _keys(got) == want, (lo, hi)
        # scores unchanged for survivors (filters constrain, never score)
        bs = {(r[4], r[5]): r[3] for r in base}
        assert all(bs[(r[4], r[5])] == r[3] for r in got)


def test_not_range_is_complement(ridx):
    idx, truth = ridx
    base = idx.search_rows([(0, QUERY, 500)])
    got = idx.search_rows(
        [(0, QUERY, 500)],
        filters={"n_chars": {"not": {"range": [200, 400]}}})
    want = {k for k in _keys(base) if not 200 <= truth[k] <= 400}
    assert _keys(got) == want


def test_full_range_equals_unfiltered(ridx):
    idx, _ = ridx
    assert idx.search_rows([(0, QUERY, 50)],
                           filters={"n_chars": {"range": [None, None]}}) \
        == idx.search_rows([(0, QUERY, 50)])


def test_empty_value_region_returns_empty(ridx):
    idx, _ = ridx
    assert idx.search_rows([(0, QUERY, 10)],
                           filters={"n_chars": {"range": [10**12,
                                                          10**12 + 5]}}) \
        == []


def test_compose_with_equality_facet_and_bool(ridx, spark):
    idx, truth = ridx
    langs = sorted({r.lang for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("lang").distinct().collect()})[:2]
    rng_only = idx.search_rows([(0, QUERY, 500)],
                               filters={"n_chars": {"range": [150, 450]}})
    got = idx.search_rows(
        [(0, QUERY, 500)],
        filters={"n_chars": {"range": [150, 450]}, "lang": langs})
    assert _keys(got) < _keys(rng_only)   # strictly narrower AND
    assert got                            # and non-empty
    # bool mode composes with a range filter through the same mask
    rows = idx.search_rows_bool(
        [(0, "table AND NOT merge", 500)],
        filters={"n_chars": {"range": [150, 450]}})
    assert rows
    for r in rows:
        assert 150 <= truth[(r[4], r[5])] <= 450


def test_range_filter_with_tombstones(ridx, spark, tmp_path):
    """Deleted docs stay invisible under range filters (mask AND)."""
    import shutil

    from donkey_spark.plans import Index
    from donkey_spark.plans.delete import delete_docs
    src = ridx[0]
    dst = str(tmp_path / "delidx")
    shutil.copytree(src._local_dir, dst)
    idx = Index(spark, dst)
    rows = idx.search_rows([(0, QUERY, 500)],
                           filters={"n_chars": {"range": [100, 500]}})
    victim = rows[0]
    delete_docs(spark, dst, [victim[2]])
    idx2 = Index(spark, dst)
    after = idx2.search_rows([(0, QUERY, 500)],
                             filters={"n_chars": {"range": [100, 500]}})
    assert victim[2] not in {r[2] for r in after}
    assert _keys(after) == _keys(rows) - {(victim[4], victim[5])}


def test_streaming_epoch_indexes_range_tags(spark, tmp_path):
    """Docs ingested through stream epochs are range-filterable exactly
    like batch docs (meta carries range_facets across the stream)."""
    from donkey_spark.config import BLOCK_SIZE
    from donkey_spark.plans import Index, build_index
    from donkey_spark.sources import documents_as_corpus
    from donkey_spark.streaming.ingest import _append_epoch
    out = str(tmp_path / "sidx")
    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001") \
        .withColumn("n_chars", F.length("content"))
    head = corpus.where(F.col("path") < "doc/3")
    tail = corpus.where(F.col("path") >= "doc/3").limit(40)
    build_index(spark, head, out, range_facets=("n_chars",))
    _append_epoch(tail, 1, out, "varint", BLOCK_SIZE)
    idx = Index(spark, out)
    truth = {(r.repo, r.path): r.nc for r in corpus.select(
        "repo", "path", F.col("n_chars").alias("nc")).collect()}
    got = idx.search_rows([(0, QUERY, 500)],
                          filters={"n_chars": {"range": [200, 400]}})
    base = idx.search_rows([(0, QUERY, 500)])
    assert _keys(got) == {k for k in _keys(base)
                          if 200 <= truth[k] <= 400}
    # epoch docs specifically are present on both sides of the bound
    assert any(p >= "doc/3" for _, p in _keys(base))


def test_ann_range_filter(spark):
    """The ANN surface accepts the same range spec as a BETWEEN over
    denormalized meta columns (shared normalize_filter_spec)."""
    from donkey_spark.pipeline.similarity import cosine_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = emb.where(F.col("vec_id") == 0).select("embedding") \
        .collect()[0][0]
    got = cosine_topk(emb, probe, k=5, id_col="vec_id",
                      vec_col="embedding",
                      filters={"label": {"range": [1, 3]}}).collect()
    # range [1,3] ≡ membership [1,2,3] on an int column — same rows
    want = cosine_topk(emb, probe, k=5, id_col="vec_id",
                       vec_col="embedding",
                       filters={"label": [1, 2, 3]}).collect()
    assert got and got == want
    ok = {r.vec_id for r in emb.where("label between 1 and 3")
          .select("vec_id").collect()}
    assert all(r.vec_id in ok for r in got)


def test_error_forms(ridx):
    idx, _ = ridx
    with pytest.raises(ValueError, match="range facet"):
        idx.search_rows([(0, QUERY, 5)], filters={"n_chars": [200]})
    with pytest.raises(ValueError, match="equality facet"):
        idx.search_rows([(0, QUERY, 5)],
                        filters={"lang": {"range": [1, 2]}})
    with pytest.raises(ValueError, match="no facet"):
        idx.search_rows([(0, QUERY, 5)],
                        filters={"nope": {"range": [1, 2]}})


# ------------------------------------------------------ binned histograms

def _bin(v: int, shift: int) -> tuple[int, int]:
    lo = ((((v + (1 << 63)) & ((1 << 64) - 1)) >> shift) << shift) \
        - (1 << 63)
    return lo, lo + (1 << shift) - 1


def test_range_counts_vs_bruteforce(ridx):
    """Level-``shift`` tag counts ARE the 2^shift-wide value histogram
    of the match set — checked against python binning of the truth."""
    from collections import Counter

    from donkey_spark.plans.facet_counts import range_counts
    idx, truth = ridx
    base = _keys(idx.search_rows([(0, QUERY, 500)]))
    for shift in (0, 8, 12):
        got = {(r.bin_lo, r.bin_hi): r.n_docs
               for r in range_counts(idx, QUERY, "n_chars",
                                     shift).collect()}
        want = Counter(_bin(truth[k], shift) for k in base)
        assert got == dict(want), shift


def test_range_counts_filters_compose(ridx, spark):
    """Equality and range filters constrain the binned counts through
    the same shared spec compilation the scorer uses."""
    from collections import Counter

    from donkey_spark.plans.facet_counts import range_counts
    idx, truth = ridx
    langs = {r.repo + "\x00" + r.path: r.lang
             for r in spark.read.parquet(
                 "/root/testdata/sf0.001/documents.parquet")
             .select(F.col("source").alias("repo"),
                     F.concat(F.lit("doc/"), F.col("doc_id"))
                     .alias("path"), "lang").collect()}
    base = _keys(idx.search_rows([(0, QUERY, 500)]))
    l0 = sorted(set(langs.values()))[0]
    got = {(r.bin_lo, r.bin_hi): r.n_docs
           for r in range_counts(
               idx, QUERY, "n_chars", 8,
               filters={"lang": l0,
                        "n_chars": {"range": [150, 450]}}).collect()}
    want = Counter(_bin(truth[k], 8) for k in base
                   if langs[k[0] + "\x00" + k[1]] == l0
                   and 150 <= truth[k] <= 450)
    assert got == dict(want) and got


def test_facet_counts_under_range_filter(ridx, spark):
    """facet_counts accepts the SAME range spec search does (the r5
    composition gap): the lang histogram under an n_chars range filter
    matches brute force."""
    from collections import Counter

    from donkey_spark.plans.facet_counts import facet_counts
    idx, truth = ridx
    langs = {r.repo + "\x00" + r.path: r.lang
             for r in spark.read.parquet(
                 "/root/testdata/sf0.001/documents.parquet")
             .select(F.col("source").alias("repo"),
                     F.concat(F.lit("doc/"), F.col("doc_id"))
                     .alias("path"), "lang").collect()}
    base = _keys(idx.search_rows([(0, QUERY, 500)]))
    got = {r.value: r.n_docs for r in facet_counts(
        idx, QUERY, "lang",
        filters={"n_chars": {"range": [200, 400]}}).collect()}
    want = Counter(langs[k[0] + "\x00" + k[1]] for k in base
                   if 200 <= truth[k] <= 400)
    assert got == dict(want) and got
    # negated range = the complement partition of the unfiltered counts
    got_not = {r.value: r.n_docs for r in facet_counts(
        idx, QUERY, "lang",
        filters={"n_chars": {"not": {"range": [200, 400]}}}).collect()}
    unfiltered = {r.value: r.n_docs
                  for r in facet_counts(idx, QUERY, "lang").collect()}
    both = Counter(got) + Counter(got_not)
    assert dict(both) == unfiltered


def test_range_counts_negative_values(spark, tmp_path):
    """The decimal tag→bin arithmetic is exact across the sign bit —
    the case the driver oracle's integer-division twin cannot reach."""
    from collections import Counter

    from donkey_spark.plans import Index, build_index
    from donkey_spark.plans.facet_counts import range_counts
    from donkey_spark.sources import documents_as_corpus
    out = str(tmp_path / "negidx")
    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001") \
        .withColumn("delta", F.length("content") - F.lit(300))
    build_index(spark, corpus, out, range_facets=("delta",))
    idx = Index(spark, out)
    truth = {(r.repo, r.path): r.d for r in corpus.select(
        "repo", "path", F.col("delta").alias("d")).collect()}
    base = _keys(idx.search_rows([(0, QUERY, 500)]))
    got = {(r.bin_lo, r.bin_hi): r.n_docs
           for r in range_counts(idx, QUERY, "delta", 4).collect()}
    want = Counter(_bin(truth[k], 4) for k in base)
    assert got == dict(want)
    assert any(lo < 0 for lo, _ in got)      # the sign bit was exercised


def test_range_counts_sharded_sums_exactly(ridx, spark, tmp_path):
    """Federated bins ≡ unified bins: shards partition the corpus and
    bin boundaries are shard-independent arithmetic."""
    from collections import Counter

    from donkey_spark.plans import Index, build_index
    from donkey_spark.plans.facet_counts import range_counts
    from donkey_spark.plans.sharded import range_counts_sharded
    from donkey_spark.sources import documents_as_corpus
    idx, _ = ridx
    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001") \
        .withColumn("n_chars", F.length("content"))
    shards = []
    for i, pred in enumerate(["path < 'doc/3'", "path >= 'doc/3'"]):
        d = str(tmp_path / f"s{i}")
        build_index(spark, corpus.where(pred), d, facets=("lang",),
                    range_facets=("n_chars",))
        shards.append(Index(spark, d))
    fed = {(r.bin_lo, r.bin_hi): r.n_docs
           for r in range_counts_sharded(shards, QUERY, "n_chars",
                                         8).collect()}
    uni = {(r.bin_lo, r.bin_hi): r.n_docs
           for r in range_counts(idx, QUERY, "n_chars", 8).collect()}
    assert Counter(fed) == Counter(uni) and fed
    # federated RANKED search under a range filter ≡ unified (filters
    # stay shard-local; global stats keep scores identical)
    from donkey_spark.plans.sharded import search_rows_sharded
    filt = {"n_chars": {"range": [150, 450]}}
    fed_rows = [(r[5], r[6], round(r[4], 9)) for r in search_rows_sharded(
        shards, [(0, QUERY, 500)], filters=filt)]
    uni_rows = [(r[4], r[5], round(r[3], 9)) for r in idx.search_rows(
        [(0, QUERY, 500)], filters=filt)]
    assert fed_rows == uni_rows and fed_rows


def test_histogram_empty_and_errors(ridx):
    from donkey_spark.plans.facet_counts import facet_counts, range_counts
    idx, _ = ridx
    e = range_counts(idx, "zzzqqqoov", "n_chars", 8)
    assert e.columns == ["bin_lo", "bin_hi", "n_docs"] and e.count() == 0
    with pytest.raises(ValueError, match="range facets"):
        facet_counts(idx, QUERY, "n_chars")
    with pytest.raises(ValueError, match="equality facet"):
        range_counts(idx, QUERY, "lang", 8)
    with pytest.raises(ValueError, match="no range facet"):
        range_counts(idx, QUERY, "nope", 8)
    for bad_shift in (3, -4, 64, 8.0, True):
        with pytest.raises(ValueError, match="shift"):
            range_counts(idx, QUERY, "n_chars", bad_shift)


def test_range_counts_top_trie_level(spark, tmp_path):
    """shift=63 (reachable whenever range_step divides 63, e.g. a
    streamed index created with range_step=21) bins by width 2^63 —
    past Java's long; the arithmetic must route the width through
    decimal like the sign bias does (r5 review). All small positive
    values share sortable top bit 1, so exactly ONE bin [0, 2^63-1]
    must come back, counting every matched non-null doc."""
    from donkey_spark.config import BLOCK_SIZE
    from donkey_spark.plans import Index
    from donkey_spark.plans.facet_counts import range_counts
    from donkey_spark.sources import documents_as_corpus
    from donkey_spark.streaming.ingest import _append_epoch, write_meta
    out = str(tmp_path / "sidx63")
    write_meta(spark, out, version=2, n_docs=0, avgdl=0.0, n_postings=0,
               range_size=64, block_size=BLOCK_SIZE, codec="varint",
               facets=(), n_buckets=32, n_chunks=-1,
               range_facets=("n_chars",), range_step=21)
    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001") \
        .withColumn("n_chars", F.length("content")) \
        .where(F.col("path") < "doc/15")
    _append_epoch(corpus, 1, out, "varint", BLOCK_SIZE)
    idx = Index(spark, out)
    assert idx.range_step == 21
    n_match = len(idx.search_rows([(0, QUERY, 10**6)]))
    assert n_match
    rows = range_counts(idx, QUERY, "n_chars", 63).collect()
    assert [(r["bin_lo"], r["bin_hi"], r["n_docs"]) for r in rows] == \
        [(0, (1 << 63) - 1, n_match)]
    # a mid-trie level on the same step still partitions exactly
    mid = range_counts(idx, QUERY, "n_chars", 21).collect()
    assert sum(r["n_docs"] for r in mid) == n_match
