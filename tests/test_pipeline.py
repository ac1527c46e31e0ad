"""Training-data pipeline operator tests (dedup / similarity / text /
multimodal). The SQL-expressible ops are additionally DuckDB-checked by
tests/test_contract.py; these tests cover the engine-only paths against
transparent Python oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different content about spark and indexes"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_neardup_finds_dups_and_neighbors(spark, docs):
    from donkey_spark.pipeline.dedup import jaccard_pairs, neardup_pairs
    pairs = {(r["id_a"], r["id_b"])
             for r in neardup_pairs(docs).collect()}
    assert (0, 3) in pairs                       # exact duplicates collide
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert jac[(0, 3)] == 1.0
    if (0, 1) in jac:                            # near-dup: 8/10 tokens
        assert 0.7 <= jac[(0, 1)] <= 0.9
    assert all(a < b for a, b in jac)


def test_simhash_matches_python_oracle(spark, docs):
    from collections import Counter
    from donkey_spark.pipeline.dedup import simhash64, simhash64_py
    from donkey_spark.functions.tokenize import tokenize_py
    got = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    for row in docs.collect():
        toks = tokenize_py(row["text"])
        expect = simhash64_py(sorted(Counter(toks).items()))
        assert got[row["doc_id"]] == expect, row["text"]


def test_simhash_similar_docs_close_hamming(spark, docs):
    from donkey_spark.pipeline.dedup import simhash64
    got = {r["doc_id"]: r["simhash"] & ((1 << 64) - 1)
           for r in simhash64(docs).collect()}
    ham_dup = bin(got[0] ^ got[3]).count("1")
    ham_near = bin(got[0] ^ got[1]).count("1")
    ham_far = bin(got[0] ^ got[2]).count("1")
    assert ham_dup == 0
    assert ham_near < ham_far


def test_winnow_matches_python_oracle(spark, docs):
    from donkey_spark.pipeline.textqual import (winnow_fingerprints,
                                                winnow_py)
    from donkey_spark.functions.tokenize import tokenize_py
    got: dict[int, list] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            r["fingerprint"] & ((1 << 64) - 1))
    for row in docs.collect():
        expect = winnow_py(tokenize_py(row["text"]))
        assert sorted(got.get(row["doc_id"], [])) == expect


def test_winnow_detects_partial_overlap(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "XX YY " + a + " ZZ"                     # shared run → shared prints
    c = "totally unrelated words without any common substring here at all"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)],
                               "doc_id long, text string")
    from donkey_spark.pipeline.textqual import winnow_fingerprints
    fps: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[0] & fps[1]
    assert not (fps[0] & fps[2])


def test_lsh_ann_recall_vs_brute_force(spark):
    from donkey_spark.pipeline.similarity import cosine_topk, lsh_ann_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in
             cosine_topk(emb, probe, k=10).collect()]
    approx = [r["vec_id"] for r in
              lsh_ann_topk(emb, probe, k=10, n_tables=8,
                           n_planes=4).collect()]
    assert 0 in approx                     # the probe itself must be found
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"recall {recall} too low: {exact} vs {approx}"


def test_media_features_deterministic_and_stub_guarded(spark):
    from donkey_spark.pipeline.multimodal import (extract_media_features,
                                                  frame_sample, synth_media)
    media = synth_media(spark, n=30)
    f1 = {r["media_id"]: r["feature"] for r in
          extract_media_features(media, decode="fake").collect()}
    f2 = {r["media_id"]: r["feature"] for r in
          extract_media_features(media, decode="fake").collect()}
    assert f1 == f2 and len(f1) == 30
    assert all(len(v) == 16 for v in f1.values())
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        extract_media_features(media, decode="real").collect()
    frames = frame_sample(media, every_ms=1000).collect()
    assert frames and all(r["frame_ms"] % 1000 == 0 for r in frames)


def test_lang_id_prefers_matching_stopwords(spark):
    from donkey_spark.pipeline.textqual import lang_id
    df = spark.createDataFrame(
        [(0, "the cat and the dog of it"),
         (1, "der hund und die katze ist nicht"),
         (2, "xyzzy qwerty")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "xx"


def test_ann_index_matches_full_scan_and_prunes(spark, tmp_path):
    """Materialized bucket table == full-scan LSH (same planes), and the
    probe scan is partition-pruned to the probe's buckets."""
    from donkey_spark.pipeline.similarity import (ann_topk, build_ann_index,
                                                  lsh_ann_topk,
                                                  probe_buckets)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    out = str(tmp_path / "ann")
    build_ann_index(emb, out, n_tables=4, n_planes=4)
    got = ann_topk(spark, out, probe, k=10, n_tables=4,
                   n_planes=4).collect()
    ref = lsh_ann_topk(emb, probe, k=10, n_tables=4, n_planes=4).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
        [(r["vec_id"], r["cosine"]) for r in ref]
    # partition pruning: the probed scan must touch ≤ n_tables bucket dirs
    pbs = probe_buckets(probe, 4, 4)
    plan = (spark.read.parquet(out)
            .where(F.col("bucket").isin(pbs))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:120]


def test_simhash_and_winnow_apply_token_cap(spark, monkeypatch):
    """simhash_batch / winnow_batch must apply MAX_TOKENS_PER_DOC like
    every other engine path and the SQL twins (ADVICE r2)."""
    import pandas as pd
    import donkey_spark.config as cfg
    from donkey_spark.pipeline.dedup import simhash_batch
    from donkey_spark.pipeline.textqual import winnow_batch
    monkeypatch.setattr(cfg, "MAX_TOKENS_PER_DOC", 6)
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    capped = "alpha beta gamma delta epsilon zeta"
    s = pd.Series([text, capped])
    sh = simhash_batch(s)
    assert sh.iloc[0] == sh.iloc[1]
    wn = winnow_batch(s, k=2, w=2)
    assert list(wn.iloc[0]) == list(wn.iloc[1])


def test_ann_multiprobe_expands_candidates_and_recall(spark):
    """Multi-probe LSH (VERDICT r2 #10): flipping the lowest-margin sign
    bits must (a) always include the base buckets — results can only gain
    candidates — and (b) strictly improve brute-force agreement on a
    fixture where single-probe recall is imperfect."""
    import numpy as np
    from donkey_spark.pipeline.similarity import (_bucket_id, _planes,
                                                  probe_buckets)
    rng = np.random.default_rng(3)
    for _ in range(20):
        p = rng.standard_normal(16).tolist()
        base = probe_buckets(p, 4, 8, multiprobe=0)
        mp = probe_buckets(p, 4, 8, multiprobe=3)
        assert set(base) <= set(mp)
        assert len(set(mp)) == 16            # 4 tables × (1 + 3), distinct
        # flipped buckets differ from base in exactly one bit position
        for t in range(4):
            planes = _planes(16, 8, seed=f"t{t}")
            proj = planes @ np.array(p)
            bits = (proj >= 0).astype(np.int64)
            lowest = np.argsort(np.abs(proj))[:3]
            expected = {_bucket_id(t, 8, bits)}
            for j in lowest:
                fl = bits.copy()
                fl[j] ^= 1
                expected.add(_bucket_id(t, 8, fl))
            got_t = {b for b in mp if b >> (2 * 8 + 1) == t}
            assert got_t == expected


def test_ann_topk_multiprobe_superset_recall(spark, tmp_path):
    """End-to-end: ann_topk(multiprobe=2) candidates ⊇ multiprobe=0 and
    the top-k moves (weakly) closer to brute force on a clustered set."""
    import numpy as np
    import pandas as pd
    from donkey_spark.pipeline.similarity import (ann_topk, build_ann_index,
                                                  cosine_topk)
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((20, 16))
    vecs = (centers[rng.integers(0, 20, size=3000)]
            + 0.3 * rng.standard_normal((3000, 16)))
    df = spark.createDataFrame(pd.DataFrame(
        {"vec_id": np.arange(3000), "embedding": list(vecs.astype("f4"))}))
    idx = str(tmp_path / "annmp")
    build_ann_index(df, idx, n_tables=2, n_planes=8)
    probe = (vecs[7] + 0.05 * rng.standard_normal(16)).tolist()
    truth = [r["vec_id"] for r in cosine_topk(df, probe, k=10).collect()]
    r0 = [r["vec_id"] for r in
          ann_topk(spark, idx, probe, k=10, n_tables=2, n_planes=8).collect()]
    r2 = [r["vec_id"] for r in
          ann_topk(spark, idx, probe, k=10, n_tables=2, n_planes=8,
                   multiprobe=2).collect()]
    assert len(set(r2) & set(truth)) >= len(set(r0) & set(truth))
    assert len(r2) == 10


def test_ann_topk_tombstone_visibility(spark, tmp_path):
    """r4: deletion governs BOTH retrieval paths. A tombstoned document's
    vector vanishes from ANN top-k (bucket table frozen, exclusion at
    rescoring) while every surviving rank/cosine is unchanged — via an
    explicit exclude set AND via a BM25 index's tombstones
    (tombstones_from, vec_id == doc_id convention)."""
    from donkey_spark.pipeline.similarity import ann_topk, build_ann_index
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.sources.corpus import documents_as_corpus
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    out = str(tmp_path / "ann")
    build_ann_index(emb, out, n_tables=4, n_planes=4)
    base = [(r["vec_id"], r["cosine"]) for r in
            ann_topk(spark, out, probe, k=10, n_tables=4,
                     n_planes=4).collect()]
    dead = [base[0][0], base[3][0]]            # delete two current top-10

    got = [(r["vec_id"], r["cosine"]) for r in
           ann_topk(spark, out, probe, k=10, n_tables=4, n_planes=4,
                    exclude=dead).collect()]
    assert not set(dead) & {v for v, _ in got}
    # survivors keep their exact cosines and relative order
    expect = [(v, c) for v, c in base if v not in set(dead)]
    assert got[:len(expect)] == expect

    # tombstones_from: a BM25 index over the documents corpus whose
    # doc_ids line up with vec_ids; its tombstones govern the ANN probe.
    # documents_as_corpus assigns doc_id by (repo,path,commit) rank, so
    # resolve the dead vec_ids to their corpus keys through the docs
    # table after the build.
    idx_dir = str(tmp_path / "bm25")
    build_index(spark, documents_as_corpus(spark, "/root/testdata/sf0.001"),
                idx_dir)
    delete_docs(spark, idx_dir, dead)
    got2 = [(r["vec_id"], r["cosine"]) for r in
            ann_topk(spark, out, probe, k=10, n_tables=4, n_planes=4,
                     tombstones_from=idx_dir).collect()]
    assert got2 == got


def test_ann_incremental_append_and_compact(spark, tmp_path):
    """r4 incremental vector ingest: appended vectors are probe-visible
    immediately and the combined table answers identically to a
    from-scratch build over the union; delete + compact reclaims."""
    from donkey_spark.pipeline.similarity import (ann_topk,
                                                  append_ann_vectors,
                                                  build_ann_index,
                                                  compact_ann_index)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    first = emb.where(F.col("vec_id") < 300)
    rest = emb.where(F.col("vec_id") >= 300)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_ann_index(first, inc, n_tables=4, n_planes=4)
    append_ann_vectors(rest, inc, n_tables=4, n_planes=4)
    build_ann_index(emb, full, n_tables=4, n_planes=4)
    got = [(r["vec_id"], r["cosine"]) for r in
           ann_topk(spark, inc, probe, k=10, n_tables=4,
                    n_planes=4).collect()]
    ref = [(r["vec_id"], r["cosine"]) for r in
           ann_topk(spark, full, probe, k=10, n_tables=4,
                    n_planes=4).collect()]
    assert got == ref
    # appended rows really landed in the bucket table
    n_appended = (spark.read.parquet(inc)
                  .where(F.col("vec_id") >= 300).count())
    assert n_appended > 0

    # delete two of the current top-10, compact, deleted gone + reclaimed
    dead = [got[0][0], got[1][0]]
    compact_ann_index(spark, emb, inc, n_tables=4, n_planes=4,
                      exclude=dead)
    after = [(r["vec_id"], r["cosine"]) for r in
             ann_topk(spark, inc, probe, k=10, n_tables=4,
                      n_planes=4).collect()]
    assert not set(dead) & {v for v, _ in after}
    expect = [(v, c) for v, c in ref if v not in set(dead)]
    assert after[:len(expect)] == expect
    assert (spark.read.parquet(inc)
            .where(F.col("vec_id").isin(dead)).count()) == 0  # reclaimed


def test_ann_bucket_kernel_bit_identical_to_expression_oracle(spark):
    """r5: the mapInArrow matmul kernel (the production ANN build path,
    kernels/annproj.py) must assign bit-identical (vec_id, bucket) rows
    to the r4 Catalyst-expression oracle, across hash-table shapes."""
    from donkey_spark.pipeline.similarity import ann_bucket_rows
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for nt, npl in ((4, 4), (2, 8)):
        a = sorted((r["vec_id"], r["bucket"]) for r in
                   ann_bucket_rows(emb, n_tables=nt, n_planes=npl,
                                   method="arrow").collect())
        e = sorted((r["vec_id"], r["bucket"]) for r in
                   ann_bucket_rows(emb, n_tables=nt, n_planes=npl,
                                   method="expr").collect())
        assert a == e, (nt, npl)


def test_ann_bucket_kernel_high_dim_and_input_guards(spark):
    """The kernel at a realistic embedding dim (768): buckets must match
    a driver-side numpy recomputation exactly (the expression oracle is
    unusable at this dim — that is the point of the kernel), and
    malformed embedding columns must raise, not mis-hash."""
    import pandas as pd
    from donkey_spark.kernels.annproj import bucket_ids, plane_matrix
    from donkey_spark.pipeline.similarity import ann_bucket_rows
    rng = np.random.default_rng(7)
    n, dim, nt, npl = 500, 768, 8, 6
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in vecs]}))
    got = sorted((r["vec_id"], r["bucket"]) for r in
                 ann_bucket_rows(df, n_tables=nt, n_planes=npl).collect())
    pmat = plane_matrix(dim, nt, npl)
    bk = bucket_ids(vecs, pmat, nt, npl)
    want = sorted((int(i), int(b))
                  for i in range(n) for b in bk[i])
    assert got == want
    # guards: ragged rows and nulls are data bugs, not shapes to absorb
    # (coalesce(1): in-batch detection; ragged only ACROSS partitions
    # needs an explicit dim= — documented kernel contract)
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>").coalesce(1)
    with pytest.raises(Exception, match="ragged"):
        ann_bucket_rows(bad, n_tables=2, n_planes=2).collect()
    with pytest.raises(Exception, match="!= declared"):
        ann_bucket_rows(bad.repartition(2), n_tables=2, n_planes=2,
                        dim=2).collect()
    nullv = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)],
        "vec_id long, embedding array<float>").coalesce(1)
    with pytest.raises(Exception, match="null"):
        ann_bucket_rows(nullv, n_tables=2, n_planes=2).collect()


def test_ann_metadata_filters(spark, tmp_path):
    """r5: compound ANN queries — "nearest neighbors among label∈{...}
    vectors". Denormalized (meta_cols) and metadata-join paths must
    agree with the raw-scan filtered reference, the NOT form must
    exclude, filters must compose with tombstones, and a filter column
    available on neither side must raise."""
    from donkey_spark.pipeline.similarity import (ann_topk, build_ann_index,
                                                  lsh_ann_topk)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}

    denorm = str(tmp_path / "ann_meta")
    build_ann_index(emb, denorm, n_tables=4, n_planes=4,
                    meta_cols=("label",))
    plain = str(tmp_path / "ann_plain")
    build_ann_index(emb, plain, n_tables=4, n_planes=4)

    want = [(r["vec_id"], r["cosine"]) for r in
            lsh_ann_topk(emb, probe, k=5, n_tables=4, n_planes=4,
                         filters={"label": [1, 2]}).collect()]
    assert want and all(labels[v] in (1, 2) for v, _ in want)
    got_d = [(r["vec_id"], r["cosine"]) for r in
             ann_topk(spark, denorm, probe, k=5, n_tables=4, n_planes=4,
                      filters={"label": [1, 2]}).collect()]
    got_m = [(r["vec_id"], r["cosine"]) for r in
             ann_topk(spark, plain, probe, k=5, n_tables=4, n_planes=4,
                      filters={"label": [1, 2]}, metadata=emb).collect()]
    assert got_d == want and got_m == want

    neg = [r["vec_id"] for r in
           ann_topk(spark, denorm, probe, k=5, n_tables=4, n_planes=4,
                    filters={"label": {"not": [1, 2]}}).collect()]
    assert neg and all(labels[v] not in (1, 2) for v in neg)

    # composition: filter + exclusion — the excluded survivor vanishes,
    # the rest keep their exact cosines/ranks
    top = got_d[0][0]
    comp = [(r["vec_id"], r["cosine"]) for r in
            ann_topk(spark, denorm, probe, k=4, n_tables=4, n_planes=4,
                     filters={"label": [1, 2]}, exclude=[top]).collect()]
    assert comp == [x for x in want if x[0] != top][:4]

    with pytest.raises(ValueError, match="denormalized|metadata"):
        ann_topk(spark, plain, probe, k=5, n_tables=4, n_planes=4,
                 filters={"label": [1, 2]}).collect()
    with pytest.raises(ValueError, match="must be"):
        ann_topk(spark, denorm, probe, k=5, n_tables=4, n_planes=4,
                 filters={"label": {"bogus": [1]}}).collect()


def test_lsh_ann_topk_arrow_matches_expr_path(spark):
    """Raw-scan LSH: the arrow hashing path returns exactly the
    expression path's results (same candidate set, same rescoring)."""
    from donkey_spark.pipeline.similarity import lsh_ann_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    a = [(r["vec_id"], r["cosine"]) for r in
         lsh_ann_topk(emb, probe, k=10, n_tables=8, n_planes=4,
                      method="arrow").collect()]
    e = [(r["vec_id"], r["cosine"]) for r in
         lsh_ann_topk(emb, probe, k=10, n_tables=8, n_planes=4,
                      method="expr").collect()]
    assert a == e and len(a) == 10


def test_ann_append_with_meta_cols(spark, tmp_path):
    """r5: incremental appends carry the index's denormalized metadata,
    so filtered probes see appended vectors too."""
    from donkey_spark.pipeline.similarity import (ann_topk,
                                                  append_ann_vectors,
                                                  build_ann_index)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    first = emb.where(F.col("vec_id") < 400)
    rest = emb.where(F.col("vec_id") >= 400)
    out = str(tmp_path / "annm")
    build_ann_index(first, out, n_tables=4, n_planes=4,
                    meta_cols=("label",))
    append_ann_vectors(rest, out, n_tables=4, n_planes=4,
                       meta_cols=("label",), dim=64)
    scratch = str(tmp_path / "annm_all")
    build_ann_index(emb, scratch, n_tables=4, n_planes=4,
                    meta_cols=("label",))
    for filt in (None, {"label": [1, 2, 3]}):
        got = ann_topk(spark, out, probe, k=10, n_tables=4, n_planes=4,
                       filters=filt).collect()
        want = ann_topk(spark, scratch, probe, k=10, n_tables=4,
                        n_planes=4, filters=filt).collect()
        assert [(r["vec_id"], r["cosine"]) for r in got] == \
            [(r["vec_id"], r["cosine"]) for r in want], filt


def test_embedding_neardup_pairs_exact_and_never_all_pairs(spark):
    """r5: every emitted pair is a true >=threshold pair with the exact
    (rounded) cosine, every bucket-colliding true pair is emitted
    (exactness on the candidate set), and the candidate set is a small
    fraction of all pairs (the never-all-pairs scale property)."""
    from donkey_spark.pipeline.similarity import (ann_bucket_rows,
                                                  embedding_neardup_pairs)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, Vn = ids[order], Vn[order]
    cos = {(int(ids[i]), int(ids[j])): round(float(Vn[i] @ Vn[j]), 6)
           for i in range(len(ids)) for j in range(i + 1, len(ids))}

    t = 0.28
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           embedding_neardup_pairs(emb, threshold=t, n_tables=4,
                                   n_planes=4).collect()}
    assert got, "threshold too high for the fixture"
    for (a, b), c in got.items():
        assert a < b and c >= t and c == cos[(a, b)], (a, b)

    # exactness over the candidate set: every bucket-colliding pair
    # with true cosine >= t must be in the result
    br = ann_bucket_rows(emb, n_tables=4, n_planes=4).collect()
    from collections import defaultdict
    byb = defaultdict(list)
    for r in br:
        byb[r["bucket"]].append(r["vec_id"])
    cands = {(min(a, b), max(a, b))
             for vs in byb.values()
             for i, a in enumerate(vs) for b in vs[i + 1:] if a != b}
    expect = {p for p in cands if cos[p] >= t}
    assert set(got) == expect
    # the scale property: candidates are a small fraction of all pairs
    n = len(ids)
    assert len(cands) < 0.5 * n * (n - 1) / 2


def test_simhash_neardup_pairs_complete_recall_at_radius(spark):
    """r5: 4-band pigeonhole candidates give COMPLETE recall at hamming
    <= 3 — the result equals brute-force over ALL pairs at that radius,
    and hamming values are exact."""
    from donkey_spark.pipeline.dedup import simhash64, simhash_neardup_pairs
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    sh = {r["doc_id"]: r["simhash"] & ((1 << 64) - 1)
          for r in simhash64(docs).collect()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_neardup_pairs(docs).collect()}
    assert got == want and got, "fixture must contain near-dups"


def _py_components(edges, nodes=()):
    """Transparent union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes:
        find(n)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    """large-star/small-star vs a python union-find oracle: random
    graphs (several densities/seeds), a 60-node chain (the
    diameter-worst case label propagation loses on), and empty input."""
    import random
    from donkey_spark.pipeline.dedup import connected_components

    def check(edges):
        df = spark.createDataFrame(edges or [(0, 0)],
                                   "id_a long, id_b long")
        if not edges:
            df = df.where("id_a < 0")
        got = {r["node"]: r["component"]
               for r in connected_components(df).collect()}
        # engine contract: self-loops are not graph membership (real
        # pair generators emit id_a < id_b, so they never occur)
        assert got == _py_components(
            [(a, b) for a, b in edges if a != b])

    for seed, n, m in ((1, 40, 25), (2, 200, 150), (3, 100, 300)):
        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        check(edges)
    check([(i, i + 1) for i in range(59)])          # 60-node chain
    check([(5, 9), (9, 5), (2, 2), (7, 3)])         # dups/self-loops
    check([])


def test_neardup_clusters_end_to_end(spark, docs):
    """Docs 0 and 3 are byte-identical (hamming 0 → paired by any
    band): they must share a cluster rooted at the smaller id; every
    other doc is its own singleton cluster."""
    from donkey_spark.pipeline.dedup import neardup_clusters
    got = {r["doc_id"]: r["cluster_id"]
           for r in neardup_clusters(docs, method="simhash").collect()}
    assert len(got) == 5
    assert got[0] == 0 and got[3] == got[0]
    assert got[2] == 2 and got[4] == 4
    without = neardup_clusters(docs, method="simhash",
                               include_singletons=False).collect()
    assert {r["doc_id"] for r in without} <= {0, 1, 3}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        neardup_clusters(docs, method="bogus")


def test_cosine_topk_filters_and_exclusions(spark):
    """r5 review: the exact brute-force path honors the same
    filters/metadata/exclude surface as the ANN probes (hybrid_topk
    documents them as pass-through for ann='exact')."""
    from donkey_spark.pipeline.similarity import cosine_topk
    rows = [(i, [1.0, 0.0] if i % 2 else [0.0, 1.0],
             "py" if i < 6 else "java") for i in range(10)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, lang string")
    probe = [1.0, 0.0]
    got = cosine_topk(vecs, probe, k=10, filters={"lang": "py"}).collect()
    assert [r["vec_id"] for r in got] == [1, 3, 5, 0, 2, 4]
    got = cosine_topk(vecs, probe, k=10, filters={"lang": "py"},
                      exclude=[1, 3]).collect()
    assert [r["vec_id"] for r in got] == [5, 0, 2, 4]
    # metadata-frame fallback for a column not on the vector rows
    meta = spark.createDataFrame([(i, i % 3 == 0) for i in range(10)],
                                 "vec_id long, keep boolean")
    got = cosine_topk(vecs.select("vec_id", "embedding"), probe, k=10,
                      filters={"keep": True}, metadata=meta).collect()
    assert [r["vec_id"] for r in got] == [3, 9, 0, 6]


def test_ann_range_filter_null_semantics(spark):
    """r5 review: the ANN range predicate must match the BM25 trie side
    exactly — a null-valued row carries no trie tags there, so it never
    matches a range (even a fully-open one) and always lands in the
    negation's complement."""
    from donkey_spark.pipeline.similarity import _filter_pred
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 300)], "id long, size long")

    def ids(spec):
        return sorted(r["id"] for r in
                      df.where(_filter_pred("size", spec)).collect())

    assert ids({"range": [None, None]}) == [1, 3]
    assert ids({"not": {"range": [None, None]}}) == [2]
    assert ids({"range": [None, 100]}) == [1]
    assert ids({"not": {"range": [None, 100]}}) == [2, 3]
    assert ids({"range": [100, None]}) == [3]
