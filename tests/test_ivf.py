"""IVF coarse-quantizer ANN tests (pipeline/ivf.py).

The probe path is additionally DuckDB-checked end-to-end by the
``ivf_ann_topk`` contract pair (seeding + Lloyd + assignment + probe
replayed in SQL); these tests cover the engine-only invariants: full-probe
exactness, training determinism, partition pruning, incremental append,
compaction, and filter/exclusion composition.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _probe(spark):
    emb = spark.read.parquet(EMB)
    return [float(x) for x in
            emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]


def _topk(df):
    return [(r["vec_id"], r["cosine"]) for r in df.collect()]


@pytest.fixture(scope="module")
def ivf_idx(spark, tmp_path_factory):
    from donkey_spark.pipeline.ivf import build_ivf_index
    out = str(tmp_path_factory.mktemp("ivf") / "idx")
    emb = spark.read.parquet(EMB)
    cents = build_ivf_index(emb, out, n_lists=8, n_iters=2,
                            meta_cols=("label",))
    return out, cents


def test_ivf_full_probe_is_exact(spark, ivf_idx):
    """nprobe == n_lists scans every list exactly once (each vector lives
    in ONE list), so the result must equal brute-force cosine_topk."""
    from donkey_spark.pipeline.ivf import ivf_topk
    from donkey_spark.pipeline.similarity import cosine_topk
    out, _ = ivf_idx
    probe = _probe(spark)
    got = _topk(ivf_topk(spark, out, probe, k=10, nprobe=8))
    ref = _topk(cosine_topk(spark.read.parquet(EMB), probe, k=10))
    assert got == ref


def test_ivf_partial_probe_results_are_exact_over_candidates(spark, ivf_idx):
    """Partial-probe results carry the true cosine (rescore is exact) —
    every returned (id, score) must appear in the brute-force ranking."""
    from donkey_spark.pipeline.ivf import ivf_topk
    from donkey_spark.pipeline.similarity import cosine_topk
    out, _ = ivf_idx
    probe = _probe(spark)
    got = _topk(ivf_topk(spark, out, probe, k=10, nprobe=3))
    full = dict(_topk(cosine_topk(spark.read.parquet(EMB), probe, k=500)))
    assert got  # the probe vector's own list is always chosen
    for vid, cos in got:
        assert full[vid] == cos
    # vec_id 0 is the probe itself (cosine 1.0) — its list must be probed
    assert got[0][0] == 0 and got[0][1] == 1.0


def test_ivf_training_deterministic_and_kbounded(spark, ivf_idx):
    """Retraining on the same data reproduces the same centroids
    bit-for-bit (seeded + 9-decimal rounding kills float-sum jitter)."""
    from donkey_spark.pipeline.ivf import train_ivf_centroids
    _, cents = ivf_idx
    again = train_ivf_centroids(spark.read.parquet(EMB), n_lists=8,
                                n_iters=2)
    assert np.array_equal(cents, again)
    # centroids are unit-norm up to the rounding quantum
    norms = np.linalg.norm(cents, axis=1)
    assert np.all(np.abs(norms - 1.0) < 1e-7)


def test_ivf_probe_scan_is_partition_pruned(spark, ivf_idx):
    from donkey_spark.pipeline.ivf import (_lists_dir, probe_lists,
                                           read_centroids)
    out, _ = ivf_idx
    probe = _probe(spark)
    lists = probe_lists(read_centroids(spark, out), probe, nprobe=3)
    assert len(lists) == 3 and len(set(lists)) == 3
    plan = (spark.read.parquet(_lists_dir(out))
            .where(F.col("list").isin(lists))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    assert "list" in plan.split("PartitionFilters", 1)[1][:120]


def test_probe_lists_ties_to_lower_id():
    from donkey_spark.pipeline.ivf import probe_lists
    cents = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    assert probe_lists(cents, [1.0, 0.0], 2) == [0, 2]
    assert probe_lists(cents, [1.0, 0.0], 99) == [0, 2, 1]  # clamped


def test_ivf_empty_list_keeps_previous_centroid(spark):
    """A list that captures no vectors (duplicate seed loses its tie)
    keeps its seed centroid instead of collapsing to NaN/zero."""
    from donkey_spark.pipeline.ivf import train_ivf_centroids
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]),   # dup direction: tie -> list 0
            (2, [0.0, 1.0]), (3, [0.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(df, n_lists=3, n_iters=2)
    assert np.array_equal(cents[1], np.array([1.0, 0.0]))  # kept seed
    assert np.array_equal(cents[0], np.array([1.0, 0.0]))
    assert np.array_equal(cents[2], np.array([0.0, 1.0]))


def test_ivf_append_matches_fresh_build(spark, tmp_path):
    """Appended vectors assign with the STORED (frozen) centroids, so
    append(first)+append(rest) answers identically to a from-scratch
    assignment pass over the union with the same centroids."""
    from donkey_spark.pipeline.ivf import (append_ivf_vectors,
                                           build_ivf_index, ivf_topk,
                                           read_centroids)
    emb = spark.read.parquet(EMB)
    probe = _probe(spark)
    first = emb.where(F.col("vec_id") < 300)
    rest = emb.where(F.col("vec_id") >= 300)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_ivf_index(first, inc, n_lists=4, n_iters=1)
    append_ivf_vectors(rest, inc)
    build_ivf_index(emb, full, n_lists=4,
                    centroids=read_centroids(spark, inc))
    got = _topk(ivf_topk(spark, inc, probe, k=10, nprobe=4))
    ref = _topk(ivf_topk(spark, full, probe, k=10, nprobe=4))
    assert got == ref
    from donkey_spark.pipeline.ivf import _lists_dir
    assert (spark.read.parquet(_lists_dir(inc))
            .where(F.col("vec_id") >= 300).count()) == rest.count()


def test_ivf_compact_reclaims_and_keeps_centroids(spark, tmp_path):
    from donkey_spark.pipeline.ivf import (_lists_dir, build_ivf_index,
                                           compact_ivf_index, ivf_topk,
                                           read_centroids)
    emb = spark.read.parquet(EMB)
    probe = _probe(spark)
    out = str(tmp_path / "ivf")
    build_ivf_index(emb, out, n_lists=4, n_iters=1)
    before = read_centroids(spark, out)
    ref = _topk(ivf_topk(spark, out, probe, k=10, nprobe=4))
    dead = [ref[0][0], ref[1][0]]
    compact_ivf_index(spark, emb, out, exclude=dead)
    assert np.array_equal(before, read_centroids(spark, out))  # no retrain
    after = _topk(ivf_topk(spark, out, probe, k=10, nprobe=4))
    assert not set(dead) & {v for v, _ in after}
    expect = [(v, c) for v, c in ref if v not in set(dead)]
    assert after[:len(expect)] == expect
    assert (spark.read.parquet(_lists_dir(out))
            .where(F.col("vec_id").isin(dead)).count()) == 0


def test_ivf_filters_and_exclusions_compose(spark, ivf_idx):
    """meta_cols filters push into the pruned scan; exclude composes on
    top — mirrors ann_topk's contract (filters AND NOT excluded)."""
    from donkey_spark.pipeline.ivf import ivf_topk
    from donkey_spark.pipeline.similarity import cosine_topk
    out, _ = ivf_idx
    probe = _probe(spark)
    emb = spark.read.parquet(EMB)
    ref = _topk(cosine_topk(
        emb.where(F.col("label").isin([1, 2]) & (F.col("vec_id") % 7 != 0)),
        probe, k=10))
    got = _topk(ivf_topk(
        spark, out, probe, k=10, nprobe=8, filters={"label": [1, 2]},
        exclude=emb.where(F.col("vec_id") % 7 == 0).select("vec_id")))
    assert got == ref
    # a filter column NOT on the list rows resolves via metadata=
    got2 = _topk(ivf_topk(
        spark, out, probe, k=10, nprobe=8, filters={"parity": [0]},
        metadata=emb.select("vec_id",
                            (F.col("vec_id") % 2).alias("parity"))))
    ref2 = _topk(cosine_topk(emb.where(F.col("vec_id") % 2 == 0),
                             probe, k=10))
    assert got2 == ref2
