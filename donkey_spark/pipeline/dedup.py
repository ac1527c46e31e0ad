"""Deduplication operators for training-data pipelines.

Exact dedup is contract.q_dup_contents (sha256 groupBy). Near-dup here:

* **MinHash + LSH** [Broder 1997]: per-doc signatures from a PORTABLE hash
  (low 60 bits of sha256(token + '#' + i)) so the identical computation is
  expressible in DuckDB SQL for the ◇ oracle; band keys bucket-join into
  candidate pairs without any all-pairs comparison — the scale path.
* **exact n-gram Jaccard** on candidate pairs (verification step).
* **SimHash** [Charikar 2002]: 64-bit fingerprint, Hamming-near duplicates;
  engine-side numpy (no SQL twin — bit-parallel ops), tested vs a
  transparent Python oracle.

All built-in-function paths (no UDF) except simhash: minhash/LSH/jaccard run
entirely in whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_expr

#: LSH selectivity knobs. With r = n_hashes/n_bands rows per band, a pair of
#: Jaccard similarity s collides in one band with probability s^r, in ANY
#: band with 1-(1-s^r)^b — the S-curve's threshold sits near (1/b)^(1/r).
#: The defaults (r=2, b=4 → threshold ≈ 0.5·(1/4)^(1/2) ≈ 0.5) are tuned
#: PERMISSIVE for small test corpora; at 10^9+ docs raise r (e.g. 128
#: hashes, 16 bands → r=8, threshold ≈ 0.84) or hot band buckets explode
#: candidate pairs quadratically — pass the knobs explicitly per corpus.
N_HASHES = 8
N_BANDS = 4            # rows-per-band = N_HASHES // N_BANDS = 2


def _hash60(col: Column, salt: int) -> Column:
    """Portable 60-bit hash: conv(substr(sha2(s#i),1,15),16,10) — the same
    expression DuckDB spells CAST('0x'||substr(sha256(s||'#i'),1,15) AS
    UBIGINT). Deterministic across engines, versions, and partitionings."""
    return F.conv(F.substring(F.sha2(F.concat(col, F.lit(f"#{salt}")), 256),
                              1, 15), 16, 10).cast("long")


def shingle_tokens(tokens: Column, k: int = 3) -> Column:
    """Word k-gram shingles from a tokens array — built-ins only
    (transform over an index sequence; empty when fewer than k tokens)."""
    n = F.size(tokens)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(tokens, i + j + 1) for j in range(k)]))


def minhash_bands(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n_hashes: int = N_HASHES,
                  n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, band_key) LSH band signatures over distinct tokens.

    One explode + one groupBy with n_hashes min-aggregates (map-side
    combined); zero UDFs. Docs with no tokens produce no rows.
    """
    toks = (df.select(id_col,
                      F.explode(F.array_distinct(
                          tokenize_expr(F.col(text_col)))).alias("t")))
    aggs = [F.min(_hash60(F.col("t"), i)).alias(f"h{i}")
            for i in range(n_hashes)]
    sigs = toks.groupBy(id_col).agg(*aggs)
    rows_per_band = n_hashes // n_bands
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("_", *[F.col(f"h{b * rows_per_band + r}")
                                    for r in range(rows_per_band)])
                 .alias("band_key"))
        for b in range(n_bands)])
    return (sigs.select(id_col, F.explode(bands).alias("bk"))
            .select(id_col, F.col("bk.band").alias("band"),
                    F.col("bk.band_key").alias("band_key")))


def neardup_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n_hashes: int = N_HASHES,
                  n_bands: int = N_BANDS) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.
    The join is on (band, band_key) — never all-pairs; hot buckets are
    real duplicates by construction. Tune (n_hashes, n_bands) per the
    S-curve math above before pointing this at a large corpus."""
    b = minhash_bands(df, text_col, id_col, n_hashes, n_bands)
    left = b.alias("a")
    right = b.alias("b")
    return (left.join(right, ["band", "band_key"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", threshold: float = 0.7,
                  n_hashes: int = N_HASHES,
                  n_bands: int = N_BANDS) -> DataFrame:
    """Exact token-set Jaccard for LSH candidate pairs (verification)."""
    toks = df.select(F.col(id_col).alias("jid"),
                     F.array_distinct(tokenize_expr(F.col(text_col)))
                     .alias("ts"))
    cand = neardup_pairs(df, text_col, id_col, n_hashes, n_bands)
    j = (cand
         .join(toks.select(F.col("jid").alias("id_a"),
                           F.col("ts").alias("ts_a")), "id_a")
         .join(toks.select(F.col("jid").alias("id_b"),
                           F.col("ts").alias("ts_b")), "id_b")
         .withColumn("_raw",
                     F.size(F.array_intersect("ts_a", "ts_b"))
                     / F.size(F.array_union("ts_a", "ts_b"))))
    return (j.where(F.col("_raw") >= threshold)   # threshold on raw value,
            .select("id_a", "id_b",               # rounding only for output
                    F.round(F.col("_raw"), 4).alias("jaccard")))


# --- SimHash (engine-side, numpy) ------------------------------------------

def simhash64_py(term_tfs: list[tuple[str, int]]) -> int:
    """Transparent oracle: 64-bit SimHash from (term, tf) pairs using the
    low 64 bits of sha256(term)."""
    import hashlib
    acc = np.zeros(64, dtype=np.int64)
    for term, tf in term_tfs:
        h = int.from_bytes(
            hashlib.sha256(term.encode()).digest()[:8], "big")
        bits = np.array([(h >> j) & 1 for j in range(64)], dtype=np.int64)
        acc += tf * (2 * bits - 1)
    out = 0
    for j in range(64):
        if acc[j] > 0:
            out |= (1 << j)
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_batch(content: pd.Series) -> pd.Series:
    """Batch kernel for simhash64 (plain pandas in / pandas out, so it is
    directly microbenchable — bench/micro_pipeline.py).

    Batch-vectorized: every unique term in the Arrow batch is sha256-hashed
    exactly once (factorize → hash table), and the per-doc ±1 bit
    accumulation is one `np.add.reduceat` over the flattened occurrence
    stream — tf weighting falls out for free because each occurrence
    contributes its term's bits once. No per-token Python in the hot path;
    the only Python-level loop is over the batch's UNIQUE terms (sha256 has
    no vectorized form), whose count is sublinear in corpus size.
    """
    import hashlib
    import unicodedata

    from ..config import MAX_TOKENS_PER_DOC
    from ..functions.tokenize import _RE_LEN

    cap = MAX_TOKENS_PER_DOC            # §T.3 — every engine path caps
    tok_lists = [(_RE_LEN.findall(
        unicodedata.normalize("NFC", x).lower())[:cap]
        if x else []) for x in content]
    n_docs = len(tok_lists)
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                         count=n_docs)
    total = int(counts.sum())
    if total == 0:
        return pd.Series(np.zeros(n_docs, dtype=np.int64))
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in tok_lists:
        flat[pos:pos + len(toks)] = toks
        pos += len(toks)
    codes, uniques = pd.factorize(flat)
    hs = np.fromiter(
        (int.from_bytes(hashlib.sha256(u.encode()).digest()[:8], "big")
         for u in uniques), dtype=np.uint64, count=len(uniques))
    shifts = np.arange(64, dtype=np.uint64)
    # ±1 matrix over the batch's unique terms, (U, 64) — a few MB
    pm = (((hs[:, None] >> shifts[None, :]) & np.uint64(1))
          .astype(np.int32) * 2 - 1)
    # per doc: tf over its unique codes (np.unique on the code slice) then
    # one (1×u)·(u×64) int32 matmul — tf-weighted ±1 accumulation that
    # never materializes a per-OCCURRENCE bit matrix (memory-bound killer).
    # MEASURED (BENCH/BASELINE.md, simhash accumulation A/B): the "fully
    # vectorized" alternative — lexsort the (doc, code) occurrence stream,
    # run-length tf, one np.add.reduceat over the (pairs, 64) contribution
    # matrix — is 13× SLOWER (2-D reduceat isn't column-vectorized and the
    # pair gather is ~3 GB of bus traffic); |acc| ≤ dl ≤ cap so int32 is
    # exact and halves matmul traffic vs int64 (~1.4× end-to-end).
    starts = np.concatenate(([0], np.cumsum(counts)))
    acc = np.zeros((n_docs, 64), dtype=np.int32)
    for d in range(n_docs):
        seg = codes[starts[d]:starts[d + 1]]
        if seg.size:
            uc, tf = np.unique(seg, return_counts=True)
            acc[d] = tf.astype(np.int32) @ pm[uc]
    sign = (acc > 0).astype(np.uint8)
    packed = np.packbits(sign, axis=1, bitorder="little")
    return pd.Series(np.ascontiguousarray(packed).view(np.int64).ravel())


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash:long) via an Arrow UDF over ``simhash_batch``."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _simhash(content: pd.Series) -> pd.Series:
        return simhash_batch(content)

    return df.select(id_col, _simhash(F.col(text_col)).alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 3,
                          n_bands: int = 4, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """SimHash near-duplicate PAIRS via banded hamming search
    [Manku, Jarvelin & Sarma, WWW 2007 — the canonical web-dedup
    shape]: the 64-bit fingerprint splits into ``n_bands`` equal bands;
    by pigeonhole, any pair within hamming distance n_bands−1 shares at
    least one band VERBATIM, so the candidate join is an equi-join on
    (band index, band value) — never all-pairs — and the default
    (4 bands, max_hamming=3) has COMPLETE recall. Everything after the
    fingerprint UDF is codegen: band extraction is shift+mask, hamming
    is ``bit_count(xor)``.

    Returns (id_a, id_b, hamming) with id_a < id_b. max_hamming above
    n_bands−1 is allowed but then finds only band-sharing pairs
    (candidates-only, like any LSH)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    sh = simhash64(df, text_col, id_col)
    bands = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"),
                     (F.shiftright(F.col("simhash"), width * b)
                      .bitwiseAND(F.lit(mask))).alias("bv"))
            for b in range(n_bands)])).alias("e")) \
        .select(id_col, "simhash", F.col("e.b").alias("b"),
                F.col("e.bv").alias("bv"))
    a = bands.select(F.col(id_col).alias("id_a"),
                     F.col("simhash").alias("_sa"), "b", "bv")
    b2 = bands.select(F.col(id_col).alias("id_b"),
                      F.col("simhash").alias("_sb"), "b", "bv")
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (a.join(b2, ["b", "bv"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])     # multi-band hits, once
            .select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b",
                         max_iters: int = 50) -> DataFrame:
    """(node, component) over an undirected pair graph — component id =
    the smallest node id reachable from each node. The step every dedup
    pipeline needs after pair generation: near-dup PAIRS become dup
    CLUSTERS (keep one canonical doc per component).

    Alternating large-star / small-star [Kiveris, Lattanzi, Mirrokni,
    Rastogi & Vassilvitskii, "Connected Components in MapReduce and
    Beyond", SoCC 2014]: each round is a constant number of bounded
    shuffles (groupBy-min + equi-join + distinct — NO adjacency lists
    are ever materialized, so a 10^6-member dup cluster never collects
    on one task), and the edge set converges to per-component stars in
    O(log n) rounds on real graphs. Compare label propagation, whose
    round count is the graph DIAMETER — unbounded for chain-shaped
    near-dup graphs.

    Convergence is detected by a cheap per-round signature
    (count / Σu / Σv) and CONFIRMED by an exact set comparison before
    stopping — a signature collision can cost one extra round, never a
    wrong answer. Raises after ``max_iters`` (50 rounds covers graphs
    astronomically past 10^12 nodes).

    Each round CHECKPOINTS its edge set — iterative self-referencing
    DataFrames otherwise double their lineage every round (``sym``
    reads the previous round twice) and the logical plan grows
    exponentially until the driver OOMs planning it. With a checkpoint
    dir configured (``sparkContext.setCheckpointDir`` — the reliable,
    executor-loss-safe choice on a cluster) rounds checkpoint there;
    otherwise ``localCheckpoint`` (executor-local blocks)."""
    sc = pairs.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _cut(df):
        return (df.checkpoint(eager=True) if reliable
                else df.localCheckpoint(eager=True))

    edges = (pairs.select(F.col(a_col).cast("long").alias("u"),
                          F.col(b_col).cast("long").alias("v"))
             .where(F.col("u") != F.col("v")).distinct())
    cur = _cut(edges)
    prev_sig = None
    for _ in range(max_iters):
        # large-star: every neighbor v > u links to min(Γ(u) ∪ {u})
        sym = cur.union(cur.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m")))
        ls = (sym.join(mins, "u").where(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .where(F.col("u") != F.col("v")).distinct())
        # small-star: orient down; every lo-neighbor AND hi itself link
        # to min(Γ⁻(hi) ∪ {hi}) (= min lo, since all lo < hi)
        d = (ls.select(F.greatest("u", "v").alias("hi"),
                       F.least("u", "v").alias("lo")).distinct())
        smins = d.groupBy("hi").agg(F.min("lo").alias("mn"))
        nxt = (d.join(smins, "hi")
               .select(F.col("lo").alias("u"), F.col("mn").alias("v"))
               .union(smins.select(F.col("hi").alias("u"),
                                   F.col("mn").alias("v")))
               .where(F.col("u") != F.col("v")).distinct())
        nxt = _cut(nxt)
        row = nxt.agg(F.count("*").alias("c"), F.sum("u").alias("su"),
                      F.sum("v").alias("sv")).collect()[0]
        sig = (row["c"], row["su"], row["sv"])
        if sig == prev_sig:
            # counts equal + nxt ⊆ cur ⇒ sets equal: a true fixpoint
            if nxt.exceptAll(cur).limit(1).count() == 0:
                cur = nxt
                break
        cur, prev_sig = nxt, sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"rounds — pathological input?")
    # fixpoint edges are stars: (node → component min); roots appear
    # only on the right
    out = (cur.select(F.col("u").alias("node"),
                      F.col("v").alias("component"))
           .union(cur.select("v", "v").distinct()))
    return out


def neardup_clusters(df: DataFrame, method: str = "simhash",
                     text_col: str = "text", id_col: str = "doc_id",
                     include_singletons: bool = True,
                     **pair_kwargs) -> DataFrame:
    """(doc_id, cluster_id): near-duplicate clusters = connected
    components of the chosen pair generator (``method``: "simhash" —
    banded hamming pairs — or "minhash" — LSH band-bucket pairs).
    Docs in no pair cluster as themselves (``include_singletons``);
    downstream dedup keeps e.g. ``min(doc_id)`` per cluster."""
    if method == "simhash":
        pairs = simhash_neardup_pairs(df, text_col=text_col,
                                      id_col=id_col, **pair_kwargs)
    elif method == "minhash":
        pairs = neardup_pairs(df, text_col=text_col, id_col=id_col,
                              **pair_kwargs)
    else:
        raise ValueError(f"unknown method {method!r} "
                         "(expected simhash | minhash)")
    comp = connected_components(pairs)
    docs = df.select(F.col(id_col).cast("long").alias(id_col))
    if not include_singletons:
        docs = docs.join(comp.select(F.col("node").alias(id_col)),
                         id_col, "left_semi")
    return (docs.join(comp.withColumnRenamed("node", id_col),
                      id_col, "left")
            .select(id_col,
                    F.coalesce("component", F.col(id_col))
                    .alias("cluster_id")))
