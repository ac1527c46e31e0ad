"""Positional postings — phrase/proximity support (format version 3).

The bag-of-words index (like donkey's) cannot answer `"exact phrase"`
queries; r4's VERDICT flagged this as the one capability gap beyond
spec and pointed at META_VERSION as the safe way to rev the format.
Design (Lucene's two-tier shape, re-expressed for parquet):

* ``build_index(..., positions=True)`` writes an ADDITIONAL
  ``positions/chunk=<c>/bucket=<b>/`` table — (doc_id, term,
  positions:list<int>),
  bucketed by the SAME crc32 term hash as the dictionary/segments so a
  phrase probe prunes to its terms' bucket dirs. Within each written
  file rows are term-sorted, so parquet row-group min/max stats prune
  further. No shuffle is added: the extract partitioning is kept
  (hot-term rows stay spread across files; readers filter, never group).
* Posting blocks, dictionary, scoring are UNCHANGED — positions are a
  side table consulted only by phrase queries, so every existing query
  path and its oracles are untouched.
* A positional index writes meta version 3 (non-positional builds keep
  writing 2): an r4 reader refuses it cleanly instead of silently
  answering phrase-less; this reader accepts 1..3.
* Phrase top-k = conjunctive (AND) BM25 candidates, best-first, with
  position verification on the BOUNDED candidate set: positions are
  fetched for |candidates| x |phrase terms| rows only, then an
  adjacency sweep (numpy isin chain) keeps docs where the full token
  sequence occurs. Ranking = AND-mode BM25 over the phrase's distinct
  terms (re-ranked 1..k after verification). Candidates widen
  geometrically until k verified hits or the AND set is exhausted.

Scale: the verify step is O(candidates), independent of corpus size;
the positions table scan is partition-pruned by bucket and pushed down
on (term, doc_id). The table is CHUNKED like docs/segments
(``positions/chunk=<c>/bucket=<b>``): streaming epochs and upserts
append their own chunk=stream<e> dirs (r5 — the earlier fail-fast seam
is closed), readers union chunks (doc-space partitioning: no
supersession rule), and compaction rewrites chunk=batch fresh.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import MAX_TOKENS_PER_DOC, META_VERSION

#: meta version written by positional builds; readers accept <= this
POSITIONS_VERSION = 3


def write_positions(spark: SparkSession, docs_content: DataFrame,
                    out_dir: str, cap: int = MAX_TOKENS_PER_DOC,
                    chunk: str = "batch", n_buckets: int | None = None) -> None:
    """Write a positions side-table CHUNK from (doc_id, content) rows.

    Layout mirrors docs/segments: ``positions/chunk=<c>/bucket=<b>`` —
    a batch build writes one chunk=batch, each streaming epoch / upsert
    appends its own chunk=stream<e> as an idempotent epoch-keyed
    overwrite. Chunks partition the DOC space (every doc's positions
    live in exactly one chunk), so readers just union them: no
    supersession rule, deletion is the tombstone mask, compaction
    rewrites chunk=batch fresh.

    The extractor mirrors §T exactly (NFC → lower → token regex → cap) so
    position i is the i-th RETAINED token — the same sequence the DuckDB
    twin reconstructs. Per-doc Python here follows the measured
    extractor decision (BENCH/BASELINE.md §Extractor: the per-doc C
    regex path wins on this host); the kernel seam is one function."""
    import pandas as pd

    def extract(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata
        from ..functions.tokenize import _RE_LEN
        findall, norm = _RE_LEN.findall, unicodedata.normalize
        for pdf in pdfs:
            out_d: list[int] = []
            out_t: list[str] = []
            out_p: list[list[int]] = []
            for did, text in zip(pdf["doc_id"], pdf["content"]):
                toks = (findall(norm("NFC", text).lower())[:cap]
                        if text else [])
                seen: dict[str, list[int]] = {}
                for i, t in enumerate(toks):   # _RE_LEN yields only valid
                    seen.setdefault(t, []).append(i)   # tokens: i is the
                #                     index in the retained token stream
                for t, ps in seen.items():
                    out_d.append(did)
                    out_t.append(t)
                    out_p.append(ps)
            yield pd.DataFrame({"doc_id": out_d, "term": out_t,
                                "positions": out_p})

    from ..config import N_BUCKETS
    from ..operators.postings import term_bucket_col
    # epoch writers pass the INDEX'S bucket count from meta; the config
    # default is only for the batch build, which defines the layout
    n_buckets = int(N_BUCKETS if n_buckets is None else n_buckets)
    pos = docs_content.mapInPandas(
        extract, "doc_id long, term string, positions array<int>")
    # doc_id as the third sort key: within a hot term's run of row
    # groups the doc_id min/max stats become tight, so the probe's
    # doc_id pushdown prunes row groups instead of reading the term's
    # whole occurrence list (r5 review)
    (pos.withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
        .sortWithinPartitions("bucket", "term", "doc_id")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{out_dir}/positions/chunk={chunk}"))


def check_positions_layout(spark: SparkSession, index_dir: str) -> None:
    """Fail fast on a flat (pre-chunk) positions layout: appending
    chunk=* dirs beside root-level bucket=* dirs would break Hive
    partition discovery for every later positions read — refuse and
    point at the (cheap) migration, same policy as the dictionary
    guard (plans/build._check_dictionary_layout)."""
    from ..fsutil import hadoop_fs
    fs, ppath = hadoop_fs(spark, f"{index_dir}/positions")
    if not fs.exists(ppath):
        return
    flat = [st.getPath().getName() for st in fs.listStatus(ppath)
            if st.isDirectory()
            and st.getPath().getName().startswith("bucket=")]
    if flat:
        raise ValueError(
            f"{index_dir}/positions has a flat bucket=* layout (early-r5 "
            f"positional format); mixing chunk=* dirs beside it would "
            f"corrupt positions reads — compact_index (or rebuild with "
            f"positions=True) rewrites it in the chunked layout")


def _phrase_match_ids(pos_map: dict, ids: list[int], seq: list[str],
                      slop: int = 0) -> set[int]:
    """Docs (from ids) whose token stream contains seq within ``slop``.

    slop=0 = exact consecutive phrase. slop>0 = ordered proximity
    (Lucene-near-ish, documented semantics): positions p_0 < p_1 < ... <
    p_{n-1}, one per phrase slot IN ORDER, with total stretch
    (p_{n-1} - p_0) - (n-1) <= slop. Verified with a greedy minimal-
    span chain: for every candidate start, each later slot takes its
    EARLIEST position after the previous slot (searchsorted) — greedy
    minimizes the final span per start, so it finds a window iff one
    exists. pos_map: (doc_id, term) -> sorted int positions."""
    n = len(seq)
    out = set()
    for did in ids:
        first = pos_map.get((did, seq[0]))
        if first is None:
            continue
        start = np.asarray(first, dtype=np.int64)
        end = start.copy()
        ok = True
        for t in seq[1:]:
            nxt = pos_map.get((did, t))
            if nxt is None:
                ok = False
                break
            nxt = np.asarray(nxt, dtype=np.int64)
            idx = np.searchsorted(nxt, end + 1)
            keep = idx < nxt.size
            if not keep.any():
                ok = False
                break
            start = start[keep]
            end = nxt[idx[keep]]
        if ok and (end - start - (n - 1) <= slop).any():
            out.add(did)
    return out


#: rough positions bytes per posting row for the local-scan cost model:
#: one list header + a handful of int32 positions + row overhead
_POS_BYTES_PER_DOC = 64


def verify_phrase(index, ids: list[int], seq: list[str],
                  slop: int = 0) -> set[int]:
    """Fetch positions for the BOUNDED (ids × seq-terms) slice and return
    the ids containing the phrase.

    Driver-local pyarrow scan only when the estimated scan work fits the
    index's ``local_bytes`` budget — the same cost model the scorer
    uses (r5 review: hot-term occurrence lists can dwarf the candidate
    set, since doc_id pushdown prunes row groups, not rows within
    them); otherwise the scan runs distributed with the same pushdown."""
    if not ids:
        return set()
    from ..operators.postings import term_bucket_py
    terms = sorted(set(seq))
    buckets = sorted({term_bucket_py(t) for t in terms})
    use_local = False
    if index.local_bytes:
        # dfs are memoized on the Index — the AND candidate stage already
        # probed these very terms, so this is a dict lookup, not IO
        dfs = index._lookup_terms(terms)
        est = sum(dfs.get(t, 0) for t in terms) * _POS_BYTES_PER_DOC
        use_local = est <= index.local_bytes
    if use_local:
        import pyarrow.dataset as ds
        dset = index._pa_dataset("positions")
        tbl = dset.to_table(
            columns=["doc_id", "term", "positions"],
            filter=ds.field("bucket").isin(buckets)
            & ds.field("term").isin(terms)
            & ds.field("doc_id").isin(ids))
        pos_map = {(d, t): p for d, t, p in
                   zip(tbl["doc_id"].to_pylist(), tbl["term"].to_pylist(),
                       tbl["positions"].to_pylist())}
    else:
        # the isolated child session: this branch handles exactly the
        # LARGE scans (hot terms past the local budget), which would
        # fragment into hundreds of tiny tasks under the caller
        # session's build-tuned 8m split size (r5 review)
        qspark = index._qspark
        pos = (qspark.read.parquet(f"{index.dir}/positions")
               .where(F.col("bucket").isin(buckets)
                      & F.col("term").isin(terms)))
        if len(ids) <= 10_000:
            pos = pos.where(F.col("doc_id").isin([int(i) for i in ids]))
        else:
            # a widened candidate set as a literal list would bloat the
            # plan / stall py4j — ship it as a broadcast semi-join
            cdf = qspark.createDataFrame(
                [(int(i),) for i in ids], "doc_id long")
            pos = pos.join(F.broadcast(cdf), "doc_id", "left_semi")
        rows = pos.select("doc_id", "term", "positions").collect()
        pos_map = {(r["doc_id"], r["term"]): r["positions"] for r in rows}
    return _phrase_match_ids(pos_map, ids, seq, slop=slop)


def meta_version(positions: bool) -> int:
    """Version stamped into meta: 3 only when the positions table exists,
    so pre-r5 readers refuse positional indexes instead of silently
    dropping phrase semantics; plain indexes stay readable everywhere."""
    return POSITIONS_VERSION if positions else META_VERSION
