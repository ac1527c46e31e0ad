"""Entry point B — top-k BM25 query (SURVEY §3.3).

Donkey's search lifecycle (extract → per-feature index probe → Matcher
aggregate → top-K Hits `[donkey:src/donkey.cpp — unverified, SURVEY §0]`)
re-expressed Spark-first:

  tokenize queries (driver-side, §T) → dictionary lookup (bucket+term
  parquet pruning, memoized across queries) → segments scan pruned by
  bucket partition dirs + term row-group stats → ONE repartition("salt")
  + mapInArrow running the block-max scorer per doc range (every term's
  postings for a range co-partition by the global range salt, so a doc's
  whole score forms inside one group — no per-doc shuffle; blobs stay
  Arrow buffers, never pandas objects) → per-range bounded top-k (≤ k
  rows per range reach the driver) → driver merge with the (score desc,
  doc_id asc) tie-break → doc-metadata fetch by pushed-down doc_id
  IN (...) filter.

Latency design (donkey keeps its index RAM-resident; the Spark analog):
DataFrame handles for segments/dictionary/docs are built once per Index so
file listings and schema stay cached; `cache=True` persists the segment
blocks in executor memory; per-term dictionary rows are memoized on the
driver. A query then costs exactly two Spark jobs (score + metadata fetch),
plus one dictionary probe per never-seen term.

Single-query latency fast path: when the dictionary-estimated pruned
posting bytes fall under `local_bytes` (default 64 MB) and the index is on
a local filesystem, the SAME per-salt kernel runs on the driver over a
pyarrow scan of the probed bucket dirs — zero Spark jobs, ~50-200 ms
instead of ~2 s of fixed job overhead. Hot terms, big batches, or remote
storage automatically fall back to the distributed path; results are
bit-identical (shared scorer, shared merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py
from ..kernels.bm25 import idf as bm25_idf
from ..kernels.wand import (SynGroup, TermBlocks, score_range_topk,
                            score_range_topk_and, score_range_topk_msm)
from ..operators.postings import term_bucket_py

_RESULT_SCHEMA = ("query_id int, rank int, doc_id long, score double, "
                  "repo string, path string")

#: columns the scorer needs from segment block rows
_SEG_COLS = ["term", "salt", "block_id", "first_doc_id", "max_doc_id",
             "block_max_tfpart", "n_docs", "docids_blob", "tfs_blob",
             "dls_blob"]

#: conservative bytes-per-posting for the local-path estimate (measured
#: ~4.2 B of blob + parquet row overhead amortized over 128-posting blocks)
_BYTES_PER_POSTING = 8


_REC_COLS = ["first_doc_id", "max_doc_id", "block_max_tfpart", "n_docs",
             "docids_blob", "tfs_blob", "dls_blob"]


def _eval_bool_mask(tree, by_term, base, size, avgdl, cache):
    """Boolean-tree match mask over one doc range: presence masks from
    the terms' decoded postings (shared _decode_parts cache — each
    block decodes once per salt no matter how many queries or NOT
    branches touch it), combined bottom-up with numpy boolean algebra.
    A term with no blocks in this range has empty presence (its NOT is
    all-True) — the out-of-dictionary rule, locally."""
    import numpy as np

    from ..kernels.wand import _decode_parts
    kind = tree[0]
    if kind == "term":
        m = np.zeros(size, dtype=bool)
        blocks = by_term.get(tree[1])
        if blocks:
            rids, _ = _decode_parts(blocks, "varint", avgdl, cache)
            m[rids - base] = True
        return m
    if kind == "not":
        m = _eval_bool_mask(tree[1], by_term, base, size, avgdl, cache)
        np.logical_not(m, out=m)
        return m
    m = _eval_bool_mask(tree[1][0], by_term, base, size, avgdl, cache)
    for c in tree[1][1:]:
        cm = _eval_bool_mask(c, by_term, base, size, avgdl, cache)
        if kind == "and":
            m &= cm
        else:
            m |= cm
    return m


def _normalize_synonyms(synonyms, mode, min_match) -> dict | None:
    """Validate and tokenize a ``synonyms`` map ({term: syn | [syns]})
    into {head token: sorted member tokens incl. the head}. Synonym
    scoring is a disjunctive-clause construct (Lucene SynonymQuery):
    mode="or" only, and it does not compose with min_match (a group is
    ONE clause; the counting kernel counts terms)."""
    if not synonyms:
        return None
    if mode != "or":
        raise ValueError(
            f"synonyms apply to mode='or' only, got mode={mode!r}")
    if min_match:
        raise ValueError("synonyms do not compose with min_match")
    syn_map: dict[str, list[str]] = {}
    for head, syns in synonyms.items():
        h = tokenize_py(str(head))
        if len(h) != 1:
            raise ValueError(
                f"synonym head {head!r} must normalize to one token, "
                f"got {h}")
        mems = {h[0]} | set(syn_map.get(h[0], ()))
        # heads normalizing to the same token MERGE (two raw keys —
        # "Foo"/"foo" — or repeated CLI flags must never silently
        # last-wins-drop a group)
        for s in ([syns] if isinstance(syns, str) else syns):
            st = tokenize_py(str(s))
            if len(st) != 1:
                raise ValueError(
                    f"synonym {s!r} for {head!r} must normalize to "
                    f"one token, got {st}")
            mems.add(st[0])
        syn_map[h[0]] = sorted(mems)
    return syn_map


def _make_group_scorer(qplan, idf_map, mode, base_mult, avgdl,
                       tombstones=None, required_groups=None,
                       pot_scale: float = 1.0, bool_trees=None,
                       cursors=None, boosts=None, min_match=None,
                       syn_groups=None):
    """(salt, by_term) -> (qids, doc_ids, scores) — the per-doc-range
    scoring core, shared verbatim by the distributed (mapInArrow) and
    driver-local (pyarrow) paths: identical kernels, identical results.
    ``tombstones`` (a sorted global doc-id ndarray, or a Spark Broadcast
    of one on the distributed path) is sliced per range by searchsorted
    and passed to the kernels as local dead indices. ``required_groups``
    (facet filters, list of (kind, facet-term list) tuples, ANDed
    across columns): kind "any" — a doc must carry AT LEAST ONE term of
    the group (OR within a column's values, `lang IN (py, java)`);
    kind "not" — a doc must carry NONE (complement semantics: a doc
    without the column passes). ``bool_trees`` ({qid: parsed boolean
    tree}, mode="bool"): each query's match set is its tree's per-range
    mask (_eval_bool_mask) ANDed into ``allowed``; scoring runs the
    ordinary disjunctive kernel over the query's POSITIVE terms —
    guardedness (functions/boolquery.py) guarantees the mask never
    admits a doc without one. ``cursors`` ({qid: (score, doc_id)},
    cursor pagination — see Index.search_rows_after): per query, only
    docs strictly after the cursor in ranking order may rank; the
    kernels disable score-threshold block skipping for such queries.
    ``boosts`` ({qid: {term: w}}, w > 0 — functions/boosts.py): a
    query's term scores as w·idf·tf_part, applied by scaling the
    TermBlocks idf, so the kernel's block-max potentials (derived from
    the same idf) scale with it and every skip stays a safe
    upper-bound test; boost 1.0 / absent is bit-identical to before.
    ``min_match`` ({qid: m}, mode="or" only — the ES
    minimum_should_match knob): queries with m > 1 route to the
    counting kernel (score_range_topk_msm) — only docs containing at
    least m distinct query terms rank, scores unchanged for survivors;
    m <= 1 / absent stays on the plain disjunctive kernel."""
    import numpy as np

    def score_group(salt: int, by_term: dict[str, list[dict]],
                    cache: dict | None = None):
        base = salt * base_mult
        dead = None
        ts = (tombstones.value if hasattr(tombstones, "value")
              else tombstones) if tombstones is not None else None
        if ts is not None and len(ts):
            lo = np.searchsorted(ts, base)
            hi = np.searchsorted(ts, base + base_mult)
            if hi > lo:
                dead = ts[lo:hi] - base
        allowed = None
        if required_groups:
            # query-independent presence mask, built ONCE per salt; the
            # facet postings decode once too (through the batch prefill
            # cache when present, a salt-local one otherwise)
            from ..kernels.wand import _decode_parts
            req_cache = cache if cache is not None else {}
            for kind, group in required_groups:
                g_here = [t for t in group if t in by_term]
                if not g_here:
                    if kind == "any":
                        # no value of this column's filter has postings
                        # in this doc range — nothing here can match
                        return [], [], []
                    continue    # nothing to exclude in this range
                gmask = np.full(base_mult, kind == "not", dtype=bool)
                for t in g_here:
                    rids, _ = _decode_parts(by_term[t], "varint", avgdl,
                                            req_cache)
                    # "any": OR within the column; "not": complement of
                    # the union (a doc WITHOUT the column passes)
                    gmask[rids - base] = kind == "any"
                allowed = gmask if allowed is None else (allowed & gmask)
            if allowed is not None:
                if dead is not None and dead.size:
                    allowed[dead] = False
                    dead = None             # folded into the mask
                if not allowed.any():
                    return [], [], []
        # mask-eval decode cache: per salt when the batch has no
        # prefill cache, so each block still decodes at most once here
        bcache = cache if cache is not None else (
            {} if bool_trees else None)
        out_q, out_d, out_s = [], [], []
        for qid, terms, k in qplan:
            bw = boosts.get(qid) if boosts else None
            tbs = [TermBlocks(idf_map[t] * (bw.get(t, 1.0) if bw else 1.0),
                              by_term[t], pot_scale)
                   for t in terms if t in by_term]
            if syn_groups:
                # synonym groups (mode "or" only — _plan_search
                # enforces): one SynGroup per clause, members with
                # postings in this range; a boost on the HEAD token
                # scales the group's blended idf like any term boost
                for idf_g, members, head in syn_groups.get(qid, ()):
                    pres = [by_term[m] for m in members if m in by_term]
                    if pres:
                        w = bw.get(head, 1.0) if bw else 1.0
                        tbs.append(SynGroup(idf_g * w, pres, pot_scale))
            if not tbs:
                continue
            cur = cursors.get(qid) if cursors else None
            if mode == "bool":
                m = _eval_bool_mask(bool_trees[qid], by_term, base,
                                    base_mult, avgdl, bcache)
                if allowed is not None:
                    m &= allowed
                if not m.any():
                    continue
                # bcache, not cache: the mask eval above already decoded
                # every positive term's blocks into it — the scorer must
                # reuse those, not re-decode (bit-equal either way)
                ids, sc = score_range_topk(base, base_mult, tbs, avgdl,
                                           k, cache=bcache, dead=dead,
                                           allowed=m, cursor=cur)
            elif mode == "and":
                ids, sc = score_range_topk_and(
                    base, base_mult, tbs, avgdl, k, len(terms),
                    cache=cache, dead=dead, allowed=allowed, cursor=cur)
            elif min_match is not None and min_match.get(qid, 1) > 1:
                ids, sc = score_range_topk_msm(
                    base, base_mult, tbs, avgdl, k, min_match[qid],
                    cache=cache, dead=dead, allowed=allowed, cursor=cur)
            else:
                ids, sc = score_range_topk(base, base_mult, tbs, avgdl, k,
                                           cache=cache, dead=dead,
                                           allowed=allowed, cursor=cur)
            out_q.extend([qid] * len(ids))
            out_d.extend(ids.tolist())
            out_s.extend(sc.tolist())
        return out_q, out_d, out_s

    return score_group


def _validate_min_match(min_match, queries, mode) -> dict | None:
    """Normalize search_rows' ``min_match`` to {query_id: m} (or None
    when it constrains nothing). Ints must be >= 1; mode must be "or"
    (AND already requires every term; boolean trees and phrases carry
    their own match semantics)."""
    if min_match is None:
        return None
    if isinstance(min_match, int) and min_match <= 1:
        return None        # m <= 1 is the plain disjunctive query
    if mode != "or":
        raise ValueError(
            f"min_match applies to mode='or' only, got mode={mode!r}")
    if isinstance(min_match, int):
        return {qid: min_match for qid, _, _ in queries}
    if not isinstance(min_match, dict):
        raise ValueError("min_match must be an int or {query_id: int}")
    qids = {qid for qid, _, _ in queries}
    bad = {q: m for q, m in min_match.items()
           if q not in qids or not isinstance(m, int) or m < 1}
    if bad:
        raise ValueError(f"min_match: invalid entries {bad} (keys must "
                         f"be batch query_ids, values ints >= 1)")
    mm = {q: m for q, m in min_match.items() if m > 1}
    return mm or None


#: batch size at which the scorer pre-decodes every pruned block in bulk
#: (one varint pass per column + one tf_part for the whole set) instead of
#: decoding lazily per (query, term). Lazy decode preserves block-max skip
#: savings for interactive single queries; at ≥ this many queries the
#: per-call fixed cost of thousands of tiny decodes dominates the skips
#: (measured: 50-query batch on the 1M index spends ~5.7 of 8.5 scorer
#: seconds in small-array decode overhead).
_PRECOMPUTE_MIN_QUERIES = 8


def _prefill_parts(blocks: list[dict], codec: str, avgdl: float) -> dict:
    """Decode cache {block identity: (doc_ids, tf_part)} for a block set,
    built in three varint passes + one vectorized tf_part. Values are
    bit-identical to the lazy path (same concatenation-order elementwise
    math), so results never depend on which path ran."""
    from ..kernels.blocks import decode_blocks_arrays
    from ..kernels.bm25 import tf_part
    ids, tfs, dls, bounds = decode_blocks_arrays(blocks, codec)
    part = tf_part(tfs, dls, avgdl)
    return {id(b): (ids[bounds[i]:bounds[i + 1]],
                    part[bounds[i]:bounds[i + 1]])
            for i, b in enumerate(blocks)}


def _score_block_table(tbl, score_group, codec: str, avgdl: float,
                       prefill: bool):
    """Score a pyarrow Table of pruned block rows (any number of salts —
    each salt's rows must be complete in ``tbl``): one lexsort groups rows
    by (salt, term, block_id), then the shared group scorer runs per doc
    range. Shared VERBATIM by the driver-local path and the distributed
    mapInArrow partitions, so their results are bit-identical. With
    ``prefill`` (query batches), every block decodes up front in three
    varint passes + one tf_part instead of thousands of tiny per-(query,
    term) decodes. Returns (qids, doc_ids, scores) lists."""
    import numpy as np
    term_dict = tbl["term"].combine_chunks().dictionary_encode()
    tcode = term_dict.indices.to_numpy()
    terms_list = term_dict.dictionary.to_pylist()
    salt = tbl["salt"].to_numpy()
    bid = tbl["block_id"].to_numpy()
    order = np.lexsort((bid, tcode, salt))
    cols = {c: tbl[c].to_pylist() for c in _REC_COLS}
    recs = [dict(zip(_REC_COLS, row), codec=codec) for row in zip(
        *[[cols[c][i] for i in order] for c in _REC_COLS])]
    salt_o, tcode_o = salt[order], tcode[order]
    bounds = np.flatnonzero(np.concatenate(
        ([True], (salt_o[1:] != salt_o[:-1])
         | (tcode_o[1:] != tcode_o[:-1]), [True])))
    out_q: list = []
    out_d: list = []
    out_s: list = []
    by_term: dict[str, list[dict]] = {}
    salt_start = 0
    for gi in range(len(bounds) - 1):
        s, e = bounds[gi], bounds[gi + 1]
        if not by_term:
            salt_start = s
        by_term[terms_list[tcode_o[s]]] = recs[s:e]
        last_of_salt = (gi + 1 == len(bounds) - 1
                        or salt_o[bounds[gi + 1]] != salt_o[s])
        if last_of_salt:
            # per-SALT bulk decode: three varint passes over ~range_size
            # postings replace one tiny decode per (query, term) — sized so
            # the decoded arrays stay ~MBs (whole-scan prefill measured
            # PATHOLOGICAL on this host: hundreds of MB of live temp
            # arrays turn every small numpy op into a page-fault stall)
            cache = (_prefill_parts(recs[salt_start:e], codec, avgdl)
                     if prefill else None)
            q, d, sc = score_group(int(salt_o[s]), by_term, cache)
            out_q.extend(q)
            out_d.extend(d)
            out_s.extend(sc)
            by_term = {}
    return out_q, out_d, out_s


def _make_arrow_scorer(qplan, idf_map, mode, base_mult, codec, avgdl,
                       tombstones=None, required_groups=None,
                       pot_scale: float = 1.0, bool_trees=None,
                       cursors=None, boosts=None, min_match=None,
                       syn_groups=None):
    """mapInArrow partition function for the distributed path: each
    partition holds complete salts (repartition("salt") upstream), blobs
    stay Arrow buffers end to end — no pandas object conversion of
    posting blobs (measured ~4.5 s of a 50-query batch at local[2])."""
    score_group = _make_group_scorer(qplan, idf_map, mode, base_mult, avgdl,
                                     tombstones, required_groups, pot_scale,
                                     bool_trees, cursors, boosts, min_match,
                                     syn_groups)
    prefill = len(qplan) >= _PRECOMPUTE_MIN_QUERIES

    def score_arrow(batches):
        import pyarrow as pa
        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        if tbl.num_rows == 0:
            return
        q, d, s = _score_block_table(tbl, score_group, codec, avgdl,
                                     prefill)
        yield pa.RecordBatch.from_arrays(
            [pa.array(q, pa.int32()), pa.array(d, pa.int64()),
             pa.array(s, pa.float64())],
            names=["query_id", "doc_id", "score"])

    return score_arrow


#: (applicationId, scan_partition_bytes, mirrored conf values) -> child
#: session. Keying on the mirrored values means a caller whose runtime
#: conf differs (e.g. another timeZone) gets its OWN child rather than
#: silently inheriting a previous caller's settings. Guarded by a lock:
#: concurrent Index construction across serving threads must not race
#: the eviction sweep into the set/restore fallback (r5 review).
_QSPARK_CACHE: dict[tuple, SparkSession] = {}
import threading as _threading                                # noqa: E402
_QSPARK_LOCK = _threading.Lock()

_QSPARK_MIRROR = ("spark.sql.shuffle.partitions",
                  "spark.sql.adaptive.enabled",
                  "spark.sql.adaptive.coalescePartitions.enabled",
                  "spark.sql.execution.arrow.maxRecordsPerBatch",
                  "spark.sql.session.timeZone")


def _query_session(spark: SparkSession,
                   scan_partition_bytes: str) -> SparkSession:
    """One shared child session per (application, split size, mirrored
    caller confs) — isolated SQL conf for the query scan without leaking
    a session per Index instance."""
    try:
        mirrored = tuple(spark.conf.get(k) for k in _QSPARK_MIRROR)
        app = spark.sparkContext.applicationId
        key = (app, scan_partition_bytes, mirrored)
        with _QSPARK_LOCK:
            cached = _QSPARK_CACHE.get(key)
            if cached is not None:
                return cached
            # evict sessions of other (stopped/replaced) applications —
            # a restarted context gets a new applicationId, so stale
            # entries would otherwise be retained forever (r5 review)
            for k in [k for k in _QSPARK_CACHE if k[0] != app]:
                del _QSPARK_CACHE[k]
            qspark = spark.newSession()
            for k, v in zip(_QSPARK_MIRROR, mirrored):
                qspark.conf.set(k, v)
            qspark.conf.set("spark.sql.files.maxPartitionBytes",
                            scan_partition_bytes)
            _QSPARK_CACHE[key] = qspark
            return qspark
    except Exception:          # e.g. a connect session: fall back, scan
        return spark           # splits then follow the session setting


def group_mixed_specs(specs: list[tuple], caller: str) -> dict:
    """Validate + group a mixed serving batch — the ONE definition of
    the per-query spec grammar, shared by `Index.search_rows_mixed` and
    the federation's `search_rows_mixed_sharded` (fourth review: two
    verbatim copies would silently desynchronize the surfaces).

    ``specs`` = [(query_id, text, k, mode, filters)]; returns
    {(mode, filters_signature): [(qid, text, k, filters)]} with
    query-id uniqueness and phrase-takes-no-filters enforced."""
    import json
    from collections import defaultdict
    qids = [s[0] for s in specs]
    if len(set(qids)) != len(qids):
        dup = sorted({q for q in qids if qids.count(q) > 1})
        raise ValueError(
            f"{caller}: duplicate query_ids {dup} — results from "
            f"different sub-batches would interleave under the same id; "
            f"give every spec a unique query_id")
    groups: dict[tuple, list] = defaultdict(list)
    for qid, text, k, mode, filt in specs:
        if (mode or "or") == "phrase" and filt:
            raise ValueError("phrase specs do not take filters")
        sig = (mode or "or",
               json.dumps(filt, sort_keys=True, default=list)
               if filt else "")
        groups[sig].append((qid, text, k, filt))
    return groups


class Index:
    """Reader over a built index directory (plans/build.py layout)."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache: bool = False, local_bytes: int = 64 << 20,
                 scan_partition_bytes: str = "128m"):
        """local_bytes: when the index lives on a local filesystem and the
        estimated pruned posting bytes for a query batch fall under this
        bound, score on the DRIVER via pyarrow (same kernels, zero Spark
        jobs) — the analog of donkey serving from its RAM-resident index.
        0 disables the fast path. The distributed path takes over
        automatically for hot terms / big batches / remote storage.

        scan_partition_bytes: file-split size for the distributed
        scorer's segment scan, set on an isolated child session (shared
        SparkContext, own SQL conf) so the caller's session — which
        get_spark tunes DOWN to 8m so the build's extractor UDF gets
        enough input tasks — is never mutated or raced. At 8m the query
        scan fragments into hundreds of tiny tasks: measured +1s on the
        1M-index 50-query warm batch; 64–256m all equally fix it
        (BENCH/BASELINE.md §Query latency)."""
        from ..fsutil import fs_is_local, local_path
        self.spark = spark
        self.dir = index_dir
        # gate on the RESOLVED filesystem, not the path string: a
        # scheme-less path means fs.defaultFS (HDFS on a real cluster)
        # to Spark but the local disk to pyarrow — only scheme == 'file'
        # makes the driver-side reads coherent
        self.local_bytes = (local_bytes
                            if fs_is_local(spark, index_dir) else 0)
        self.scan_partition_bytes = scan_partition_bytes
        self._local_dir = local_path(index_dir)
        m = spark.read.parquet(f"{index_dir}/meta").collect()[0]
        from .positions import POSITIONS_VERSION
        if int(m["version"]) > POSITIONS_VERSION:
            raise ValueError(
                f"index {index_dir} has format version {int(m['version'])} "
                f"> supported {POSITIONS_VERSION}; upgrade the engine to "
                f"read it")
        self.version = int(m["version"])
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])
        self.range_size = int(m["range_size"])
        self.codec = m["codec"]
        self.n_buckets = int(m["n_buckets"])
        md = m.asDict()
        from ..streaming.ingest import split_facets
        self.facets = split_facets(md, "facets")
        # numeric range facets (§2.14 T25) — the trie step is a layout
        # property: query decomposition must split where the build did
        from ..operators.ranges import RANGE_STEP
        self.range_facets = split_facets(md, "range_facets")
        self.range_step = int(md.get("range_step") or RANGE_STEP)
        # the distributed scorer's scan runs on an ISOLATED child session
        # (shared SparkContext, own SQL conf) so its split sizing never
        # mutates — or races with — the caller's session conf (the build
        # tunes maxPartitionBytes DOWN; a set/restore around the collect
        # would leak across concurrently-serving threads). Child sessions
        # are SHARED per (application, split size, mirrored-conf values):
        # embedders constructing many Index objects would otherwise leak
        # one never-released session each (r4 ADVICE).
        self._qspark = _query_session(spark, scan_partition_bytes)
        self._seg = self._qspark.read.option(
            "basePath", f"{index_dir}/segments").parquet(
            f"{index_dir}/segments")
        self._dict = spark.read.parquet(f"{index_dir}/dictionary")
        self._docs = spark.read.parquet(f"{index_dir}/docs")
        # tombstoned doc ids (plans/delete.py): invisible to every query,
        # stats frozen until compact_index — keys resolved to ids once
        # per Index; the array ships to executors ONCE via broadcast
        # (a plain closure capture would re-serialize it per search call)
        from .delete import load_tombstones
        self._tombstones = load_tombstones(spark, index_dir)
        self._tombstones_bc = (
            spark.sparkContext.broadcast(self._tombstones)
            if self._tombstones.size else None)
        self._df_memo: dict[str, int | None] = {}
        # r6: "opening the index" includes discovering its files — do the
        # pyarrow dataset listings here (construction time, the donkey
        # analog of mapping the index at startup) so the first query's
        # latency is scoring, not directory walks. Best-effort: a
        # layout without positions/facet dirs simply skips them.
        if self.local_bytes > 0:
            for sub in ("segments", "dictionary", "docs"):
                try:
                    self._pa_dataset(sub)
                except Exception:
                    pass
        if cache:
            self._seg = self._seg.persist()
            self._seg.count()          # materialize the warm index

    # -- planning helpers -------------------------------------------------
    def _active_dict_chunks(self) -> list[str] | None:
        """Dictionary chunk values a reader must sum, or None for "all"
        (the common case: no merged partial exists). A chunk=m<E> partial
        written by streaming.merge_dictionary_partials supersedes the
        stream partials it folded — summing those too would double-count
        df if the merge's source GC was interrupted. One FS listing,
        memoized per Index (same staleness contract as the cached
        DataFrame handles)."""
        if not hasattr(self, "_dict_chunks"):
            from ..streaming.ingest import (_is_m_chunk,
                                            active_dictionary_chunks,
                                            dictionary_chunks)
            chunks = dictionary_chunks(self.spark, self.dir)
            self._dict_chunks = (active_dictionary_chunks(chunks)
                                 if any(_is_m_chunk(c) for c in chunks)
                                 else None)
        return self._dict_chunks

    def _lookup_terms(self, terms: list[str]) -> dict[str, int]:
        """term -> df via dictionary (bucket dirs + term stats pruning);
        memoized — repeated terms never re-probe parquet. On a local
        filesystem the probe is a pyarrow row-group-pruned read (~ms);
        remote storage uses the Spark scan. The dictionary is a union of
        per-chunk partials (batch + streaming epochs), so a term's df is
        the SUM of its rows; probe cost grows with the number of stream
        epochs until compact_index() folds them back into one chunk."""
        missing = [t for t in terms if t not in self._df_memo]
        if missing:
            buckets = sorted({term_bucket_py(t, self.n_buckets)
                              for t in missing})
            active = self._active_dict_chunks()
            found: dict[str, int] = {}
            if self.local_bytes > 0:
                import pyarrow.dataset as ds
                filt = (ds.field("bucket").isin(buckets)
                        & ds.field("term").isin(missing))
                if active is not None:
                    filt &= ds.field("chunk").isin(active)
                tbl = self._pa_dataset("dictionary").to_table(
                    columns=["term", "df"], filter=filt)
                for t, d in zip(tbl["term"].to_pylist(),
                                tbl["df"].to_pylist()):
                    found[t] = found.get(t, 0) + int(d)
            else:
                d = self._dict
                if active is not None:
                    d = d.where(F.col("chunk").isin(active))
                rows = (d.where(F.col("bucket").isin(buckets)
                                & F.col("term").isin(missing))
                        .groupBy("term").agg(F.sum("df").alias("df"))
                        .collect())
                found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_memo[t] = found.get(t)
        return {t: self._df_memo[t] for t in terms
                if self._df_memo.get(t) is not None}

    # -- search ------------------------------------------------------------
    def _plan_search(self, queries: list[tuple[int, str, int]],
                     mode: str = "or",
                     filters: dict | None = None,
                     stats: dict | None = None,
                     bool_trees: dict | None = None,
                     min_match: dict | None = None,
                     synonyms: dict | None = None) -> dict | None:
        """The shared planning pass: parse → dictionary probe → facet
        resolution → per-query term plans → bucket pruning → the
        local-vs-distributed cost decision. Returns None when the plan
        is provably empty (every early-exit search_rows takes);
        otherwise the dict search_rows executes and explain_search
        reports.

        ``stats``: corpus-stats override {"n_docs", "avgdl", "dfs"} for
        federated sharded search (plans/sharded.py) — idf comes from the
        GLOBAL df/N, tf normalization from the global avgdl, while term
        presence, pruning, and postings stay this shard's. Block-max
        potentials are inflated by avgdl_global/avgdl_local when the
        global avgdl is larger (the stored block maxima were computed at
        build avgdl; tf_part's ratio is bounded by the avgdl ratio, so
        the scaled potentials remain safe upper bounds).

        ``bool_trees`` ({qid: parsed tree}, with mode="bool" — see
        search_rows_bool): a query's SCAN terms are every term of its
        tree (NOT branches decode presence too), its SCORING terms the
        positive ones; the plan carries the trees to the scorer."""
        if mode == "bool":
            if bool_trees is None or set(bool_trees) != {
                    qid for qid, _, _ in queries}:
                raise ValueError("mode='bool' needs a parsed tree per "
                                 "query (use search_rows_bool)")
        elif mode not in ("or", "and"):
            raise ValueError(mode)
        if stats is not None and not {"n_docs", "avgdl", "dfs"} <= set(stats):
            raise ValueError(
                "stats override needs n_docs, avgdl and dfs keys")
        syn_map = _normalize_synonyms(synonyms, mode, min_match)
        facet_groups: list[tuple[str, list[str]]] = []
        if filters:
            # one shared compilation (equality tags + range trie
            # decomposition) with the facet-histogram path — see
            # operators/facets.resolve_filter_groups
            from ..operators.facets import resolve_filter_groups
            facet_groups = resolve_filter_groups(
                filters, self.facets, self.range_facets, self.range_step)
        facet_terms = [t for _, g in facet_groups for t in g]
        # a query's text may instead be a pre-resolved term LIST (the
        # pattern-expansion and federation paths resolve terms before
        # planning); strings go through the §T tokenizer as ever. A
        # boolean query's probe/scan terms are its WHOLE tree's.
        if mode == "bool":
            from ..functions.boolquery import bool_terms
            parsed = {qid: (sorted(bool_terms(bool_trees[qid])), k)
                      for qid, _, k in queries}
        else:
            parsed = {qid: (sorted(set(q))
                            if isinstance(q, (list, tuple,
                                              set, frozenset))
                            else sorted(set(tokenize_py(q))), k)
                      for qid, q, k in queries}
        syn_members: set[str] = set()
        if syn_map:
            for ts, _ in parsed.values():
                for t in ts:
                    if t in syn_map:
                        syn_members.update(syn_map[t])
        all_terms = sorted({t for ts, _ in parsed.values() for t in ts}
                           | set(facet_terms) | syn_members)
        dfs = self._lookup_terms(all_terms)
        if any(kind == "any" and all(t not in dfs for t in g)
               for kind, g in facet_groups):
            return None   # no doc carries ANY requested value of a column
        # values absent from the dictionary drop out of their group; an
        # emptied NOT group excludes nothing and drops entirely
        facet_groups = [(kind, [t for t in g if t in dfs])
                        for kind, g in facet_groups]
        facet_groups = [(kind, g) for kind, g in facet_groups if g]
        facet_terms = [t for _, g in facet_groups for t in g]
        live_terms = sorted(dfs)
        if not live_terms:
            return None
        # idf from the global stats when overridden (terms the override
        # does not list — e.g. facet tags — keep their local df; facet
        # presence postings are zero-score either way)
        n_eff = int(stats["n_docs"]) if stats else self.n_docs
        sdfs = stats["dfs"] if stats else {}
        idf_map = {t: float(bm25_idf(n_eff, sdfs.get(t, dfs[t])))
                   for t in live_terms}
        if mode == "bool":
            # scoring terms = the tree's POSITIVE terms (guardedness:
            # every match carries one); a query with no live positive
            # term has a provably empty match set and drops
            from ..functions.boolquery import positive_terms
            qplan = [(qid,
                      [t for t in sorted(positive_terms(bool_trees[qid]))
                       if t in idf_map], k)
                     for qid, (ts, k) in parsed.items()]
        else:
            # a term heading a synonym group scores through its GROUP
            # (summed tf under the blended idf), never also as a plain
            # term; other tokens are independent clauses as ever
            qplan = [(qid, [t for t in ts
                            if t in idf_map
                            and not (syn_map and t in syn_map)], k)
                     for qid, (ts, k) in parsed.items()
                     if mode == "or" or all(t in idf_map for t in ts)]
        syn_groups = None
        if syn_map:
            # per query: one SynonymQuery group per syn_map'd token —
            # live members only; idf from the MAX live-member df
            # (Lucene's docFreq blend), global dfs under a stats
            # override exactly like plain terms
            syn_groups = {}
            for qid, (ts, k) in parsed.items():
                gs = []
                for t in ts:
                    mems = syn_map.get(t)
                    if not mems:
                        continue
                    # liveness is GLOBAL under a stats override: a
                    # member absent from this shard's dictionary but
                    # live elsewhere still sets the blended idf (the
                    # unified index would see it), it just has no
                    # postings to decode here
                    live = [m for m in mems if m in dfs or m in sdfs]
                    if not live:
                        continue   # whole clause OOV — drops like one
                    df_g = max(int(sdfs.get(m, dfs.get(m, 0)))
                               for m in live)
                    gs.append((float(bm25_idf(n_eff, df_g)), live, t))
                if gs:
                    syn_groups[qid] = gs
            syn_groups = syn_groups or None
        qplan = [q for q in qplan
                 if q[1] or (syn_groups and syn_groups.get(q[0]))]
        if min_match:
            # minimum_should_match counts DISTINCT query terms present
            # in a doc; out-of-dictionary terms can never contribute, so
            # a query with fewer live terms than its m is provably empty
            # (ES semantics: OOV should-clauses still count toward m)
            qplan = [q for q in qplan
                     if len(q[1]) >= min_match.get(q[0], 1)]
        # facets apply as a per-salt presence mask in BOTH modes — built
        # once per salt, never per query (see _make_group_scorer)
        required = facet_groups or None
        if not qplan:
            return None

        # a boolean query's scan/decode work spans ALL its live tree
        # terms (NOT branches decode presence masks too), not just the
        # scored positives
        if mode == "bool":
            work_terms = {qid: [t for t in parsed[qid][0] if t in dfs]
                          for qid, _, _ in qplan}
        else:
            work_terms = {qid: ts for qid, ts, _ in qplan}
        if syn_groups:
            # group members' postings are scanned and decoded like any
            # scored term — the cost model and fetch set must price them
            for qid, gs in syn_groups.items():
                if qid in work_terms:
                    # locally-present members only: globally-live ones
                    # without postings here cost (and fetch) nothing
                    work_terms[qid] = sorted(
                        set(work_terms[qid])
                        | {m for _, live, _ in gs for m in live
                           if m in dfs})
        needed = sorted({t for ts in work_terms.values() for t in ts}
                        | set(facet_terms))
        buckets = sorted({term_bucket_py(t, self.n_buckets)
                          for t in needed})
        # Cost model: the scorer touches each query's terms' postings, so
        # driver-local WORK is Σ_q Σ_{t∈q} df(t) — not the union — while
        # the distributed path amortizes one ~2 s job over all queries and
        # all cores. Go local only when the single-threaded work is small.
        # Facet postings decode once per salt (shared cache), so they
        # count once, not per query.
        est_work = (sum(dfs[t] for ts in work_terms.values()
                        for t in ts if t not in facet_terms)
                    + sum(dfs[t] for t in facet_terms)) * _BYTES_PER_POSTING
        use_local = 0 < est_work <= self.local_bytes
        avgdl_eff = float(stats["avgdl"]) if stats else self.avgdl
        # potentials must be scaled against the LOWEST avgdl any chunk's
        # block maxima were computed at — not meta's current avgdl: on a
        # stream-/upsert-fed index, later epochs can raise meta avgdl
        # above an older chunk's write-time value, and unscaled maxima
        # would then under-bound tf_part (an unsafe block skip — r5
        # second review). Batch-only indexes have one write avgdl ==
        # meta avgdl, so the scale stays exactly 1.0 there.
        min_wavg = self._min_write_avgdl()
        return {"qplan": qplan, "idf_map": idf_map, "dfs": dfs,
                "needed": needed, "buckets": buckets,
                "required": required, "facet_terms": facet_terms,
                "est_work": est_work, "use_local": use_local,
                "parsed": parsed, "avgdl": avgdl_eff,
                "syn_groups": syn_groups,
                "trees": ({qid: bool_trees[qid] for qid, _, _ in qplan}
                          if mode == "bool" else None),
                "pot_scale": (max(1.0, avgdl_eff / min_wavg)
                              if min_wavg > 0 else 1.0)}

    def _min_write_avgdl(self) -> float:
        """Lower bound on the avgdl any content chunk's block maxima
        were computed with (memoized; one tiny journal read on epoch-fed
        indexes, a single existence probe otherwise). Every chunk's
        write avgdl is a convex combination of the batch base average
        and the per-epoch averages applied before it (build uses ONE
        global avgdl for all batch chunks; each epoch uses the running
        cumulative), so min(base avg, per-epoch avgs) bounds them all.
        Facet-backfill chunks are excluded (n_docs=0 journal rows):
        presence postings are mask-decoded, never potential-pruned.

        Meta can LAG the journal (a crash between an epoch's journal
        row — its commit point — and its meta write), so the derived
        batch base is an estimate. It stays SAFE: meta always equals
        base + a PREFIX of journal rows, and every epoch avg is an
        exact candidate, so (a) if the true minimum is an epoch avg it
        is already in the candidate set, and (b) if the true minimum is
        the batch avg, the missing suffix's epochs all average above it
        and subtracting their mass can only pull the estimate DOWN —
        min(candidates) ≤ the true minimum either way, i.e. pot_scale
        only ever over-scales in the torn window (looser pruning, never
        an unsafe skip). The one unusable case — the subtraction going
        non-positive — recomputes the batch base exactly from the docs
        table's batch chunks instead of guessing (r5 third review)."""
        cached = getattr(self, "_min_wavg", None)
        if cached is not None:
            return cached
        from ..streaming.ingest import journal_df
        j = journal_df(self.spark, self.dir)
        cands = []
        jn = jdl = 0
        if j is not None:
            for r in j.select("n_docs", "sum_dl").collect():
                n, dl = int(r["n_docs"]), int(r["sum_dl"])
                if n > 0:
                    cands.append(dl / n)
                    jn += n
                    jdl += dl
        base_n = self.n_docs - jn
        # total sum_dl is integral, so round() recovers it exactly
        base_dl = round(self.avgdl * self.n_docs) - jdl
        if base_n > 0 and base_dl > 0:
            cands.append(base_dl / base_n)
        elif base_n != 0 or base_dl != 0:
            # inconsistent estimate = meta is mid-crash-window stale;
            # recover the exact batch base (bounded agg over the docs
            # table's non-epoch chunks — the same job streaming runs
            # once per run). base_n == base_dl == 0 is the legitimate
            # pure-epoch-fed index: no batch candidate to add.
            from ..streaming.ingest import _base_state
            b = _base_state(self.spark, self.dir)
            if b["n"] > 0:
                cands.append(b["dl"] / b["n"])
        self._min_wavg = min(cands) if cands else self.avgdl
        return self._min_wavg

    def explain_search(self, queries: list[tuple[int, str, int]],
                       mode: str = "or",
                       filters: dict | None = None) -> dict:
        """Observability: the pruning/cost decisions search_rows would
        take for this batch, WITHOUT executing it — what an EXPLAIN is
        to a SQL engine. Returns a plain dict (JSON-serializable):

        * ``path``: "local" (driver pyarrow over the pruned block set),
          "distributed" (repartition-by-salt mapInArrow scan), or
          "empty" (provably no results — OOV terms, empty facet
          selection, AND with a missing conjunct);
        * per-query term plans with df and idf (dropped OOV terms
          listed separately);
        * ``buckets_probed`` of ``n_buckets`` segment dirs read;
        * ``est_bytes`` (the cost model's work estimate) vs
          ``local_budget_bytes``;
        * facet groups as resolved against the dictionary, the
          tombstone count, and whether the batch qualifies for the
          decode-cache prefill.

        mode="bool" is explained too (trees parsed here, as
        search_rows_bool would): ``terms`` are the SCORED positives and
        each query gains ``mask_terms`` — the tree terms decoded only
        for the presence mask (NOT branches). mode="pattern" resolves
        each query's prefix/fuzzy/wildcard/regexp atoms exactly as
        search_rows_pattern would (capped, df-ranked, memoized) and
        explains the resulting OR plan; each query gains
        ``expansions`` — {pattern atom: [expanded terms]}.
        """
        trees = None
        expansions = None
        if mode == "bool":
            from ..functions.boolquery import parse_bool_text
            trees = {qid: parse_bool_text(text)
                     for qid, text, _ in queries}
        elif mode == "pattern":
            from ..functions.patterns import parse_pattern_text
            expansions = {}
            for qid, text, _ in queries:
                _, pats = parse_pattern_text(text)
                expansions[qid] = {
                    (base + "*" if kind == "prefix" else
                     f"{base}~{dist}" if kind == "fuzzy" else
                     f"/{base}/" if kind == "regexp" else base):
                        [t for t, _ in self.expand_pattern(kind, base,
                                                           dist)]
                    for kind, base, dist in pats}
            queries = self.resolve_pattern_terms(queries)
        plan = self._plan_search(
            queries, "or" if mode == "pattern" else mode, filters,
            bool_trees=trees)
        base = {
            "mode": mode,
            "n_queries": len(queries),
            "tombstones": int(self._tombstones.size),
            "local_budget_bytes": int(self.local_bytes),
            "n_buckets": int(self.n_buckets),
        }
        if plan is None:
            return {**base, "path": "empty", "queries": {}, "reason":
                    "no query term (or required facet value) is in the "
                    "dictionary"}
        dfs, idf = plan["dfs"], plan["idf_map"]
        per_q = {}
        for qid, ts, k in plan["qplan"]:
            want = plan["parsed"][qid][0]
            per_q[qid] = {
                "k": k,
                "terms": [{"term": t, "df": int(dfs[t]),
                           "idf": round(idf[t], 6)} for t in ts],
                "dropped_oov": [t for t in want if t not in idf],
            }
            if mode == "bool":
                per_q[qid]["mask_terms"] = [
                    t for t in want if t in idf and t not in ts]
            if expansions is not None:
                per_q[qid]["expansions"] = expansions[qid]
        return {
            **base,
            "path": "local" if plan["use_local"] else "distributed",
            "est_bytes": int(plan["est_work"]),
            "buckets_probed": len(plan["buckets"]),
            "facet_groups": [
                {"kind": kind,
                 "values": [t.split("=", 1)[1] for t in g]}
                for kind, g in (plan["required"] or [])],
            "prefill": len(plan["qplan"]) >= _PRECOMPUTE_MIN_QUERIES,
            "queries": per_q,
        }

    def search_rows(self, queries: list[tuple[int, str, int]],
                    mode: str = "or",
                    filters: dict | None = None,
                    stats: dict | None = None,
                    bool_trees: dict | None = None,
                    cursors: dict | None = None,
                    boosts: dict | None = None,
                    min_match: int | dict | None = None,
                    synonyms: dict | None = None) -> list[tuple]:
        """queries: [(query_id, text, k)] -> fully-materialized result rows
        [(query_id, rank, doc_id, score, repo, path)] sorted by
        (query_id, rank) — the serving-layer surface (donkey's Hits
        analog; results are ≤ Σk rows by construction, never distributed).

        mode="or" (default): disjunctive block-max scoring. mode="and":
        conjunctive — only docs containing EVERY query term score (op 32
        intersection fast path); a query with any out-of-dictionary term
        returns no rows (no doc can contain it).

        filters={"lang": "py"} or {"lang": ["py", "java"], ...}: restrict
        every query of the batch to docs carrying the facet values —
        a LIST is an OR within that column (`lang IN (py, java)`), and
        columns AND together (index must be built with facets=...; see
        plans/build.py). {"lang": {"not": ["py", ...]}} NEGATES: docs
        carrying any listed value are excluded; docs WITHOUT the column
        pass (complement semantics — the SQL twin is `lang IS NULL OR
        lang NOT IN (...)`). Facet terms intersect as zero-score
        presence postings — BM25 scores are identical to the unfiltered
        query's scores for the surviving docs.

        ``stats``: global corpus-stats override for federated sharded
        search (see _plan_search / plans/sharded.py). ``bool_trees``:
        internal — parsed trees for mode="bool"; use search_rows_bool,
        which parses query texts and supplies them. ``cursors``:
        internal — {query_id: (score, doc_id)} cursor-pagination
        boundaries; use search_rows_after, which validates them.
        ``boosts`` ({query_id: {term: w}}, every w > 0): per-term
        relevance weights — the query's term scores w·idf·tf_part (see
        functions/boosts.py; search_rows_boosted parses the ``term^w``
        text syntax into this).

        ``min_match`` (the ES ``minimum_should_match`` knob, mode="or"
        only — the dial between OR and AND): an int (every query) or
        {query_id: int}; a doc must contain at least that many DISTINCT
        query terms to rank, and a surviving doc's score is unchanged
        (the same per-matched-term BM25 sum the plain OR query gives
        it). m <= 1 is bit-identical to the plain query; m == the
        query's term count reproduces mode="and"'s results; m above the
        query's in-dictionary term count is provably empty (an
        out-of-dictionary term can never be matched). Composes with
        ``filters``, ``boosts``, tombstones and cursors.

        synonyms={"list": ["array", "vec"]} (mode="or" only — the
        Lucene SynonymQuery construct): a query token with a map entry
        scores as ONE blended clause over {token} ∪ synonyms — per
        doc the members' tfs SUM before the BM25 saturation, under one
        idf from the MAX member df (Lucene's docFreq blend) — instead
        of as independent per-term clauses; other tokens are
        unaffected, and a token that is only a VALUE in the map (not a
        key) still scores alone. Members absent from the dictionary
        drop from the group; a group with every member OOV drops like
        an OOV term. A boost on the head token (``list^2``) scales the
        group's blended idf. Does not compose with ``min_match`` (a
        group is one clause; the counting kernel counts terms)."""
        from ..functions.boosts import validate_boosts
        validate_boosts(boosts, "search_rows")
        min_match = _validate_min_match(min_match, queries, mode)
        plan = self._plan_search(queries, mode, filters, stats,
                                 bool_trees=bool_trees,
                                 min_match=min_match,
                                 synonyms=synonyms)
        if plan is None:
            return []
        qplan, idf_map, dfs = plan["qplan"], plan["idf_map"], plan["dfs"]
        needed, buckets = plan["needed"], plan["buckets"]
        required, use_local = plan["required"], plan["use_local"]
        avgdl, pot_scale = plan["avgdl"], plan["pot_scale"]
        syn_groups = plan["syn_groups"]
        spark = self.spark

        if use_local:
            # driver-local scoring: pyarrow reads ONLY the probed bucket
            # dirs + term-pruned row groups (same pruning the Spark scan
            # does), then the identical per-salt kernel runs in-process —
            # no Spark job. Bounded by est_work ≤ local_bytes.
            scorer = _make_group_scorer(qplan, idf_map, mode,
                                        self.range_size, avgdl,
                                        self._tombstones, required,
                                        pot_scale, plan["trees"],
                                        cursors, boosts, min_match,
                                        syn_groups)
            cand = self._local_candidates(
                needed, buckets, scorer,
                prefill=len(qplan) >= _PRECOMPUTE_MIN_QUERIES,
                avgdl=avgdl)
        else:
            score_arrow = _make_arrow_scorer(qplan, idf_map, mode,
                                             self.range_size, self.codec,
                                             avgdl,
                                             self._tombstones_bc, required,
                                             pot_scale, plan["trees"],
                                             cursors, boosts, min_match,
                                             syn_groups)
            seg = (self._seg
                   .where(F.col("bucket").isin(buckets)      # dir prune
                          & F.col("term").isin(needed))
                   .select(*_SEG_COLS))   # shuffle ONLY scorer columns
            # ONE exchange co-locating each salt's rows, then Arrow-native
            # scoring per partition (blobs never convert to pandas objects)
            scored = seg.repartition("salt").mapInArrow(
                score_arrow, "query_id int, doc_id long, score double")
            # Global top-k (op 35). Candidates are ≤ k per (query, touched
            # range). Small bound → merge on the driver (TakeOrdered
            # analog, saves a window+join job pair per call); large bound
            # (hot terms × many ranges at cluster scale) → distributed
            # window rank first.
            ks_ = {qid: k for qid, _, k in qplan}
            n_ranges = max(1, (self.n_docs + self.range_size - 1)
                           // self.range_size)
            cand_bound = (sum(min(k, self.n_docs) for k in ks_.values())
                          * n_ranges)
            if cand_bound > 1_000_000:
                from pyspark.sql import Window
                w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                           F.asc("doc_id"))
                # same session as the scan: DataFrames from different
                # sessions cannot join
                ksdf = self._qspark.createDataFrame(list(ks_.items()),
                                                    "query_id int, k int")
                scored = (scored.withColumn("rank", F.row_number().over(w))
                          .join(F.broadcast(ksdf), "query_id")
                          .where(F.col("rank") <= F.col("k"))
                          .drop("rank", "k"))
            if self._qspark is not spark:
                # split sizing comes from the isolated session's conf
                cand = [(r["query_id"], r["doc_id"], r["score"])
                        for r in scored.collect()]    # Spark job 1
            else:
                # newSession() unavailable (fallback): apply the split
                # sizing via set/restore — single-serving-thread
                # semantics on such sessions, but the scan must not run
                # fragmented at the build-tuned 8m
                _MPB = "spark.sql.files.maxPartitionBytes"
                prev_mpb = spark.conf.get(_MPB)
                spark.conf.set(_MPB, self.scan_partition_bytes)
                try:
                    cand = [(r["query_id"], r["doc_id"], r["score"])
                            for r in scored.collect()]
                finally:
                    spark.conf.set(_MPB, prev_mpb)

        ks = {qid: k for qid, _, k in qplan}
        by_q: dict[int, list] = {}
        for qid, did, sc in cand:
            by_q.setdefault(qid, []).append((did, sc))
        hits = []
        for qid, rows in by_q.items():
            rows.sort(key=lambda r: (-r[1], r[0]))
            hits.extend((qid, rk + 1, did, sc)
                        for rk, (did, sc) in enumerate(rows[:ks[qid]]))
        if not hits:
            return []

        ids = sorted({h[2] for h in hits})
        meta = self._doc_meta(ids, use_local)
        return [(qid, rk, d, s, *meta.get(d, (None, None)))
                for qid, rk, d, s in sorted(hits)]

    def search_batch(self, queries: list[tuple[int, str, int]],
                     mode: str = "or",
                     filters: dict | None = None,
                     min_match: int | dict | None = None,
                     synonyms: dict | None = None) -> DataFrame:
        """DataFrame wrapper over search_rows (same columns/ordering)."""
        return self.spark.createDataFrame(
            self.search_rows(queries, mode, filters=filters,
                             min_match=min_match, synonyms=synonyms),
            _RESULT_SCHEMA)

    def search_rows_bool(self, queries: list[tuple[int, str, int]],
                         filters: dict | None = None,
                         stats: dict | None = None) -> list[tuple]:
        """Boolean query expressions (§2.14 T24 — the Lucene
        BooleanQuery surface): each query text is a nested AND/OR/NOT
        expression over terms, e.g.
        ``"spark AND (shuffle OR join) AND NOT java"``. Match set =
        the boolean evaluation of term presence; score = the BM25 sum
        over the query's POSITIVE terms a matching doc contains (NOT
        constrains, never scores — Lucene MUST_NOT), so scores equal
        the plain OR query's for the surviving docs. Operators are
        UPPERCASE (lowercase "and"/"or"/"not" remain searchable
        terms); purely-negative expressions are refused (see
        functions/boolquery.py). Result rows/ordering and the
        ``filters``/``stats`` forms are exactly search_rows'.

        Cost shape: identical to an OR query over ALL the expression's
        terms — one pruned scan, one mask + score pass per salt; the
        boolean structure never adds a job, a join, or a shuffle."""
        from ..functions.boolquery import parse_bool_text
        trees = {qid: parse_bool_text(text) for qid, text, _ in queries}
        return self.search_rows(queries, mode="bool", filters=filters,
                                stats=stats, bool_trees=trees)

    def search_rows_boosted(self, queries: list[tuple[int, str, int]],
                            mode: str = "or",
                            filters: dict | None = None,
                            stats: dict | None = None) -> list[tuple]:
        """Per-term boosted queries (§2.14 — the Lucene ``term^2.5``
        relevance knob): each query text may weight atoms with a
        trailing ``^W`` (W a positive decimal), e.g.
        ``"wand^2 block max^0.5"`` — that term's BM25 contribution is
        multiplied by W. Parsing, the largest-wins duplicate rule, and
        why pruning stays exact live in functions/boosts.py. ``mode``
        or/and and ``filters`` compose exactly as on search_rows; an
        all-unweighted text is bit-identical to the plain query."""
        if mode not in ("or", "and"):
            raise ValueError(f"search_rows_boosted supports modes "
                             f"or/and, got {mode!r}")
        from ..functions.boosts import parse_boost_text
        parsed = {qid: parse_boost_text(text) for qid, text, _ in queries}
        boosts = {qid: bw for qid, (_, bw) in parsed.items() if bw}
        return self.search_rows(
            [(qid, parsed[qid][0], k) for qid, _, k in queries],
            mode=mode, filters=filters, stats=stats,
            boosts=boosts or None)

    def search_rows_mixed(self, specs: list[tuple]) -> list[tuple]:
        """Serving-loop surface for a batch with PER-QUERY modes/filters:
        ``specs`` = [(query_id, text, k, mode, filters)] (mode/filters
        may be None → "or" / unfiltered; modes "boosted"/"boosted-and"
        parse `term^W` weights in the text — search_rows_boosted).
        Queries sharing (mode, filter)
        run as one sub-batch through search_rows — the per-salt filter
        masks and the prefill decode cache amortize within each group,
        and the Index-level dictionary memo amortizes across groups —
        then results merge back sorted by (query_id, rank). query_ids
        must be unique across the whole batch."""
        out: list[tuple] = []
        for (mode, _), qs in group_mixed_specs(
                specs, "search_rows_mixed").items():
            if mode == "phrase":      # r5: exact-phrase specs (format v3)
                out.extend(r for q, t, kk, _ in qs
                           for r in self.search_phrase(t, k=kk,
                                                       query_id=q))
            elif mode == "pattern":   # r5: prefix/fuzzy/wildcard specs
                out.extend(self.search_rows_pattern(
                    [(q, t, k) for q, t, k, _ in qs],
                    filters=qs[0][3]))
            elif mode == "bool":      # r5: boolean expression specs
                out.extend(self.search_rows_bool(
                    [(q, t, k) for q, t, k, _ in qs],
                    filters=qs[0][3]))
            elif mode in ("boosted", "boosted-and"):   # r5: term^W specs
                out.extend(self.search_rows_boosted(
                    [(q, t, k) for q, t, k, _ in qs],
                    mode="and" if mode == "boosted-and" else "or",
                    filters=qs[0][3]))
            else:
                out.extend(self.search_rows(
                    [(q, t, k) for q, t, k, _ in qs],
                    mode=mode, filters=qs[0][3]))
        return sorted(out)

    # -- dictionary-expansion queries (prefix/fuzzy/wildcard; §2.14 T23/T26)
    def expand_pattern(self, kind: str, base: str, dist: int = 0,
                       max_expansions: int | None = None
                       ) -> list[tuple[str, int]]:
        """Matching dictionary terms for one pattern atom, ranked
        (df DESC, term ASC) and capped at ``max_expansions`` (None →
        config.MAX_TERM_EXPANSIONS): ``("prefix", "va")`` matches every
        term starting with ``va``; ``("fuzzy", "joun", 1)`` every term
        within edit distance 1; ``("wildcard", "va*ble")`` every term
        matching the ``*``/``?`` glob (SQL LIKE semantics, identical
        across the local pyarrow, distributed Spark, and DuckDB-oracle
        evaluations); ``("regexp", "jo(in|urnal)")`` every term the
        portable-grammar regexp whole-term-matches (one ``^(?:…)$``
        rendering evaluated by pyarrow RE2 locally, Spark RLIKE
        distributed, DuckDB RE2 in the oracle — the grammar admits
        only constructs the three dialects agree on). Returns
        ``[(term, df)]`` with df summed
        across dictionary chunks — exactly what ``_lookup_terms`` would
        report for the same terms (the dfs are memoized so the ensuing
        search never re-probes them).

        Cost shape: a prefix is a TERM-RANGE scan of the dictionary —
        pyarrow prunes row groups by term min/max stats on the local
        path, Spark pushes the range predicate into the parquet scan on
        the distributed path; it never touches segments. Fuzzy scans
        the dictionary's term column (length-banded, then a banded DP /
        codegen ``levenshtein``) — O(|dictionary|) work but on the
        index's SMALLEST table, one Spark job at any corpus size. A
        wildcard with a literal head keeps the head as a prefix range
        bound; a leading wildcard pays the fuzzy-shaped full term-column
        scan."""
        from ..config import MAX_TERM_EXPANSIONS
        cap = MAX_TERM_EXPANSIONS if max_expansions is None else max_expansions
        cand = self._expand_candidates(kind, base, dist)
        ranked = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
        for t, df in ranked:
            self._df_memo.setdefault(t, df)
        return ranked

    def search_rows_page(self, queries: list[tuple[int, str, int]],
                         offset: int, mode: str = "or",
                         filters: dict | None = None) -> list[tuple]:
        """Offset pagination — page rows offset+1..offset+k of each
        query's ranking (the ES from+size shape), re-ranked 1..k in
        the same result schema as search_rows. A query whose ranking
        is shorter than the offset contributes no rows. Deep pages pay
        retrieval of offset+k rows per query — the industry-standard
        deep-paging cost (Elasticsearch caps from+size at 10k for the
        same reason); this engine inherits the same guidance: paginate
        UIs with from+size, walk deep or exhaustive RANKED pages with
        search_rows_after (constant per-page cost — BENCH/BASELINE.md
        §Paging), and bulk-export rank-free with
        plans/facet_counts.match_ids (distributed)."""
        off = int(offset)
        if off < 0:
            raise ValueError(f"offset must be >= 0, got {offset}")
        if off == 0:
            return self.search_rows(queries, mode=mode, filters=filters)
        big = [(qid, text, int(k) + off) for qid, text, k in queries]
        rows = self.search_rows(big, mode=mode, filters=filters)
        return [(r[0], r[1] - off, *r[2:]) for r in rows if r[1] > off]

    def search_rows_after(self, queries: list[tuple[int, str, int]],
                          after: dict, mode: str = "or",
                          filters: dict | None = None) -> list[tuple]:
        """Cursor pagination (§2.14 T32 — the ES ``search_after`` shape):
        ``after`` maps query_id -> (score, doc_id), the LAST row of the
        query's previous page exactly as search_rows emitted it; returns
        the next k rows per query, re-ranked 1..k in search_rows' result
        schema. A query absent from ``after`` (or mapped to None) gets
        its FIRST page. An exhausted ranking returns no rows for that
        query. The score comparison is exact float equality — engine
        scores are deterministic and bit-identical across the local and
        distributed paths, so the boundary doc re-scores to the same
        double and the page tiling is exact, ties included.

        Scale shape vs search_rows_page: per-page cost is CONSTANT in
        page depth — candidates stay ≤ k per doc range and the driver
        merge stays O(Σk), where offset paging retrieves (and merges)
        offset+k rows per query. The trade: a cursor disables
        score-threshold (θ) block skipping for that query, since a
        partially-accumulated score cannot prove a doc will stay under
        the cursor; presence-based pruning (bucket dirs, term row
        groups, AND span intersection, facet masks, tombstones) is
        unaffected. This is the ES guidance verbatim: from+size for
        shallow UI pages, search_after for deep or exhaustive walks."""
        cursors: dict[int, tuple[float, int]] = {}
        qids = {qid for qid, _, _ in queries}
        for qid, cur in (after or {}).items():
            if qid not in qids:    # before the None skip: a stale qid
                # is a caller bug whether or not it carries a cursor
                raise ValueError(f"after has unknown query_id {qid!r}")
            if cur is None:
                continue
            try:
                cs, cd = cur
                cursors[qid] = (float(cs), int(cd))
            except (TypeError, ValueError) as e:
                raise ValueError(
                    f"after[{qid!r}] must be (score, doc_id), got "
                    f"{cur!r}") from e
        trees = None
        if mode == "bool":   # boolean expressions paginate too
            from ..functions.boolquery import parse_bool_text
            trees = {qid: parse_bool_text(text) for qid, text, _ in queries}
        elif mode not in ("or", "and"):
            raise ValueError(
                f"search_rows_after supports modes or/and/bool, got "
                f"{mode!r}")
        return self.search_rows(queries, mode=mode, filters=filters,
                                bool_trees=trees,
                                cursors=cursors or None)

    def suggest(self, term: str, k: int = 5,
                max_dist: int = 2) -> list[tuple[str, int, int]]:
        """Did-you-mean: the ``k`` dictionary terms closest to ``term``
        — (suggestion, distance, df) ranked (distance ASC, df DESC,
        term ASC), the Lucene DirectSpellChecker ordering (closer
        beats more-frequent; frequency breaks distance ties). The
        exact term never suggests itself; a term with zero live
        candidates within ``max_dist`` returns []. One length-banded
        dictionary term-column scan (the fuzzy-expansion path, facet
        sentinels excluded by its ``>= "0"`` floor, candidates
        memoized per Index) + a driver-side exact-distance rank over
        the bounded candidate set — never touches segments."""
        from ..functions.patterns import rank_suggestions, suggest_base
        base = suggest_base(term)
        cand = self._expand_candidates("fuzzy", base, int(max_dist))
        return rank_suggestions(cand, base, k, max_dist)

    def _expand_candidates(self, kind: str, base: str,
                           dist: int) -> dict[str, int]:
        """UNCAPPED term → summed-df for one pattern (memoized per
        Index; the federation's stats phase needs the full candidate
        set — see plans/sharded.search_pattern_sharded). Guarded by
        config.MAX_EXPANSION_CANDIDATES against patterns that match a
        dictionary-sized term set."""
        key = (kind, base, dist)
        return self._expand_candidates_multi([key])[key]

    def _expand_candidates_multi(self, keys: list[tuple]
                                 ) -> dict[tuple, dict[str, int]]:
        """Expand MANY patterns against the dictionary, sharing work:
        prefixes stay individual term-range probes (row-group pruned),
        but all fuzzy patterns share ONE term-column scan — the
        federation's stats phase expands every pattern of a batch in a
        single call per shard. Two hardening rules both scans enforce:

        * corpus terms live in ``[0-9a-z_]+`` while facet presence
          postings are ``\\x01``-prefixed (operators/facets.py), so a
          ``term >= "0"`` bound keeps internal facet sentinels out of
          the expansion space (a fuzzy pattern like ``lang_py~2`` is
          within edit distance of ``\\x01lang=py``) AND is a parquet-
          prunable range predicate;
        * the local path reads the dictionary batch-at-a-time so the
          MAX_EXPANSION_CANDIDATES guard fires BEFORE the driver
          materializes an unbounded match set (``a*`` over a 10^8-term
          dictionary refuses without first loading it)."""
        from ..config import MAX_EXPANSION_CANDIDATES as HARD
        from ..functions.patterns import (levenshtein_py,
                                          prefix_upper_bound,
                                          regexp_anchor,
                                          regexp_literal_head,
                                          wildcard_literal_head,
                                          wildcard_to_like)
        if not hasattr(self, "_exp_memo"):
            self._exp_memo: dict[tuple, dict[str, int]] = {}
        todo: list[tuple] = []
        for key in keys:
            if key[0] not in ("prefix", "fuzzy", "wildcard", "regexp"):
                raise ValueError(f"unknown pattern kind {key[0]!r}")
            if key not in self._exp_memo and key not in todo:
                todo.append(key)

        def _guard(found: dict, kind: str, base: str) -> None:
            if len(found) > HARD:
                raise ValueError(
                    f"pattern {base!r} ({kind}) matches more than "
                    f"{HARD} dictionary terms; use a longer "
                    f"prefix/smaller distance")

        active = self._active_dict_chunks()
        if todo and self.local_bytes > 0:
            import pyarrow.compute as pc
            import pyarrow.dataset as ds
            chunk_f = (ds.field("chunk").isin(active)
                       if active is not None else None)
            for kind, base, dist in [k for k in todo if k[0] == "prefix"]:
                filt = ((ds.field("term") >= base)
                        & (ds.field("term") < prefix_upper_bound(base)))
                if chunk_f is not None:
                    filt &= chunk_f
                found: dict[str, int] = {}
                for batch in self._pa_dataset("dictionary").scanner(
                        columns=["term", "df"], filter=filt).to_batches():
                    for t, d in zip(batch.column(0).to_pylist(),
                                    batch.column(1).to_pylist()):
                        found[t] = found.get(t, 0) + int(d)
                    _guard(found, kind, base)
                self._exp_memo[(kind, base, dist)] = found
            # wildcard and regexp share one probe shape: a mandatory
            # literal head row-group-prunes like a prefix; headless
            # patterns (leading metachar / top-level alternation) scan
            # the term column — the >= "0" floor keeps \x01 facet
            # sentinels out. Only the head function and the pyarrow
            # matcher differ per kind.
            _MATCHERS = {
                "wildcard": (wildcard_literal_head,
                             lambda b: (lambda col: pc.match_like(
                                 col, wildcard_to_like(b)))),
                "regexp": (regexp_literal_head,
                           lambda b: (lambda col: pc.match_substring_regex(
                               col, regexp_anchor(b)))),
            }
            for kind, base, dist in [k for k in todo
                                     if k[0] in _MATCHERS]:
                head_of, make_match = _MATCHERS[kind]
                head = head_of(base)
                if head:
                    filt = ((ds.field("term") >= head)
                            & (ds.field("term") < prefix_upper_bound(head)))
                else:
                    filt = ds.field("term") >= "0"
                if chunk_f is not None:
                    filt &= chunk_f
                match = make_match(base)
                found = {}
                for batch in self._pa_dataset("dictionary").scanner(
                        columns=["term", "df"], filter=filt).to_batches():
                    mask = match(batch.column(0))
                    for t, d in zip(
                            pc.filter(batch.column(0), mask).to_pylist(),
                            pc.filter(batch.column(1), mask).to_pylist()):
                        found[t] = found.get(t, 0) + int(d)
                    _guard(found, kind, base)
                self._exp_memo[(kind, base, dist)] = found
            fuzz = [k for k in todo if k[0] == "fuzzy"]
            if fuzz:
                filt = ds.field("term") >= "0"
                if chunk_f is not None:
                    filt &= chunk_f
                hits: dict[tuple, dict[str, int]] = {k: {} for k in fuzz}
                for batch in self._pa_dataset("dictionary").scanner(
                        columns=["term", "df"], filter=filt).to_batches():
                    terms = batch.column(0)
                    ln = pc.utf8_length(terms)
                    for key in fuzz:
                        _, base, dist = key
                        # length band first (vectorized), DP on the slice
                        mask = pc.and_(
                            pc.greater_equal(ln, len(base) - dist),
                            pc.less_equal(ln, len(base) + dist))
                        found = hits[key]
                        for t, d in zip(
                                pc.filter(terms, mask).to_pylist(),
                                pc.filter(batch.column(1),
                                          mask).to_pylist()):
                            if levenshtein_py(base, t, dist) <= dist:
                                found[t] = found.get(t, 0) + int(d)
                        _guard(found, "fuzzy", base)
                for key in fuzz:
                    self._exp_memo[key] = hits[key]
        elif todo:
            for kind, base, dist in todo:
                d = self._dict
                if active is not None:
                    d = d.where(F.col("chunk").isin(active))
                if kind == "prefix":
                    d = d.where((F.col("term") >= base)
                                & (F.col("term")
                                   < prefix_upper_bound(base)))
                elif kind in ("wildcard", "regexp"):
                    head = (wildcard_literal_head(base)
                            if kind == "wildcard"
                            else regexp_literal_head(base))
                    bound = ((F.col("term") >= head)
                             & (F.col("term") < prefix_upper_bound(head))
                             if head else F.col("term") >= "0")
                    pred = (F.col("term").like(wildcard_to_like(base))
                            if kind == "wildcard"
                            else F.col("term").rlike(regexp_anchor(base)))
                    d = d.where(bound & pred)
                else:
                    d = d.where(
                        (F.col("term") >= "0")
                        & F.length("term").between(len(base) - dist,
                                                   len(base) + dist)
                        & (F.levenshtein(F.lit(base),
                                         F.col("term")) <= dist))
                rows = (d.groupBy("term").agg(F.sum("df").alias("df"))
                        .limit(HARD + 1).collect())
                _guard(rows, kind, base)
                self._exp_memo[(kind, base, dist)] = {
                    r["term"]: int(r["df"]) for r in rows}
        return {key: self._exp_memo[key] for key in keys}

    def resolve_pattern_terms(self, queries: list[tuple[int, str, int]],
                              max_expansions: int | None = None,
                              expansions: dict | None = None
                              ) -> list[tuple[int, list[str], int]]:
        """Rewrite pattern queries to term-list queries: each query's
        terms = its literal tokens ∪ the capped expansion of each of
        its pattern atoms. ``expansions`` overrides the per-pattern
        expansion lists ({(kind, base, dist): [terms]}) — the
        federation passes GLOBALLY-ranked expansions so every shard
        rewrites identically."""
        from ..functions.patterns import parse_pattern_text
        resolved = []
        for qid, text, k in queries:
            lit_text, pats = parse_pattern_text(text)
            terms = set(tokenize_py(lit_text))
            for kind, base, dist in pats:
                if expansions is not None:
                    terms.update(expansions[(kind, base, dist)])
                else:
                    terms.update(t for t, _ in self.expand_pattern(
                        kind, base, dist, max_expansions))
            resolved.append((qid, sorted(terms), k))
        return resolved

    def search_rows_pattern(self, queries: list[tuple[int, str, int]],
                            filters: dict | None = None,
                            max_expansions: int | None = None,
                            stats: dict | None = None,
                            expansions: dict | None = None
                            ) -> list[tuple]:
        """`search_rows` for queries whose text may contain pattern
        atoms — trailing-``*`` prefixes (``va*``), fuzzy terms
        (``joun~1``, ``tabel~2``), wildcards (``va*ble``, ``te?t``,
        ``*ble``) and whole-term regexps (``/jo(in|urnal)/``).
        Each pattern expands against the
        dictionary (df-ranked, capped — see ``expand_pattern``) and the
        query runs as a plain disjunctive multi-term query over
        literal ∪ expanded terms, each term scored with its own df
        (Lucene's per-term-idf multi-term rewrite). Same row shape,
        filters and tombstone semantics as ``search_rows``; OR mode
        only (a pattern is itself a disjunction — nesting it under AND
        needs disjunction groups the block-intersection kernel does
        not model)."""
        return self.search_rows(
            self.resolve_pattern_terms(queries, max_expansions,
                                       expansions),
            mode="or", filters=filters, stats=stats)

    def search_pattern(self, text: str, k: int = 10,
                       filters: dict | None = None,
                       max_expansions: int | None = None) -> list[tuple]:
        """Single-query convenience over ``search_rows_pattern``."""
        return self.search_rows_pattern([(0, text, k)], filters=filters,
                                        max_expansions=max_expansions)

    def _pa_dataset(self, sub: str):
        """Memoized pyarrow dataset handles (file discovery is per-Index,
        like the Spark DataFrame handles)."""
        import pyarrow.dataset as ds
        if not hasattr(self, "_pa_cache"):
            self._pa_cache = {}
        if sub not in self._pa_cache:
            self._pa_cache[sub] = ds.dataset(f"{self._local_dir}/{sub}",
                                             partitioning="hive")
        return self._pa_cache[sub]

    def _local_candidates(self, needed, buckets,
                          score_group, prefill: bool = False,
                          avgdl: float | None = None) -> list[tuple]:
        """Driver-side scoring over the pruned block set: a pyarrow scan of
        the probed bucket dirs feeds the SAME table scorer the distributed
        partitions run. Returns (qid, doc_id, score) tuples."""
        import pyarrow.dataset as ds
        dset = self._pa_dataset("segments")
        tbl = dset.to_table(
            columns=_SEG_COLS,
            filter=ds.field("bucket").isin(buckets)
            & ds.field("term").isin(needed))
        if tbl.num_rows == 0:
            return []
        q, d, s = _score_block_table(
            tbl, score_group, self.codec,
            self.avgdl if avgdl is None else avgdl, prefill)
        return list(zip(q, d, s))

    def _doc_meta(self, ids: list, use_local: bool) -> dict:
        """doc_id -> (repo, path) for a BOUNDED id set (≤ Σk)."""
        if use_local:
            import pyarrow.dataset as ds
            dset = self._pa_dataset("docs")
            t = dset.to_table(columns=["doc_id", "repo", "path"],
                              filter=ds.field("doc_id").isin(ids))
            return {d: (r, p) for d, r, p in
                    zip(t["doc_id"].to_pylist(), t["repo"].to_pylist(),
                        t["path"].to_pylist())}
        return {r["doc_id"]: (r["repo"], r["path"]) for r in
                self._docs.where(F.col("doc_id").isin(ids))  # pushed down
                .select("doc_id", "repo", "path").collect()}  # Spark job 2

    def search(self, text: str, k: int = 10, mode: str = "or",
               filters: dict | None = None,
               min_match: int | None = None) -> DataFrame:
        return (self.search_batch([(0, text, k)], mode=mode,
                                  filters=filters, min_match=min_match)
                .drop("query_id"))

    def search_phrase(self, text: str, k: int = 10,
                      query_id: int = 0, slop: int = 0,
                      start_candidates: int = 64,
                      stats: dict | None = None) -> list[tuple]:
        """Exact-phrase top-k (format version 3, plans/positions.py):
        best-first conjunctive BM25 candidates, position-verified on the
        bounded candidate set, re-ranked 1..k. Rows match search_rows:
        (query_id, rank, doc_id, score, repo, path). Scores are the
        AND-mode BM25 of the phrase's distinct terms.

        ``slop`` relaxes adjacency to ordered proximity: the phrase
        terms must appear IN ORDER with total stretch <= slop extra
        tokens (slop=0 = exact phrase; see positions._phrase_match_ids
        for the precise window semantics).

        The candidate width doubles geometrically until k hits verify or
        the AND match set is exhausted — verification cost stays
        O(candidates x phrase terms), corpus-size-independent.

        ``stats`` carries federation-global corpus stats exactly as on
        search_rows (plans/sharded.py injects them); position
        verification is stats-free, so only the candidate ranking
        changes."""
        from ..functions.tokenize import tokenize_py
        from .positions import verify_phrase
        if self.version < 3:
            raise ValueError(
                f"index {self.dir} (format version {self.version}) was "
                f"built without positions=True; phrase queries need the "
                f"positions side table — rebuild with "
                f"build_index(..., positions=True)")
        seq = tokenize_py(text)
        if not seq:
            return []
        if len(seq) == 1:        # degenerate phrase: plain top-k
            return [(query_id, *r[1:]) for r in
                    self.search_rows([(query_id, text, k)], stats=stats)]
        m = max(start_candidates, 2 * k)
        while True:
            cand = self.search_rows([(query_id, " ".join(seq), m)],
                                    mode="and", stats=stats)
            matched = verify_phrase(self, [r[2] for r in cand], seq,
                                    slop=slop)
            hits = [r for r in cand if r[2] in matched]
            if len(hits) >= k or len(cand) < m:
                return [(query_id, rank, r[2], r[3], r[4], r[5])
                        for rank, r in enumerate(hits[:k], start=1)]
            m *= 4
