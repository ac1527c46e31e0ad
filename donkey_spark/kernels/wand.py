"""K7 kernel: block-max-pruned top-k scoring within one doc range (+ op 36 heap).

Donkey bounds its candidate stage with hint_K / approximate ANN pruning
(`[donkey:src/donkey.h]` SearchRequest — unverified, see SURVEY §0); the exact
analog here is *safe-up-to-k* block-max pruning [Broder et al. CIKM 2003;
Ding & Suel SIGIR 2011], adapted to term-at-a-time over a dense doc-range
accumulator:

  * terms are applied in descending upper-bound (idf · max tf-part) order;
  * before decoding a block we test
        max(acc over block span) + idf·block_max_tfpart + Σ UB(remaining terms)
    against θ, the current k-th best accumulated score (a lower bound on the
    final k-th best, since scores only grow). Strictly-below ⇒ no doc in the
    block can reach the final top-k ⇒ skip the decode. Exactness: ties are
    kept (strict <) and the doc_id tie-break is applied on final scores only.
  * the per-range result is a bounded top-k (np.argpartition = the min-heap
    analog), so only k rows per range reach the global exchange.

Every (term, salt) group shares the global range salt (config.default_range_size)
so a doc's entire score accumulates inside ONE range — per-range top-k is
globally safe.
"""

from __future__ import annotations

import numpy as np

from .blocks import decode_term_blocks
from .bm25 import tf_part


class TermBlocks:
    """Posting blocks of one term within one doc range (lazy decode).

    ``pot_scale`` (≥ 1) inflates the STATIC pruning potentials only —
    ``ub`` and the per-block ``block_max_tfpart`` bounds — never the
    accumulated scores. It is required when scoring with an avgdl
    LARGER than the one the block maxima were computed with (sharded
    search under global stats, plans/sharded.py): tf_part is monotone
    increasing in avgdl with ratio bounded by avgdl_q/avgdl_build, so
    scaling by that ratio keeps every skip decision a safe upper-bound
    test. At the default 1.0 behavior is bit-identical to before."""

    __slots__ = ("idf", "blocks", "ub", "pot_idf")

    def __init__(self, idf: float, blocks: list[dict],
                 pot_scale: float = 1.0):
        # blocks: dicts with first_doc_id, max_doc_id, block_max_tfpart,
        #         docids_blob, tfs_blob, codec
        self.idf = float(idf)
        self.pot_idf = self.idf * float(pot_scale)
        self.blocks = blocks
        self.ub = self.pot_idf * max(b["block_max_tfpart"] for b in blocks)


class SynGroup:
    """A Lucene-SynonymQuery group [Robertson & Zaragoza 2009 §3.4's
    blended-term treatment; Lucene SynonymQuery]: the members' postings
    score as ONE pseudo-term — per doc, member tfs SUM before the BM25
    saturation, under one shared idf (the caller derives it from the
    max member df, Lucene's docFreq blend). ``ub`` uses
    tf_part(Σtf) ≤ Σ member block maxima (tf_part is concave in tf
    with f(0)=0 at fixed dl ⇒ subadditive), a safe if looser bound:
    group entries participate in the kernel's entry ordering and
    suffix bounds, and PLAIN terms in the same query keep their full
    block-level θ skipping, but a group's own blocks always decode:
    a whole-entry θ test on range-max acc is vacuous (θ is the k-th
    largest of acc, so max(acc) ≥ θ always), and per-block tests need
    cross-member bounds (a doc skipped in one member's block may still
    accumulate through another's) — not worth it for the human-curated
    handful of synonyms per query, measured within ~6% of the
    equivalent plain OR at 400k (BENCH §T44)."""

    __slots__ = ("idf", "members", "ub", "pot_idf")

    def __init__(self, idf: float, members: list[list[dict]],
                 pot_scale: float = 1.0):
        # members: one block-list per member term (same dicts
        # TermBlocks takes)
        self.idf = float(idf)
        self.pot_idf = self.idf * float(pot_scale)
        self.members = members
        self.ub = self.pot_idf * sum(
            max(b["block_max_tfpart"] for b in blocks)
            for blocks in members)


def _decode_group(members: list[list[dict]], avgdl: float,
                  cache: dict | None):
    """(unique doc_ids, tf_part of the SUMMED tf) across a group's
    member block lists — the SynonymQuery accumulation. Raw
    (ids, tf, dl) triples cache under ("raw", id(block)) so they never
    collide with _decode_parts' (ids, part) entries; a block touched
    by both a group and a plain term decodes at most twice per salt,
    never per query."""
    ids_l, tf_l, dl_l = [], [], []
    for blocks in members:
        if cache is None:
            i, t, d = decode_term_blocks(blocks,
                                         blocks[0].get("codec", "varint"))
        else:
            missing = [b for b in blocks if ("raw", id(b)) not in cache]
            if missing:
                mi, mt, md = decode_term_blocks(
                    missing, missing[0].get("codec", "varint"))
                off = 0
                for b in missing:
                    n = int(b["n_docs"])
                    cache[("raw", id(b))] = (mi[off:off + n],
                                             mt[off:off + n],
                                             md[off:off + n])
                    off += n
            chunks = [cache[("raw", id(b))] for b in blocks]
            i = np.concatenate([c[0] for c in chunks])
            t = np.concatenate([c[1] for c in chunks])
            d = np.concatenate([c[2] for c in chunks])
        ids_l.append(i)
        tf_l.append(t)
        dl_l.append(d)
    ids = np.concatenate(ids_l)
    tfs = np.concatenate(tf_l)
    dls = np.concatenate(dl_l)
    o = np.argsort(ids, kind="stable")
    ids, tfs, dls = ids[o], tfs[o], dls[o]
    starts = np.r_[0, np.flatnonzero(np.diff(ids)) + 1]
    return ids[starts], tf_part(np.add.reduceat(tfs, starts),
                                dls[starts], avgdl)


def _decode_parts(keep: list[dict], codec: str, avgdl: float,
                  cache: dict | None):
    """(doc_ids, tf_part) for a kept block list.

    With a cache (one dict per salt group, keyed by block identity), each
    block's varint decode AND its BM25 tf-part — both term-independent —
    happen once per (term, salt) regardless of how many batch queries
    touch the term; a query's contribution is then idf · cached part. The
    uncached path computes the identical values in one batch decode, so
    results are bit-equal either way (elementwise ufunc over the same
    concatenation order)."""
    if cache is None:
        ids, tfs, dls = decode_term_blocks(keep, keep[0].get("codec", codec))
        return ids, tf_part(tfs, dls, avgdl)
    missing = [b for b in keep if id(b) not in cache]
    if missing:
        ids, tfs, dls = decode_term_blocks(missing,
                                           missing[0].get("codec", codec))
        part = tf_part(tfs, dls, avgdl)
        off = 0
        for b in missing:
            n = int(b["n_docs"])
            cache[id(b)] = (ids[off:off + n], part[off:off + n])
            off += n
    if len(keep) == 1:
        return cache[id(keep[0])]
    parts = [cache[id(b)] for b in keep]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))


def _span_maxima(acc: np.ndarray, lo: np.ndarray,
                 hi: np.ndarray) -> np.ndarray:
    """max(acc[lo_i:hi_i]) for disjoint spans, one ufunc call.

    Replaces a per-block Python loop of `acc[lo:hi].max()` slices (the
    last per-block Python left in the hot kernels) with a single
    np.maximum.reduceat over the interleaved span boundaries. Spans are
    sorted by lo first (same-term blocks are disjoint, so sorting lo
    sorts hi too) and results are scattered back to input order; the
    even reduceat segments are exactly [lo_i, hi_i), the odd gap
    segments are discarded. A trailing boundary == acc.size would be
    out of reduceat's index domain — dropping it leaves the final
    segment running to the array end, which is the same span."""
    m = lo.size
    if m == 0:          # reduceat would raise on flat[-1] of an empty set;
        return np.empty(0, dtype=acc.dtype)  # shared helper, guard here
    o = np.argsort(lo, kind="stable")
    flat = np.empty(2 * m, dtype=np.int64)
    flat[0::2] = lo[o]
    flat[1::2] = hi[o]
    idx = flat[:-1] if flat[-1] >= acc.size else flat
    seg = np.maximum.reduceat(acc, idx)[0::2]
    out = np.empty(m, dtype=acc.dtype)
    out[o] = seg
    return out


def _cursor_keep(ids: np.ndarray, sc: np.ndarray, base: int,
                 cursor: tuple[float, int]) -> np.ndarray:
    """Bool mask of candidates strictly AFTER ``cursor`` = (score,
    doc_id) in the ranking order (score DESC, doc_id ASC): keep docs
    with a lower score, or the same score and a higher GLOBAL doc id.
    Score equality is exact float comparison — the cursor is the
    engine's own emitted score, and both scorer paths are bit-identical
    by construction, so the previous page's boundary re-scores to the
    same double here."""
    cs, cd = cursor
    return (sc < cs) | ((sc == cs) & (ids + base > cd))


def score_range_topk(base: int, size: int,
                     terms: list[TermBlocks], avgdl: float, k: int,
                     stats: dict | None = None,
                     cache: dict | None = None,
                     dead: np.ndarray | None = None,
                     allowed: np.ndarray | None = None,
                     cursor: tuple[float, int] | None = None):
    """Exact top-k for one query within one doc range.

    Doc lengths come from each block's own dls_blob (co-stored with the
    postings — no side table). ``dead`` (LOCAL indices of tombstoned docs
    in this range) are re-zeroed after every accumulation so they can
    neither rank nor inflate θ / block potentials — Lucene-style
    visibility deletion with df/avgdl frozen until compaction.
    ``allowed`` (bool mask over the range, facet filters — built ONCE per
    salt by the caller, query-independent): only allowed docs may rank;
    the mask is applied after each accumulation, exactly like ``dead``,
    so θ and potentials stay tight over the allowed docs. ``cursor``
    (cursor pagination, plans/query.search_rows_after): only docs
    strictly AFTER (score, doc_id) in ranking order may rank; because a
    partially-accumulated score cannot prove a doc will stay under the
    cursor, θ over the post-cursor set is unknowable mid-loop and
    score-threshold block skipping is DISABLED for the query (presence
    skipping — bucket/row-group pruning, facet masks — still applies);
    the filter runs once on the final scores. Returns (doc_ids int64,
    scores float64) with score desc, doc_id asc.
    """
    if not terms or k <= 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    mask = allowed
    if mask is not None and dead is not None and dead.size:
        # same parameter semantics as the AND kernel: both constraints
        # apply — fold dead into the mask (copy: the caller may reuse its
        # mask across queries) so the single accumulation-masking path
        # below enforces both
        mask = mask.copy()
        mask[dead] = False
        dead = None
    acc = np.zeros(size, dtype=np.float64)
    order = sorted(terms, key=lambda t: -t.ub)
    ubs = np.array([t.ub for t in order], dtype=np.float64)
    suffix = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]])
    theta = 0.0
    for i, t in enumerate(order):
        rem = suffix[i]
        if isinstance(t, SynGroup):
            # synonym group: summed-tf accumulation under one idf; the
            # group's blocks always decode. A whole-entry θ test on
            # range-max acc is PROVABLY vacuous (θ is the k-th largest
            # of acc, so max(acc) ≥ θ always), and a useful per-block
            # test needs cross-member bounds (a doc skipped in one
            # member's block may still accumulate through another's) —
            # the span-max + own-blockmax + Σ other-member-maxima shape.
            # Not built: groups are human-curated handfuls and the
            # measured blend prices within ~6% of the equivalent plain
            # OR (BENCH §T44); revisit only if synonym maps grow hot.
            ids, part = _decode_group(t.members, avgdl, cache)
            acc[ids - base] += t.idf * part
            if mask is not None:
                np.multiply(acc, mask, out=acc)
            elif dead is not None and dead.size:
                acc[dead] = 0.0
            if stats is not None:
                stats["blocks_decoded"] = (
                    stats.get("blocks_decoded", 0)
                    + sum(len(m) for m in t.members))
                stats["postings_scored"] = (
                    stats.get("postings_scored", 0) + ids.size)
            if cursor is None and np.count_nonzero(acc) >= k:
                theta = np.partition(acc, acc.size - k)[acc.size - k]
            continue
        # Same-term blocks cover DISJOINT ascending doc ranges, so the
        # skip test for every block depends only on acc as of the term's
        # start — decide all skips first, then batch-decode the keepers
        # in one varint pass (amortizes the per-block decode overhead).
        if theta > 0.0:
            pots = (_span_maxima(
                acc,
                np.array([b["first_doc_id"] for b in t.blocks],
                         dtype=np.int64) - base,
                np.array([b["max_doc_id"] for b in t.blocks],
                         dtype=np.int64) - base + 1)
                + t.pot_idf * np.array([b["block_max_tfpart"]
                                        for b in t.blocks]) + rem)
            keep = [b for b, p in zip(t.blocks, pots) if p >= theta]
            if stats is not None and len(keep) < len(t.blocks):
                stats["blocks_skipped"] = (stats.get("blocks_skipped", 0)
                                           + len(t.blocks) - len(keep))
        else:
            keep = t.blocks
        if keep:
            ids, part = _decode_parts(keep, "varint", avgdl, cache)
            acc[ids - base] += t.idf * part
            if mask is not None:
                np.multiply(acc, mask, out=acc)
            elif dead is not None and dead.size:
                acc[dead] = 0.0
            if stats is not None:
                stats["blocks_decoded"] = (stats.get("blocks_decoded", 0)
                                           + len(keep))
                stats["postings_scored"] = (stats.get("postings_scored", 0)
                                            + ids.size)
        if cursor is None and np.count_nonzero(acc) >= k:
            theta = np.partition(acc, acc.size - k)[acc.size - k]
    nz = np.flatnonzero(acc)
    if cursor is not None and nz.size:
        nz = nz[_cursor_keep(nz, acc[nz], base, cursor)]
    if nz.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if nz.size > k:  # bounded selection before the full sort (op 36)
        kth = np.partition(acc[nz], nz.size - k)[nz.size - k]
        keep = acc[nz] >= kth      # ≥ keeps boundary ties; doc_id break below
        nz = nz[keep]
    sc = acc[nz]
    ordix = np.lexsort((nz, -sc))[:k]
    return ((nz[ordix] + base).astype(np.int64), sc[ordix])


def score_range_topk_msm(base: int, size: int,
                         terms: list[TermBlocks], avgdl: float, k: int,
                         min_match: int,
                         stats: dict | None = None,
                         cache: dict | None = None,
                         dead: np.ndarray | None = None,
                         allowed: np.ndarray | None = None,
                         cursor: tuple[float, int] | None = None):
    """Exact minimum-should-match top-k within one doc range (the ES
    ``minimum_should_match`` knob between OR and AND): only docs
    containing AT LEAST ``min_match`` distinct query terms may rank;
    a qualifying doc's score is the ordinary disjunctive BM25 sum over
    the query terms it contains, so scores equal the plain OR query's
    for the surviving docs (and min_match == n terms reproduces the
    AND mode's results exactly).

    ``dead``/``allowed``/``cursor``: score_range_topk's contracts.

    Pruning stays exact but must be more conservative than the OR
    kernel's: a partially-accumulated score only lower-bounds the final
    k-th best if its doc is GUARANTEED to qualify, and mid-loop a doc's
    term count can still grow — so θ is the k-th best accumulated score
    among docs that have ALREADY reached min_match (counts and scores
    only grow, so such docs qualify for certain and θ remains a safe
    lower bound). A θ-skipped block denies its docs both score and
    count, which is safe for the same reason as the AND kernel's
    last-term cutoff: the block potential upper-bounds any member's
    FINAL score, so strictly-below-θ docs are outside the final top-k
    whether or not they would have qualified. min_match <= 1 callers
    should use score_range_topk (bit-identical there, with tighter θ).
    """
    if not terms or k <= 0 or len(terms) < min_match:
        # fewer live terms than the required match count in this range
        # → no doc here can qualify
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    mask = allowed
    if mask is not None and dead is not None and dead.size:
        mask = mask.copy()
        mask[dead] = False
        dead = None
    acc = np.zeros(size, dtype=np.float64)
    # term-presence counter; tombstoned / filtered-out docs get a large
    # negative sentinel so they can never reach min_match (the AND
    # kernel's cnt trick) — acc is additionally re-zeroed for them
    # below so block potentials stay tight
    cnt = np.zeros(size, dtype=np.int32)
    if mask is not None:
        cnt[~mask] = np.int32(-(1 << 30))
    elif dead is not None and dead.size:
        cnt[dead] = np.int32(-(1 << 30))
    order = sorted(terms, key=lambda t: -t.ub)
    ubs = np.array([t.ub for t in order], dtype=np.float64)
    suffix = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]])
    theta = 0.0
    for i, t in enumerate(order):
        rem = suffix[i]
        if theta > 0.0:
            pots = (_span_maxima(
                acc,
                np.array([b["first_doc_id"] for b in t.blocks],
                         dtype=np.int64) - base,
                np.array([b["max_doc_id"] for b in t.blocks],
                         dtype=np.int64) - base + 1)
                + t.pot_idf * np.array([b["block_max_tfpart"]
                                        for b in t.blocks]) + rem)
            keep = [b for b, p in zip(t.blocks, pots) if p >= theta]
            if stats is not None and len(keep) < len(t.blocks):
                stats["blocks_skipped"] = (stats.get("blocks_skipped", 0)
                                           + len(t.blocks) - len(keep))
        else:
            keep = t.blocks
        if keep:
            ids, part = _decode_parts(keep, "varint", avgdl, cache)
            loc = ids - base
            acc[loc] += t.idf * part
            cnt[loc] += np.int32(1)
            if mask is not None:
                np.multiply(acc, mask, out=acc)
            elif dead is not None and dead.size:
                acc[dead] = 0.0
            if stats is not None:
                stats["blocks_decoded"] = (stats.get("blocks_decoded", 0)
                                           + len(keep))
                stats["postings_scored"] = (stats.get("postings_scored", 0)
                                            + ids.size)
        if cursor is None:
            qual = acc[cnt >= min_match]
            if qual.size >= k:
                theta = np.partition(qual, qual.size - k)[qual.size - k]
    nz = np.flatnonzero(cnt >= min_match)
    if cursor is not None and nz.size:
        nz = nz[_cursor_keep(nz, acc[nz], base, cursor)]
    if nz.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if nz.size > k:
        kth = np.partition(acc[nz], nz.size - k)[nz.size - k]
        keep = acc[nz] >= kth
        nz = nz[keep]
    sc = acc[nz]
    ordix = np.lexsort((nz, -sc))[:k]
    return ((nz[ordix] + base).astype(np.int64), sc[ordix])


def score_range_topk_and(base: int, size: int,
                         terms: list[TermBlocks], avgdl: float, k: int,
                         n_query_terms: int,
                         stats: dict | None = None,
                         cache: dict | None = None,
                         dead: np.ndarray | None = None,
                         allowed: np.ndarray | None = None,
                         cursor: tuple[float, int] | None = None):
    """Exact conjunctive (AND) top-k within one doc range (SURVEY op 32 /
    K4 intersection fast path).

    ``cursor`` (cursor pagination): exactly score_range_topk's contract
    — the span-skip intersection (presence-based, score-independent)
    still prunes, the last-term θ batch cutoff is disabled, and the
    (score, doc_id) filter runs once on the qualifying docs.

    A doc qualifies only if EVERY query term hits it, so the driving
    structure is the rarest term's posting blocks: their [first_doc_id,
    max_doc_id] spans are the only places an intersection doc can live, and
    any other term's block whose span overlaps none of them is skipped
    without decode (the skip-pointer intersection — block granular, exact).
    Scoring is one accumulator pass with a presence counter; docs with
    count == n_query_terms survive.

    Terms are processed rarest→hottest, and the LAST (hottest) term adds
    the OR path's block-max-vs-θ pruning: every earlier term has already
    accumulated, so zeroing dead docs (cnt < n-1) makes each surviving
    block's potential — masked span-max + idf·block_max — a STATIC exact
    upper bound on any of its docs' final scores. Blocks decode in
    descending-potential batches; once k docs have fully qualified, θ (the
    k-th best qualifying score, a lower bound on the final k-th best) kills
    every remaining batch whose best potential is strictly below it. A doc
    in a θ-skipped block is provably outside the final top-k even though
    skipping also denies it its last presence count. Ties at θ survive
    (strict <); the doc_id tie-break applies on final scores only.

    Returns (doc_ids int64, scores float64), score desc / doc_id asc.
    """
    if (not terms or k <= 0 or len(terms) < n_query_terms):
        # some query term has no postings at all in this range → empty
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    sizes = [sum(b["n_docs"] for b in t.blocks) for t in terms]
    terms = [terms[i] for i in np.argsort(sizes, kind="stable")]
    rarest = terms[0]
    r_lo = np.array([b["first_doc_id"] for b in rarest.blocks],
                    dtype=np.int64)
    r_hi = np.array([b["max_doc_id"] for b in rarest.blocks], dtype=np.int64)
    # Callers order blocks by block_id, which restarts per chunk dir — a
    # streamed index interleaves a (term, salt) group across chunk=stream*
    # dirs, so the spans arrive non-doc-ordered. The searchsorted skip test
    # below requires ascending spans; sort explicitly (spans are disjoint,
    # so sorting by lo also sorts hi).
    o = np.argsort(r_lo)
    r_lo, r_hi = r_lo[o], r_hi[o]
    acc = np.zeros(size, dtype=np.float64)
    cnt = np.zeros(size, dtype=np.int32)
    if dead is not None and dead.size:
        # tombstoned docs can never reach cnt == n_query_terms, never
        # qualify for θ, and (with the acc re-zeroing below) never
        # inflate a block potential
        cnt[dead] = np.int32(-(1 << 30))
    if allowed is not None:
        # facet filter: disallowed docs are dead for this batch
        cnt[~allowed] = np.int32(-(1 << 30))

    def _span_keep(t):
        keep = []
        for blk in t.blocks:
            # overlap test vs the rarest term's block spans: the first
            # rarest-span with hi >= blk.first must start <= blk.max
            j = int(np.searchsorted(r_hi, blk["first_doc_id"]))
            if j == r_lo.size or r_lo[j] > blk["max_doc_id"]:
                if stats is not None:
                    stats["blocks_skipped"] = (
                        stats.get("blocks_skipped", 0) + 1)
            else:
                keep.append(blk)
        return keep

    for t in terms[:-1]:
        keep = t.blocks if t is rarest else _span_keep(t)
        if keep:
            ids, part = _decode_parts(keep, "varint", avgdl, cache)
            ids = ids - base
            acc[ids] += t.idf * part
            cnt[ids] += 1
            if allowed is not None:
                np.multiply(acc, allowed, out=acc)
            elif dead is not None and dead.size:
                acc[dead] = 0.0
            if stats is not None:
                stats["blocks_decoded"] = (stats.get("blocks_decoded", 0)
                                           + len(keep))

    # --- last (hottest) term: θ-pruned, potential-ordered decode ---------
    t = terms[-1]
    if len(terms) == 1:
        keep = list(t.blocks)
    else:
        keep = _span_keep(t)
        acc[cnt != len(terms) - 1] = 0.0   # dead docs can't qualify; masking
        #                                    makes block potentials tight
    if keep:
        pots = (_span_maxima(
            acc,
            np.array([b["first_doc_id"] for b in keep],
                     dtype=np.int64) - base,
            np.array([b["max_doc_id"] for b in keep],
                     dtype=np.int64) - base + 1)
            + t.pot_idf * np.array([b["block_max_tfpart"] for b in keep]))
        dec_order = np.argsort(-pots, kind="stable")
        n_terms = len(terms)
        qual_scores: list[np.ndarray] = []
        nqual = 0
        theta = -np.inf
        BATCH = 8
        pos = 0
        while pos < dec_order.size:
            batch_ix = dec_order[pos:pos + BATCH]
            if cursor is None and nqual >= k and pots[batch_ix[0]] < theta:
                # potentials are sorted descending and θ only grows —
                # every remaining block is unbeatable
                if stats is not None:
                    stats["blocks_skipped_theta"] = (
                        stats.get("blocks_skipped_theta", 0)
                        + dec_order.size - pos)
                break
            batch = [keep[j] for j in batch_ix]
            ids, part = _decode_parts(batch, "varint", avgdl, cache)
            ids = ids - base
            acc[ids] += t.idf * part
            cnt[ids] += 1
            if allowed is not None:
                np.multiply(acc, allowed, out=acc)
            elif dead is not None and dead.size:
                acc[dead] = 0.0
            if stats is not None:
                stats["blocks_decoded"] = (stats.get("blocks_decoded", 0)
                                           + len(batch))
            newq = ids[cnt[ids] == n_terms]
            if newq.size:
                qual_scores.append(acc[newq])
                nqual += newq.size
                if nqual >= k:
                    allq = (np.concatenate(qual_scores)
                            if len(qual_scores) > 1 else qual_scores[0])
                    qual_scores = [allq]
                    theta = np.partition(allq, allq.size - k)[allq.size - k]
            pos += BATCH

    hit = np.flatnonzero(cnt == n_query_terms)
    if cursor is not None and hit.size:
        hit = hit[_cursor_keep(hit, acc[hit], base, cursor)]
    if hit.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if hit.size > k:
        sc_all = acc[hit]
        kth = np.partition(sc_all, hit.size - k)[hit.size - k]
        hit = hit[sc_all >= kth]
    sc = acc[hit]
    ordix = np.lexsort((hit, -sc))[:k]
    return ((hit[ordix] + base).astype(np.int64), sc[ordix])
