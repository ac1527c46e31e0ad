"""Numeric range facets — trie-encoded presence postings (§2.14 T25).

The Lucene NumericRangeQuery design [Schindler & Diepenbroek, Computers
& Geosciences 34 (2008): "Generic XML-based framework for metadata
portals" — the published algorithm behind Lucene's numeric tries;
donkey itself has no typed field filters]: each indexed value is tagged
at every precision level (64/RANGE_STEP tags per doc per column), and a
[lo, hi] range query decomposes into a BOUNDED set of trie nodes —
at most 2·(2^step − 1) per level, ~480 worst-case at step 4 — so the
filter is an OR over node presence postings whose cost is independent
of the column's value cardinality. A range filter over a 10^12-file
corpus with 10^9 distinct sizes touches the same ≤480 posting lists a
10-value column would; the alternative (one equality tag per distinct
value) would enumerate the dictionary.

Encoding. sortable(v) = v XOR 2^63 maps signed int64 to order-
preserving unsigned; the tag at shift s is
``"\\x01<col>#<s>=<hex(sortable >> s)>"`` for s = 0, step, 2·step, …
< 64. The '#' cannot appear in equality facet tags ("\\x01col=value"),
and the \\x01 prefix keeps both out of the §T token space. Hex comes
from Spark's ``F.hex`` (uppercase, no leading zeros) and python's
``format(x, 'X')`` — asserted equal by tests so the build and query
sides can never drift.

Scale/storage: 16 extra presence postings per doc per range column at
step 4 (Lucene's longs default) — the documented cost of O(log) range
queries. Postings co-locate with content postings in the same
(term, salt) layout, so a range-filtered query is the SAME per-salt
mask intersection equality facets use: no docs-table join, no extra
job, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .facets import FACET_PREFIX

#: trie precision step in bits — 64/STEP tags per value; worst-case
#: 2·(2^STEP − 1)·(64/STEP − 1) + 2^STEP query nodes (~480). Recorded
#: in meta so readers decompose against the layout the writer used.
RANGE_STEP = 4

_SIGN = 1 << 63
_MASK64 = (1 << 64) - 1


def sortable_long(v: int) -> int:
    """Signed int64 -> order-preserving unsigned (flip the sign bit)."""
    return (int(v) ^ _SIGN) & _MASK64


def range_tag(col: str, shift: int, prefix: int) -> str:
    """Driver-side tag for one trie node (twin of the build expression)."""
    return f"{FACET_PREFIX}{col}#{shift}={format(prefix, 'X')}"


def value_tags(col: str, v: int, step: int = RANGE_STEP) -> list[str]:
    """Every tag a value is indexed under — the python oracle of
    append_range_terms, used by tests and the streaming twin."""
    s = sortable_long(v)
    return [range_tag(col, sh, s >> sh) for sh in range(0, 64, step)]


def decompose_range(lo: int, hi: int, step: int = RANGE_STEP
                    ) -> list[tuple[int, int, int]]:
    """[lo, hi] (inclusive, signed int64) -> [(shift, prefix_lo,
    prefix_hi)] trie nodes covering the range EXACTLY (disjoint, union
    = [lo, hi]) — the Schindler–Diepenbroek split: peel unaligned
    boundary nodes at each level, recurse one level coarser on the
    aligned remainder. Empty when lo > hi."""
    if lo > hi:
        return []
    lo, hi = sortable_long(lo), sortable_long(hi)
    out: list[tuple[int, int, int]] = []
    shift = 0
    while True:
        diff = 1 << (shift + step)
        mask = ((1 << step) - 1) << shift
        has_lower = (lo & mask) != 0
        has_upper = (hi & mask) != mask
        next_lo = ((lo + diff if has_lower else lo) & ~mask) & _MASK64
        next_hi = ((hi - diff if has_upper else hi) & ~mask) & _MASK64
        lower_wrap = next_lo < lo if has_lower else False
        upper_wrap = next_hi > hi if has_upper else False
        if (shift + step >= 64 or next_lo > next_hi
                or lower_wrap or upper_wrap):
            out.append((shift, lo >> shift, hi >> shift))
            break
        if has_lower:
            out.append((shift, lo >> shift, (lo | mask) >> shift))
        if has_upper:
            out.append((shift, (hi & ~mask) >> shift, hi >> shift))
        lo, hi, shift = next_lo, next_hi, shift + step
    return out


def range_query_tags(col: str, lo: int | None, hi: int | None,
                     step: int = RANGE_STEP) -> list[str]:
    """The node tags a [lo, hi] filter ORs over (None = open end).
    Bounded by the trie arithmetic, never by column cardinality."""
    lo = -(1 << 63) if lo is None else int(lo)
    hi = (1 << 63) - 1 if hi is None else int(hi)
    return [range_tag(col, sh, p)
            for sh, p_lo, p_hi in decompose_range(lo, hi, step)
            for p in range(p_lo, p_hi + 1)]


def range_tags_col(value: Column, column: str,
                   step: int = RANGE_STEP) -> Column:
    """The array of 64/step trie presence tags for one long value — JVM
    expressions only (XOR + unsigned shift + hex), the ONE build-side
    twin of value_tags, shared by the batch/stream projection
    (append_range_terms) and the backfill (plans/add_facet.py) so their
    tag rendering can never drift."""
    sortable = value.cast("long").bitwiseXOR(F.lit(-(1 << 63)))
    return F.array(*[
        F.concat(F.lit(f"{FACET_PREFIX}{column}#{sh}="),
                 F.hex(F.shiftrightunsigned(sortable, sh))
                 if sh else F.hex(sortable))
        for sh in range(0, 64, step)])


def append_range_terms(terms: Column, tfs: Column,
                       range_facets: tuple[str, ...],
                       step: int = RANGE_STEP) -> tuple[Column, Column]:
    """Append the 64/step trie presence terms (tf=1) per non-null range
    column (range_tags_col). NULL values index nothing, matching
    equality facets (a NOT/complement filter admits them)."""
    for fc in range_facets:
        has = F.col(fc).isNotNull()
        tags = range_tags_col(F.col(fc), fc, step)
        ones = F.array(*[F.lit(1)] * (64 // step))
        terms = F.when(has, F.concat(terms, tags)).otherwise(terms)
        tfs = F.when(has, F.concat(tfs, ones)).otherwise(tfs)
    return terms, tfs
