"""Dictionary-expansion query patterns — prefix (``foo*``) and fuzzy
(``bar~1``) term matching, the Lucene PrefixQuery / FuzzyQuery analog
(donkey itself has no term patterns — its features are opaque vectors —
but every fulltext engine in the capability class ships them; SURVEY
§2.14 T23).

Semantics (binding, shared by the engine and the DuckDB oracle):

* a pattern expands against the index DICTIONARY (never the corpus) to
  the terms matching it, ranked by (df DESC, term ASC) and capped at
  ``max_expansions`` — the deterministic version of Lucene's
  top-terms rewrite;
* the expanded terms join the query's literal tokens as ordinary
  disjunctive (OR) BM25 terms, each scored with its OWN df — i.e. the
  query rewrites to a plain multi-term query and the scoring engine
  never learns patterns existed.

Only trailing-``*`` prefixes and whole-term ``~1`` / ``~2`` edit
distances are supported (Lucene caps fuzzy at 2 as well); infix/leading
wildcards would defeat the dictionary's ordered probe and are refused
loudly.
"""

from __future__ import annotations

import re

#: pattern atoms are restricted to the tokenizer's own alphabet
#: (functions/tokenize.py emits lowercased [a-z0-9_]{2,64}), so prefix
#: range bounds stay pure ASCII and byte order == codepoint order in
#: parquet stats, Arrow, Spark and DuckDB alike.
_PREFIX_RE = re.compile(r"^([a-z0-9_]{1,64})\*$")
_FUZZY_RE = re.compile(r"^([a-z0-9_]{1,64})~([0-9])$")

#: Lucene's bound; the banded DP below is O(len·d) per candidate
MAX_FUZZY_DIST = 2


def parse_pattern_text(text: str) -> tuple[str, list[tuple[str, str, int]]]:
    """Split a query on whitespace and classify each atom.

    Returns ``(literal_text, patterns)`` where ``literal_text`` is the
    non-pattern atoms rejoined (tokenize it with the normal tokenizer)
    and ``patterns`` is ``[(kind, base, dist)]`` with kind ``"prefix"``
    (dist 0) or ``"fuzzy"``. Raises ValueError on malformed patterns
    rather than silently searching for ``*``/``~`` literals the
    tokenizer would drop anyway.
    """
    lits: list[str] = []
    pats: list[tuple[str, str, int]] = []
    for atom in str(text).split():
        a = atom.lower()
        m = _PREFIX_RE.match(a)
        if m:
            pats.append(("prefix", m.group(1), 0))
            continue
        m = _FUZZY_RE.match(a)
        if m:
            d = int(m.group(2))
            if d > MAX_FUZZY_DIST:
                raise ValueError(
                    f"fuzzy distance {d} in {atom!r} exceeds the "
                    f"supported maximum {MAX_FUZZY_DIST}")
            pats.append(("fuzzy", m.group(1), d))
            continue
        if "*" in a or "~" in a:
            raise ValueError(
                f"unsupported pattern {atom!r}: only trailing-* "
                f"prefixes (foo*) and whole-term edit distances "
                f"(bar~1, bar~2) are supported")
        lits.append(atom)
    return " ".join(lits), pats


def prefix_upper_bound(prefix: str) -> str:
    """Smallest string strictly greater than every string starting with
    ``prefix`` — the exclusive upper end of the dictionary range scan.
    The pattern grammar restricts prefixes to [a-z0-9_], so bumping the
    last character never overflows or leaves ASCII."""
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


def levenshtein_py(a: str, b: str, cap: int) -> int:
    """Classic unit-cost edit distance (insert/delete/substitute — the
    same definition Spark's ``levenshtein`` and DuckDB's ``levenshtein``
    compute), banded: returns ``cap + 1`` as soon as the distance
    provably exceeds ``cap``. Used only on the driver-local expansion
    path over the length-banded candidate slice."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la > lb:                      # iterate over the shorter row
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        lo = max(1, j - cap)
        hi = min(la, j + cap)
        if lo > 1:
            cur[lo - 1] = cap + 1
        best = cap + 1 if lo > 1 else cur[0]
        bj = b[j - 1]
        for i in range(lo, hi + 1):
            c = prev[i - 1] if a[i - 1] == bj else 1 + min(
                prev[i - 1], prev[i], cur[i - 1])
            cur[i] = c
            if c < best:
                best = c
        for i in range(hi + 1, la + 1):
            cur[i] = cap + 1
        if best > cap:
            return cap + 1
        prev, cur = cur, prev
    return prev[la] if prev[la] <= cap else cap + 1
