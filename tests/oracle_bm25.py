"""Pure-Python reference engine (SURVEY §0 / §7.4.7).

The reference checkout at /root/reference is empty in this sandbox, so THIS
transparent, loop-based engine is the stand-in reference for the north_rule's
"rank-identical to the reference engine" contract. Its spec is frozen in
FIXTURES.md §T: the tokenizer, BM25 constants, float64 scores, and the
ascending-doc_id tie-break can never drift without failing tests.

Deliberately naive (dict-of-lists postings, per-doc loops) — clarity over
speed; it is the oracle, not the engine.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter

import math

from donkey_spark.config import (BM25_B, BM25_K1, MAX_TOKEN_LEN,
                                 MAX_TOKENS_PER_DOC, MIN_TOKEN_LEN, TOKEN_RE)

_RE = re.compile(TOKEN_RE)


def tokenize(content: str) -> list[str]:
    """§T: NFC → lower → [a-z0-9_]+ runs → len∈[2,64] → cap 50k."""
    if content is None:
        return []
    s = unicodedata.normalize("NFC", content).lower()
    toks = [t for t in _RE.findall(s)
            if MIN_TOKEN_LEN <= len(t) <= MAX_TOKEN_LEN]
    return toks[:MAX_TOKENS_PER_DOC]


class OracleIndex:
    """In-memory inverted index + BM25 scorer over (doc_id, content) pairs."""

    def __init__(self, docs: list[tuple[int, str]]):
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.dl: dict[int, int] = {}
        for doc_id, content in docs:
            toks = tokenize(content)
            self.dl[doc_id] = len(toks)
            for term, tf in sorted(Counter(toks).items()):
                self.postings.setdefault(term, []).append((doc_id, tf))
        for plist in self.postings.values():
            plist.sort()
        self.n_docs = len(self.dl)
        self.avgdl = (sum(self.dl.values()) / self.n_docs
                      if self.n_docs else 0.0)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int,
               boosts: dict[str, float] | None = None
               ) -> list[tuple[int, int, float]]:
        """→ [(rank, doc_id, score)] ordered by (score desc, doc_id asc).
        ``boosts`` ({term: w}): the term's contribution is w·idf·part —
        the per-term boost twin (functions/boosts.py semantics)."""
        acc: dict[int, float] = {}
        for term in sorted(set(tokenize(query))):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = self.idf(term) * (boosts.get(term, 1.0) if boosts else 1.0)
            for doc_id, tf in plist:
                dl = self.dl[doc_id]
                part = tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                acc[doc_id] = acc.get(doc_id, 0.0) + w * part
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]

    def search_and(self, query: str, k: int,
                   boosts: dict[str, float] | None = None
                   ) -> list[tuple[int, int, float]]:
        """Conjunctive twin of search(): only docs containing EVERY query
        term score; a query with any unindexed term matches nothing."""
        terms = sorted(set(tokenize(query)))
        if not terms or any(t not in self.postings for t in terms):
            return []
        acc: dict[int, float] = {}
        hit: dict[int, int] = {}
        for term in terms:
            w = self.idf(term) * (boosts.get(term, 1.0) if boosts else 1.0)
            for doc_id, tf in self.postings[term]:
                dl = self.dl[doc_id]
                part = tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                acc[doc_id] = acc.get(doc_id, 0.0) + w * part
                hit[doc_id] = hit.get(doc_id, 0) + 1
        ranked = sorted(((d, s) for d, s in acc.items()
                         if hit[d] == len(terms)),
                        key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]

    def search_msm(self, query: str, k: int,
                   min_match: int) -> list[tuple[int, int, float]]:
        """minimum_should_match twin of search(): only docs containing
        at least ``min_match`` DISTINCT query terms rank; a survivor's
        score is the plain disjunctive sum over the terms it contains
        (ES semantics: an unindexed term still counts toward the
        requirement, so it can only make queries emptier, never
        looser)."""
        acc: dict[int, float] = {}
        hit: dict[int, int] = {}
        for term in sorted(set(tokenize(query))):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = self.idf(term)
            for doc_id, tf in plist:
                dl = self.dl[doc_id]
                part = tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                acc[doc_id] = acc.get(doc_id, 0.0) + w * part
                hit[doc_id] = hit.get(doc_id, 0) + 1
        ranked = sorted(((d, s) for d, s in acc.items()
                         if hit[d] >= min_match),
                        key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]

    def search_bool(self, text: str, k: int) -> list[tuple[int, int, float]]:
        """Boolean-expression twin (§2.14 T24): match set = the parsed
        tree evaluated set-wise over term presence; score = search()'s
        plain BM25 sum over the tree's POSITIVE terms a matching doc
        contains (negations constrain, never score)."""
        from donkey_spark.functions.boolquery import (parse_bool_text,
                                                      positive_terms)
        tree = parse_bool_text(text)
        match = self._tree_docs(tree)
        full = self.search(" ".join(sorted(positive_terms(tree))),
                           k=self.n_docs)
        kept = [(d, s) for _, d, s in full if d in match][:k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(kept)]

    def _tree_docs(self, tree) -> set[int]:
        kind = tree[0]
        if kind == "term":
            return {d for d, _ in self.postings.get(tree[1], ())}
        if kind == "not":
            return set(self.dl) - self._tree_docs(tree[1])
        out = self._tree_docs(tree[1][0])
        for c in tree[1][1:]:
            cd = self._tree_docs(c)
            out = (out & cd) if kind == "and" else (out | cd)
        return out
