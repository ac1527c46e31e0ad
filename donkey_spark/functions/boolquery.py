"""Boolean query expressions — nested AND / OR / NOT over terms, the
Lucene BooleanQuery surface (donkey itself exposes no query language —
its queries are opaque feature vectors `[donkey:src — unverified,
SURVEY §0]` — but every fulltext engine in the capability class ships
boolean composition; SURVEY §2.14 T24).

Semantics (binding, shared by the engine and the DuckDB oracle):

* the MATCH SET is the boolean evaluation of term presence:
  ``a AND (b OR c) AND NOT d`` matches docs containing ``a``, at least
  one of ``b``/``c``, and not ``d``;
* the SCORE of a matching doc is the plain BM25 sum over the query's
  POSITIVE terms it contains (terms at even NOT depth) — negations
  constrain matching but never contribute score, exactly Lucene's
  MUST_NOT. Scores therefore equal the unfiltered OR query's scores
  for the surviving docs;
* a term out of the dictionary has empty presence (its NOT matches
  everything) — no error, like AND-mode's missing-conjunct rule.

Grammar: terms are the tokenizer's own atoms (lowercased
``[a-z0-9_]+``); operators are UPPERCASE ``AND`` / ``OR`` / ``NOT``
(so the lowercase corpus words "and"/"or"/"not" stay searchable);
parentheses group; precedence NOT > AND > OR. Bare juxtaposition
(``spark shuffle``) is refused — boolean queries are explicit or they
are not boolean.

Safety: the expression must be GUARDED — every disjunct must contain a
positively-guarded conjunct (term → guarded; NOT → not guarded; AND →
any child guarded; OR → all children guarded). An unguarded query
(``NOT java``, ``a OR NOT b``) has a match set that is a complement —
O(corpus) at any scale — and is refused loudly, Lucene's pure-negative
rule. Guardedness also guarantees every matching doc carries at least
one positive term, which is what lets the engine score matches through
the ordinary disjunctive block-max kernel under a match-set mask.

Trees are plain nested tuples — ``("term", t)``, ``("not", child)``,
``("and", (c1, c2, ...))``, ``("or", (c1, c2, ...))`` — picklable into
the executor-side scorer closure as-is.
"""

from __future__ import annotations

import re

from .tokenize import tokenize_py

_OPS = ("AND", "OR", "NOT")
_TOKEN_RE = re.compile(r"\(|\)|[^\s()]+")


def _lex(text: str) -> list[str]:
    toks = _TOKEN_RE.findall(str(text))
    if not toks:
        raise ValueError("empty boolean query")
    return toks


def parse_bool_text(text: str):
    """Parse a boolean query into its tree; raises ValueError on syntax
    errors, atoms that are not single tokenizer terms, and unguarded
    (pure-negative) expressions."""
    toks = _lex(text)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        t = peek()
        if t is None or (expected is not None and t != expected):
            raise ValueError(
                f"boolean query syntax error at "
                f"{'end' if t is None else t!r}: {text!r}")
        pos += 1
        return t

    def parse_or():
        parts = [parse_and()]
        while peek() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else ("or", tuple(parts))

    def parse_and():
        parts = [parse_unary()]
        while peek() == "AND":
            take()
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else ("and", tuple(parts))

    def parse_unary():
        if peek() == "NOT":
            take()
            return ("not", parse_unary())
        return parse_atom()

    def parse_atom():
        t = peek()
        if t == "(":
            take()
            inner = parse_or()
            take(")")
            return inner
        if t is None or t in _OPS or t == ")":
            raise ValueError(
                f"boolean query syntax error at "
                f"{'end' if t is None else t!r}: expected a term or "
                f"'(' in {text!r}")
        take()
        terms = tokenize_py(t)
        if len(terms) != 1:
            raise ValueError(
                f"boolean query atom {t!r} is not a single term "
                f"(tokenizes to {terms}); quote-free atoms must be "
                f"plain [a-z0-9_] terms")
        return ("term", terms[0])

    tree = parse_or()
    if pos != len(toks):
        raise ValueError(
            f"boolean query syntax error at {toks[pos]!r}: two atoms "
            f"need an explicit AND/OR between them in {text!r}")
    if not guarded(tree):
        raise ValueError(
            f"boolean query {text!r} is purely negative (its match set "
            f"is a complement — O(corpus) at any scale); every OR "
            f"branch needs a positive term")
    return tree


def guarded(tree) -> bool:
    """Safe-negation rule: does every disjunct contain a positive
    conjunct? Guarantees match set ⊆ union of positive-term presence."""
    kind = tree[0]
    if kind == "term":
        return True
    if kind == "not":
        return False
    if kind == "and":
        return any(guarded(c) for c in tree[1])
    return all(guarded(c) for c in tree[1])


def bool_terms(tree) -> set[str]:
    """Every term in the tree (all need their postings scanned — NOT
    masks decode presence too)."""
    if tree[0] == "term":
        return {tree[1]}
    kids = (tree[1],) if tree[0] == "not" else tree[1]
    out: set[str] = set()
    for c in kids:
        out |= bool_terms(c)
    return out


def positive_terms(tree, neg: bool = False) -> set[str]:
    """Terms at even NOT depth — the ones that score."""
    if tree[0] == "term":
        return set() if neg else {tree[1]}
    if tree[0] == "not":
        return positive_terms(tree[1], not neg)
    out: set[str] = set()
    for c in tree[1]:
        out |= positive_terms(c, neg)
    return out


def matches_tokens(tree, tokens: set[str]) -> bool:
    """Doc-level reference evaluation over a token set — the transparent
    python oracle tests compare the engine against."""
    kind = tree[0]
    if kind == "term":
        return tree[1] in tokens
    if kind == "not":
        return not matches_tokens(tree[1], tokens)
    if kind == "and":
        return all(matches_tokens(c, tokens) for c in tree[1])
    return any(matches_tokens(c, tokens) for c in tree[1])


def tree_to_sql(tree, presence_sql) -> str:
    """Render the tree as a SQL boolean expression;
    ``presence_sql(term)`` returns the SQL predicate for "this doc
    contains term" — the DuckDB oracle twin uses this so engine and
    oracle share ONE tree."""
    kind = tree[0]
    if kind == "term":
        return presence_sql(tree[1])
    if kind == "not":
        return f"(NOT {tree_to_sql(tree[1], presence_sql)})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(tree_to_sql(c, presence_sql)
                         for c in tree[1]) + ")"
