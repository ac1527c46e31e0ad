"""Dictionary-expansion query patterns — prefix (``foo*``), fuzzy
(``bar~1``), wildcard (``va*ble``, ``te?t``) and regexp
(``/jo(in|urnal)/``) term matching, the Lucene PrefixQuery /
FuzzyQuery / WildcardQuery / RegexpQuery analog (donkey itself
has no term patterns — its features are opaque vectors — but every
fulltext engine in the capability class ships them, and regexp term
search is THE query shape of source-code engines in particular —
Zoekt / livegrep's grep-over-the-index; SURVEY §2.14 T23/T26/T43).

Semantics (binding, shared by the engine and the DuckDB oracle):

* a pattern expands against the index DICTIONARY (never the corpus) to
  the terms matching it, ranked by (df DESC, term ASC) and capped at
  ``max_expansions`` — the deterministic version of Lucene's
  top-terms rewrite;
* the expanded terms join the query's literal tokens as ordinary
  disjunctive (OR) BM25 terms, each scored with its OWN df — i.e. the
  query rewrites to a plain multi-term query and the scoring engine
  never learns patterns existed.

Atom classification: a trailing-``*`` with no other metacharacter is
the "prefix" kind (a pure ordered dictionary-range probe); any other
``*``/``?`` placement is the "wildcard" kind — matched with SQL LIKE
semantics (``*`` → ``%``, ``?`` → ``_``, literal ``_`` escaped), which
pyarrow's ``match_like``, Spark's ``LIKE`` and DuckDB's ``LIKE ...
ESCAPE '\\'`` all but guarantee agree byte-for-byte over the
tokenizer's [a-z0-9_] term alphabet (verified in tests). A wildcard
with a literal head (``va*ble``) keeps the head as a range bound, so
row-group pruning still applies; a leading wildcard (``*ble``) scans
the dictionary's term column — O(|dictionary|) like fuzzy, on the
index's smallest table. A pattern with no literal character (``*``,
``?*``) is refused: its match set is the whole vocabulary.

Regexp atoms are ``/body/`` with the body restricted to a grammar
whose matching semantics PROVABLY agree across the three evaluators —
pyarrow ``match_substring_regex`` (RE2, local path), Spark ``RLIKE``
(java.util.regex, distributed path) and DuckDB ``regexp_matches``
(RE2, the oracle): literals over the term alphabet, ``.``, character
classes (``[a-z]``, ranges, negation ``[^x]`` — ``^`` is legal only
right after ``[``), greedy quantifiers ``* + ?`` and bounded ``{m}`` /
``{m,}`` / ``{m,n}`` (malformed braces are refused — java.util.regex
rejects a dangling ``{`` where RE2 reads it as a literal, so only
well-formed repeats are portable), grouping ``(...)`` and alternation
``|``. Backslash escapes, anchors and named constructs are refused —
that is where the engines' dialects diverge. Matching is WHOLE-TERM
(the Lucene RegexpQuery convention): every evaluator runs the same
``^(?:body)$`` rendering. A body with no ``[a-z0-9_]`` character
anywhere is refused like the all-meta wildcard. A regexp with a
mandatory literal head (``jo(in|urnal)`` → ``jo``) keeps the head as
a dictionary range bound exactly like an infix wildcard; top-level
alternation or a leading metacharacter pays the full term-column
scan.
"""

from __future__ import annotations

import re

#: pattern atoms are restricted to the tokenizer's own alphabet
#: (functions/tokenize.py emits lowercased [a-z0-9_]{2,64}), so prefix
#: range bounds stay pure ASCII and byte order == codepoint order in
#: parquet stats, Arrow, Spark and DuckDB alike.
_PREFIX_RE = re.compile(r"^([a-z0-9_]{1,64})\*$")
_FUZZY_RE = re.compile(r"^([a-z0-9_]{1,64})~([0-9])$")
_WILDCARD_RE = re.compile(r"^(?=.*[a-z0-9_])[a-z0-9_*?]{1,64}$")
#: regexp atom: /body/ — the portable-grammar charset; ^ position,
#: brace shape, literal presence and compilability checked separately
_REGEXP_BODY_RE = re.compile(r"^[a-z0-9_\[\]().*+?|,{}^-]{1,64}$")
_BRACE_RE = re.compile(r"\{[0-9]+(,[0-9]*)?\}")

#: Lucene's bound; the banded DP below is O(len·d) per candidate
MAX_FUZZY_DIST = 2


def parse_pattern_text(text: str) -> tuple[str, list[tuple[str, str, int]]]:
    """Split a query on whitespace and classify each atom.

    Returns ``(literal_text, patterns)`` where ``literal_text`` is the
    non-pattern atoms rejoined (tokenize it with the normal tokenizer)
    and ``patterns`` is ``[(kind, base, dist)]`` with kind ``"prefix"``
    (dist 0), ``"fuzzy"``, ``"wildcard"`` (dist 0 — ``*`` matches
    any run, ``?`` exactly one character; a trailing-``*``-only atom
    classifies as the cheaper "prefix"), or ``"regexp"`` (``/body/``,
    dist 0 — whole-term match under the portable grammar, base = the
    body without its slashes). Raises ValueError on malformed
    patterns rather than silently searching for ``*``/``?``/``~``/
    ``/…/`` literals the tokenizer would drop anyway.
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
        if ("*" in a or "?" in a) and _WILDCARD_RE.match(a):
            pats.append(("wildcard", a, 0))
            continue
        if len(a) >= 3 and a[0] == "/" and a[-1] == "/":
            body = a[1:-1]
            validate_regexp_body(body)   # raises with the grammar
            pats.append(("regexp", body, 0))
            continue
        if "*" in a or "~" in a or "?" in a or "/" in a:
            raise ValueError(
                f"unsupported pattern {atom!r}: trailing-* prefixes "
                f"(foo*), whole-term edit distances (bar~1, bar~2), "
                f"wildcards over [a-z0-9_*?] with at least one literal "
                f"character (va*ble, te?t) and /regexp/ atoms over the "
                f"portable grammar are supported")
        lits.append(atom)
    return " ".join(lits), pats


def validate_regexp_body(body: str) -> None:
    """Reject a regexp body outside the portable grammar (module
    docstring): charset, ``^`` only immediately after ``[``, braces
    only as well-formed bounded repeats, at least one term-alphabet
    character, and the anchored rendering must compile. Everything the
    check admits matches identically under RE2 (pyarrow, DuckDB) and
    java.util.regex (Spark RLIKE) — the divergent constructs
    (escapes, anchors, dangling braces, named groups) are all refused
    here, before any engine sees the pattern."""
    ok = bool(_REGEXP_BODY_RE.match(body))
    if ok:
        for i, ch in enumerate(body):
            if ch == "^" and (i == 0 or body[i - 1] != "["):
                ok = False
                break
    if ok:
        # paren balance OUTSIDE classes, depth never negative: a body
        # like `a)|(b` balances only ACROSS the injected ^(?:...)$
        # wrapper and would silently turn whole-term matching into
        # prefix-OR-suffix matching (every evaluator agreeing on the
        # broken semantics, so no oracle would catch it)
        depth = 0
        in_class = False
        for ch in body:
            if in_class:
                in_class = ch != "]"
            elif ch == "[":
                in_class = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    ok = False
                    break
        ok = ok and depth == 0 and not in_class
    if ok and ("{" in body or "}" in body):
        # RE2 caps repeat counts at 1000 where java.util.regex and
        # Python accept more — cap to the strictest dialect
        ok = (not re.search(r"[{}]", _BRACE_RE.sub("", body))
              and all(int(n) <= 1000
                      for m in _BRACE_RE.finditer(body)
                      for n in re.findall(r"[0-9]+", m.group(0))))
    if ok:
        # possessive quantifiers (`a*+`, `a++`, `a?+`, `a{2}+` — and
        # their `*`-suffixed forms) compile under Python 3.11+ and
        # java.util.regex but are RE2 errors; lazy `*?`/`+?`/`??`/
        # `{m,n}?` agree across all three and stay allowed
        ok = not re.search(r"[*+?}][*+]", body)
    if ok:
        ok = re.search(r"[a-z0-9_]", body) is not None
    if ok:
        try:
            re.compile(regexp_anchor(body))
        except re.error:
            ok = False
    if not ok:
        raise ValueError(
            f"unsupported regexp /{body}/: bodies are limited to the "
            f"portable grammar — [a-z0-9_] literals, '.', character "
            f"classes (^ only right after [), * + ? and well-formed "
            f"{{m}}/{{m,}}/{{m,n}} repeats, (...) groups and | "
            f"alternation; no escapes or anchors — and must contain "
            f"at least one [a-z0-9_] character")


def regexp_anchor(body: str) -> str:
    """The single whole-term rendering every evaluator runs — pyarrow
    ``match_substring_regex``, Spark ``RLIKE`` and DuckDB
    ``regexp_matches`` are all search-anywhere primitives, so the
    anchors make them full-term matchers; ``(?:...)`` confines a
    top-level alternation to the body."""
    return f"^(?:{body})$"


def regexp_literal_head(body: str) -> str:
    """The mandatory literal prefix of every match — a usable
    dictionary range bound like the wildcard head. Empty when the body
    starts with a metacharacter, when the leading literal is itself
    quantified (``ab*c`` matches ``ac`` — only ``a`` is mandatory),
    or when a TOP-LEVEL alternation exists (``ab|cd`` — matches need
    not start with ``ab``; alternation inside a group after the head,
    ``jo(in|urnal)``, keeps the head)."""
    depth = 0
    in_class = False
    for ch in body:
        if in_class:
            in_class = ch != "]"
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return ""
    head = []
    for i, ch in enumerate(body):
        nxt = body[i + 1] if i + 1 < len(body) else ""
        if ch in "abcdefghijklmnopqrstuvwxyz0123456789_":
            if nxt in "*?{":     # quantified → this char is optional /
                break            # repeatable, not a fixed prefix byte
            if nxt == "+":       # one-or-more: the char IS mandatory,
                head.append(ch)  # but nothing after it is fixed
                break
            head.append(ch)
        else:
            break
    return "".join(head)


def prefix_upper_bound(prefix: str) -> str:
    """Smallest string strictly greater than every string starting with
    ``prefix`` — the exclusive upper end of the dictionary range scan.
    The pattern grammar restricts prefixes to [a-z0-9_], so bumping the
    last character never overflows or leaves ASCII."""
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


def wildcard_to_like(pattern: str) -> str:
    """SQL LIKE translation of a wildcard atom: ``*`` → ``%``, ``?`` →
    ``_``, and a literal ``_`` (a real character in the tokenizer's
    term alphabet) backslash-escaped. The grammar excludes ``%`` and
    ``\\`` from atoms, so no other escaping exists — the SAME string
    drives pyarrow ``match_like``, Spark ``LIKE`` and DuckDB ``LIKE ...
    ESCAPE '\\'`` (all three verified to agree in tests)."""
    return (pattern.replace("_", r"\_")
            .replace("*", "%").replace("?", "_"))


def wildcard_literal_head(pattern: str) -> str:
    """The literal run before the first metacharacter — a usable
    dictionary range bound (``va*ble`` scans only ``[va, vb)``); empty
    for leading-wildcard patterns, which scan the whole term column."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


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


def suggest_base(term: str) -> str:
    """Validate a did-you-mean probe: it must normalize to exactly ONE
    token (the dictionary is unigram). Shared by Index.suggest and
    plans/sharded.suggest_sharded so both surfaces reject the same
    inputs with the same message."""
    from .tokenize import tokenize_py
    toks = tokenize_py(term)
    if len(toks) != 1:
        raise ValueError(
            f"suggest() takes one term; {term!r} normalizes to {toks}")
    return toks[0]


def rank_suggestions(candidates: dict, base: str, k: int,
                     max_dist: int) -> list[tuple[str, int, int]]:
    """Rank did-you-mean candidates (term -> df) as (suggestion,
    distance, df) tuples ordered (distance ASC, df DESC, term ASC) —
    the Lucene DirectSpellChecker ordering (closer beats more-frequent;
    frequency breaks distance ties). The base term never suggests
    itself. ONE copy shared by the unified index and the federation:
    suggest_sharded merges UNCAPPED per-shard candidate sets and
    applies this rank + cap ONCE globally, which is exact only if both
    surfaces use the identical ordering."""
    scored = sorted(
        (levenshtein_py(t, base, int(max_dist)), -int(df), t)
        for t, df in candidates.items() if t != base)
    return [(t, d, -ndf) for d, ndf, t in scored[:k]]
