"""Per-term query boosting — the Lucene ``term^2.5`` relevance knob.

A boosted query multiplies each term's BM25 contribution by a
user-supplied positive weight: ``score(d) = Σ_t boost(t) · idf(t) ·
tf_part(t, d)``. donkey ranks by unweighted feature similarity only;
this is the §2.14 serving knob every search box grows (title matches
over body matches, must-have keywords over context terms).

The engine applies boosts by scaling the term's idf inside the scoring
kernel (kernels/wand.TermBlocks) — and because the kernel's block-max
pruning potentials are DERIVED from that same idf (``ub`` and
``pot_idf`` scale together), every skip decision remains a safe
upper-bound test at any positive boost. Boost 1.0 is bit-identical to
the unboosted query (same floats, same ranks).

Syntax (``parse_boost_text``): whitespace-split atoms, an atom may end
in ``^W`` with W a positive decimal (``wand^2``, ``bm25^0.5``). The
base atom goes through the frozen §T tokenizer, so an atom that
tokenizes into several terms (``block-max^2`` → ``block``, ``max``)
boosts them all. The same term reached with different weights keeps
the LARGEST (a deterministic, order-free rule). An atom containing
``^`` in any OTHER shape (``a^b``, ``rust^2^3``, ``x^1e2``, ``x^1.``)
is refused — a malformed weight silently running unboosted (or with
only its last weight) would mis-rank with no error, the exact failure
this surface exists to refuse loudly.
"""

from __future__ import annotations

import math
import re

from .tokenize import tokenize_py

#: base^W, the ONLY accepted ^ shape: base carries no further ^, W a
#: plain positive int/decimal (no exponents, no trailing dot)
_BOOST_RE = re.compile(r"^(?P<base>[^^\s]+)\^(?P<w>\d+(?:\.\d+)?)$")


def parse_boost_text(text: str) -> tuple[list[str], dict[str, float]]:
    """``"block wand^2 max^0.5"`` → (sorted unique §T terms, {term: w}).

    Returns the term list (every atom's tokens, boosted or not — the
    pre-resolved-list query shape ``Index._plan_search`` accepts) and
    the boost map for terms whose weight differs from 1.0. Raises
    ValueError on a zero/overflowing weight (a zero-potential term
    would be dead-by-construction — drop the term instead; an inf one
    would tie every match) and on any malformed ``^`` atom (see module
    docstring)."""
    weights: dict[str, float] = {}
    for atom in text.split():
        m = _BOOST_RE.match(atom)
        if m is None and "^" in atom:
            raise ValueError(
                f"malformed boost atom {atom!r}: expected term^W with W "
                f"a positive decimal (e.g. wand^2, bm25^0.5)")
        base, w = (m["base"], float(m["w"])) if m else (atom, 1.0)
        if m and not 0.0 < w < math.inf:
            raise ValueError(
                f"boost {m['w']} on {base!r}: weights must be positive "
                f"finite reals (0 never scores — remove the term; "
                f"overflow ties every match)")
        for t in tokenize_py(base):
            # largest-wins across ALL occurrences, the implicit 1.0 of
            # an unweighted duplicate included
            weights[t] = max(weights.get(t, 0.0), w)
    return sorted(weights), {t: w for t, w in weights.items() if w != 1.0}


def validate_boosts(boosts: dict | None, caller: str) -> None:
    """Shared argument check for the search surfaces: every weight a
    positive real. (Negative or zero weights would break the kernel's
    upper-bound pruning invariant — refuse loudly, never mis-rank.)"""
    if not boosts:
        return
    for qid, bw in boosts.items():
        for t, w in (bw or {}).items():
            # bools are ints but a True weight is a type error in the
            # caller; inf/nan defeat the pruning-exactness guarantee
            if (isinstance(w, bool)
                    or not isinstance(w, (int, float))
                    or not 0 < w < math.inf):
                raise ValueError(
                    f"{caller}: boost for query {qid!r} term {t!r} "
                    f"must be a positive finite number, got {w!r}")
