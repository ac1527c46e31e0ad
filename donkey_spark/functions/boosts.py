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
the LARGEST (a deterministic, order-free rule).
"""

from __future__ import annotations

import re

from .tokenize import tokenize_py

#: trailing ^W with W a positive int/decimal — anchored so "a^b" (no
#: numeric weight) stays ordinary text for the tokenizer
_BOOST_RE = re.compile(r"^(?P<base>.*[^\s])\^(?P<w>\d+(?:\.\d+)?)$")


def parse_boost_text(text: str) -> tuple[list[str], dict[str, float]]:
    """``"block wand^2 max^0.5"`` → (sorted unique §T terms, {term: w}).

    Returns the term list (every atom's tokens, boosted or not — the
    pre-resolved-list query shape ``Index._plan_search`` accepts) and
    the boost map for terms whose weight differs from 1.0. Raises
    ValueError on a zero weight (a zero-potential term would be
    dead-by-construction; drop the term instead) — the ^ atom grammar
    cannot produce a negative one."""
    weights: dict[str, float] = {}
    for atom in text.split():
        m = _BOOST_RE.match(atom)
        base, w = (m["base"], float(m["w"])) if m else (atom, 1.0)
        if m and w == 0.0:
            raise ValueError(
                f"boost 0 on {base!r}: a zero-weighted term never "
                f"scores — remove the term instead")
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
            if not (isinstance(w, (int, float)) and w > 0):
                raise ValueError(
                    f"{caller}: boost for query {qid!r} term {t!r} "
                    f"must be a positive number, got {w!r}")
