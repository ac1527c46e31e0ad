"""Facet-term encoding — the ONE definition of the field-filter format.

A facet posting is a synthetic presence term "\\x01<col>=<value>" with
tf=1, indexed into the same (term, salt) layout as content postings. The
\\x01 prefix cannot collide with §T tokens ([a-z0-9_]+). Batch build,
streaming ingest, and the query planner all derive their tags from the
two functions here so the three sites can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FACET_PREFIX = "\x01"


def facet_term(col: str, value) -> str:
    """Driver-side tag for a (facet column, value) pair. Must render
    values EXACTLY like the build side's Spark ``cast("string")``
    (append_facet_terms): Python ``str(True)`` is "True" but Spark
    casts booleans to "true"/"false" — without the mapping a boolean
    filter would compile to an out-of-dictionary tag and silently
    match nothing (or, negated, silently filter nothing)."""
    if isinstance(value, bool):
        value = "true" if value else "false"
    return f"{FACET_PREFIX}{col}={value}"


def append_facet_terms(terms: Column, tfs: Column,
                       facets: tuple[str, ...]) -> tuple[Column, Column]:
    """Append one presence term (tf=1) per non-null facet column to a
    (terms array, tfs array) column pair — JVM expressions only."""
    for fc in facets:
        tag = F.concat(F.lit(f"{FACET_PREFIX}{fc}="),
                       F.col(fc).cast("string"))
        has = F.col(fc).isNotNull()
        terms = F.when(has, F.concat(terms, F.array(tag))).otherwise(terms)
        tfs = F.when(has, F.concat(tfs, F.array(F.lit(1)))).otherwise(tfs)
    return terms, tfs


def normalize_filter_spec(col: str, spec) -> tuple[str, list]:
    """The ONE filter-spec grammar, shared by BM25 facet filters
    (plans/query.py) and ANN metadata filters (pipeline/similarity.py)
    so the two surfaces can never drift (r5 review): returns
    (kind, values) where kind is 'any' (membership — a scalar or list,
    OR within the column), 'not' (`{'not': values}` — complement
    INCLUDING null-valued rows), 'range' (`{'range': [lo, hi]}` —
    inclusive numeric interval, either end None for open; §2.14 T25),
    or 'not_range' (`{'not': {'range': [lo, hi]}}` — complement
    including nulls). Range values are (lo, hi) after normalization.
    Raises on unknown dict keys, empty value lists, and inverted or
    non-integral range bounds."""

    def _range(rspec, kind):
        if (not isinstance(rspec, (list, tuple)) or len(rspec) != 2
                or not all(v is None or isinstance(v, int)
                           and not isinstance(v, bool) for v in rspec)):
            raise ValueError(
                f"range filter for {col!r} must be [lo, hi] of "
                f"int|None, got {rspec!r}")
        lo, hi = rspec
        for v in (lo, hi):
            # bounds outside int64 would wrap through sortable_long and
            # silently produce a wrong (often empty) trie-node set
            if v is not None and not -(2 ** 63) <= v <= 2 ** 63 - 1:
                raise ValueError(
                    f"range bound for {col!r} outside int64: {v!r} "
                    f"(use None for an open end)")
        if lo is not None and hi is not None and lo > hi:
            raise ValueError(f"inverted range for {col!r}: {rspec!r}")
        return kind, [lo, hi]

    kind = "any"
    if isinstance(spec, dict):
        if set(spec) == {"range"}:
            return _range(spec["range"], "range")
        if set(spec) != {"not"}:
            raise ValueError(
                f"filter dict for {col!r} must be {{'not': values}} or "
                f"{{'range': [lo, hi]}}, got {sorted(spec)}")
        kind, spec = "not", spec["not"]
        if isinstance(spec, dict):
            if set(spec) == {"range"}:
                return _range(spec["range"], "not_range")
            raise ValueError(
                f"negated filter dict for {col!r} must be "
                f"{{'range': [lo, hi]}}, got {sorted(spec)}")
    if isinstance(spec, (str, bytes)):
        vals = [spec]
    else:
        try:                       # ANY iterable of values (frozenset,
            vals = list(spec)      # dict_keys, ndarray, generator...)
        except TypeError:
            vals = [spec]          # non-iterable scalar (int, float, ...)
        else:
            try:
                vals = sorted(set(vals))
            except TypeError as e:
                # a mixed-type list must raise, not collapse into one
                # garbage str()-of-the-list scalar tag (silently empty
                # or silently ignored depending on kind)
                raise ValueError(
                    f"filter values for {col!r} are not mutually "
                    f"comparable: {vals!r}") from e
    if not vals:
        raise ValueError(f"empty filter value list for {col!r}")
    return kind, vals


def resolve_filter_groups(filters: dict, eq_facets: tuple[str, ...],
                          range_facets: tuple[str, ...],
                          step: int) -> list[tuple[str, list[str]]]:
    """Filter dict -> [(mask_kind, [presence tags])] — the ONE
    compilation from the user-facing filter grammar to dictionary
    presence tags, shared by the scorer (plans/query.py) and the facet
    histogram (plans/facet_counts.py) so filtered counts and filtered
    rankings can never disagree on which docs a spec admits.

    Equality specs become their `\\x01col=value` tags; range specs
    decompose to trie node tags (operators/ranges.py) and ride the SAME
    two mask kinds — 'any' (OR within the group, groups AND together)
    and 'not' (complement INCLUDING docs without the column).
    Validates column/spec pairing: a range spec on an equality facet
    (or vice versa, or an unindexed column) raises."""
    from .ranges import range_query_tags
    unknown = sorted(set(filters) - set(eq_facets) - set(range_facets))
    if unknown:
        raise ValueError(
            f"index has no facet(s) {unknown}; built with "
            f"facets={tuple(eq_facets) or '()'} / range_facets="
            f"{tuple(range_facets) or '()'} — rebuild with "
            f"build_index(..., facets=(...), range_facets=(...))")
    groups: list[tuple[str, list[str]]] = []
    for c, v in sorted(filters.items()):
        kind, vals = normalize_filter_spec(c, v)
        if kind in ("range", "not_range"):
            # a [lo, hi] filter decomposes to a BOUNDED set of trie
            # node tags: range -> 'any' (OR over nodes), the negation
            # -> 'not' — no new mask machinery
            if c not in range_facets:
                raise ValueError(
                    f"column {c!r} is an equality facet, not a "
                    f"range facet; rebuild with "
                    f"build_index(..., range_facets=({c!r},))")
            tags = range_query_tags(c, vals[0], vals[1], step=step)
            groups.append(("any" if kind == "range" else "not", tags))
            continue
        if c not in eq_facets:
            raise ValueError(
                f"column {c!r} is a range facet; filter it with "
                f"{{'range': [lo, hi]}} (or a negated range)")
        groups.append((kind, [facet_term(c, x) for x in vals]))
    return groups
