"""The CLI --filter grammar, shared by every spark-submit entry point.

One string per --filter flag, ``COL=...`` to require or ``COL!=...`` to
negate, with the value side either a comma list of equality-facet
values (``lang=en,de``) or a numeric range ``LO..HI`` over a range
facet (either bound may be omitted: ``n_chars=500..``). Multiple flags
AND together (one dict key per column).

This is the PRESENTATION layer of plans/facet_counts._compile_filters'
dict form — scripts/query.py and scripts/delete_docs.py MUST parse the
same string to the same dict, or an operator's takedown deletes a
different doc set than the query they previewed. Hence ONE parser.
"""

from __future__ import annotations

import re

_RANGE_RE = re.compile(r"^(-?\d+)?\.\.(-?\d+)?$")


def _parse_value(v: str):
    """``LO..HI`` -> the {"range": [lo, hi]} dict form, else None."""
    m = _RANGE_RE.match(v)
    if m and (m.group(1) or m.group(2)):
        return {"range": [int(m.group(1)) if m.group(1) else None,
                          int(m.group(2)) if m.group(2) else None]}
    return None


def parse_filter_specs(specs) -> dict | None:
    """Parse a list of ``COL=V[,V...] | COL!=... | COL=LO..HI`` strings
    into the filters dict accepted by Index.search / match_ids /
    facet_counts (None when no specs — the unfiltered fast path).

    The FIRST separator wins (`a!=b` negates on column a; `msg=a!=b`
    requires msg equal to "a!=b") and a spec with no separator or an
    empty column name raises a ValueError naming the bad spec, not a
    bare tuple-unpack traceback (fourth review)."""
    filters: dict = {}
    for f in specs or ():
        i_eq = f.find("=")
        if i_eq < 1:
            raise ValueError(
                f"bad --filter spec {f!r}: expected COL=VALUE[,...], "
                f"COL!=..., or COL=LO..HI")
        if f[i_eq - 1] == "!":          # the '=' belongs to a '!='
            c, v = f[:i_eq - 1], f[i_eq + 1:]
            rng = _parse_value(v)
            filters[c] = {"not": rng if rng else v.split(",")}
        else:
            c, v = f[:i_eq], f[i_eq + 1:]
            rng = _parse_value(v)
            filters[c] = rng or (v.split(",") if "," in v else v)
        if not c:
            raise ValueError(f"bad --filter spec {f!r}: empty column")
    return filters or None
