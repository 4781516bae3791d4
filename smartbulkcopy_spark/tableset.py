"""Table-set resolution: +:/-: include/exclude with * wildcards.

Same semantics as the reference (reference: client/SmartBulkCopy.cs:812-911):
the list is processed in order; additions append, removals remove matching
entries already in the list; wildcards expand against a catalog listing;
names are normalized to a quoted two-part form; the final list is
deduplicated (reference applies Distinct at client/SmartBulkCopy.cs:138).
"""

from __future__ import annotations

import re
from collections.abc import Iterable


def quote_two_part(name: str) -> str:
    """dbo.tab -> [dbo].[tab] (reference: client/SmartBulkCopy.cs:885-895)."""
    parts = name.split(".")
    out = []
    for p in parts:
        q = p
        if not q.startswith("["):
            q = "[" + q
        if not q.endswith("]"):
            q = q + "]"
        out.append(q)
    return ".".join(out)


def _unquote(name: str) -> str:
    return name.replace("[", "").replace("]", "")


def wildcard_to_regex(pattern: str) -> str:
    """'dbo.*' -> 'dbo[.].*' (reference: client/SmartBulkCopy.cs:864-867)."""
    return pattern.replace(".", "[.]").replace("*", ".*")


def resolve_tables(
    patterns: Iterable[str], catalog_tables: Iterable[str]
) -> list[str]:
    """Expand an ordered pattern list against the catalog listing.

    ``catalog_tables`` plays the role of the reference's sys.tables query
    (reference: client/SmartBulkCopy.cs:832-863) — for parquet sources it
    is the table names found in the source directory.
    """
    listing = [quote_two_part(t) for t in catalog_tables]
    selected: list[str] = []

    for raw in patterns:
        mode, pat = "+", raw
        if raw[:2] in ("+:", "-:"):
            mode, pat = raw[0], raw[2:]

        if "*" in pat:
            rx = wildcard_to_regex(pat)
            for t in listing:
                if re.search(rx, _unquote(t)):
                    if mode == "+":
                        selected.append(t)
                    elif t in selected:
                        selected.remove(t)
        else:
            qt = quote_two_part(pat)
            if mode == "+":
                selected.append(qt)
            elif qt in selected:
                selected.remove(qt)

    # Distinct, preserving first-seen order
    seen: set[str] = set()
    out = []
    for t in selected:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out
