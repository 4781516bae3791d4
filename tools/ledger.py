"""Regenerate queries.LAST_GREEN from the committed CORRECTNESS_r{N}.json
files (round close-out step — see the emission-order comment in
smartbulkcopy_spark/queries.py and SURVEY.md §2.12).

Usage: python tools/ledger.py            # print the dict literal
       python tools/ledger.py --check    # exit 1 if queries.LAST_GREEN is stale
       python tools/ledger.py --write    # splice the dict into queries.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def derive() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            with open(f) as fh:
                rows = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> int:
    derived = derive()
    if "--check" in sys.argv:
        sys.path.insert(0, REPO)
        from smartbulkcopy_spark.queries import LAST_GREEN

        if LAST_GREEN != derived:
            extra = set(LAST_GREEN) - set(derived)
            stale = {
                k: (LAST_GREEN.get(k), derived.get(k))
                for k in set(derived) | set(LAST_GREEN)
                if LAST_GREEN.get(k) != derived.get(k)
            }
            print(f"LAST_GREEN stale: {stale} (unknown-to-driver: {sorted(extra)})")
            return 1
        print("LAST_GREEN up to date")
        return 0
    literal = "LAST_GREEN = {\n"
    for k in sorted(derived):
        literal += f'    "{k}": {derived[k]},\n'
    literal += "}"
    if "--write" in sys.argv:
        path = os.path.join(REPO, "smartbulkcopy_spark", "queries.py")
        with open(path) as fh:
            src = fh.read()
        start = src.index("LAST_GREEN = {")
        # Anchor the close brace at line start: a '}' inside a future
        # inline comment or string in the literal must not end the splice.
        end = src.index("\n}", start) + 2
        new_src = src[:start] + literal + src[end:]
        import ast

        ast.parse(new_src)  # refuse to write a file that no longer parses
        with open(path, "w") as fh:
            fh.write(new_src)
        print(f"spliced {len(derived)} rows into {path}")
        return 0
    print(literal)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
