"""Render the SCALING.md factor table from two bench headline JSONs.

Usage:
    python tools/gen_scaling_table.py sf01_headline.json sf1_headline.json

Prints the markdown table (query, sf0.1 s, sf1 s, factor) sorted by
factor descending, plus the headline totals line — paste into
SCALING.md. Queries present in only one file are listed at the end so
registry drift between the two runs is visible instead of silent.
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict:
    # round 9 split variants out of per_query; the scaling factors
    # still want every measured query
    h = json.load(open(path))
    return {**h["per_query"], **h.get("variants_per_query", {})}


def main() -> None:
    a = _queries(sys.argv[1])
    b = _queries(sys.argv[2])
    common = sorted(set(a) & set(b))
    rows = [
        (n, a[n]["median"], b[n]["median"],
         b[n]["median"] / a[n]["median"] if a[n]["median"] > 0 else float("inf"))
        for n in common
    ]
    rows.sort(key=lambda r: -r[3])
    t_a = sum(r[1] for r in rows)
    t_b = sum(r[2] for r in rows)
    print(
        f"Headline total: {t_a:.1f}s at sf0.1 -> {t_b:.1f}s at sf1 = "
        f"{t_b / t_a:.1f}x for 10x data ({len(rows)} common queries)"
    )
    worst = [r for r in rows if r[3] >= 10]
    print(f"superlinear (>=10x): {[r[0] for r in worst] or 'none'}\n")
    print("| query | sf0.1 s | sf1 s | factor |")
    print("|---|---|---|---|")
    for n, x, y, f in rows:
        print(f"| `{n}` | {x:.2f} | {y:.2f} | {f:.1f}× |")
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    if only_a or only_b:
        print(f"\nonly in {sys.argv[1]}: {only_a}")
        print(f"only in {sys.argv[2]}: {only_b}")


if __name__ == "__main__":
    main()
