"""Suggest next round's _SAMPLE_FIRST rotation for __spark_entry__.py.

The correctness driver samples the FIRST 50 registered queries() entries,
so with 59 entries 9 per round go unchecked.  This tool reads every
CORRECTNESS_r*.json plus the current registration order and prints the
entries ranked by evidence staleness — never-checked first, then by the
round of their most recent row (oldest first).  Paste the top of the list
into _SAMPLE_FIRST (keep flagship_featurize pinned if you want a fresh
flagship row every round) so that across consecutive rounds every entry
gets a correctness row at least every other round.

Usage: python tools/rotate_sample.py [sample_size]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def latest_round_per_query() -> dict[str, int]:
    """query name -> newest round with a fully-green row (0 = never)."""
    seen: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except Exception:
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only entries lack it
                and not row.get("err")
            )
            if green:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def main(sample_size: int = 50) -> None:
    import __spark_entry__ as e

    names = list(e.queries())
    seen = latest_round_per_query()
    ranked = sorted(names, key=lambda n: (seen.get(n, 0), n))
    print(f"# {len(names)} entries, driver samples first {sample_size}; "
          f"{max(len(names) - sample_size, 0)} will go unchecked this round")
    print("# staleness-ranked (never-checked first, then oldest evidence):")
    for n in ranked:
        rnd = seen.get(n, 0)
        tag = "NEVER" if rnd == 0 else f"r{rnd:02d}"
        print(f"{tag:6s} {n}")
    stale = [n for n in ranked if seen.get(n, 0) < max(seen.values(), default=0)]
    head = stale[: len(names) - sample_size + 1]
    print("\n_SAMPLE_FIRST suggestion (stalest entries to surface):")
    print(json.dumps(head, indent=4))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
