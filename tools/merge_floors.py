"""Fold BENCH/query_floors_overlay.json into the tracked floor history.

``bench.py`` never writes the committed evidence file directly: every
session's floors land in the gitignored overlay, min-merged over the
tracked baseline at write time (see ``bench.merge_query_floors``).  This
tool folds the overlay into ``BENCH/query_floors.json`` and deletes the
overlay — run it as the FIRST act of a round and commit the result, so a
driver-initiated bench run at round end can never leave the working tree
dirty (round-6 verdict, "What's wrong #1").

Run: python tools/merge_floors.py
Exit 0 always; prints what changed.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main() -> int:
    bench_dir = Path(bench.__file__).resolve().parent / "BENCH"
    tracked_path = bench_dir / "query_floors.json"
    overlay_path = bench_dir / "query_floors_overlay.json"
    overlay = bench._load_json(overlay_path)
    if not overlay:
        print("no overlay to merge")
        return 0
    tracked = bench._load_json(tracked_path)
    for key, entry in overlay.items():
        before = tracked.get(key)
        tracked[key] = bench._min_merge_entries(before, entry)
        n = tracked[key].get("n_sessions", 0)
        print(f"merged {key}: n_sessions -> {n}")
    tracked_path.write_text(json.dumps(tracked, indent=1))
    overlay_path.unlink()
    print(f"wrote {tracked_path}; removed overlay")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
