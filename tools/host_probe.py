"""Absolute host-speed probe: append an md5-burn record to
BENCH/host_regime.json.

The per-query floors in BENCH/query_floors.json are minima over bench.py
sessions, and the shared host swings 15-25% between speed regimes (see
BENCH/BASELINE.md "hardware ceiling" discussion — round-4-era md5-burn
ceilings already showed 0.68-1.02 window-to-window scatter for the
PARALLEL ratio).  Ratios can't distinguish "engine got slower" from
"host got slower"; this probe records the ABSOLUTE single-core burn time
plus a 32-process parallel burn, so a floor regression can be read
against the host regime it was measured in.  Run it on a quiet box,
immediately before or after a floor session batch:

    python tools/host_probe.py [label | --label NAME | --label=NAME]

Protocol: best-of-3 single-core 1.2M-iteration md5 burn (the same burn
kernel as bench_cluster.md5_ceiling, bench_cluster.py:186), then one
32-process run of the same per-process work.  Appends one JSON record to
BENCH/host_regime.json (list), prints it, and exits 0.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

WORK = 1_200_000


def _burn(n: int = WORK) -> float:
    x = 0
    t0 = time.perf_counter()
    for i in range(n):
        x ^= int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "little")
    return time.perf_counter() - t0


def _burn_child(_: int) -> float:
    return _burn()


def main() -> int:
    # accept: positional LABEL, "--label NAME", or "--label=NAME"
    args = [
        a[len("--label="):] if a.startswith("--label=") else a
        for a in sys.argv[1:]
        if a != "--label"
    ]
    label = args[0] if args else ""
    _burn(100_000)  # warm the interpreter
    singles = [_burn() for _ in range(3)]
    nproc = 32
    t0 = time.perf_counter()
    with mp.Pool(nproc) as pool:
        pool.map(_burn_child, range(nproc))
    par = time.perf_counter() - t0
    rec = {
        "ts": time.time(),
        "iso": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "label": label,
        "work": WORK,
        "burn1_sec": round(min(singles), 3),
        "burn1_reps": [round(t, 3) for t in singles],
        "burn32_sec": round(par, 3),
        # 32 procs x the single-core work in `par` seconds vs one proc's
        # best time: parallel capacity actually delivered this window
        "parallel_capacity": round(nproc * min(singles) / par, 1),
    }
    path = Path(__file__).resolve().parent.parent / "BENCH" / "host_regime.json"
    hist = []
    if path.exists():
        try:
            hist = json.loads(path.read_text())
        except ValueError:
            hist = []
    hist.append(rec)
    path.write_text(json.dumps(hist, indent=1))
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
