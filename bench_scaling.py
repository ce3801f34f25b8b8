"""Scaling-efficiency evidence: the same flagship job at N and 4N cores.

The north_rule's two-cluster-size criterion (>= 0.8 throughput scaling
efficiency between N and 4N executors) cannot use a real cluster in this
sandbox; per the driver instruction it is evidenced by running the same job
on the same input at local[8] and local[32] and reporting throughput at
both.  Each configuration runs in its own subprocess (one JVM per master
setting); the first timed iteration is discarded as warmup.

Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[2])
from deep_ner_spark.session import get_spark
from deep_ner_spark.pipeline import featurize_transcripts
from pyspark.sql import functions as F
import bench

cpus = int(sys.argv[1])
n_convs = int(sys.argv[3])
spark = get_spark("scaling", master="local[%d]" % cpus)
spark.sparkContext.setLogLevel("ERROR")

import os
from pathlib import Path
from deep_ner_spark.datagen import write_parquet_tables
base = "/tmp/deep_ner_bench/scaling_c%d_s42" % n_convs
marker = Path(base) / "_SUCCESS_ALL"
if not marker.exists():
    write_parquet_tables(spark, base, n_convs, 40, 42)
    marker.touch()
tr = spark.read.parquet(base + "/transcripts.parquet")
st = spark.read.parquet(base + "/entity_state.parquet")

def job():
    out, _ = featurize_transcripts(tr, st, max_seq_length=32, emb_dim=16)
    row = out.select(
        F.count("*").alias("n"),
        F.sum(F.length("features")).alias("fb"),
        F.sum(F.crc32("norm_text")).alias("chk"),
    ).collect()[0]
    return row["n"], row["chk"]

results = []
n = chk = None
for i in range(3):
    spark.catalog.clearCache()  # every iteration does the full cold job
    t0 = time.time()
    n, chk = job()
    results.append(time.time() - t0)
timed = results[1:]  # drop warmup (JVM/Arrow JIT, parquet footer cache)
best = min(timed)
print(json.dumps({"cpus": cpus, "n_turns": n, "checksum": chk,
                  "runs_sec": [round(x, 2) for x in results],
                  "best_sec": round(best, 3),
                  "turns_per_sec": round(n / best, 1)}))
spark.stop()
"""


N_CONVS = int(os.environ.get("SCALING_CONVS", "12000"))  # ~480k turns


def run_config(cpus: int) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(REPO), str(N_CONVS)],
        capture_output=True,
        text=True,
        env=env,
        timeout=2400,
        cwd=str(REPO),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    r8 = run_config(8)
    r32 = run_config(32)
    assert r8["checksum"] == r32["checksum"], "determinism across parallelism broken!"
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "local8": r8,
        "local32": r32,
        "checksum_identical": True,
    }
    md = f"""# BENCH — measured numbers (sandbox: single node, {os.cpu_count()} cores, local mode)

## Flagship job: as-of join + point-in-time featurization

Input: deterministic synthetic transcript table (seed=42), same parquet for
both configs.  Job: normalize -> tokenize -> shape vocab -> feature matrices
(binary float32) -> sessionize -> forward-fill -> lag/lead -> as-of join of
entity state -> full consume (count + byte/crc checksums).  First iteration
of each config discarded as JVM/Arrow warmup; best of remaining reported.

| config | turns | best sec | turns/sec | runs (sec) |
|---|---|---|---|---|
| local[8]  (N)  | {r8['n_turns']} | {r8['best_sec']} | {r8['turns_per_sec']} | {r8['runs_sec']} |
| local[32] (4N) | {r32['n_turns']} | {r32['best_sec']} | {r32['turns_per_sec']} | {r32['runs_sec']} |

**Throughput scaling efficiency (N -> 4N) = ({r32['turns_per_sec']} / {r8['turns_per_sec']}) / 4 = {eff:.3f}**
(gate: >= 0.8; BASELINE.md "scaling gate")

Determinism across parallelism: the order-invariant crc32 checksum of all
normalized turn texts is identical at both widths
({r8['checksum']}), per SURVEY §5(e).

Reproduce: `python bench_scaling.py` (writes this file); per-round metrics:
`python bench.py` -> one JSON line (driver records BENCH_r{{N}}.json).
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
