"""Deterministic synthetic data: transcripts / entity_spans / entity_state.

Shapes per BASELINE.json input_hint and FIXTURES.md: the transcript table is
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``; entity spans are char offsets into the *normalized* text
(normalization is 1:1 on length, so offsets are generated once and stay
valid); entity_state is the as-of right side with tie / between-turn /
after-last-turn (leakage-test) updates.

Everything is seeded (no wall clock, no PYTHONHASHSEED dependence) so two
runs — and two parallelism levels — produce byte-identical inputs.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

ENTITY_PHRASES = {
    "PERSON": ["Anna Karenina", "John Smith", "Marie Curie", "Alan Turing", "Grace Hopper"],
    "LOCATION": ["New York", "San Francisco", "Lake Baikal", "Mount Elbrus"],
    "ORG": ["Acme Corp", "United Nations", "Apache Spark Foundation"],
}

_FILLERS = (
    "the quick brown fox jumps over lazy dog while 42 engineers debug "
    "spark jobs at 3:15 apparently some—strange unicode–dashes and "
    "a soft­hyphen plus CamelCase WORDS and punctuation marks ! ? ... "
    "version v2.7.1 costs $1,234 or 56% more"
).split(" ")

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "browser", "python", "calculator"]

_EPOCH = datetime(2024, 1, 1)


def gen_transcripts(
    n_convs: int = 20,
    mean_turns: int = 10,
    seed: int = 42,
    entity_prob: float = 0.55,
    state_dim: int = 4,
):
    """Returns (transcripts, entity_spans, entity_state) pandas DataFrames.

    Conversation sizes are Zipfian (hot conversations for skew tests);
    inter-turn gaps are bimodal (seconds vs > 30 min) so gap-based
    sessionize has real boundaries.
    """
    rng = np.random.default_rng(seed)
    t_rows, s_rows, st_rows = [], [], []
    zipf_w = 1.0 / np.arange(1, n_convs + 1) ** 0.7
    zipf_w = zipf_w / zipf_w.mean()
    flat_types = [(t, p) for t, ps in sorted(ENTITY_PHRASES.items()) for p in ps]

    for ci in range(n_convs):
        conv_id = f"conv{ci:05d}"
        n_turns = max(2, int(rng.poisson(mean_turns * zipf_w[ci])))
        ts = _EPOCH + timedelta(seconds=float(rng.integers(0, 86400 * 30)))
        turn_times = []
        for ti in range(n_turns):
            gap = float(rng.choice([rng.uniform(1, 120), rng.uniform(2000, 7200)], p=[0.8, 0.2]))
            ts = ts + timedelta(seconds=gap)
            turn_times.append(ts)
            words, spans, pos = [], [], 0
            n_frag = int(rng.integers(3, 9))
            for _ in range(n_frag):
                if rng.random() < entity_prob / n_frag * 3:
                    ne_type, phrase = flat_types[int(rng.integers(0, len(flat_types)))]
                    words.append(phrase)
                    spans.append((ne_type, pos, pos + len(phrase)))
                    pos += len(phrase) + 1
                else:
                    w = " ".join(
                        _FILLERS[int(rng.integers(0, len(_FILLERS)))]
                        for _ in range(int(rng.integers(1, 4)))
                    )
                    words.append(w)
                    pos += len(w) + 1
            text = " ".join(words)
            role = _ROLES[ti % 3] if rng.random() > 0.15 else None
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if rng.random() < 0.2 else None
            t_rows.append((conv_id, ti, role, text, tool, ts))
            for ne_type, s, e in spans:
                s_rows.append((conv_id, ti, ne_type, s, e))

        # state timeline: before-first, between-turns, exactly-at-a-turn
        # (tie-break test), after-last (leakage test)
        n_state = max(2, n_turns // 3)
        first, last = turn_times[0], turn_times[-1]
        span_sec = max(1.0, (last - first).total_seconds())
        for si in range(n_state):
            mode = rng.random()
            if mode < 0.1:
                sts = first - timedelta(seconds=float(rng.uniform(10, 1000)))
            elif mode < 0.2:
                sts = turn_times[int(rng.integers(0, n_turns))]  # exact tie
            elif mode < 0.3:
                sts = last + timedelta(seconds=float(rng.uniform(10, 1000)))  # leakage probe
            else:
                sts = first + timedelta(seconds=float(rng.uniform(0, span_sec)))
            vec = rng.standard_normal(state_dim).astype(np.float32)
            st_rows.append((conv_id, sts, si, [float(x) for x in vec]))

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    entity_spans = pd.DataFrame(
        s_rows, columns=["conv_id", "turn_idx", "ne_type", "start", "end"]
    )
    entity_spans["turn_idx"] = entity_spans["turn_idx"].astype("int32")
    entity_spans["start"] = entity_spans["start"].astype("int32")
    entity_spans["end"] = entity_spans["end"].astype("int32")
    entity_state = pd.DataFrame(
        st_rows, columns=["entity_id", "ts", "state_seq", "state"]
    )
    entity_state["state_seq"] = entity_state["state_seq"].astype("int32")
    return transcripts, entity_spans, entity_state


def spark_transcripts(spark, n_convs=20, mean_turns=10, seed=42, partitions=None):
    """Create the three tables as Spark DataFrames."""
    t, s, st = gen_transcripts(n_convs, mean_turns, seed)
    tdf = spark.createDataFrame(t)
    sdf = spark.createDataFrame(s)
    stdf = spark.createDataFrame(st)
    if partitions:
        tdf = tdf.repartition(partitions, "conv_id")
    return tdf, sdf, stdf


def write_parquet_tables(
    spark, out_dir: str, n_convs: int, mean_turns: int = 12, seed: int = 42,
    n_files: int = 64,
):
    """Materialize to parquet (bench input), partition layout bucketed by conv.

    At cluster scale this would be an Iceberg table partitioned by days(ts)
    and bucketed by conv_id; parquet is the sandbox stand-in with the same
    layout intent (hash-bucketed by conv_id, sorted within files by
    (conv_id, turn_idx)).  ``n_files`` sets scan parallelism: parquet splits
    at row-group grain, so fewer files than cores caps every downstream
    narrow stage — the single-node analog of "size your input splits".
    """
    tdf, sdf, stdf = spark_transcripts(spark, n_convs, mean_turns, seed)
    tdf.repartition(n_files, "conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    ).write.mode("overwrite").parquet(f"{out_dir}/transcripts.parquet")
    sdf.repartition(max(8, n_files // 8), "conv_id").write.mode("overwrite").parquet(
        f"{out_dir}/entity_spans.parquet"
    )
    stdf.repartition(max(8, n_files // 8), "entity_id").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/entity_state.parquet")
