"""As-of join: correctness vs a pandas oracle, tie semantics, zero leakage,
salted == unsalted."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deep_ner_spark import datagen
from deep_ner_spark.operators.asof import asof_join, asof_join_salted


@pytest.fixture(scope="module")
def tables(spark):
    t, s, st = datagen.gen_transcripts(n_convs=12, mean_turns=8, seed=7)
    return (
        spark.createDataFrame(t),
        spark.createDataFrame(st.rename(columns={"entity_id": "conv_id"})),
        t,
        st.rename(columns={"entity_id": "conv_id"}),
    )


def pandas_asof(turns: pd.DataFrame, state: pd.DataFrame) -> dict:
    """Oracle: latest state with state.ts <= turn.ts per conv."""
    out = {}
    for (conv, tidx), turn in turns.set_index(["conv_id", "turn_idx"]).iterrows():
        cand = state[(state.conv_id == conv) & (state.ts <= turn.ts)]
        if len(cand):
            best = cand.sort_values(["ts", "state_seq"]).iloc[-1]
            out[(conv, tidx)] = list(best.state)
        else:
            out[(conv, tidx)] = None
    return out


def test_asof_matches_pandas_oracle(tables, spark):
    tdf, stdf, t, st = tables
    got = asof_join(
        tdf, stdf.select("conv_id", "ts", "state_seq", "state"), ["conv_id"], "ts", ["state"], seq_col="turn_idx", state_seq_col="state_seq"
    )
    got_map = {
        (r["conv_id"], r["turn_idx"]): (list(r["state"]) if r["state"] is not None else None)
        for r in got.collect()
    }
    want = pandas_asof(t, st)
    assert got_map == want


def test_asof_zero_leakage_property(tables, spark):
    """Shifting any state row past a turn's ts must remove it from that turn."""
    tdf, stdf, t, st = tables
    # state strictly after the global max turn ts must never attach
    max_ts = t.ts.max()
    late_state = st.copy()
    late_state["ts"] = max_ts + pd.Timedelta(seconds=1)
    got = asof_join(
        tdf,
        spark.createDataFrame(late_state).select("conv_id", "ts", "state_seq", "state"),
        ["conv_id"],
        "ts",
        ["state"],
        seq_col="turn_idx",
    )
    assert got.where(F.col("state").isNotNull()).count() == 0
    assert got.count() == len(t)


def test_asof_tie_attaches(spark):
    """A state update at exactly the turn's ts attaches (<= semantics)."""
    turns = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c"],
                "turn_idx": [0],
                "ts": [pd.Timestamp("2024-01-01 00:00:00")],
            }
        )
    )
    state = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c", "c"],
                "ts": [pd.Timestamp("2023-12-31"), pd.Timestamp("2024-01-01 00:00:00")],
                "state": [[1.0], [2.0]],
            }
        )
    )
    row = asof_join(turns, state, ["conv_id"], "ts", ["state"], seq_col="turn_idx").collect()[0]
    assert list(row["state"]) == [2.0]


def test_salted_equals_unsalted(tables, spark):
    tdf, stdf, t, st = tables
    plain = asof_join(
        tdf, stdf.select("conv_id", "ts", "state_seq", "state"), ["conv_id"], "ts", ["state"], seq_col="turn_idx", state_seq_col="state_seq"
    )
    salted = asof_join_salted(
        tdf,
        stdf.select("conv_id", "ts", "state_seq", "state"),
        ["conv_id"],
        "ts",
        ["state"],
        seq_col="turn_idx",
        state_seq_col="state_seq",
        n_salts=4,
        hot_key_threshold=5,  # force most convs down the salted path
    )
    key = lambda r: (r["conv_id"], r["turn_idx"])
    a = {key(r): (tuple(r["state"]) if r["state"] else None) for r in plain.collect()}
    b = {key(r): (tuple(r["state"]) if r["state"] else None) for r in salted.collect()}
    assert a == b
