"""Splitting (SO1), Viterbi decode, and streaming sessionize."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deep_ner_spark import datagen


@pytest.fixture(scope="module")
def data(spark):
    t, s, _ = datagen.gen_transcripts(n_convs=15, mean_turns=6, seed=13)
    units = (
        spark.createDataFrame(t[["conv_id", "turn_idx", "text"]])
        .withColumn("sample_id", F.concat_ws("#", "conv_id", "turn_idx"))
    )
    spans = spark.createDataFrame(s).withColumn(
        "sample_id", F.concat_ws("#", "conv_id", "turn_idx")
    )
    return units, spans


def test_split_partitions_and_stratifies(data, spark):
    from deep_ner_spark.operators.splitting import split_assignment, split_dataset_df

    units, spans = data
    n = units.count()
    train, test = split_dataset_df(units, spans, test_part=0.3, seed=7)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == n
    assert n_test == round(0.3 * n)
    # disjoint
    assert train.join(test, "sample_id").count() == 0
    # class sets equal (the fixture has all 3 classes on both sides)
    tr_classes = {
        r["ne_type"] for r in spans.join(train, "sample_id").select("ne_type").distinct().collect()
    }
    te_classes = {
        r["ne_type"] for r in spans.join(test, "sample_id").select("ne_type").distinct().collect()
    }
    assert tr_classes == te_classes
    # deterministic under a fixed seed
    a1 = {r["sample_id"]: r["is_test"] for r in split_assignment(units, spans, 0.3, seed=7).collect()}
    a2 = {r["sample_id"]: r["is_test"] for r in split_assignment(units, spans, 0.3, seed=7).collect()}
    assert a1 == a2


def test_sample_keeps_all_classes(data, spark):
    from deep_ner_spark.operators.splitting import sample_assignment

    units, spans = data
    sel = sample_assignment(units, spans, n=30, seed=3)
    assert sel.count() == 30
    classes = {
        r["ne_type"]
        for r in spans.join(sel, "sample_id").select("ne_type").distinct().collect()
    }
    total = {r["ne_type"] for r in spans.select("ne_type").distinct().collect()}
    assert classes == total


def test_viterbi_matches_bruteforce(spark):
    from deep_ner_spark.operators.viterbi import decode_labels, viterbi_decode

    rng = np.random.default_rng(0)
    k = 4
    trans = rng.standard_normal((k, k))

    def brute(logits):
        from itertools import product

        best, best_s = None, -1e18
        n = len(logits)
        for path in product(range(k), repeat=n):
            s = logits[0][path[0]]
            for t in range(1, n):
                s += trans[path[t - 1]][path[t]] + logits[t][path[t]]
            if s > best_s:
                best_s, best = s, list(path)
        return best

    rows = []
    for i in range(6):
        n = int(rng.integers(1, 6))
        logits = rng.standard_normal((n, k))
        rows.append((i, [float(x) for x in logits.ravel()], brute(logits)))
        assert viterbi_decode(logits, trans).tolist() == rows[-1][2]

    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "logits", "expected"])
    )
    out = decode_labels(df, "logits", trans.tolist())
    for r in out.collect():
        assert list(r["label_ids"]) == list(r["expected"])


def test_streaming_sessionize(spark, tmp_path):
    from deep_ner_spark.streaming.sessions import run_streaming_sessionize_once
    from deep_ner_spark.operators.windows import sessionize

    t, _, _ = datagen.gen_transcripts(n_convs=6, mean_turns=10, seed=21)
    tdf = spark.createDataFrame(t)
    src = str(tmp_path / "in")
    tdf.write.parquet(src)
    run_streaming_sessionize_once(
        spark, src, tdf.schema, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    # append mode emits a session only once the watermark passes its end;
    # flush the tail with a far-future sentinel row per conversation and a
    # second availableNow increment (the resume path of the checkpoint)
    sentinel_ts = t.ts.max() + pd.Timedelta(days=30)
    sentinel = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": sorted(t.conv_id.unique()),
                "turn_idx": 10 ** 6,
                "role": None,
                "text": "sentinel",
                "tool": None,
                "ts": sentinel_ts,
            }
        ),
        schema=tdf.schema,
    )
    sentinel.write.mode("append").parquet(src)
    run_streaming_sessionize_once(
        spark, src, tdf.schema, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    got = spark.read.parquet(str(tmp_path / "out")).where(
        F.col("first_ts") < pd.Timestamp(sentinel_ts)
    )
    # streaming session windows agree with the batch sessionize session count
    batch = sessionize(tdf, ["conv_id"], "ts", 1800.0, ["turn_idx"])
    want = (
        batch.groupBy("conv_id")
        .agg(F.countDistinct("session_id").alias("n"))
        .collect()
    )
    got_counts = {
        r["conv_id"]: r["n"]
        for r in got.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    for r in want:
        assert got_counts[r["conv_id"]] == r["n"], r["conv_id"]
    # and per-session turn totals match the input row count
    assert got.agg(F.sum("n_turns")).collect()[0][0] == tdf.count()
