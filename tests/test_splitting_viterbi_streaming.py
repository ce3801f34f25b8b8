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


def test_split_keeps_last_subset_shuffle(data, spark):
    """dataset_splitting.py:50-51 OVERWRITES best on every shuffle whose
    test classes are a proper subset of train — the repo must mirror the
    same selection against an equivalent driver-side loop."""
    from deep_ner_spark.operators.splitting import split_assignment

    units, spans = data
    ids = sorted(r["sample_id"] for r in units.select("sample_id").collect())
    class_rows = (
        spans.groupBy("sample_id").agg(F.collect_set("ne_type").alias("c")).collect()
    )
    class_sets = {r["sample_id"]: frozenset(r["c"]) for r in class_rows}

    def reference_loop(test_part, seed, n_restarts):
        n = len(ids)
        n_test = int(round(test_part * n))
        n_train = n - n_test
        rng = np.random.default_rng(seed)
        idx = np.arange(n)
        best = None
        for _ in range(n_restarts):
            rng.shuffle(idx)
            tr = frozenset().union(*(class_sets.get(ids[i], frozenset()) for i in idx[:n_train]))
            te = frozenset().union(*(class_sets.get(ids[i], frozenset()) for i in idx[n_train:]))
            if tr == te:
                best = idx.copy()
                break
            if te < tr:
                best = idx.copy()  # keep LAST subset-qualifying shuffle
        if best is None:
            best = idx
        return {ids[i] for i in best[n_train:]}

    for seed in (3, 7, 11, 23):
        want = reference_loop(0.3, seed, 10)
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore")
            got_df = split_assignment(units, spans, 0.3, seed=seed)
        got = {r["sample_id"] for r in got_df.where("is_test").collect()}
        assert got == want, f"seed {seed}: selection semantics diverge"


def test_split_assignment_hashed_invariants(data, spark):
    from deep_ner_spark.operators.splitting import split_assignment_hashed

    units, spans = data
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        assign = split_assignment_hashed(units, spans, 0.3, seed=5, n_restarts=8)
    rows = assign.collect()
    assert len(rows) == units.count()
    # deterministic across recomputation
    again = {(r["sample_id"], r["is_test"]) for r in assign.collect()}
    assert {(r["sample_id"], r["is_test"]) for r in rows} == again
    # both sides non-empty at this size
    sides = {r["is_test"] for r in rows}
    assert sides == {True, False}


def test_streaming_asof_agrees_with_batch(spark, tmp_path):
    """Streaming as-of (applyInPandasWithState) must agree row-for-row with
    the batch union-tag window on every emitted turn, including equal-ts
    state-attaches and state_seq tie-breaks; a second availableNow run
    resumes from the checkpoint and flushes the remainder."""
    import numpy as np
    import pandas as pd

    from deep_ner_spark.operators.asof import asof_join
    from deep_ner_spark.streaming.asof import streaming_asof_attach

    rng = np.random.default_rng(5)
    rows = []
    base = 1_700_000_000
    for conv in range(6):
        t = base + conv * 7
        for i in range(40):
            t += int(rng.integers(1, 300))
            if rng.random() < 0.35:
                rows.append((f"c{conv}", 1, t, 1000 + i, float(i)))
            else:
                rows.append((f"c{conv}", 0, t, i, 0.0))
        # adversarial ties: two states at one ts (higher seq must win), and
        # a turn exactly at a state's ts (state attaches, <= semantics)
        rows.append((f"c{conv}", 1, t + 50, 5000, 111.0))
        rows.append((f"c{conv}", 1, t + 50, 5001, 222.0))
        rows.append((f"c{conv}", 0, t + 50, 900, 0.0))
    pdf = pd.DataFrame(rows, columns=["conv_id", "is_state", "ts_s", "seq", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts_s"], unit="s")
    pdf = pdf.sort_values(["ts_s", "is_state"]).reset_index(drop=True)

    in_dir = str(tmp_path / "in")
    for chunk in np.array_split(pdf, 3):
        # shuffle WITHIN the chunk: rows arrive out of order inside each
        # micro-batch (chunk boundaries still respect the watermark), so the
        # stateful buffering/merge logic is genuinely exercised
        chunk = chunk.sample(frac=1.0, random_state=7)
        spark.createDataFrame(
            chunk[["conv_id", "is_state", "ts", "seq", "value"]]
        ).coalesce(1).write.mode("append").parquet(in_dir)

    schema = spark.read.parquet(in_dir).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out = streaming_asof_attach(stream, watermark="1 second")
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got1 = spark.read.parquet(str(tmp_path / "out"))
    n1 = got1.count()
    assert n1 > 0, "no turns emitted after three watermark-advancing batches"

    # batch reference over the same tagged rows
    tagged = spark.createDataFrame(pdf[["conv_id", "is_state", "ts", "seq", "value"]])
    turns = tagged.where("is_state = 0").selectExpr(
        "conv_id", "ts", "seq AS turn_seq"
    )
    st = tagged.where("is_state = 1").selectExpr(
        "conv_id", "ts", "seq AS state_seq", "value AS state_value"
    )
    ref = asof_join(
        turns, st, ["conv_id"], "ts", ["state_value"],
        seq_col="turn_seq", state_seq_col="state_seq",
    ).selectExpr(
        "conv_id", "turn_seq", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        "state_value",
    )
    ref_rows = {(r["conv_id"], r["turn_seq"], r["ts_us"]): r["state_value"]
                for r in ref.collect()}
    for r in got1.collect():
        k = (r["conv_id"], r["turn_seq"], r["ts_us"])
        assert k in ref_rows and ref_rows[k] == r["state_value"], f"mismatch {k}"

    # late flush file advances the watermark past everything -> resume run
    # emits ALL remaining real turns from the checkpoint
    flush = pd.DataFrame(
        [("flush", 0, pdf["ts_s"].max() + 10_000, 0, 0.0)],
        columns=["conv_id", "is_state", "ts_s", "seq", "value"],
    )
    flush["ts"] = pd.to_datetime(flush["ts_s"], unit="s")
    spark.createDataFrame(
        flush[["conv_id", "is_state", "ts", "seq", "value"]]
    ).coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    got2 = spark.read.parquet(str(tmp_path / "out")).where("conv_id <> 'flush'")
    assert got2.count() == len(ref_rows), "resume run did not flush all turns"
    for r in got2.collect():
        k = (r["conv_id"], r["turn_seq"], r["ts_us"])
        assert k in ref_rows and ref_rows[k] == r["state_value"], f"mismatch {k}"


def test_split_threshold_hex_twin_matches_library():
    """__spark_entry__._split_threshold_hex duplicates
    operators/splitting.md5_threshold_hex (the oracle string must build
    before the package import is guaranteed); pin the two formulas equal at
    many fractions so drift at a non-oracled fraction can't go uncaught."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    from deep_ner_spark.operators.splitting import md5_threshold_hex

    for frac in (0.0, 0.1, 0.25, 1 / 3, 0.5, 0.625, 0.75, 0.9, 1.0):
        assert entry._split_threshold_hex(frac) == md5_threshold_hex(frac), frac


def test_viterbi_batch_bitexact_vs_per_sequence():
    """viterbi_decode_batch (one shared t-loop across same-length sequences)
    must be BIT-identical to the per-sequence DP — including argmax
    tie-breaks — on ties, negatives, singletons, and long sequences."""
    from deep_ner_spark.operators.viterbi import (
        viterbi_decode,
        viterbi_decode_batch,
    )

    rng = np.random.default_rng(7)
    k = 5
    trans = rng.standard_normal((k, k))
    trans[0, :] = trans[1, :]  # force tie-prone transitions
    for seq_len in (1, 2, 3, 17, 64):
        batch = rng.standard_normal((9, seq_len, k))
        batch[3] = np.round(batch[3])  # integral logits -> frequent ties
        batch[4] = 0.0                 # all-tie: pins first-max tie-break
        got = viterbi_decode_batch(batch, trans)
        assert got.shape == (9, seq_len)
        for i in range(9):
            ref = viterbi_decode(batch[i], trans)
            assert got[i].tolist() == ref.tolist(), (seq_len, i)


def test_streaming_asof_entry_harness_contract(spark):
    """The driver-contract streaming_asof harness must (1) restore the
    session's shuffle-partition setting after scoping the stateful stage to
    4 state partitions, and (2) reuse its tmpfs-cached input chunks on the
    second call instead of rebuilding them (the cache is fixture prep, not
    the measured operator)."""
    import hashlib
    import os

    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    q = e.queries()["streaming_asof"]
    n1 = q(spark, sf_dir).count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    # same content-stamped key as the entry (r7: regenerated fixture bytes
    # must invalidate the cache, so the key carries a content stamp; r8:
    # plus a chunk-layout tag so old-layout caches are not reused)
    key = hashlib.md5(
        f"{sf_dir}|{e._content_stamp(sf_dir, 'events')}|chunks1".encode()
    ).hexdigest()[:12]
    in_dir = f"{tmp_root}/deep_ner_stream_q_cache/{key}/in"
    assert os.path.exists(f"{in_dir}/_READY")
    stamp = {f: os.path.getmtime(os.path.join(in_dir, f))
             for f in os.listdir(in_dir)}
    n2 = q(spark, sf_dir).count()
    assert n2 == n1  # deterministic result from the cached chunks
    after = {f: os.path.getmtime(os.path.join(in_dir, f))
             for f in os.listdir(in_dir)}
    assert after == stamp  # second call did not rebuild the input
