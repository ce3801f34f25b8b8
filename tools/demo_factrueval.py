"""E3 demo composition (SURVEY §3: demo_elmo_factrueval2016.py:180-235)
re-expressed on the engine: FactRuEval ETL -> dataset -> featurize ->
predict (seeded head) -> quality vs gold -> .task1 sink.

Run: python tools/demo_factrueval.py [--src /root/reference/tests/testdata/factrueval_data] [--out /tmp/factrueval_demo]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/tests/testdata/factrueval_data")
    ap.add_argument("--out", default="/tmp/factrueval_demo")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from deep_ner_spark.operators.features import fit_classes_list
    from deep_ner_spark.operators.quality import prediction_quality
    from deep_ner_spark.pipeline import featurize_transcripts, predict_entities
    from deep_ner_spark.session import get_spark
    from deep_ner_spark.sources.factrueval import factrueval_to_dataset, write_task1

    spark = get_spark("factrueval-demo", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    # S1-S5: three-file chain -> reconstructed docs + gold entities
    docs, gold, bounds = factrueval_to_dataset(spark, args.src)
    classes = fit_classes_list(gold)
    print("classes:", classes)

    # transcript-shaped view (one document = one turn of its own conv)
    transcripts = docs.select(
        F.col("base_name").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    featurized, vocab = featurize_transcripts(
        transcripts, None, max_seq_length=256, emb_dim=16
    )
    print("shape vocab size:", len(vocab))

    # E1 steps 4-7 with a seeded stand-in head (training out of scope)
    n_tags = 2 * len(classes) + 1
    width = 16 + len(vocab) + 3 + 66
    rng = np.random.default_rng(42)
    W = rng.standard_normal((width, n_tags)).astype("float32")
    trans = rng.standard_normal((n_tags, n_tags))
    pred = predict_entities(featurized, classes, W, trans).withColumnRenamed(
        "conv_id", "base_name"
    )
    print("predicted spans:", pred.count())

    # quality vs gold (J3 + A3)
    g = gold.select(
        F.col("base_name").alias("sample_key"), F.col("ne_type").alias("ne_class"),
        "start", "end",
    ).withColumn("sample_id", F.xxhash64("sample_key")).drop("sample_key")
    p = pred.select(
        F.col("base_name").alias("sample_key"), F.col("ne_type").alias("ne_class"),
        "start", "end",
    ).withColumn("sample_id", F.xxhash64("sample_key")).drop("sample_key")
    prediction_quality(g, p, classes).orderBy(F.col("ne_class").asc_nulls_last()).show()

    # S11 sink
    write_task1(pred, args.out)
    print("task1 files written to", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
