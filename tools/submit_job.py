"""spark-submit entry point for the flagship backfill.

    spark-submit --master <cluster> \
        --py-files deep_ner_spark.zip \
        tools/submit_job.py --input <dir> --output <dir> [--run-id r1]

Runs the point-in-time featurization as a resumable checkpointed backfill
(one unit per conv_id bucket) and prints per-unit lineage.  This is the
cluster-shaped deployment of the engine; the sandbox runs it on local[N].
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with transcripts/entity_state parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from deep_ner_spark.pipeline import featurize_transcripts
    from deep_ner_spark.plans.checkpoint import CheckpointTable, resumable_backfill
    from deep_ner_spark.session import get_spark

    spark = get_spark("deep-ner-backfill", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    transcripts = spark.read.parquet(f"{args.input}/transcripts.parquet")
    state = spark.read.parquet(f"{args.input}/entity_state.parquet")

    def run_unit(unit: str):
        b = int(unit)
        t = transcripts.where(F.pmod(F.xxhash64("conv_id"), args.buckets) == b)
        s = state.where(F.pmod(F.xxhash64("entity_id"), args.buckets) == b)
        out, _ = featurize_transcripts(
            t, s, max_seq_length=32, emb_dim=16, state_seq_col="state_seq"
        )
        return out.withColumn("features_b64", F.base64("features")).drop(
            "features", "tokens", "starts", "ends"
        )

    from deep_ner_spark.sources.table_io import snapshot_id

    ckpt = CheckpointTable(spark, f"{args.output}/_lineage")
    done = resumable_backfill(
        spark,
        [str(b) for b in range(args.buckets)],
        run_unit,
        f"{args.output}/data",
        ckpt,
        args.run_id,
        checksum_cols=["conv_id", "turn_idx", "norm_text"],
        ts_col="ts",
        snapshot_id=snapshot_id(spark, args.input),
    )
    print(f"executed units: {done}")
    ckpt.read().where(F.col("run_id") == args.run_id).orderBy("unit").show(
        truncate=False
    )
    spark.stop()


if __name__ == "__main__":
    main()
