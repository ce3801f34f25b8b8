"""Round-7 floor profiling: break the four largest sf0.01 floors into
sub-stage timings so perf edits target the real cost, not a guess.

Targets (r6 converged allq floors): ivf_cosine_topk_exhaustive 3.06s,
dup_clusters 2.18s, dedup_corpus_lsh 1.68s, quality_prf1 1.42s.
Run: python tools/profile_r7.py   (prints one timing block per target)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"


def t(name, thunk, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        thunk()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {name:45s} {best:7.3f}s")
    return best


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from deep_ner_spark.session import get_spark

    spark = get_spark("profile-r7", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs.count(); emb.count()

    # warm every target once
    for name in ("ivf_cosine_topk_exhaustive", "dup_clusters",
                 "dedup_corpus_lsh", "quality_prf1"):
        qs[name](spark, SF).count()

    print("== ivf_cosine_topk_exhaustive ==")
    from deep_ner_spark.operators.similarity import fit_ivf_codebook, ivf_cosine_topk
    t("whole query", lambda: qs["ivf_cosine_topk_exhaustive"](spark, SF).count())
    t("fit_ivf_codebook(iters=2) alone", lambda: fit_ivf_codebook(
        emb.orderBy("vec_id").select("embedding"), "embedding", 8, 2, seed=42))
    t("fit(iters=0) alone", lambda: fit_ivf_codebook(
        emb.orderBy("vec_id").select("embedding"), "embedding", 8, 0, seed=42))
    t("probe only (iters=0 whole op)", lambda: ivf_cosine_topk(
        emb, emb.where(F.col("vec_id") < 5), k=3, n_lists=8, n_probe=8,
        kmeans_iters=0).count())

    print("== dup_clusters ==")
    from deep_ner_spark.operators.dedup import (
        connected_components, dup_clusters, jaccard_pairs)
    t("whole query", lambda: qs["dup_clusters"](spark, SF).count())
    t("jaccard_pairs alone", lambda: jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5).count())
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    pairs = pairs.localCheckpoint()  # materialized: isolates CC cost
    t("connected_components on materialized pairs", lambda: connected_components(
        pairs, docs.select("doc_id"), "doc_id").count())
    t("dup_clusters whole op", lambda: dup_clusters(
        docs, "doc_id", "text", n=3, threshold=0.5).count())

    print("== dedup_corpus_lsh ==")
    from deep_ner_spark.operators.dedup import (
        banded_buckets, lsh_dedup_against_corpus, minhash_signatures)
    new_df = docs.where(F.col("doc_id") % 5 == 0)
    cor_df = docs.where(F.col("doc_id") % 5 != 0)
    t("whole query", lambda: qs["dedup_corpus_lsh"](spark, SF).count())
    t("minhash both sides", lambda: (
        minhash_signatures(new_df, "doc_id", "text", 8, 3).count(),
        minhash_signatures(cor_df, "doc_id", "text", 8, 3).count()))
    t("minhash+banding both sides", lambda: (
        banded_buckets(minhash_signatures(new_df, "doc_id", "text", 8, 3),
                       "doc_id", 4).count(),
        banded_buckets(minhash_signatures(cor_df, "doc_id", "text", 8, 3),
                       "doc_id", 4).count()))
    t("cand join (no verify)", lambda: banded_buckets(
        minhash_signatures(new_df, "doc_id", "text", 8, 3), "doc_id", 4
    ).withColumnRenamed("doc_id", "__id_new").join(
        banded_buckets(minhash_signatures(cor_df, "doc_id", "text", 8, 3),
                       "doc_id", 4).withColumnRenamed("doc_id", "__id_cor"),
        ["band", "bucket"]).select("__id_new", "__id_cor").distinct().count())
    t("lsh_dedup op (materialize=False)", lambda: lsh_dedup_against_corpus(
        new_df, cor_df, "doc_id", "text", n_hashes=8, band_size=4, n=3,
        threshold=0.5, materialize=False).count())

    print("== quality_prf1 ==")
    from deep_ner_spark.operators.quality import entity_match_metrics
    t("whole query", lambda: qs["quality_prf1"](spark, SF).count())

    d300 = docs.where(F.col("doc_id") < 300)
    toks = d300.select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.trim("text"), r"\s+"),
                              lambda tk: tk != "")).alias("token_idx", "token"),
    )
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    toks = toks.withColumn(
        "start",
        F.coalesce(F.sum(F.length("token") + 1).over(wprev), F.lit(0)).cast("long"),
    ).withColumn("end", (F.col("start") + F.length("token")).cast("long"))
    gold = toks.where(F.col("token").isin("merge", "filter")).select(
        F.col("doc_id").alias("sample_id"), F.lit("KEY").alias("ne_class"),
        "start", "end")
    t("gold prep (explode+window) alone", lambda: gold.count())
    pred = gold.select("sample_id", "ne_class",
                       (F.col("start") + 1).alias("start"),
                       (F.col("end") + 3).alias("end"))
    t("entity_match_metrics on prepped", lambda: entity_match_metrics(
        gold, pred).count())
    gold_m = gold.localCheckpoint()
    pred_m = pred.localCheckpoint()
    t("entity_match_metrics on MATERIALIZED", lambda: entity_match_metrics(
        gold_m, pred_m).count())

    spark.stop()


if __name__ == "__main__":
    main()
