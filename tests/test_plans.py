"""Physical-plan properties: the shuffle/pushdown/broadcast contracts the
scale design rests on, asserted against .explain output so regressions in
operator composition surface as test failures."""

import re

import pytest
from pyspark.sql import functions as F

from deep_ner_spark import datagen


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def exchanges(plan: str):
    """(kind, args) per Exchange node in the FINAL plan tree (AQE's initial
    plan is advisory; formatted mode lists node details separately)."""
    tree = plan.split("== Initial Plan ==")[0]
    ids = set(re.findall(r"Exchange \((\d+)\)", tree))
    out = []
    for m in re.finditer(r"\((\d+)\) Exchange\s*\n(?:Input[^\n]*\n)?Arguments: (\w+)\(([^)]*)\)", plan):
        if m.group(1) in ids:
            out.append((m.group(2), m.group(3)))
    return out


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("plans")
    t, s, st = datagen.gen_transcripts(n_convs=10, mean_turns=6, seed=23)
    spark.createDataFrame(t).write.parquet(str(base / "t.parquet"))
    spark.createDataFrame(st.rename(columns={"entity_id": "conv_id"})).write.parquet(
        str(base / "st.parquet")
    )
    return (
        spark.read.parquet(str(base / "t.parquet")),
        spark.read.parquet(str(base / "st.parquet")),
    )


def test_flagship_single_exchange_and_no_feature_shuffle(tables, spark):
    """The whole flagship pipeline runs on ONE hash exchange by conv_id
    (the as-of union's), and the feature blobs never appear in any
    exchange — the two core scale claims of pipeline.py."""
    from deep_ner_spark.pipeline import featurize_transcripts

    tdf, stdf = tables
    out, _ = featurize_transcripts(
        tdf, stdf.withColumnRenamed("conv_id", "entity_id"), max_seq_length=8, emb_dim=4
    )
    plan = plan_of(out)
    ex = exchanges(plan)
    hash_ex = [e for e in ex if e[0] == "hashpartitioning"]
    assert len(hash_ex) == 1, f"expected 1 hash exchange, got {ex}\n{plan}"
    assert "conv_id" in hash_ex[0][1]
    # the feature column is created after the exchange: no Exchange line may
    # mention it, and ArrowEvalPython (the feature UDF) must come after
    # the Window operators in the plan tree (higher node id = deeper child)
    for _, args in ex:
        assert "features" not in args


def test_asof_join_is_window_not_join(tables, spark):
    from deep_ner_spark.operators.asof import asof_join

    tdf, stdf = tables
    out = asof_join(
        tdf,
        stdf.select("conv_id", "ts", "state_seq", "state"),
        ["conv_id"],
        "ts",
        ["state"],
        seq_col="turn_idx",
        state_seq_col="state_seq",
    )
    plan = plan_of(out)
    assert "Join" not in plan  # union-tag + window, no join operator
    assert "Window" in plan
    assert len([e for e in exchanges(plan) if e[0] == "hashpartitioning"]) == 1


def test_parquet_filter_pushdown_and_column_pruning(tables, spark):
    tdf, _ = tables
    q = tdf.where(F.col("conv_id") == "conv0000003").select("conv_id", "turn_idx")
    plan = plan_of(q)
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(conv_id", plan), plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" not in m.group(1)  # untouched wide column pruned


def test_cosine_topk_broadcasts_query_side(spark):
    from deep_ner_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=2)
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_vocab_agg_has_partial_aggregation(tables, spark):
    """The shape-vocab fit must map-side combine (partial_count before the
    exchange) so the shuffle moves (shape, count) pairs, not tokens."""
    from deep_ner_spark.operators.tokens import tokenize_turns

    tdf, _ = tables
    toks = tokenize_turns(tdf)
    agg = (
        toks.select(F.explode("shapes").alias("shape"))
        .groupBy("shape")
        .count()
        .where(F.col("count") >= 3)
    )
    plan = plan_of(agg)
    assert "partial_count" in plan or "Partial" in plan, plan


def test_whole_stage_codegen_covers_window_ops(tables, spark):
    from deep_ner_spark.operators.windows import sessionize

    tdf, _ = tables
    out = sessionize(tdf, ["conv_id"], "ts", 1800.0, ["turn_idx"])
    out.collect()  # AQE finalizes the plan (codegen markers) on execution
    plan = plan_of(out)
    assert "codegen id" in plan or "WholeStageCodegen" in plan


def test_bench_flagship_agg_keeps_all_stages_live(tables, spark):
    """An aggregation that skips a stage's output lets Catalyst prune that
    stage from the plan entirely (observed: round-1's bench agg contained
    ZERO Window nodes — the as-of + sessionize + ffill + lag stages were
    dead code and the 'flagship' timing measured only tokenize+featurize).
    This pins the honest consumption shape bench.py uses: every window
    output consumed => every Window/Sort present."""
    from deep_ner_spark.pipeline import featurize_transcripts

    tdf, stdf = tables
    out, _ = featurize_transcripts(
        tdf,
        stdf.withColumnRenamed("conv_id", "entity_id"),
        max_seq_length=8,
        emb_dim=4,
        state_seq_col="state_seq",
    )
    agg = out.select(
        F.count("*"),
        F.sum(F.length("features")),
        F.sum(F.crc32("norm_text")),
        F.sum("n_tokens"),
        F.sum(F.crc32(F.col("state").cast("string"))),
        F.sum("session_id"),
        F.sum(F.crc32("role_ffill")),
        F.sum(F.crc32("tool_ffill")),
        F.sum("n_tokens_lag1"),
        F.sum("n_tokens_lead1"),
    )
    plan = plan_of(agg)
    tree = plan.split("== Initial Plan ==")[0]
    n_windows = len(re.findall(r"Window", tree))
    assert n_windows >= 4, f"window stages pruned from bench plan:\n{tree}"
    assert "MapInArrow" in plan  # featurize pass live (r8: mapInArrow)
    # r8: mapInArrow is opaque over ALL its input columns, so the window
    # stages stay live even under a lean agg — the round-1 pruning hazard
    # the full agg was built against is now gone by construction (this
    # also means the frozen bench agg measures the same work as before)
    lean = out.select(F.count("*"), F.sum(F.length("features")))
    lean_tree = plan_of(lean).split("== Initial Plan ==")[0]
    assert "Window" in lean_tree


def test_jaccard_default_uses_prefix_filtering(spark):
    """VERDICT r1 flagged the naive shared-shingle self-join as the
    scale-killer at t<0.6; 'auto' must route EVERY threshold through the
    PPJoin prefix path (row_number ranking present in the plan)."""
    from deep_ner_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(4)], ["doc_id", "text"]
    )
    for t in (0.3, 0.8):
        # materialize=False: localCheckpoint truncates lineage, hiding the
        # upstream window from the final plan text
        out = jaccard_pairs(df, "doc_id", "text", n=2, threshold=t, materialize=False)
        plan = plan_of(out)
        assert "row_number" in plan, f"t={t}: prefix ranking missing\n{plan[:500]}"


def test_chunk_documents_zero_exchange(spark):
    """The chunker is a pure projection + generate: no shuffle at any
    corpus size (output partitioning follows the scan)."""
    from deep_ner_spark.operators.packing import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(chunk_documents(docs, "doc_id", "text", 32, overlap=8))
    assert exchanges(plan) == [], plan
    # explode_outer (Generate's outer flag true), not plain explode: no
    # inferred filter re-evaluating the HOF chain per row
    gen_args = re.search(r"Arguments: explode\(.*\], (\w+), \[", plan)
    assert gen_args and gen_args.group(1) == "true", plan


def test_eval_contamination_broadcasts_eval_side(spark):
    """The shingled eval set must broadcast: the corpus side streams
    map-side with no corpus shuffle before the per-doc aggregation."""
    from deep_ner_spark.operators.dedup import eval_contamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = eval_contamination(
        docs.where(F.col("doc_id") % 20 != 0),
        docs.where(F.col("doc_id") % 20 == 0),
        "doc_id", "text", n=4,
    )
    plan = plan_of(out)
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pack_sequences_single_exchange_no_text(spark):
    """Packing shuffles ONCE, keyed by shard, and only the slim
    (id, token-count) columns cross the exchange — never text."""
    from deep_ner_spark.operators.packing import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(pack_sequences(docs, "doc_id", "text", 128, n_shards=8))
    ex = exchanges(plan)
    hash_ex = [e for e in ex if e[0] == "hashpartitioning"]
    assert len(hash_ex) == 1 and "shard" in hash_ex[0][1], ex
    assert "text" not in hash_ex[0][1]


def test_term_frequencies_partial_aggregation(spark):
    """The token count must map-side combine: the shuffle moves
    (token, count) pairs, not token occurrences (Zipf-skew-proof)."""
    from deep_ner_spark.operators.textstats import term_frequencies

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(term_frequencies(docs, "text", min_count=3))
    assert "partial_count" in plan or "Partial" in plan, plan


def test_repetition_stats_two_exchanges(spark):
    """Fused repetition stats: ONE tagged explode feeding exactly two hash
    exchanges — (id, n, gram) then id — and no join."""
    from deep_ner_spark.operators.textstats import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(repetition_stats(docs, "doc_id", "text"))
    hash_ex = [e for e in exchanges(plan) if e[0] == "hashpartitioning"]
    assert len(hash_ex) == 2, hash_ex
    assert "Join" not in plan.split("== Initial Plan ==")[0], plan
