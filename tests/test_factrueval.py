"""FactRuEval source chain vs the reference's golden expectations
(tests/test_utils.py:34-304) on the book_3543 fixture."""

import os

import pytest

FX = "/root/reference/tests/testdata/factrueval_data"

needs_fixture = pytest.mark.skipif(
    not os.path.isdir(FX), reason="reference fixture unavailable"
)


@needs_fixture
def test_tokens_and_sentence_bounds(spark):
    from deep_ner_spark.sources.factrueval import (
        load_tokens,
        reconstructed_text,
        sentence_bounds,
    )

    toks = load_tokens(spark, FX)
    rows = {r["token_id"]: (r["start"], r["end"], r["token"]) for r in toks.collect()}
    assert rows[1802186] == (0, 8, "Назначен")
    assert rows[1802191] == (53, 59, "долины")
    assert rows[1802201] == (146, 147, ".")

    sb = {
        r["sentence_idx"]: (r["start"], r["end"])
        for r in sentence_bounds(toks).collect()
    }
    assert tuple(sb[k] for k in sorted(sb)) == (
        (0, 59), (61, 147), (149, 290), (291, 507), (508, 619), (620, 756), (757, 795),
    )

    text = reconstructed_text(toks).collect()[0]["text"]
    assert len(text) == 795
    assert text.startswith("Назначен куратор строительства российской Кремниевой долины")
    assert text[61:68] == "Дмитрий"
    assert text[59:61] == "  "  # gap fill


@needs_fixture
def test_paragraph_bounds(spark):
    from deep_ner_spark.sources.factrueval import load_tokens, paragraph_bounds

    toks = load_tokens(spark, FX)
    pb = {
        r["para_idx"]: (r["start"], r["end"])
        for r in paragraph_bounds(spark, FX, toks).collect()
    }
    assert tuple(pb[k] for k in sorted(pb)) == ((0, 59), (61, 147), (149, 795))


@needs_fixture
def test_spans_objects_and_entities(spark):
    from deep_ner_spark.sources.factrueval import (
        factrueval_to_dataset,
        load_objects,
        load_spans,
        load_tokens,
    )

    toks = load_tokens(spark, FX)
    spans = load_spans(spark, FX, toks)
    span_map = {}
    for r in spans.collect():
        span_map.setdefault(r["span_id"], set()).add(r["token_id"])
    assert span_map[87547] == {1802190, 1802191}
    assert span_map[87549] == {1802189}

    objs = load_objects(spark, FX, spans)
    obj_map = {}
    for r in objs.collect():
        obj_map.setdefault((r["object_id"], r["ne_type"]), set()).add(r["span_id"])
    assert obj_map[(52701, "LOCATION")] == {87547, 87548, 87549}
    assert (52700, "LOCATION") in obj_map  # LocOrg remapped

    docs, ents, bounds = factrueval_to_dataset(spark, FX, split_by_paragraphs=True)
    ent_set = {(r["ne_type"], r["start"], r["end"]) for r in ents.collect()}
    # object 52701: union of tokens 1802189..91 -> (31, 59)
    assert ("LOCATION", 31, 59) in ent_set
    # object 52700 (LocOrg): token 1802189 -> (31, 41)
    assert ("LOCATION", 31, 41) in ent_set
    assert all(t in {"LOCATION", "PERSON", "ORG"} for t, _, _ in ent_set)


@needs_fixture
def test_task1_sink(spark, tmp_path):
    from deep_ner_spark.sources.factrueval import factrueval_to_dataset, write_task1
    from pyspark.sql import functions as F

    docs, ents, _ = factrueval_to_dataset(spark, FX)
    write_task1(ents.withColumn("base_name", F.lit("book_3543")), str(tmp_path))
    lines = open(tmp_path / "book_3543.task1", encoding="utf-8").read().splitlines()
    assert all(len(l.split()) == 3 for l in lines)
    assert any(l.startswith("loc 31 ") for l in lines)
    starts = [int(l.split()[1]) for l in lines]
    assert starts == sorted(starts)


@needs_fixture
def test_task1_roundtrip_via_s6(spark, tmp_path):
    """S11 sink then S6 loader: predictions survive the round-trip."""
    from pyspark.sql import functions as F

    from deep_ner_spark.sources.factrueval import (
        factrueval_to_dataset,
        load_task1_predictions,
        write_task1,
    )

    _, ents, _ = factrueval_to_dataset(spark, FX)
    named = ents.withColumn("base_name", F.lit("book_3543"))
    write_task1(named, str(tmp_path))
    back = load_task1_predictions(spark, str(tmp_path))
    want = {(r["ne_type"], r["start"], r["end"]) for r in named.collect()}
    got = {(r["ne_type"], r["start"], r["end"]) for r in back.collect()}
    assert got == want
