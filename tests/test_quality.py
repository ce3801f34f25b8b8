"""Quality metric: unit semantics + the reference's golden fixture numbers
(tests/test_quality.py:107-150 expects F1=0.842037 P=0.908352 R=0.784746 on
the true/predicted JSON pair)."""

import os

import pytest

from deep_ner_spark.operators.quality import match_spans, prf, span_similarity

REF_TESTDATA = "/root/reference/tests/testdata"


def test_span_similarity_cases():
    # exact match
    assert span_similarity((0, 10), (0, 10)) == (1.0, 10, 0, 0)
    # disjoint
    s, tp, fp, fn = span_similarity((0, 5), (10, 20))
    assert (s, tp, fp, fn) == (0.0, 0, 10, 5)
    # overlap: gold (224,238) vs pred (224,230) -> tp=6 fp=0 fn=8
    s, tp, fp, fn = span_similarity((224, 238), (224, 230))
    assert (tp, fp, fn) == (6, 0, 8)
    assert abs(s - 6 / 14) < 1e-12
    # pred extends past gold on both sides
    s, tp, fp, fn = span_similarity((5, 10), (0, 15))
    assert (tp, fp, fn) == (5, 10, 0)


def test_match_spans_equal_counts_identity_pairing():
    gold = [(0, 10), (20, 30)]
    pred = [(0, 10), (20, 30)]
    assert match_spans(gold, pred) == (20, 0, 0)
    # identity pairing even when a cross pairing would be better
    gold = [(0, 10), (11, 21)]
    pred = [(11, 21), (30, 40)]  # sorted; (0) pairs with (11,21)? no overlap
    tp, fp, fn = match_spans(gold, pred)
    # pair (0,0): gold(0,10) vs pred(11,21) no overlap -> not in sim;
    # pair (1,1): gold(11,21) vs pred(30,40) no overlap -> not in sim
    assert tp == 0 and fn == 20 and fp == 20


def test_match_spans_unequal_uses_greedy():
    gold = [(0, 10)]
    pred = [(0, 4), (5, 10), (50, 60)]
    tp, fp, fn = match_spans(gold, pred)
    # best single pair: (0,10)x(5,10): tp=5,fp=0,fn=5 vs (0,10)x(0,4): tp=4
    # comb enumeration finds (0 -> (0,4)) first but greedy/(comb) picks max
    assert tp == 5
    assert fn == 5
    # unmatched preds add their lengths as fp: (0,4)=4 + (50,60)=10
    assert fp == 14


@pytest.mark.skipif(
    not os.path.isdir(REF_TESTDATA), reason="reference fixtures unavailable"
)
def test_golden_prediction_quality(spark):
    """Load the reference's gold/pred JSON fixtures through our S7 source,
    run the Spark quality metric, pin the reference's published numbers."""
    from deep_ner_spark.sources.json_ds import load_json_dataset
    from deep_ner_spark.operators.quality import prediction_quality

    units_g, spans_g = load_json_dataset(
        spark, os.path.join(REF_TESTDATA, "true_named_entities.json")
    )
    units_p, spans_p = load_json_dataset(
        spark, os.path.join(REF_TESTDATA, "predicted_named_entities.json")
    )
    # per-unit text equality between the two files (they share the corpus)
    gt = {r["sample_id"]: r["text"] for r in units_g.collect()}
    pt = {r["sample_id"]: r["text"] for r in units_p.collect()}
    assert gt == pt

    out = prediction_quality(
        spans_g.withColumnRenamed("ne_type", "ne_class"),
        spans_p.withColumnRenamed("ne_type", "ne_class"),
        ("LOCATION", "PERSON", "ORG"),
    )
    rows = {r["ne_class"]: r for r in out.collect()}
    total = rows[None]
    assert abs(total["f1"] - 0.842037) < 1e-3
    assert abs(total["precision"] - 0.908352) < 1e-3
    assert abs(total["recall"] - 0.784746) < 1e-3
    for c in ("LOCATION", "PERSON", "ORG"):
        assert 0.0 < rows[c]["f1"] < 1.0


def test_prf_guards():
    assert prf(0, 5, 5) == (0.0, 0.0, 0.0)
    f1, p, r = prf(10, 0, 0)
    assert (f1, p, r) == (1.0, 1.0, 1.0)
