"""Sentence division with entity-straddle merge (utils.py:1064-1171)."""

import pandas as pd

from deep_ner_spark.operators.segment import (
    default_sent_tokenize,
    divide_unit_by_sentences,
    divide_units_by_sentences,
)


def test_simple_split_and_rebase():
    text = "Anna went home. John stayed in New York. The end."
    ents = {"PERSON": [(0, 4), (16, 20)], "LOCATION": [(31, 39)]}
    out = divide_unit_by_sentences(text, ents)
    assert [t for t, _ in out] == [
        "Anna went home.",
        "John stayed in New York.",
        "The end.",
    ]
    assert out[0][1] == {"PERSON": [(0, 4)]}
    assert out[1][1] == {"PERSON": [(0, 4)], "LOCATION": [(15, 23)]}
    assert out[2][1] == {}
    # rebased slices point at the right substrings
    assert out[1][0][15:23] == "New York"


def test_straddling_entity_merges_sentences():
    text = "Intro words. The United Nations. Assembly met today. Tail."
    # entity spans across sentence 2 and 3
    ents = {"ORG": [(17, 41)]}
    out = divide_unit_by_sentences(text, ents)
    texts = [t for t, _ in out]
    assert texts == ["Intro words.", "The United Nations. Assembly met today.", "Tail."]
    assert out[1][1]["ORG"] == [(4, 28)]
    assert out[1][0][4:28] == "United Nations. Assembly"


def test_spark_divide_units(spark):
    rows = pd.DataFrame(
        {
            "sample_id": [0, 1],
            "text": [
                "Anna went home. John stayed in New York. The end.",
                "One sentence only",
            ],
        }
    )
    spans = pd.DataFrame(
        {
            "sample_id": [0, 0, 0],
            "ne_type": ["PERSON", "PERSON", "LOCATION"],
            "start": [0, 16, 31],
            "end": [4, 20, 39],
        }
    )
    units2, spans2 = divide_units_by_sentences(
        spark.createDataFrame(rows), spark.createDataFrame(spans)
    )
    texts = {r["sample_id"]: r["text"] for r in units2.collect()}
    assert len(texts) == 4
    got = {}
    for r in spans2.collect():
        got.setdefault(r["sample_id"], set()).add((r["ne_type"], r["start"], r["end"]))
    by_text = {texts[k]: v for k, v in got.items()}
    assert by_text["Anna went home."] == {("PERSON", 0, 4)}
    assert by_text["John stayed in New York."] == {
        ("PERSON", 0, 4),
        ("LOCATION", 15, 23),
    }


def test_default_sent_tokenize():
    assert default_sent_tokenize("A b. C d! E?") == ["A b.", "C d!", "E?"]
    assert default_sent_tokenize("no terminal punct") == ["no terminal punct"]
