"""BIO/CoNLL loader + sink: the reference's own golden expectations
(tests/test_utils.py:1558-1660) against our Spark source on the reference's
bio.txt fixture."""

import os

import pytest

from deep_ner_spark.sources.bio import (
    assemble_bio_unit,
    load_bio_dataset,
    save_bio_predictions,
)

BIO_FIXTURE = "/root/reference/tests/testdata/bio.txt"

needs_fixture = pytest.mark.skipif(
    not os.path.isfile(BIO_FIXTURE), reason="reference fixture unavailable"
)


def collect(units, spans):
    texts = [r["text"] for r in units.orderBy("sample_id").collect()]
    ents = [dict() for _ in texts]
    for r in spans.collect():
        ents[r["sample_id"]].setdefault(r["ne_type"], []).append(
            (r["start"], r["end"])
        )
    for d in ents:
        for k in d:
            d[k].sort()
    return texts, ents


@needs_fixture
def test_bio_plain(spark):
    units, spans = load_bio_dataset(spark, BIO_FIXTURE)
    texts, ents = collect(units, spans)
    assert texts == [
        "-DOCSTART-",
        "SOCCER - JAPAN GET LUCKY WIN, CHINA IN SURPRISE DEFEAT.",
        "Nadim Ladki",
        "AL-AIN, United Arab Emirates 1996-12-06",
        "Japan coach Shu Kamo said: '' The Syrian own goal proved lucky for us.",
        "Percent change 1.8% 21.8% - 4.4%",
        "-DOCSTART-",
        "FREESTYLE SKIING-WORLD CUP MOGUL RESULTS.",
    ]
    assert ents == [
        {},
        {"LOC": [(9, 14)], "PER": [(30, 35)]},
        {"PER": [(0, 11)]},
        {"LOC": [(0, 6), (8, 28)]},
        {"LOC": [(0, 5)], "PER": [(12, 20)], "MISC": [(34, 40)]},
        {},
        {},
        {"MISC": [(10, 26)]},
    ]


@needs_fixture
def test_bio_stopwords(spark):
    units, spans = load_bio_dataset(spark, BIO_FIXTURE, stopwords={"-DOCSTART-"})
    texts, ents = collect(units, spans)
    assert texts[0] == "SOCCER - JAPAN GET LUCKY WIN, CHINA IN SURPRISE DEFEAT."
    assert len(texts) == 6
    assert ents[3] == {"LOC": [(0, 5)], "PER": [(12, 20)], "MISC": [(34, 40)]}


@needs_fixture
def test_bio_paragraph_separators(spark):
    units, spans = load_bio_dataset(
        spark, BIO_FIXTURE, paragraph_separators={"-DOCSTART-"}, stopwords={"-DOCSTART-"}
    )
    texts, ents = collect(units, spans)
    assert len(texts) == 2
    assert texts[1] == "FREESTYLE SKIING-WORLD CUP MOGUL RESULTS."
    assert texts[0].startswith("SOCCER - JAPAN GET LUCKY WIN, CHINA IN SURPRISE DEFEAT. Nadim Ladki")
    assert ents[0]["LOC"] == [(9, 14), (68, 74), (76, 96), (108, 113)]
    assert ents[0]["PER"] == [(30, 35), (56, 67), (120, 128)]
    assert ents[0]["MISC"] == [(142, 148)]
    assert ents[1] == {"MISC": [(10, 26)]}


def test_assemble_unit_punctuation_rules():
    text, spans = assemble_bio_unit(
        ["Percent", "change", "1.8", "%", "21.8", "%", "-", "4.4", "%"],
        ["O"] * 9,
    )
    assert text == "Percent change 1.8% 21.8% - 4.4%"
    text, spans = assemble_bio_unit(["He", "said", ":", "'", "'", "ok"], ["O"] * 6)
    assert text == "He said: ' ' ok" or text == "He said: '' ok"


@needs_fixture
def test_bio_sink_roundtrip(spark, tmp_path):
    units, spans = load_bio_dataset(spark, BIO_FIXTURE, stopwords={"-DOCSTART-"})
    out = tmp_path / "out.bio"
    save_bio_predictions(
        spark, BIO_FIXTURE, units, spans, str(out), stopwords={"-DOCSTART-"}
    )
    src_lines = [l.strip() for l in open(BIO_FIXTURE, encoding="utf-8")]
    dst_lines = [l.strip() for l in open(out, encoding="utf-8")]
    # every non-blank source line gains exactly one appended label;
    # feeding gold spans back reproduces the gold BIO labels
    si = 0
    checked = 0
    for dl in dst_lines:
        while si < len(src_lines) and not src_lines[si]:
            si += 1
        if not dl:
            continue
        if si < len(src_lines) and src_lines[si]:
            src_parts = src_lines[si].split()
            dst_parts = dl.split()
            assert dst_parts[: len(src_parts)] == src_parts
            if src_parts[0] != "-DOCSTART-":
                assert dst_parts[-1] == src_parts[-1], (src_parts, dst_parts)
                checked += 1
            si += 1
    assert checked > 30
