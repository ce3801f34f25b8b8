"""brat source: per-document semantics vs independently computed
expectations from the reference fixtures (tests/testdata/brat_data)."""

import glob
import os

import pytest

BRAT_DIR = "/root/reference/tests/testdata/brat_data"
BAD_DIR = "/root/reference/tests/testdata/bad_brat_data"

needs_fixture = pytest.mark.skipif(
    not os.path.isdir(BRAT_DIR), reason="reference fixture unavailable"
)


@needs_fixture
def test_whole_document_mode(spark):
    from deep_ner_spark.sources.brat import load_brat_dataset

    units, spans = load_brat_dataset(spark, BRAT_DIR, split_by_paragraphs=False)
    got = {r["base_name"]: r["text"] for r in units.collect()}
    assert len(got) == 4
    for txt_file in sorted(glob.glob(f"{BRAT_DIR}/*.txt")):
        base = os.path.basename(txt_file)[:-4]
        raw = open(txt_file, encoding="utf-8", errors="ignore", newline="").read()
        expected = raw.replace("\xad", "").replace("\n", " ").replace("\r", " ")
        assert got[base] == expected, base
    # every span's slice strips to a non-empty string
    texts = {r["sample_id"]: r["text"] for r in units.collect()}
    n = 0
    for r in spans.collect():
        piece = texts[r["sample_id"]][r["start"]:r["end"]]
        assert piece.strip(), (r["sample_id"], r["start"], r["end"])
        n += 1
    assert n > 20


@needs_fixture
def test_paragraph_mode(spark):
    from deep_ner_spark.sources.brat import load_brat_dataset

    units, spans = load_brat_dataset(spark, BRAT_DIR, split_by_paragraphs=True)
    rows = units.collect()
    assert len(rows) > 4  # documents split into multiple paragraphs
    for r in rows:
        assert "\n" not in r["text"] and "\r" not in r["text"]
        assert "\xad" not in r["text"]
    texts = {r["sample_id"]: r["text"] for r in units.collect()}
    for r in spans.collect():
        t = texts[r["sample_id"]]
        assert 0 <= r["start"] < r["end"] <= len(t)
        assert t[r["start"]:r["end"]].strip()


@needs_fixture
def test_entity_text_matches_annotation(spark):
    """In whole-doc mode, non-trimmed entities' slices equal the .ann texts
    (modulo soft hyphens), proving offset-shift correctness (W6)."""
    from deep_ner_spark.sources.brat import (
        parse_ann,
        process_brat_document,
    )

    for ann_file in sorted(glob.glob(f"{BRAT_DIR}/*.ann")):
        base = ann_file[:-4]
        full = open(base + ".txt", encoding="utf-8", errors="ignore", newline="").read()
        ann = open(ann_file, encoding="utf-8", errors="ignore", newline="").read()
        raw_ents = parse_ann(ann, full, base)
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("ignore")
            [(text, ents)] = process_brat_document(full, ann, False, base)
        # reconstruct expected slices for entities that were not trimmed
        raw_texts = {
            full[s:e].replace("\xad", "").replace("\n", " ").replace("\r", " ").strip()
            for t in raw_ents
            for s, e in raw_ents[t]
        }
        checked = 0
        for t in ents:
            for s, e in ents[t]:
                piece = text[s:e].strip()
                if piece in raw_texts:
                    checked += 1
        assert checked > 0


@needs_fixture
def test_missing_text_file_raises(spark):
    from deep_ner_spark.sources.brat import load_brat_dataset

    if not os.path.isdir(BAD_DIR):
        pytest.skip("bad_brat_data unavailable")
    with pytest.raises(ValueError, match="has no text file"):
        load_brat_dataset(spark, BAD_DIR)


def test_overlap_resolution_semantics():
    from deep_ner_spark.sources.brat import resolve_overlaps
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        # contained span dropped; partial overlap trimmed to start at prev end
        out = resolve_overlaps({"X": [(0, 10), (5, 8), (7, 15)]})
    assert out["X"] == [(0, 10), (10, 15)]


def test_soft_hyphen_shift():
    from deep_ner_spark.sources.brat import strip_soft_hyphens

    text = "ab\xadcd\xadef"
    ents = {"X": [(0, 2), (3, 5), (6, 8)]}  # 'ab', 'cd', 'ef' around hyphens
    new_text, new_ents = strip_soft_hyphens(text, ents)
    assert new_text == "abcdef"
    assert new_ents["X"] == [(0, 2), (2, 4), (4, 6)]
