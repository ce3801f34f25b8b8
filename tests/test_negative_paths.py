"""Negative-input validation paths — the reference's test suite is ~60%
validation tests (SURVEY §5); these pin our loaders' error behavior."""

import pandas as pd
import pytest


def test_bio_invalid_label_raises(spark, tmp_path):
    from deep_ner_spark.sources.bio import load_bio_dataset

    p = tmp_path / "bad.bio"
    p.write_text("Tok NN B-LOC\nBad NN b-loc\n\n")  # lowercase label
    with pytest.raises(ValueError, match="invalid BIO line"):
        load_bio_dataset(spark, str(p))


def test_bio_single_field_raises(spark, tmp_path):
    from deep_ner_spark.sources.bio import load_bio_dataset

    p = tmp_path / "bad2.bio"
    p.write_text("loneword\n")
    with pytest.raises(ValueError, match="invalid BIO line"):
        load_bio_dataset(spark, str(p))


def test_brat_mismatched_annotation_text_raises():
    from deep_ner_spark.sources.brat import parse_ann

    with pytest.raises(ValueError, match="line 1 is wrong"):
        parse_ann("T1\tLOC 0 5\tWRONG", "Hello world", "doc")


def test_brat_out_of_range_span_raises():
    from deep_ner_spark.sources.brat import parse_ann

    with pytest.raises(ValueError, match="line 1 is wrong"):
        parse_ann("T1\tLOC 0 99\tHello", "Hello", "doc")


def test_factrueval_bad_token_line_raises(spark, tmp_path):
    from deep_ner_spark.sources.factrueval import load_tokens

    p = tmp_path / "doc.tokens"
    p.write_text("1 0 5 Hello\n2 6 3 toolong\n")  # len mismatch on line 2
    with pytest.raises(ValueError, match="Invalid .tokens line"):
        load_tokens(spark, str(tmp_path))


def test_factrueval_duplicate_token_id_raises(spark, tmp_path):
    from deep_ner_spark.sources.factrueval import load_tokens

    p = tmp_path / "doc.tokens"
    p.write_text("1 0 5 Hello\n1 6 5 World\n")
    with pytest.raises(ValueError, match="Duplicate token ids"):
        load_tokens(spark, str(tmp_path))


def test_spans_unknown_token_fk_raises(spark, tmp_path):
    from deep_ner_spark.sources.factrueval import load_spans, load_tokens

    (tmp_path / "doc.tokens").write_text("1 0 5 Hello\n")
    (tmp_path / "doc.spans").write_text("7 word 0 5 1 1 extra pad # 999 Hello\n")
    toks = load_tokens(spark, str(tmp_path))
    with pytest.raises(ValueError, match="unknown token"):
        load_spans(spark, str(tmp_path), toks)


def test_splitting_bad_params_raise(spark):
    from deep_ner_spark.operators.splitting import split_assignment

    units = spark.createDataFrame(pd.DataFrame({"sample_id": [0, 1, 2, 3], "text": list("abcd")}))
    spans = spark.createDataFrame(
        pd.DataFrame({"sample_id": [0], "ne_type": ["X"]})
    )
    with pytest.raises(ValueError, match="restarts"):
        split_assignment(units, spans, 0.5, n_restarts=1)
    with pytest.raises(ValueError, match="too small value of the test part"):
        split_assignment(units, spans, 0.01)
    with pytest.raises(ValueError, match="too large value of the test part"):
        split_assignment(units, spans, 0.99999)


def test_bounds_of_tokens_missing_token_raises():
    from deep_ner_spark.textfns import bounds_of_tokens

    with pytest.raises(ValueError, match="cannot be tokenized"):
        bounds_of_tokens("short text", ["short", "missing"])


def test_sentence_division_unfindable_sentence_raises():
    from deep_ner_spark.operators.segment import divide_unit_by_sentences

    with pytest.raises(ValueError, match="cannot be tokenized by sentences"):
        divide_unit_by_sentences("abc.", {}, sent_tokenize_func=lambda t: ["zzz"])
