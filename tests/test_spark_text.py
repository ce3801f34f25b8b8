"""Spark expressions/UDFs agree with the pure reference-semantics functions."""

import pandas as pd
from pyspark.sql import functions as F

from deep_ner_spark import textfns
from deep_ner_spark.functions.text import (
    normalize_text_col,
    shape_col_sql,
    shape_udf,
    tokenize_struct_udf,
)

TRICKY = [
    "a—b–c‒d‑e‐f﹣g－h⁃i֊j᠆k",
    "tabs\tand\nnewlines\r\nand nbsp thin　ideographic",
    "Барак Обама принимает в Белом доме своего французского коллегу Николя Саркози.",
    "plain ascii text 123 !?",
    "",
    "  leading and trailing  ",
    "mixed—dash­softhyphen",
]


def test_normalize_col_matches_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": TRICKY}))
    got = [r["n"] for r in df.select(normalize_text_col(F.col("text")).alias("n")).collect()]
    want = [textfns.normalize_text(t) for t in TRICKY]
    assert got == want


def test_tokenize_udf_matches_python(spark):
    texts = [t for t in TRICKY if t] + ["Anna Karenina flew to New York in 1997 — twice."]
    df = spark.createDataFrame(pd.DataFrame({"text": [textfns.normalize_text(t) for t in texts]}))
    rows = (
        df.withColumn("tok", tokenize_struct_udf(F.col("text")))
        .select("text", "tok.*")
        .collect()
    )
    for r in rows:
        triples = textfns.tokenize_with_bounds(r["text"])
        assert r["tokens"] == [t for t, _, _ in triples]
        assert r["starts"] == [s for _, s, _ in triples]
        assert r["ends"] == [e for _, _, e in triples]
        assert r["shapes"] == [textfns.shape_of_string(t) for t, _, _ in triples]
        # bounds also equal the reference's sequential-find alignment
        if r["tokens"]:
            assert list(zip(r["starts"], r["ends"])) == textfns.bounds_of_tokens(
                r["text"], r["tokens"]
            )


def test_shape_udf_and_sql_fallback_agree_on_ascii(spark):
    tokens = ["Hello", "HELLO", "abc123", "CamelCase", "1,234.56", "a+b", "!!", "x"]
    df = spark.createDataFrame(pd.DataFrame({"token": tokens}))
    rows = df.select(
        "token",
        shape_udf(F.col("token")).alias("py"),
        shape_col_sql(F.col("token")).alias("sql"),
    ).collect()
    for r in rows:
        assert r["py"] == textfns.shape_of_string(r["token"])
        assert r["sql"] == r["py"]
