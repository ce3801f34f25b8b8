"""Turn -> token pipeline (SURVEY §1.3 token rows, §2.5 W5).

``tokenize_turns`` keeps everything turn-local (one UDF call per turn, Arrow
batched); ``token_table`` explodes to the long form used by relational
operators.  No shuffle in either step — posexplode is a narrow transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deep_ner_spark.functions.text import normalize_text_col, tokenize_struct_udf


def tokenize_turns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``norm_text`` + aligned token arrays (tokens/starts/ends/shapes/pos/dep).

    Offsets are computed against the normalized text, exactly as the
    reference does (elmo_ner.py:400,463: normalize first, tokenize second) —
    normalization is 1:1 on char length so offsets remain valid.
    """
    return (
        df.withColumn("norm_text", normalize_text_col(F.col(text_col)))
        .withColumn("__tok", tokenize_struct_udf(F.col("norm_text")))
        .select(
            "*",
            F.col("__tok.tokens").alias("tokens"),
            F.col("__tok.starts").alias("starts"),
            F.col("__tok.ends").alias("ends"),
            F.col("__tok.shapes").alias("shapes"),
            F.col("__tok.pos").alias("pos_tags"),
            F.col("__tok.dep").alias("dep_tags"),
        )
        .drop("__tok")
    )


def token_table(df: DataFrame, keep_cols: list[str] | None = None) -> DataFrame:
    """Explode tokenized turns into one row per token with 0-based token_idx.

    The positional index the reference keeps implicitly as a list index
    (elmo_ner.py:972, 504-512) becomes an explicit ``token_idx`` column from
    ``posexplode`` — order within a turn is array order, no window needed.
    """
    keep = keep_cols if keep_cols is not None else ["conv_id", "turn_idx"]
    zipped = F.arrays_zip("tokens", "starts", "ends", "shapes", "pos_tags", "dep_tags")
    return df.select(*keep, F.posexplode(zipped).alias("token_idx", "t")).select(
        *keep,
        "token_idx",
        F.col("t.tokens").alias("token"),
        F.col("t.starts").alias("start"),
        F.col("t.ends").alias("end"),
        F.col("t.shapes").alias("shape"),
        F.col("t.pos_tags").alias("pos"),
        F.col("t.dep_tags").alias("dep"),
    )
