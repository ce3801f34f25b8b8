"""Fitted aggregates + per-turn feature-matrix assembly (SURVEY A1/A2, §2.8).

The reference builds dense padded per-channel ndarrays by hand
(elmo_ner.py:503-541); here the columnar batch is Arrow, and the one-hot
scatter happens vectorized in NumPy inside a ``pandas_udf``.  The fitted
shape vocabulary (a global aggregate) is computed once with a hash
aggregation and broadcast — the two-pass fit/reuse structure of the
reference (fit at elmo_ner.py:103, reuse at :274) made explicit.

Scale notes: the vocab agg is a map-side-combinable groupBy on a low-
cardinality key (shape strings) — partial aggregation makes the exchange
tiny.  The matrix assembly is a narrow Arrow pass, no shuffle.  The linear
``vocab.index(shape)`` hot spot of the reference (elmo_ner.py:507) becomes a
dict lookup.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from deep_ner_spark import textfns


def fit_shape_vocab(
    tokenized_turns: DataFrame, min_freq: int = 3, shapes_col: str = "shapes"
) -> Tuple[str, ...]:
    """Shape vocabulary: corpus frequency >= min_freq, sorted (elmo_ner.py:492-500).

    Empty shapes are excluded (elmo_ner.py:419-421 skips '' before counting).
    """
    rows = (
        tokenized_turns.select(F.explode(shapes_col).alias("shape"))
        .where(F.col("shape") != "")
        .groupBy("shape")
        .count()
        .where(F.col("count") >= min_freq)
        .orderBy("shape")
        .select("shape")
        .collect()
    )
    return tuple(r["shape"] for r in rows)


def fit_classes_list(entity_spans: DataFrame, ne_col: str = "ne_type") -> Tuple[str, ...]:
    """Sorted distinct entity types (elmo_ner.py:1124-1141,1155)."""
    rows = entity_spans.select(ne_col).distinct().orderBy(ne_col).collect()
    return tuple(r[ne_col] for r in rows)


# --- pure assembly functions (shared by UDF bodies and parity tests) ---------


def shape_one_hot_matrix(
    shapes: Sequence[str], vocab: Sequence[str], max_seq_length: int
) -> np.ndarray:
    """[max_seq_length, len(vocab)+3] float32 (elmo_ner.py:503-512).

    Column len(vocab) = unknown shape; len(vocab)+1 = BOS flag on row 0;
    len(vocab)+2 = EOS flag on row (n_real_tokens - 1).  The reference sets
    the EOS flag via Python negative indexing when the text is empty
    (shapes_[s][-1]), i.e. on the last padded row — reproduced verbatim.
    """
    S = len(vocab)
    index: Dict[str, int] = {s: i for i, s in enumerate(vocab)}
    m = np.zeros((max_seq_length, S + 3), dtype=np.float32)
    n = min(len(shapes), max_seq_length)
    for i in range(n):
        m[i, index.get(shapes[i], S)] = 1.0
    m[0, S + 1] = 1.0
    # reference truncates shapes first, then indexes len-1 (wraps to the
    # last padded row via Python negative indexing when the turn is empty)
    m[n - 1 if n > 0 else max_seq_length - 1, S + 2] = 1.0
    return m


def linguistic_matrix(
    pos_tags: Sequence[str], dep_tags: Sequence[str], max_seq_length: int
) -> np.ndarray:
    """[max_seq_length, 18+48] float32 POS+dep one-hots (elmo_ner.py:514-531)."""
    width = len(textfns.UNIVERSAL_POS_TAGS) + len(textfns.UNIVERSAL_DEPENDENCIES)
    m = np.zeros((max_seq_length, width), dtype=np.float32)
    n = min(len(pos_tags), max_seq_length)
    for i in range(n):
        m[i] = textfns.pos_dep_one_hot(pos_tags[i], dep_tags[i])
    return m


def turn_feature_matrix(
    tokens: Sequence[str],
    shapes: Sequence[str],
    pos_tags: Sequence[str],
    dep_tags: Sequence[str],
    vocab: Sequence[str],
    max_seq_length: int,
    emb_dim: int = 16,
) -> np.ndarray:
    """Concat channels in reference order: embedding ‖ shape ‖ linguistic.

    Mirrors the concat the model input sees (elmo_ner.py:713-719: ELMo
    embedding then shapes then nlp features), with the hermetic hash
    embedder standing in for ELMo (see textfns.hash_embedding).
    """
    emb = np.zeros((max_seq_length, emb_dim), dtype=np.float32)
    n = min(len(tokens), max_seq_length)
    for i in range(n):
        emb[i] = textfns.hash_embedding(tokens[i], emb_dim)
    return np.concatenate(
        [
            emb,
            shape_one_hot_matrix(shapes, vocab, max_seq_length),
            linguistic_matrix(pos_tags, dep_tags, max_seq_length),
        ],
        axis=1,
    )


# --- Spark assembly: Arrow-batched, broadcast vocab --------------------------


def make_feature_matrix_udf(
    vocab: Tuple[str, ...], max_seq_length: int, emb_dim: int = 16
):
    """pandas_udf: (tokens, shapes, pos, dep) arrays -> per-turn matrix.

    The vocab tuple rides the closure (Spark broadcasts task binaries; for
    very large vocabs pass a SparkContext broadcast instead).
    """

    @pandas_udf(T.ArrayType(T.ArrayType(T.FloatType())))
    def assemble(
        tokens: pd.Series, shapes: pd.Series, pos: pd.Series, dep: pd.Series
    ) -> pd.Series:
        out = []
        for tk, sh, p, d in zip(tokens, shapes, pos, dep):
            m = turn_feature_matrix(
                list(tk), list(sh), list(p), list(d), vocab, max_seq_length, emb_dim
            )
            out.append([row.tolist() for row in m])
        return pd.Series(out)

    return assemble


def with_feature_matrix(
    tokenized_turns: DataFrame,
    vocab: Tuple[str, ...],
    max_seq_length: int,
    emb_dim: int = 16,
    out_col: str = "features",
) -> DataFrame:
    udf = make_feature_matrix_udf(vocab, max_seq_length, emb_dim)
    return tokenized_turns.withColumn(
        out_col, udf("tokens", "shapes", "pos_tags", "dep_tags")
    ).withColumn("n_tokens", F.least(F.size("tokens"), F.lit(max_seq_length)))
