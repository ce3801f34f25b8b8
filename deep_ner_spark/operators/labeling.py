"""Entity labeling: the token <-> entity interval-overlap join (SURVEY J1)
plus the exact char-paint/majority/BIO pipeline of the reference.

Two implementations, deliberately:

* :func:`label_tokens_colocated` — the *authoritative* path.  Entities and
  tokens of one turn are colocated (a single groupBy on the turn key), and
  the per-turn labeling runs the exact reference semantics
  (char paint -> per-token majority -> BIO ints; elmo_ner.py:1026-1064)
  vectorized in NumPy inside ``applyInPandas``.  One shuffle (group spans to
  turns); no interval join at table scope.

* :func:`label_tokens_relational` — pure-DataFrame range-join form used for
  oracle cross-checks: overlap theta-join + max_by(overlap) majority.  It
  matches the colocated path whenever no two entity instances tie on a
  token's majority count (the reference breaks such ties by paint instance
  id, which the relational form reproduces via min(instance)).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deep_ner_spark import textfns

_LABELS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("labels", T.ArrayType(T.IntegerType())),
    ]
)


def label_tokens_colocated(
    tokenized_turns: DataFrame,
    entity_spans: DataFrame,
    classes_list: Sequence[str],
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Per-turn BIO integer labels with exact reference semantics.

    ``tokenized_turns``: output of tokenize_turns (needs starts/ends arrays +
    norm_text).  ``entity_spans``: long-form (key..., ne_type, start, end).
    Returns (key..., labels: array<int>) — one label per token, reference
    codec (B=2k / I=2k-1 / O=0).
    """
    if tuple(key_cols) != ("conv_id", "turn_idx"):
        raise ValueError("label_tokens_colocated currently keys on (conv_id, turn_idx)")
    classes = tuple(classes_list)
    spans_grouped = entity_spans.groupBy(*key_cols).agg(
        F.collect_list(F.struct("ne_type", "start", "end")).alias("spans")
    )
    joined = tokenized_turns.select(
        *key_cols, "norm_text", "starts", "ends"
    ).join(spans_grouped, on=list(key_cols), how="left")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out_labels = []
        # column zip, not iterrows: avoids per-row Series construction
        for starts, ends, spans, norm_text in zip(
            pdf["starts"], pdf["ends"], pdf["spans"], pdf["norm_text"]
        ):
            bounds = list(zip(starts, ends))
            if spans is None or (isinstance(spans, float) and pd.isna(spans)):
                out_labels.append([0] * len(bounds))
                continue
            ner: dict = {}
            for s in spans:
                ner.setdefault(s["ne_type"], []).append((int(s["start"]), int(s["end"])))
            text_len = len(norm_text)
            paint, inst_to_class = textfns.paint_entity_chars(text_len, classes, ner)
            labels = textfns.token_labels(bounds, paint, inst_to_class, len(bounds))
            out_labels.append([int(x) for x in labels])
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "labels": out_labels,
            }
        )

    # mapInPandas-style group map: one turn per row already, so this is a
    # narrow Arrow pass — applyInPandas is unnecessary; groupBy happened
    # upstream in spans_grouped only.
    return joined.mapInPandas(
        lambda it: (run(pdf) for pdf in it), schema=_LABELS_SCHEMA
    )


def label_tokens_relational(
    token_df: DataFrame,
    entity_spans: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Range-join labeling (J1 relational form).

    tokens (key..., token_idx, start, end) x spans (key..., ne_type, start,
    end, instance_id) on char-interval overlap; per token keep the instance
    with max overlap (ties -> lowest instance id, like distr.argmax);
    overlap below half the token length floors to O (utils.py:998 analog).

    Known divergences from :func:`label_tokens_colocated` (which follows
    elmo_ner.py:1026-1064 and is the authoritative path):

    * instance-vs-instance majority ties resolve by lowest instance id in
      both paths, but the colocated path counts painted CHARS while this
      path compares interval overlaps — equal on non-overlapping spans;
    * an exact O-vs-entity tie (overlap == tok_len - overlap, i.e. a token
      exactly half-covered) labels the ENTITY here (utils.py:998 keeps
      overlap >= floor(tok_len / 2)) but O in the colocated path
      (bincount argmax picks index 0, elmo_ner.py:1050).  Both reference
      files exist with these exact semantics; this function mirrors
      utils.py, the colocated one mirrors elmo_ner.py.
    """
    t = token_df.alias("t")
    e = entity_spans.alias("e")
    cond = [F.col(f"t.{k}") == F.col(f"e.{k}") for k in key_cols]
    cond.append(F.col("t.start") < F.col("e.end"))
    cond.append(F.col("e.start") < F.col("t.end"))
    overlap = F.least(F.col("t.end"), F.col("e.end")) - F.greatest(
        F.col("t.start"), F.col("e.start")
    )
    tok_len = F.col("t.end") - F.col("t.start")
    joined = (
        t.join(e, on=cond, how="left")
        .select(
            *[F.col(f"t.{k}").alias(k) for k in key_cols],
            F.col("t.token_idx").alias("token_idx"),
            F.col("t.start").alias("start"),
            F.col("t.end").alias("end"),
            F.col("e.ne_type").alias("ne_type"),
            F.col("e.instance_id").alias("instance_id"),
            overlap.alias("overlap"),
            tok_len.alias("tok_len"),
        )
    )
    best = (
        joined.groupBy(*key_cols, "token_idx", "start", "end", "tok_len")
        .agg(
            F.max_by(
                F.struct("ne_type", "instance_id"),
                F.struct(F.col("overlap"), -F.col("instance_id")),
            ).alias("best"),
            F.max("overlap").alias("best_overlap"),
        )
    )
    # utils.py:998: O unless overlap >= floor(token_len / 2)
    keep = (F.col("best_overlap").isNotNull()) & (
        F.col("best_overlap") >= F.floor(F.col("tok_len") / 2)
    )
    return best.select(
        *key_cols,
        "token_idx",
        "start",
        "end",
        F.when(keep, F.col("best.ne_type")).alias("ne_type"),
        F.when(keep, F.col("best.instance_id")).alias("instance_id"),
    )
