"""CRF Viterbi decode as a vectorized per-turn operator (SURVEY E1 step 5).

The reference decodes each sequence with tf.contrib.crf.viterbi_decode
(elmo_ner.py:293-296) — a deterministic dynamic program over per-token
logits and a transition matrix.  Re-implemented with NumPy inside a
``pandas_udf``: one call per turn, embarrassingly parallel, transitions
broadcast via the closure.  The decoded label ids feed the BIO islands
decode (W2) exactly like the reference's predict path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def viterbi_decode(logits: np.ndarray, transitions: np.ndarray) -> np.ndarray:
    """Most-likely label sequence: argmax over paths (standard Viterbi).

    logits: [seq_len, n_tags]; transitions: [n_tags, n_tags] with
    transitions[i, j] = score of moving from tag i to tag j.
    """
    n, k = logits.shape
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    score = logits[0].astype(np.float64)
    back = np.zeros((n, k), dtype=np.int32)
    for t in range(1, n):
        cand = score[:, None] + transitions  # [from, to]
        back[t] = cand.argmax(axis=0)
        score = cand.max(axis=0) + logits[t]
    path = np.zeros(n, dtype=np.int32)
    path[-1] = int(score.argmax())
    for t in range(n - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return path


def viterbi_decode_batch(
    logits: np.ndarray, transitions: np.ndarray
) -> np.ndarray:
    """Batched Viterbi over same-length sequences: [B, L, K] -> [B, L].

    Bit-identical to running :func:`viterbi_decode` per sequence — every
    float64 op (add, max, argmax incl. first-max tie-break) is elementwise
    along the batch axis, so per-sequence values and op order are unchanged;
    only the Python-level t-loop is shared across B sequences instead of
    re-entered per sequence (the featurize-UDF vectorization playbook).
    """
    b, n, k = logits.shape
    if n == 0:
        return np.zeros((b, 0), dtype=np.int32)
    score = logits[:, 0].astype(np.float64)
    back = np.zeros((b, n, k), dtype=np.int32)
    for t in range(1, n):
        cand = score[:, :, None] + transitions[None]  # [B, from, to]
        back[:, t] = cand.argmax(axis=1)
        score = cand.max(axis=1) + logits[:, t]
    path = np.zeros((b, n), dtype=np.int32)
    path[:, -1] = score.argmax(axis=1)
    rows = np.arange(b)
    for t in range(n - 2, -1, -1):
        path[:, t] = back[rows, t + 1, path[:, t + 1]]
    return path


def make_viterbi_udf(transitions: Sequence[Sequence[float]]):
    """pandas_udf: per-turn flattened logits (+ n_tags) -> label id array.

    Sequences within an Arrow batch are grouped by length and decoded with
    one batched DP per distinct length, so the per-step Python overhead is
    paid once per (batch, length) instead of once per turn — short-turn
    corpora are loop-overhead-bound otherwise.
    """
    trans = np.asarray(transitions, dtype=np.float64)
    n_tags = trans.shape[0]

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def decode(logits_flat: pd.Series) -> pd.Series:
        vals = logits_flat.tolist()
        out: list = [None] * len(vals)
        by_len: dict[int, list[int]] = {}
        for i, flat in enumerate(vals):
            if flat is None or len(flat) == 0:
                out[i] = []
            else:
                by_len.setdefault(len(flat) // n_tags, []).append(i)
        for seq_len, idxs in by_len.items():
            stack = np.empty((len(idxs), seq_len, n_tags), dtype=np.float64)
            for j, i in enumerate(idxs):
                stack[j] = np.asarray(vals[i], dtype=np.float64).reshape(
                    seq_len, n_tags
                )
            paths = viterbi_decode_batch(stack, trans)
            for j, i in enumerate(idxs):
                out[i] = paths[j].tolist()
        return pd.Series(out)

    return decode


def decode_labels(
    df: DataFrame, logits_col: str, transitions, out_col: str = "label_ids"
) -> DataFrame:
    """Attach decoded label ids; ``logits_col`` holds the flattened
    [n_tokens * n_tags] per-turn logits array."""
    udf = make_viterbi_udf(transitions)
    return df.withColumn(out_col, udf(logits_col))
