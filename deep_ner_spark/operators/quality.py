"""Char-overlap entity-matching quality metric (SURVEY J3 + A3).

Semantics of deep_ner/quality.py:7-263: per (sample, class) the gold and
predicted span lists are matched 1:1 — identity pairing when counts are
equal, else a bounded combinatorial search (first 10 combinations in
lexicographic order) with a greedy max-similarity fallback — and each
matched pair contributes char-level tp/fp/fn; unmatched spans contribute
their full length as fn (gold) / fp (pred).  Per-class and total P/R/F1
follow.

Spark shape: the all-pairs work happens inside ``applyInPandas`` over a
cogroup on (sample_id, ne_class) — groups are tiny (entities of one text of
one class), so the quadratic part is bounded while the number of groups
scales out.  The final rollup is a hash aggregation.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- pure matching semantics (shared with tests) -----------------------------


def span_similarity(gold: Tuple[int, int], pred: Tuple[int, int]):
    """(similarity, tp, fp, fn) for one gold/pred span pair.

    Equivalent closed form of quality.py:7-65's case analysis:
    tp = char overlap; fp = pred chars outside overlap; fn = gold chars
    outside overlap; similarity = tp / (tp+fp+fn), 0 when disjoint.
    """
    overlap = min(gold[1], pred[1]) - max(gold[0], pred[0])
    if overlap <= 0:
        return 0.0, 0, pred[1] - pred[0], gold[1] - gold[0]
    tp = overlap
    fp = (pred[1] - pred[0]) - overlap
    fn = (gold[1] - gold[0]) - overlap
    return tp / float(tp + fp + fn), tp, fp, fn


def _lex_combinations(n: int, k: int) -> Iterator[List[int]]:
    """k-subsets of range(n) in lexicographic order (quality.py:68-81)."""
    cur = list(range(k))
    yield cur
    while True:
        i = k - 1
        while i >= 0 and cur[i] + k - i + 1 > n:
            i -= 1
        if i < 0:
            return
        cur[i] += 1
        for j in range(i + 1, k):
            cur[j] = cur[j - 1] + 1
        yield cur


N_MAX_COMB = 10  # quality.py:94


def match_spans(
    gold: Sequence[Tuple[int, int]], pred: Sequence[Tuple[int, int]]
) -> Tuple[int, int, int]:
    """Total (tp, fp, fn) chars for one (sample, class) group.

    Inputs must be sorted (the caller sorts, as quality.py:194 does).
    """
    gold = sorted(gold)
    pred = sorted(pred)
    sim: Dict[Tuple[int, int], Tuple[float, int, int, int]] = {}
    for i, g in enumerate(gold):
        for j, p in enumerate(pred):
            s = span_similarity(g, p)
            if s[1] > 0:
                sim[(i, j)] = s

    n_g, n_p = len(gold), len(pred)
    best_sum, best_pairs = 0.0, []

    def try_pairs(pairs):
        nonlocal best_sum, best_pairs
        pairs = [p for p in pairs if p in sim]
        total = sum(sim[p][0] for p in pairs)
        if total > best_sum:
            best_sum, best_pairs = total, list(pairs)

    if n_g == n_p:
        best_pairs = [(i, i) for i in range(n_g) if (i, i) in sim]
        best_sum = sum(sim[p][0] for p in best_pairs)
    else:
        small, large = (n_g, n_p) if n_g < n_p else (n_p, n_g)
        flip = n_g >= n_p
        for count, combo in enumerate(_lex_combinations(large, small), start=1):
            if flip:
                try_pairs([(combo[j], j) for j in range(small)])
            else:
                try_pairs([(i, combo[i]) for i in range(small)])
            if count >= N_MAX_COMB:
                break
        # greedy fallback: for each small-side item take the best unused
        greedy, used = [], set()
        for s_idx in range(small):
            best_j, best_s = None, -1.0
            for l_idx in range(large):
                if l_idx in used:
                    continue
                key = (l_idx, s_idx) if flip else (s_idx, l_idx)
                if key in sim and sim[key][0] > best_s:
                    best_s, best_j = sim[key][0], l_idx
            if best_j is None:
                break
            used.add(best_j)
            greedy.append((best_j, s_idx) if flip else (s_idx, best_j))
        try_pairs(greedy)

    tp = sum(sim[p][1] for p in best_pairs)
    fp = sum(sim[p][2] for p in best_pairs)
    fn = sum(sim[p][3] for p in best_pairs)
    matched_g = {p[0] for p in best_pairs}
    matched_p = {p[1] for p in best_pairs}
    fn += sum(e - s for i, (s, e) in enumerate(gold) if i not in matched_g)
    fp += sum(e - s for j, (s, e) in enumerate(pred) if j not in matched_p)
    return tp, fp, fn


def prf(tp: int, fp: int, fn: int) -> Tuple[float, float, float]:
    """(f1, precision, recall) with the reference's tp>0 guards."""
    precision = tp / float(tp + fp) if tp > 0 else 0.0
    recall = tp / float(tp + fn) if tp > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return f1, precision, recall


# --- Spark operators ----------------------------------------------------------

def entity_match_metrics(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """(sample_id, ne_class, tp, fp, fn) per group.

    Inputs: long-form (sample_id, ne_class, start, end).  Each side is
    list-aggregated JVM-side (collect_list + sort_array — one hash agg per
    side), the two list frames full-outer-join on the group key (the
    equi-part of SURVEY J3), and ONE scalar Arrow pandas UDF runs
    :func:`match_spans` over thousands of groups per batch.  All-pairs work
    stays inside the tiny group either way; vs the previous cogrouped
    applyInPandas this removes the per-group Python call + per-group
    DataFrame construction (r7 profile: 1.38s -> batched, same shuffle
    count) while keeping the matching semantics byte-identical.
    """
    from pyspark.sql.functions import pandas_udf

    def side(df: DataFrame, alias: str) -> DataFrame:
        return df.groupBy("sample_id", "ne_class").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("start"), F.col("end")))
            ).alias(alias)
        )

    joined = side(gold, "__g").join(
        side(pred, "__p"), ["sample_id", "ne_class"], "full_outer"
    )

    @pandas_udf("struct<tp:long,fp:long,fn:long>")
    def match_batch(gcol: pd.Series, pcol: pd.Series) -> pd.DataFrame:
        out = {"tp": [], "fp": [], "fn": []}
        for gs, ps in zip(gcol, pcol):
            tp, fp, fn = match_spans(
                [(s["start"], s["end"]) for s in gs] if gs is not None else [],
                [(s["start"], s["end"]) for s in ps] if ps is not None else [],
            )
            out["tp"].append(tp)
            out["fp"].append(fp)
            out["fn"].append(fn)
        return pd.DataFrame(out)

    return joined.select(
        F.col("sample_id").cast("long"),
        "ne_class",
        match_batch("__g", "__p").alias("__m"),
    ).select("sample_id", "ne_class", "__m.tp", "__m.fp", "__m.fn")


def prediction_quality(
    gold: DataFrame, pred: DataFrame, classes_list: Sequence[str]
) -> DataFrame:
    """Per-class rows + total row: (ne_class, tp, fp, fn, f1, precision,
    recall); ne_class is NULL on the total row (rollup shape of SURVEY A3).

    Classes in classes_list with no entities anywhere still get a zero row,
    like quality.py:209-263.
    """
    per_group = entity_match_metrics(gold, pred)
    per_class = per_group.groupBy("ne_class").agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    spark = gold.sparkSession
    classes = spark.createDataFrame(
        [(c,) for c in classes_list], T.StructType([T.StructField("ne_class", T.StringType())])
    )
    per_class = (
        classes.join(per_class, "ne_class", "left")
        .fillna(0, subset=["tp", "fp", "fn"])
        .where(F.col("ne_class").isin(list(classes_list)))
    )
    total = per_class.groupBy().agg(
        F.lit(None).cast("string").alias("ne_class"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    )
    both = per_class.unionByName(total)
    precision = F.when(F.col("tp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    recall = F.when(F.col("tp") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    both = both.withColumn("precision", precision).withColumn("recall", recall)
    return both.withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(0.0),
    )
