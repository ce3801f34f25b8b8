"""Deduplication operators for large-scale text corpora.

All-builtin implementations (JVM-side, codegen'd) of the standard dedup
family: exact hash, n-gram Jaccard, MinHash+LSH banding, SimHash.  Hash
functions are md5-based so results are engine-portable (the DuckDB oracle
computes the identical signatures) and stable across runs/cluster sizes —
no PYTHONHASHSEED, no xxhash seeds.

Scale notes: every operator is a shingle-explode + hash-aggregate — the
shuffle key is the shingle/bucket hash, which is uniformly distributed, so
no skew handling is needed.  Candidate generation (LSH bands / shared
shingles) keeps pair enumeration off the full cross product: pairs exist
only within a bucket, and bucket sizes are bounded by construction at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization for shingling (dedup does not need offsets)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (pure built-ins).

    transform over a 0..len-n index sequence; each shingle is the space-join
    of n consecutive tokens.
    """
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    # docs shorter than n tokens have no shingles (sequence(0, neg) would
    # count DOWN in Spark, so gate explicitly)
    return F.when(
        F.size(toks) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by md5(text): (text_hash, n_copies, doc_ids)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, order_col: str) -> DataFrame:
    """Keep the first (lowest order_col) row per distinct text hash."""
    return (
        df.withColumn("__h", F.md5(F.col(text_col)))
        .groupBy("__h")
        .agg(F.min_by(F.struct(*df.columns), F.col(order_col)).alias("r"))
        .select("r.*")
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) long form — the substrate for jaccard/minhash."""
    return df.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    strategy: str = "auto",
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity — EXACT under
    every strategy; the strategy only changes candidate generation.

    * ``prefix`` (PPJoin-style): J(x,y) >= t implies |x ∩ y| >= ceil(t*|x|),
      so a qualifying pair shares a shingle among each side's first
      |x| - ceil(t*|x|) + 1 shingles in a global rare-shingle-first order —
      collapses self-join volume on stop-shingle corpora, but the prefix is
      barely shorter than the doc below t ~ 0.6, where its extra passes
      (frequency rank + verification join) cost more than they save.
    * ``naive``: full shared-shingle self-join.
    * ``auto``: prefix for threshold >= 0.6, naive below.

    Output: (id_a, id_b, inter, size_a, size_b, jaccard), id_a < id_b.
    """
    if strategy == "auto":
        strategy = "prefix" if threshold >= 0.6 else "naive"
    sh = doc_shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("size"))

    if strategy == "prefix":
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        ranked = sh.join(freq, "shingle")

        from pyspark.sql.window import Window

        w = Window.partitionBy(id_col).orderBy("df", "shingle")
        prefix = (
            ranked.withColumn("pos", F.row_number().over(w))
            .join(sizes, id_col)
            .where(
                F.col("pos")
                <= F.col("size") - F.ceil(F.lit(threshold) * F.col("size")) + 1
            )
            .select(id_col, "shingle")
        )
        a = prefix.alias("a")
        b = prefix.alias("b")
        cand = (
            a.join(b, on="shingle")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .distinct()
        )
        # exact verification: full intersection count for candidates only
        sa_sh = sh.select(F.col(id_col).alias("id_a"), "shingle")
        sb_sh = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            cand.join(sa_sh, "id_a")
            .join(sb_sh, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, on="shingle")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .agg(F.count("*").alias("inter"))
        )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("size", "size_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("size", "size_b")
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, n: int = 3
) -> DataFrame:
    """Long-form MinHash: (id, h_idx, minhash) — minhash over md5 hex strings.

    Lexicographic min over fixed-width hex == numeric min, and md5 is
    identical across engines, so the oracle can reproduce signatures
    exactly.  Empty shingle sets yield no rows (doc shorter than n tokens).
    """
    sh = doc_shingles(df, id_col, text_col, n)
    expanded = sh.select(
        id_col,
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("h_idx"),
    )
    return (
        expanded.groupBy(id_col, "h_idx")
        .agg(
            F.min(
                F.md5(F.concat_ws(":", F.col("shingle"), F.col("h_idx")))
            ).alias("minhash")
        )
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    band_size: int = 4,
) -> DataFrame:
    """MinHash-LSH banding: docs sharing any full band are candidates.

    band key = md5 of the concatenated band signature; pairs enumerate
    within buckets only.  Output: distinct (id_a, id_b), id_a < id_b.
    """
    banded = (
        signatures.withColumn("band", (F.col("h_idx") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|", F.sort_array(F.collect_list(F.concat_ws(":", "h_idx", "minhash")))
                )
            ).alias("bucket")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens, engine-portable bit derivation.

    Bit b of token t = bit (b % 4) of hex digit (b / 4) of md5(t).  Per bit
    position, sum (+1 / -1) over tokens; sign -> bit.  Output: (id, simhash
    bigint).  Ties (sum == 0) resolve to bit 0.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).withColumn("h", F.md5("token"))
    bits = toks.select(
        id_col,
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
    ).withColumn(
        "hexd",
        F.expr("instr('0123456789abcdef', substring(h, CAST(b / 4 AS INT) + 1, 1)) - 1"),
    ).withColumn("bit", F.expr("shiftright(hexd, CAST(b % 4 AS INT)) & 1"))
    sums = bits.groupBy(id_col, "b").agg(
        F.sum(F.col("bit") * 2 - 1).alias("s")
    )
    return sums.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def hamming_near_pairs(
    simhashes: DataFrame, id_col: str, max_hamming: int = 3, n_blocks: int = 4
) -> DataFrame:
    """SimHash near-dup candidates via block permutation (pigeonhole).

    Split 64 bits into n_blocks; pairs within hamming distance < n_blocks
    must share at least one exact block -> bucket join per block, then exact
    hamming filter via bit_count(xor).
    """
    width = 64 // n_blocks
    blocks = simhashes.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
    ).withColumn(
        "blk_val",
        F.expr(f"shiftrightunsigned(simhash, CAST(blk * {width} AS INT)) & {(1 << width) - 1}"),
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(b, on=["blk", "blk_val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")
