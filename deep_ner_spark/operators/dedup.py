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

from deep_ner_spark.compat import CONNECT_ERRS


def _local_ckpt(frame: DataFrame) -> DataFrame:
    """localCheckpoint if the session supports it, else the frame as-is
    (self-join sides then recompute — slower, never wrong).  Only the
    Connect unsupported-surface exceptions are downgraded; a genuine
    checkpoint failure (disk full, dead executors) still raises."""
    try:
        return frame.localCheckpoint(eager=False)
    except CONNECT_ERRS:
        return frame


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization for shingling (dedup does not need offsets)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a PRE-PROJECTED token array.

    ``toks`` must be a bound attribute (project the token array into its
    own column in a prior select): each shingle then reads it via O(1)
    ``element_at``.  This matters twice over — an INLINE token expression
    referenced n times per shingle is re-evaluated n times per element by
    the interpreted HOF chain, and the older ``slice(toks, i+1, n)`` form
    allocated a 3-array per shingle.  Measured on the 50k-doc sf:
    pre-projected element_at 0.35s vs slice+concat_ws 1.64s vs inline
    element_at 3.1s for the identical output.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - n + 1)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
    )
    # docs shorter than n tokens have no shingles (sequence(1, neg) would
    # count DOWN in Spark, so gate explicitly)
    return F.when(
        F.size(toks) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (pure built-ins).

    Convenience form for one-off use on a text expression; hot paths
    should project ``tokens_col(text)`` first and call
    :func:`shingles_of_tokens` (see its docstring for why).
    """
    return shingles_of_tokens(tokens_col(text), n)


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
    """(id, size, shingle) long form — the substrate for jaccard/minhash;
    ``size`` is the doc's distinct-shingle count (0-shingle docs drop out).

    Physical notes (each measured ~4-8x on the shingle stage):
    * the shingle array must be computed exactly ONCE: a plain
      ``explode`` triggers InferFiltersFromGenerate, whose ``size(arr) > 0
      AND isnotnull(arr)`` filter is pushed below the projection and
      re-evaluates the (interpreted, non-codegen) higher-order-function
      chain 3x per row — ``explode_outer`` infers no filter, and the cheap
      null check on the OUTPUT attribute replaces it;
    * ``size`` is projected in a SECOND select so it references the array
      attribute — CollapseProject keeps non-cheap aliases used twice, so
      the array is not inlined into the size expression;
    * a small scan (fewer splits than cores) is repartitioned on the slim
      (id, text) columns first so the expensive projection parallelizes; a
      many-split corpus-scale input skips the branch.
    """
    docs = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    try:  # .rdd/sparkContext are classic-session-only; skip under Connect
        sc = df.sparkSession.sparkContext
        if docs.rdd.getNumPartitions() < sc.defaultParallelism:
            docs = docs.repartition(sc.defaultParallelism)
    except CONNECT_ERRS:
        pass
    base = docs.select(
        F.col(id_col), tokens_col(F.col("__text")).alias("__toks")
    ).select(
        F.col(id_col), shingles_of_tokens(F.col("__toks"), n).alias("__sh")
    ).select(id_col, "__sh", F.size("__sh").alias("size"))
    return base.select(
        id_col, "size", F.explode_outer("__sh").alias("shingle")
    ).where(F.col("shingle").isNotNull())


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    strategy: str = "auto",
    materialize: bool = True,
    verify_broadcast_max_docs: int = 500_000,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity — EXACT under
    every strategy; the strategy only changes candidate generation.

    * ``prefix`` (PPJoin-style, the default at every threshold): J(x,y) >= t
      implies |x ∩ y| >= ceil(t*|x|), so a qualifying pair shares a shingle
      among each side's first |x| - ceil(t*|x|) + 1 shingles in a global
      rare-shingle-first order.  Candidate generation is ASYMMETRIC (the
      PPJoin indexing/probing split, Xiao et al. WWW'08): per pair the
      lesser side by (size, id) only needs its first
      |x| - ceil(2t/(1+t)*|x|) + 1 shingles ("index prefix") — if every
      common shingle sat deeper, overlap < 2t/(1+t)*|x| <= the required
      t/(1+t)*(|x|+|y|) since |y| >= |x| — which cuts the candidate join
      ~35% over symmetric prefixes.  Candidates are further pruned by
      PPJoin's length filter (min(|x|,|y|) >= t*max(|x|,|y|)) and
      positional filter (for the matched prefix shingle at positions
      (pa, pb), overlap <= 1 + min(|x|-pa, |y|-pb), which must reach the
      Jaccard-equivalent overlap t/(1+t)*(|x|+|y|); the first common shingle
      of a qualifying pair always survives all three filters, so recall
      stays exact).  On a web-scale corpus a stop-shingle's join group no
      longer scales with the number of documents containing it, only with
      the number whose PREFIX contains it.
    * ``naive``: full shared-shingle self-join.  O(corpus^2) on hot
      shingles — kept only as a cross-check/baseline; never chosen by auto.

    Output: (id_a, id_b, inter, size_a, size_b, jaccard), id_a < id_b.

    ``materialize`` (default on): the prefix frame feeds BOTH sides of the
    candidate self-join, and Spark duplicates the whole upstream plan
    (scan -> shingle -> freq join -> window) per side — ``localCheckpoint``
    computes each intermediate once (measured ~2x end-to-end).  Unlike
    ``.cache()`` the blocks are freed by the ContextCleaner when the frame
    is garbage-collected, so repeated calls don't accumulate storage; the
    trade-off is no lineage recompute on executor loss (re-run the query),
    the standard choice for multi-pass set-similarity joins.

    Verification physics (r8, measured at a 50k-doc sf with a SATURATED
    shingle space — 28k distinct shingles, mean df 94, 18.5M candidates
    for 2.5k true pairs): shipping per-candidate STRING shingle arrays
    through two sort-merge joins cost 52.9s — the arrays dominated every
    exchange and ``array_intersect`` re-hashed ~100 strings per pair.  Two
    changes, exact by construction, took it to 7.8s:

    * shingles are dictionary-encoded to dense ints (``row_number`` over
      the distinct-shingle frame — deterministic, so safe to recompute
      under ``materialize=False``; the bijection makes int-array
      intersection counts equal string-set intersection counts).  At
      corpus scale the single-partition id window would not fly — swap in
      ``monotonically_increasing_id`` over the *materialized* dictionary
      (injectivity is all that is needed) when the dictionary outgrows one
      task.
    * the per-doc array side is BROADCAST when it has at most
      ``verify_broadcast_max_docs`` rows (~0.5 GB at web-doc shingle
      counts): candidates then flow through two broadcast hash joins with
      no exchange at all.  Catalyst's own size estimate for a
      collect_list aggregate is far above threshold, so the hint is
      explicit; past the cap the shuffle join keeps working at any scale.
    """
    if strategy == "auto":
        strategy = "prefix"

    def _mat(frame: DataFrame) -> DataFrame:
        return _local_ckpt(frame) if materialize else frame

    # doc_shingles carries the per-doc size narrowly (no groupBy pass) and
    # evaluates the shingle HOF exactly once per row
    sh = _mat(doc_shingles(df, id_col, text_col, n))

    if strategy == "prefix":
        from pyspark.sql.window import Window

        freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        # dense-int dictionary: sid monotone in shingle, so ordering by
        # (df, sid) equals the canonical (df, shingle) rare-first order
        sids = _mat(
            freq.withColumn("sid", F.row_number().over(Window.orderBy("shingle")))
        )
        sh_i = sh.join(sids, "shingle").select(id_col, "size", "df", "sid")

        w = Window.partitionBy(id_col).orderBy("df", "sid")
        probe_len = (
            F.col("size") - F.ceil(F.lit(threshold) * F.col("size")) + 1
        )
        index_len = (
            F.col("size")
            - F.ceil(F.lit(2.0 * threshold / (1.0 + threshold)) * F.col("size"))
            + 1
        )
        prefix = _mat(
            sh_i.withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= probe_len)
            .select(
                id_col,
                "sid",
                "pos",
                "size",
                (F.col("pos") <= index_len).alias("in_index"),
            )
        )
        a = prefix.alias("a")  # index side: lesser (size, id)
        b = prefix.alias("b")  # probe side
        sa_c, sb_c = F.col("a.size"), F.col("b.size")
        aid, bid = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
        overlap_needed = F.lit(threshold / (1.0 + threshold)) * (sa_c + sb_c)
        cand = (
            a.join(b, on="sid")
            # asymmetric prefix: the (size, id)-lesser side must match
            # within its shorter index prefix
            .where(F.col("a.in_index"))
            .where((sa_c < sb_c) | ((sa_c == sb_c) & (aid < bid)))
            # length filter: min size must reach t * max size
            .where(F.least(sa_c, sb_c) >= F.lit(threshold) * F.greatest(sa_c, sb_c))
            # positional filter: remaining-suffix overlap bound
            .where(
                F.least(sa_c - F.col("a.pos"), sb_c - F.col("b.pos")) + 1
                >= overlap_needed
            )
            .select(
                F.least(aid, bid).alias("id_a"), F.greatest(aid, bid).alias("id_b")
            )
            .distinct()
        )
        # the candidate frame feeds BOTH the id semi-join below and the
        # verify joins; without materialization the whole candidate
        # self-join runs twice (measured ~3.8s/pass at the 50k-doc sf)
        cand = _mat(cand)
        # exact verification: JVM array_intersect on the two shingle-id
        # arrays.  The arrays are REBUILT from the already-materialized
        # long form (semi-join on candidate ids, then collect_list) — the
        # shingle HOF chain is never re-evaluated and the corpus text is
        # never re-scanned for this step (shingle sets are distinct by
        # construction, so collect_list reconstructs the set and order is
        # irrelevant to array_intersect).
        cand_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .union(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        cand_arrays = _mat(
            sh_i.join(cand_ids, id_col)
            .groupBy(id_col, "size")
            .agg(F.collect_list("sid").alias("__sh"))
        )
        # broadcast the (materialized, hence cheaply countable) array side
        # when small: candidates then never enter an exchange
        bcast = (
            materialize
            and cand_arrays.count() <= verify_broadcast_max_docs
        )
        wrap = F.broadcast if bcast else (lambda d: d)
        arr_a = cand_arrays.select(
            F.col(id_col).alias("id_a"),
            F.col("__sh").alias("__sh_a"),
            F.col("size").alias("size_a"),
        )
        arr_b = cand_arrays.select(
            F.col(id_col).alias("id_b"),
            F.col("__sh").alias("__sh_b"),
            F.col("size").alias("size_b"),
        )
        # explode(array(x)) is a Generate BARRIER: the downstream jaccard
        # filter cannot be pushed below a generator's output, so the
        # intersection is evaluated exactly ONCE per pair.  Without it,
        # PushDownPredicate inlines the filter into the broadcast join's
        # condition and the plan carries THREE array_intersect copies
        # (2x in the join condition + 1x in the project) — measured
        # 7.4s -> 3.9s on 18.5M candidates at the 50k-doc sf.
        out = (
            cand.join(wrap(arr_a), "id_a")
            .join(wrap(arr_b), "id_b")
            .select(
                "id_a",
                "id_b",
                "size_a",
                "size_b",
                F.explode(
                    F.array(
                        F.size(F.array_intersect("__sh_a", "__sh_b")).cast("long")
                    )
                ).alias("inter"),
            )
        )
    else:
        a = sh.select(
            F.col(id_col).alias("id_a"), F.col("size").alias("size_a"), "shingle"
        )
        b = sh.select(
            F.col(id_col).alias("id_b"), F.col("size").alias("size_b"), "shingle"
        )
        out = (
            a.join(b, on="shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "size_a", "size_b")
            .agg(F.count("*").alias("inter"))
        )
    out = out.withColumn(
        "jaccard",
        F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
    ).where(F.col("jaccard") >= threshold)
    return out.select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    materialize: bool = True,
) -> DataFrame:
    """Connected components over an undirected pair list: (id, cluster_id),
    where cluster_id is the component's minimum node id.

    The input ``pairs`` is any near-dup pair frame (jaccard_pairs,
    lsh_candidate_pairs, hamming_near_pairs, embedding_near_dup_pairs);
    ``nodes`` supplies the full id universe so isolated documents come back
    as their own singleton cluster.

    Algorithm: hash-min label propagation with pointer jumping.  Each round
    does (1) neighbor-min — every node takes the min of its own label and
    its neighbors' labels (one join keyed on the uniformly-distributed node
    id + one map-side-combined min agg), then (2) pointer jumping —
    ``lab <- lab(lab)``, one self-join, which halves every node's distance
    to its component minimum.  Rounds are therefore O(log diameter) (the
    MapReduce CC bound of Kiveris et al., "Connected Components in
    MapReduce and Beyond", SOCC'14); near-dup graphs are short-diameter so
    3-5 rounds is typical.  No step enumerates a component's cross
    product, and every shuffle is keyed on node ids or label values —
    skewed (giant) components cost nothing extra because a component is
    never collected onto one task.

    Convergence detection is the monotone label-sum invariant: labels only
    ever decrease, so ``sum(lab)`` strictly decreases until fixpoint — one
    tiny aggregate per round (decimal(38,0), overflow-safe at any id
    range), no change-count join.  Each round ``localCheckpoint``s the new
    label frame (GC-freed, see jaccard_pairs) so lineage doesn't grow
    exponentially across iterations — the standard iterative-algorithm
    pattern on Spark.
    """
    # the label-sum convergence scalar below needs integral node ids: with a
    # string id column (ANSI off) the decimal cast yields NULL per row, the
    # sum is NULL every round, and None == None would break the loop after
    # one iteration returning silently unconverged clusters — fail fast
    # instead (hash string ids to long, e.g. xxhash64, before calling)
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType)
    id_type = {f.name: f.dataType for f in nodes.schema.fields}.get(id_col)
    if not isinstance(id_type, integral):
        raise TypeError(
            f"connected_components needs an integral id column; {id_col!r} "
            f"is {id_type} — hash it to long (e.g. F.xxhash64) first"
        )
    # the pair columns feed the same label domain: a string-typed edge side
    # with integral nodes would equally NULL the label-sum convergence
    # scalar after the first neighbor-min join, silently stopping after one
    # iteration — guard both sides, not just the node frame
    pair_types = {f.name: f.dataType for f in pairs.schema.fields}
    for side in (id_a, id_b):
        if not isinstance(pair_types.get(side), integral):
            raise TypeError(
                f"connected_components needs integral pair ids; {side!r} "
                f"is {pair_types.get(side)} — hash it to long "
                f"(e.g. F.xxhash64) first"
            )
    # symmetrize with ONE reference to `pairs` (explode doubles the rows
    # in-place) instead of a two-branch union: the input pair frame is
    # usually a lazy verify subplan (jaccard_pairs' candidate x array
    # joins), and a union would recompute it once per branch when the
    # edge checkpoint below materializes — measured at a 50k-doc corpus:
    # warm dup_clusters 28.9s via union vs ~21s with a single reference
    # (the jaccard itself is 13.3s, CC on materialized pairs 4.4s).
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")
    if materialize:
        edges = _local_ckpt(edges)
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("lab")
    )
    prev_sum = None
    for _ in range(max_iter):
        # (1) neighbor-min.  (Round-7 note: a union+groupBy fold of this
        # join+coalesce was tried and is SLOWER — the left join lets AQE
        # broadcast the small nmin side and keep the label frame narrow,
        # while a union forces both branches through a full exchange.  The
        # convergence scalar below is already fused into this round's
        # single action via the lazy localCheckpoint; the residual
        # per-round cost is AQE stage-materialization job latency,
        # measured ~6 jobs/round at fixture scale.)
        lab_of = labels.select(
            F.col("id").alias("dst"), F.col("lab").alias("nlab")
        )
        nmin = (
            edges.join(lab_of, "dst")
            .groupBy("src")
            .agg(F.min("nlab").alias("nlab"))
            .withColumnRenamed("src", "id")
        )
        merged = labels.join(nmin, "id", "left").select(
            "id",
            F.least(F.col("lab"), F.coalesce("nlab", F.col("lab"))).alias("lab"),
        )
        # (2) pointer jumping: lab <- lab(lab) (labels are always node ids,
        # so the lookup always hits; left join is belt-and-braces)
        parent = merged.select(
            F.col("id").alias("lab"), F.col("lab").alias("plab")
        )
        jumped = merged.join(parent, "lab", "left").select(
            "id",
            F.least(F.col("lab"), F.coalesce("plab", F.col("lab"))).alias("lab"),
        )
        labels = _local_ckpt(jumped) if materialize else jumped
        cur_sum = labels.agg(
            F.sum(F.col("lab").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("id").alias(id_col), F.col("lab").alias("cluster_id"))


def dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Duplicate clusters: n-gram-Jaccard near-dup pairs -> connected
    components -> per-cluster size + canonical flag.

    The step after pair generation in a real dedup pipeline: transitive
    near-dups (A~B, B~C but not A~C) must land in ONE cluster before a
    keep-one policy can run, else the pipeline keeps both ends of a chain.
    Output: (id_col, cluster_id, cluster_size, is_canonical) for EVERY
    input document — singletons are their own cluster of size 1; the
    canonical representative is the minimum id (deterministic, engine-
    portable; callers wanting keep-best-quality join quality_score and
    min_by themselves).

    Scale: pair generation is exact PPJoin (see jaccard_pairs), clustering
    is O(log diameter) hash-min rounds (see connected_components), and the
    size join back is keyed on cluster_id — a giant cluster makes that
    join key hot, which AQE's skew-join split handles; nothing collects a
    cluster onto one task or the driver.
    """
    pairs = jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    cc = connected_components(pairs, df.select(id_col), id_col)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, n: int = 3
) -> DataFrame:
    """Long-form MinHash: (id, h_idx, minhash) — minhash over md5 hex strings.

    Lexicographic min over fixed-width hex == numeric min, and md5 is
    identical across engines, so the oracle can reproduce signatures
    exactly.  Empty shingle sets yield no rows (doc shorter than n tokens).

    Physical shape: ONE wide aggregation with ``n_hashes`` min columns
    (map-side combined) instead of an n_hashes-way row explode — the shuffle
    carries one row per doc, not one per (shingle, hash slot); the long-form
    (id, h_idx, minhash) output is re-derived by an explode AFTER the agg.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    wide = sh.groupBy(id_col).agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(i))))
            ).alias(f"__h{i}")
            for i in range(n_hashes)
        ]
    )
    slots = F.array(
        *[
            F.struct(
                F.lit(i).alias("h_idx"), F.col(f"__h{i}").alias("minhash")
            )
            for i in range(n_hashes)
        ]
    )
    return wide.select(id_col, F.explode(slots).alias("__s")).select(
        id_col, F.col("__s.h_idx").alias("h_idx"), F.col("__s.minhash").alias("minhash")
    )


def banded_buckets(
    signatures: DataFrame, id_col: str, band_size: int = 4
) -> DataFrame:
    """(id, band, bucket) — band key = md5 of the concatenated band
    signature.  Shared substrate for self-join candidate search
    (:func:`lsh_candidate_pairs`) and incremental new-vs-corpus dedup
    (:func:`lsh_dedup_against_corpus`)."""
    return (
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


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    band_size: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """MinHash-LSH banding: docs sharing any full band are candidates.

    band key = md5 of the concatenated band signature; pairs enumerate
    within buckets only.  Output: distinct (id_a, id_b), id_a < id_b.
    ``materialize`` computes the banded frame once instead of once per
    self-join side (localCheckpoint; GC-freed, see jaccard_pairs).
    """
    banded = banded_buckets(signatures, id_col, band_size)
    if materialize:
        banded = _local_ckpt(banded)
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
    # explode_outer + null filter: a plain explode would infer a size>0
    # filter below the projection and re-evaluate the token split 3x
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens_col(F.col(text_col))).alias("token")
    ).where(F.col("token").isNotNull()).withColumn("h", F.md5("token"))
    # ONE wide aggregation with 64 (+1/-1) sum columns instead of a 64-way
    # row explode: the shuffle carries one row per doc, map-side combined,
    # and no 64x (id, h, b) row materialization happens at all
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.expr(
                    f"(shiftright(instr('0123456789abcdef', substring(h, {b // 4 + 1}, 1)) - 1, {b % 4}) & 1) * 2 - 1"
                )
            ).alias(f"__s{b}")
            for b in range(64)
        ]
    )
    packed = None
    for b in range(64):
        term = F.when(
            F.col(f"__s{b}") > 0, F.expr(f"shiftleft(CAST(1 AS BIGINT), {b})")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return sums.select(id_col, packed.alias("simhash"))


def hamming_near_pairs(
    simhashes: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """SimHash near-dup candidates via block permutation (pigeonhole).

    Split 64 bits into n_blocks; pairs within hamming distance < n_blocks
    must share at least one exact block -> bucket join per block, then exact
    hamming filter via bit_count(xor).  ``materialize`` computes the
    upstream simhash aggregation once instead of once per self-join side
    (localCheckpoint; GC-freed, see jaccard_pairs).
    """
    if materialize:
        simhashes = _local_ckpt(simhashes)
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


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    broadcast_fingerprints: bool = False,
) -> DataFrame:
    """Incremental EXACT dedup: rows of ``new_df`` whose md5(text) does not
    already appear in ``corpus_df`` (the training-pipeline "new shard vs
    existing corpus" case — no reference analog; same fingerprint as
    :func:`exact_dedup`).

    Scale shape: the corpus collapses to DISTINCT 32-hex fingerprints
    before the left-anti join, so the shuffle moves one hash per corpus
    doc, never document bodies; with ``broadcast_fingerprints`` a small
    fingerprint set (e.g. a single day's corpus delta) broadcasts and the
    new side is scanned shuffle-free.  New-vs-new duplicates are NOT
    collapsed here — that is :func:`exact_dedup`'s job; this operator's
    contract is exactly "already known to the corpus".
    """
    fp = corpus_df.select(F.md5(F.col(text_col)).alias("__fp")).distinct()
    if broadcast_fingerprints:
        fp = F.broadcast(fp)
    return (
        new_df.withColumn("__fp", F.md5(F.col(text_col)))
        .join(fp, "__fp", "left_anti")
        .drop("__fp")
    )


def lsh_dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Incremental NEAR-dup dedup: drop a new doc when it shares an LSH
    band bucket with any corpus doc AND the verified distinct-shingle
    Jaccard against that doc is >= ``threshold``.  Returns the surviving
    rows of ``new_df`` unchanged.

    Scale shape: both sides reduce to (id, band, bucket) keys before the
    equi-join, so candidate generation touches only bucket-key collisions
    (never new x corpus); Jaccard verification re-joins shingles for
    candidate ids only.  Near-dups *within* ``new_df`` are untouched —
    run :func:`jaccard_pairs` / :func:`dup_clusters` for that.
    """
    sig_new = minhash_signatures(new_df, id_col, text_col, n_hashes, n)
    sig_cor = minhash_signatures(corpus_df, id_col, text_col, n_hashes, n)
    b_new = banded_buckets(sig_new, id_col, band_size).withColumnRenamed(
        id_col, "__id_new"
    )
    b_cor = banded_buckets(sig_cor, id_col, band_size).withColumnRenamed(
        id_col, "__id_cor"
    )
    cand = (
        b_new.join(b_cor, on=["band", "bucket"])
        .select("__id_new", "__id_cor")
        .distinct()
    )
    if materialize:
        cand = _local_ckpt(cand)

    # Verification joins the candidate pairs back to each side's distinct
    # shingle SET (one shingles_col array per candidate doc, after a
    # semi-join prune) and intersects JVM-side.  Candidates are a tiny,
    # already-enumerated fraction of new x corpus, so a per-pair
    # array_intersect beats re-exploding to long form: two id-keyed joins
    # + a narrow projection replace an explode, a shingle-key exchange and
    # a hash agg per side (round-7 profile: the long-form verify was ~1.1s
    # of the 1.86s sf0.01 floor).  The long form remains the right shape
    # for ALL-PAIRS discovery (jaccard_pairs' PPJoin) — here the pair list
    # is already known.
    sets_new = new_df.join(
        cand.select(F.col("__id_new").alias(id_col)).distinct(), id_col, "semi"
    ).select(
        F.col(id_col).alias("__id_new"),
        tokens_col(F.col(text_col)).alias("__tk"),
    ).select(
        "__id_new", shingles_of_tokens(F.col("__tk"), n).alias("__sh_new")
    )
    sets_cor = corpus_df.join(
        cand.select(F.col("__id_cor").alias(id_col)).distinct(), id_col, "semi"
    ).select(
        F.col(id_col).alias("__id_cor"),
        tokens_col(F.col(text_col)).alias("__tk"),
    ).select(
        "__id_cor", shingles_of_tokens(F.col("__tk"), n).alias("__sh_cor")
    )
    inter = (
        cand.join(sets_new, "__id_new")
        .join(sets_cor, "__id_cor")
        .select(
            "__id_new",
            # explode(array(x)) Generate barrier: stops the threshold
            # filter below from being pushed into the join condition,
            # which would re-evaluate the intersection per copy (see
            # jaccard_pairs)
            F.explode(
                F.array(F.size(F.array_intersect("__sh_new", "__sh_cor")))
            ).alias("__inter"),
            F.size("__sh_new").alias("__sz_new"),
            F.size("__sh_cor").alias("__sz_cor"),
        )
    )
    dropped = (
        inter.where(
            F.col("__inter")
            / (F.col("__sz_new") + F.col("__sz_cor") - F.col("__inter"))
            >= F.lit(threshold)
        )
        .select(F.col("__id_new").alias(id_col))
        .distinct()
    )
    return new_df.join(dropped, id_col, "left_anti")


def eval_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per-train-doc n-gram overlap with an
    eval/benchmark set — (id, n_shared, n_shingles, contam_frac,
    min_eval_id).  Only contaminated docs are returned (inner semantics);
    anti-join the ids against the corpus to drop them.

    The standard pre-training hygiene step (GPT-3 used 13-gram overlap):
    any training document sharing a long word n-gram with a held-out
    benchmark leaks the benchmark.  ``contam_frac`` = shared / total
    distinct shingles of the train doc grades the severity;
    ``min_eval_id`` names one offending eval doc for auditing.

    Scale: eval sets are tiny next to the corpus, so the shingled eval
    side broadcasts (``broadcast_eval``) and the corpus-side shingle
    explode streams map-side — no corpus shuffle at all on the broadcast
    path.  With a large eval set, the fallback is a shuffle join keyed by
    the shingle hash (uniform by construction).
    """
    tr = doc_shingles(train_df, id_col, text_col, n)
    ev = doc_shingles(eval_df, id_col, text_col, n).select(
        F.col(id_col).alias("__eval_id"), "shingle"
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared"),
            # size is constant per doc (distinct-shingle count); max picks it
            F.max("size").cast("long").alias("n_shingles"),
            F.min("__eval_id").alias("min_eval_id"),
        )
        .select(
            id_col,
            "n_shared",
            "n_shingles",
            (F.col("n_shared") / F.col("n_shingles")).alias("contam_frac"),
            "min_eval_id",
        )
    )
