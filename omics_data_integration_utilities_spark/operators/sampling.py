"""Deterministic sampling & splitting for training-data pipelines
(north-star surface; the reference has no sampling operators).

Everything here is HASH-based, not RNG-based: a row's assignment depends
only on (salt, id), so splits are reproducible across runs, engines,
partitionings and cluster sizes — the property training pipelines need
for leak-free train/val/test separation.  ``df.sample()`` by contrast is
seed-and-partitioning dependent.  All expressions are JVM-side md5
arithmetic (the engine-portable recipe from ``constants.py``), so the
DuckDB oracle reproduces assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt || id) — deterministic,
    engine-portable (DuckDB: ('0x'||substr(md5(salt||id),1,15))::BIGINT)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row to a named split by hash threshold.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the last split).  Default 90/5/5
    train/val/test.  Returns the input plus a ``split`` column.
    Changing ``salt`` re-draws the assignment; keeping it pins every id
    to its split forever — ids added later don't reshuffle old ones.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    bucket = _hash_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket
    clears the stratum's threshold.  ``fractions`` maps stratum value →
    keep fraction; unlisted strata use ``default_fraction``.  The same
    (salt, id) always decides the same way — re-running the pipeline or
    adding strata never changes previous picks.
    """
    bucket = _hash_bucket(F.col(id_col), salt)
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(stratum_col) == value
        t = F.lit(int(round(frac * _BUCKETS)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(round(default_fraction * _BUCKETS)))
        if thresh is None
        else thresh.otherwise(int(round(default_fraction * _BUCKETS)))
    )
    return df.where(bucket < thresh)


def mixture_quotas(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder (Hamilton) apportionment of ``total`` draws over
    domain weights — the standard exact-rounding rule for turning mixture
    proportions into integer per-domain document counts.

    Pure arithmetic, shared verbatim by :func:`mixture_sample` and its
    SQL oracle: quotas sum to exactly ``total`` and ties in the
    fractional remainders break deterministically (larger remainder
    first, then domain name), so both engines pin identical quotas.
    """
    if total < 0:
        raise ValueError("total must be >= 0")
    wsum = float(sum(weights.values()))
    if wsum <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and sum > 0")
    exact = {d: total * w / wsum for d, w in weights.items()}
    base = {d: int(exact[d]) for d in weights}
    leftover = total - sum(base.values())
    by_rem = sorted(weights, key=lambda d: (-(exact[d] - base[d]), d))
    for d in by_rem[:leftover]:
        base[d] += 1
    return base


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    total: int,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic domain-mixture sampling — the data-mixing stage of a
    training pipeline: compose a corpus of ``total`` documents from
    weighted domains (sources, languages, quality tiers).

    Per-domain quotas come from :func:`mixture_quotas`; each domain
    contributes its ``min(quota, available)`` lowest-priority documents,
    where priority is ``md5(salt || id)`` — so the selection is a pure
    function of (salt, id, domain weights): reproducible across runs,
    engines and partitionings, and STABLE under corpus growth (a new
    document displaces at most one old pick in its own domain, never
    reshuffles other domains — the property RNG-based ``df.sample``
    cannot give).  Domains absent from ``weights`` contribute nothing;
    a domain with fewer rows than its quota contributes everything it
    has and the shortfall is NOT redistributed (rebalance weights at
    the caller if hitting caps matters — silent redistribution would
    make quotas data-dependent and break the engine-portable oracle).

    Plan shape: one tiny aggregate for per-domain counts (|domains|
    rows, broadcast back), one window rank per domain, no collect.  The
    skew bound is the largest weighted domain's row count in one sort;
    at 100 TB prefilter with :func:`stratified_hash_sample` at a few×
    the quota fraction first, then rank the survivors — priorities are
    hash-uniform, so the prefilter keeps every winner with near
    certainty and the final rank is exact on a corpus orders smaller.

    Returns (``id_col``, ``domain_col``) of the selected documents.
    """
    from pyspark.sql import Window

    quotas = mixture_quotas(weights, total)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(d, q) for d, q in sorted(quotas.items())], f"{domain_col} string, __quota long"
    )
    # restrict to WEIGHTED domains before anything wide: per-domain ranks
    # don't see other domains' rows, so dropping unweighted domains up
    # front changes nothing — but ranking first would sort-shuffle the
    # whole corpus (a join can't be pushed below a window), paying for
    # rows guaranteed to be discarded
    weighted = df.select(F.col(id_col), F.col(domain_col)).join(
        F.broadcast(qdf), domain_col
    )
    counts = weighted.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("__cnt"), F.first("__quota").alias("__quota")
    )
    lim = counts.select(
        F.col(domain_col), F.least("__quota", "__cnt").alias("__take")
    )
    pri = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(pri, F.col(id_col))
    ranked = weighted.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(lim), domain_col)
        .where(F.col("__rn") <= F.col("__take"))
        .select(F.col(id_col), F.col(domain_col))
    )


def pack_and_chunk(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    n_shards: int = 1,
    salt: str = "pack-v1",
) -> DataFrame:
    """Sequence packing for pretraining (north-star surface): concatenate
    documents in a deterministic order and cut the token stream into
    fixed-``budget`` chunks — the GPT-style pack-and-chunk step every
    training pipeline runs between curation and tokenized shards.  A
    document may straddle a chunk boundary; this operator assigns each
    document its position in the stream rather than materializing the
    stream (that is the tokenizer's job downstream).

    Pure window algebra: per shard, ``tok_offset`` is the running token sum
    over (hash-bucketed shard, id) order, so ``chunk_first``/``chunk_last``
    are floor-divisions of the offsets — no UDF, no driver state, and an
    exact ANSI-SQL oracle exists (cumulative SUM window).

    Scale shape: documents hash into ``n_shards`` independent pack
    streams (same md5 arithmetic as :func:`hash_split`, so shard
    assignment is reproducible across runs/partitionings); the window
    sorts WITHIN a shard only — at 100 TB size ``n_shards`` so one
    shard's documents fit a task's sort spill budget, and the shards
    pack in parallel.  A single global stream (``n_shards=1``) is a
    global sort — correct, but the deliberate single-stream operating
    point.

    Returns (id, token_count, shard, tok_offset, chunk_first,
    chunk_last): ``tok_offset`` is the document's first-token position
    in its shard's stream (named to avoid SQL reserved words — a bare
    ``offset`` column breaks downstream canonicalization SQL), chunks
    are ``budget``-sized windows of that stream.  Empty
    documents (0 tokens) get ``chunk_last = chunk_first - 1`` semantics
    avoided by clamping to ``chunk_first`` (they own no tokens but land
    between chunks deterministically).
    """
    from pyspark.sql import Window

    shard = F.pmod(_hash_bucket(F.col(id_col), salt), F.lit(int(n_shards)))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(token_count_col).cast("long")
    out = (
        df.select(
            F.col(id_col),
            toks.alias("token_count"),
            shard.cast("long").alias("shard"),
        )
        .withColumn("__cum", F.sum("token_count").over(w))
        .withColumn("tok_offset", (F.col("__cum") - F.col("token_count")))
        # integer `div`, not floor(x / y): double division loses exactness
        # past 2^53 tokens per shard; offsets are non-negative so the
        # truncating/floor distinction never bites, and the only negative
        # operand (__cum - 1 == -1 for an empty doc at stream start) is
        # clamped by the greatest() on both engines
        .withColumn("chunk_first", F.expr(f"tok_offset div {int(budget)}"))
        .withColumn(
            "chunk_last",
            F.greatest(
                F.expr(f"(__cum - 1) div {int(budget)}"),
                F.col("chunk_first"),
            ),
        )
        .drop("__cum")
    )
    return out


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-Res): each row draws a uniform u from md5(salt||id)
    and scores ``key = -ln(u)/w``; the n SMALLEST keys are the sample —
    exactly the distribution of sequential weighted draws, but
    embarrassingly parallel and reproducible (a pure function of
    (salt, id, weight): rerun-, partitioning- and engine-stable, the
    same determinism contract as :func:`hash_split`).

    Use for weight-proportional corpus subsampling (by length, quality,
    domain priority) where :func:`mixture_sample`'s per-domain quotas
    are too coarse.  Rows with non-positive weight never enter.

    Scale shape: one projection computes the key row-locally; the
    global smallest-n is a ``TakeOrderedAndProject`` — each partition
    keeps its local n, no full sort, no shuffle of the corpus.
    Returns (id, weight) for the n selected rows — the KEY itself is
    deliberately not emitted: ``ln`` is the one non-IEEE-exact op in
    the chain (engines may differ by an ulp), so the key column would
    be hash-fragile while the SELECTION is robust (two distinct ids'
    keys landing within an ulp of each other at the n-boundary is
    ~1e-13 probable; the k6-family boundary notes carry the same
    argument class).
    """
    if n <= 0:
        raise ValueError("weighted_sample: n must be positive")
    # u in (0, 1]: (h + 1) / 2^60 over the 60-bit md5 prefix — never 0,
    # so ln(u) is finite; identical arithmetic in the DuckDB oracle
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(2**60))
    key = -F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), key.alias("__k"))
        .orderBy(F.col("__k").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__k")
    )


def leakage_safe_split(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Train/val/test split that cannot leak through near-duplicates:
    documents are clustered into near-dup components first
    (``dedup.ngram_jaccard_pairs`` → ``dedup.connected_components``)
    and the split is hashed from the COMPONENT label, so every member
    of a duplicate cluster lands in the same split by construction —
    :func:`hash_split` on raw ids would put a test document's 0.95-
    Jaccard twin in train and silently contaminate evaluation.

    Returns (id, component, split).  The split column is a pure
    function of (salt, component): reproducible across runs, engines
    and partitionings, and singleton docs (their own component) behave
    exactly like :func:`hash_split`.

    Scale shape: the pair construction and component resolution are the
    banded/bounded dedup paths (never all-pairs; pointer-doubling
    components); the split itself adds one md5 projection — no join,
    no shuffle — because equal components hash equal everywhere.
    """
    from .dedup import connected_components, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, text_col, id_col, min_jaccard=min_jaccard)
    comps = connected_components(
        pairs, vertices=docs.select(F.col(id_col).alias("id_a"))
    )
    return hash_split(
        comps.select("id", "component"), "component", weights, salt
    )
