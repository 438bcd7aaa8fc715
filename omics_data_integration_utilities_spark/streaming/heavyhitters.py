"""Streaming heavy hitters: bucket-sharded Misra-Gries state over a
document feed — the trending-phrases / hot-key monitor (north-star
surface; the reference is strictly batch).

The batch scale path (``operators.text.heavy_hitters``: per-partition
MG sketch -> exact recount -> certificate) re-expressed incrementally:
grams are exploded JVM-side on the stream, sharded by a deterministic
gram hash into ``n_buckets`` groups, and each bucket carries ONE
Misra-Gries summary (gram/count arrays + items-seen counter) as
explicit group state via ``applyInPandasWithState``.  Every micro-batch
each touched bucket re-emits its full candidate set (update mode), so
the latest emission per bucket (rows with that bucket's max ``n_seen``)
is always a complete, mergeable summary of the whole stream so far.

Guarantees (per bucket, standard MG): a stored ``lower_count`` is
within ``n_seen/(capacity+1)`` of the gram's true count in the stream
so far, and any gram ABSENT from its bucket's summary has true count
<= ``n_seen/(capacity+1)``.  Because a gram hashes to exactly one
bucket, the bound applies to its full stream history — the candidate
union is a superset of every gram with count > n_seen_bucket/(cap+1),
the same superset the batch operator's certificate builds on.  When a
bucket's distinct grams never exceed ``capacity`` the summary is exact
(no trims), and the assembled top-k equals the batch answer — the
stream==batch parity the tests pin.

Scale shape: state is ``n_buckets`` rows of <= ``capacity`` entries —
FIXED regardless of stream length or gram cardinality (compare the
exact alternative: unbounded per-gram state).  The shuffle per
micro-batch is the gram stream hashed to ``n_buckets`` keys; hot grams
skew a bucket's INPUT but never its state.  A production consumer
periodically recounts the candidate union exactly over the archived
feed — the streaming half supplies the bounded candidate set, the
batch half (``operators.text.heavy_hitters``'s recount + certificate)
supplies exactness, mirroring the Lambda split the batch docstring
describes.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import tokens_col
from ..operators.text import word_ngrams_col
from .dedup import _stage_dir

OUTPUT_SCHEMA = "bucket int, ngram string, lower_count long, n_seen long"
STATE_SCHEMA = "grams array<string>, counts array<long>, n_seen long"


def _make_mg_fn(capacity: int):
    def update_bucket(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (bucket,) = key
        if state.exists:
            grams, counts, n_seen = state.get
            d = dict(zip(list(grams), [int(c) for c in counts]))
            n_seen = int(n_seen)
        else:
            d, n_seen = {}, 0
        for pdf in pdfs:
            vc = pdf["ngram"].value_counts()
            n_seen += int(vc.sum())
            for g, c in vc.items():
                d[g] = d.get(g, 0) + int(c)
            if len(d) > capacity:
                vals = sorted(d.values(), reverse=True)
                thr = vals[capacity]
                d = {g: v - thr for g, v in d.items() if v > thr}
        state.update((list(d.keys()), list(d.values()), n_seen))
        # ALWAYS emit a NULL-gram sentinel carrying n_seen (the batch
        # phase-1 sentinel design): a near-uniform bucket can trim to an
        # EMPTY summary, and without the sentinel a consumer could not
        # evaluate the n_seen/(capacity+1) absence bound for it
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "ngram": list(d.keys()) + [None],
                "lower_count": list(d.values()) + [0],
                "n_seen": n_seen,
            }
        )

    return update_bucket


def gram_bucket_col(ngram, n_buckets: int):
    """Deterministic gram -> bucket shard (shared by the stream and the
    batch-side verification so the per-bucket MG bound is checkable)."""
    return F.pmod(F.xxhash64(ngram), F.lit(n_buckets)).cast("int")


def trending_ngrams_stream(
    spark: SparkSession,
    docs_path: str,
    text_col: str = "text",
    n: int = 3,
    capacity: int = 512,
    n_buckets: int = 8,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Document parquet stream -> per-bucket Misra-Gries candidate
    summaries (update mode; one row per candidate gram per touched
    bucket per micro-batch).

    Returns the unstarted streaming DataFrame (bucket, ngram,
    lower_count, n_seen).  Consumers take each bucket's latest emission
    (max ``n_seen``) and union across buckets for the corpus-wide
    candidate set; top-k by ``lower_count`` is exact whenever no bucket
    ever trimmed (see module docstring), and a candidate superset of
    the true heavy hitters otherwise.
    """
    schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(_stage_dir(docs_path))
    grams = stream.select(
        F.explode(word_ngrams_col(tokens_col(text_col), n)).alias("ngram")
    )
    keyed = grams.withColumn("bucket", gram_bucket_col(F.col("ngram"), n_buckets))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_mg_fn(int(capacity)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_mg_key_fn(capacity: int):
    """Generic-key twin of :func:`_make_mg_fn`: the grouped column is
    ``key`` (any type the caller's declared schemas carry — the state
    and output schemas are built from the INPUT key dtype, so 64-bit
    keys stay typed end-to-end).  The sentinel emission builds the key
    column with dtype=object, the same guard as the batch sketch: a
    plain list-of-ints + [None] coerces to float64 and silently rounds
    keys above 2^53."""

    def update_bucket(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (bucket,) = key
        if state.exists:
            keys, counts, n_seen = state.get
            d = dict(zip(list(keys), [int(c) for c in counts]))
            n_seen = int(n_seen)
        else:
            d, n_seen = {}, 0
        for pdf in pdfs:
            vc = pdf["key"].value_counts()
            n_seen += int(vc.sum())
            for g, c in vc.items():
                d[g] = d.get(g, 0) + int(c)
            if len(d) > capacity:
                vals = sorted(d.values(), reverse=True)
                thr = vals[capacity]
                d = {g: v - thr for g, v in d.items() if v > thr}
        state.update((list(d.keys()), list(d.values()), n_seen))
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "key": pd.Series(list(d.keys()) + [None], dtype="object"),
                "lower_count": list(d.values()) + [0],
                "n_seen": n_seen,
            }
        )

    return update_bucket


def trending_keys_stream(
    spark: SparkSession,
    events_path: str,
    key_col: str = "user_id",
    capacity: int = 512,
    n_buckets: int = 8,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Generic hot-KEY monitor over a feed: the streaming twin of
    ``operators.sketches.frequent_items`` (the n-gram form above is the
    text instantiation; this one watches ANY key column — the
    continuously-updated skew detector feeding
    ``operators.skew.skew_aware_join``'s ``hot_keys`` on a live join
    key distribution, so the salting decision tracks the feed instead
    of a stale batch profile).

    Returns the unstarted streaming DataFrame (bucket, key,
    lower_count, n_seen) with ``key`` KEEPING the input column's type;
    NULL keys are excluded like the batch form, and the NULL-key
    sentinel row per bucket carries ``n_seen`` so the
    ``n_seen/(capacity+1)`` absence bound stays checkable even for a
    bucket that trimmed to empty.  Same per-bucket MG guarantees and
    fixed ``n_buckets x capacity`` state as the gram form.
    """
    from .events import stream_source_schema

    schema = stream_source_schema(spark, events_path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(_stage_dir(events_path))
    key_type = dict(stream.dtypes)[key_col]
    keyed = (
        stream.select(F.col(key_col).alias("key"))
        .where(F.col("key").isNotNull())
        .withColumn("bucket", F.pmod(F.xxhash64("key"), F.lit(n_buckets)).cast("int"))
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_mg_key_fn(int(capacity)),
        outputStructType=f"bucket int, `key` {key_type}, lower_count long, n_seen long",
        stateStructType=f"keys array<{key_type}>, counts array<long>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
