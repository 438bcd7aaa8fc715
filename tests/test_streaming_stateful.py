"""Stateful streaming: running per-user stats must agree with the batch
aggregation after the single micro-batch drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from omics_data_integration_utilities_spark.streaming.stateful import (
    running_user_stats_stream,
)
from .conftest import SF_SMOKE


def test_stateful_user_stats_match_batch(spark, tmp_path):
    path = f"{SF_SMOKE}/events.parquet"
    stream_df = running_user_stats_stream(spark, path)
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: r
            for r in spark.sql("SELECT * FROM user_stats").collect()
        }
    finally:
        q.stop()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from omics_data_integration_utilities_spark.streaming.events import ts_event_micros

    events = spark.read.parquet(path)
    batch = (
        events
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
            F.max(ts_event_micros(events)).alias("last"),
        )
    )
    expect = {r["user_id"]: r for r in batch.collect()}
    assert set(got) == set(expect)
    for uid, e in expect.items():
        g = got[uid]
        assert g["n_events"] == e["n"]
        assert abs(g["sum_value"] - e["s"]) < 1e-6
        assert g["last_ts_us"] == e["last"]


def test_trending_ngrams_stream_exact_when_untouched_by_trims(spark, tmp_path):
    """capacity >= per-bucket distinct grams -> no MG trims, the final
    per-bucket emissions carry EXACT counts, and the assembled top-k
    equals batch top_ngrams on the same corpus."""
    from omics_data_integration_utilities_spark.operators.text import top_ngrams
    from omics_data_integration_utilities_spark.streaming.heavyhitters import (
        trending_ngrams_stream,
    )

    path = f"{SF_SMOKE}/documents.parquet"
    stream_df = trending_ngrams_stream(
        spark, path, n=3, capacity=100_000, n_buckets=8
    )
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName("trending")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM trending").collect()
    finally:
        q.stop()

    # latest emission per bucket = rows at that bucket's max n_seen
    latest = {}
    for r in rows:
        latest.setdefault(r["bucket"], []).append(r)
    final = []
    for b, rs in latest.items():
        hi = max(r["n_seen"] for r in rs)
        final.extend(
            r for r in rs if r["n_seen"] == hi and r["ngram"] is not None
        )
    got = sorted(
        ((r["ngram"], r["lower_count"]) for r in final),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]

    docs = spark.read.parquet(path)
    want = [
        (r["ngram"], r["n_occurrences"])
        for r in top_ngrams(docs, "text", n=3, k=20).collect()
    ]
    assert got == want


def test_trending_ngrams_stream_superset_under_trims(spark, tmp_path):
    """Small capacity + multi-batch arrival: every gram whose true count
    exceeds its bucket's n_seen/(capacity+1) MUST appear in that
    bucket's final candidate emission (the MG guarantee the batch
    certificate builds on), and lower_count never exceeds the true
    count."""
    from pyspark.sql import functions as F2
    from omics_data_integration_utilities_spark.streaming.heavyhitters import (
        gram_bucket_col,
        trending_ngrams_stream,
    )
    from omics_data_integration_utilities_spark.operators.dedup import tokens_col

    CAPACITY, BUCKETS = 8, 4
    hot = "alpha beta gamma delta"
    rows = [(i, hot) for i in range(60)] + [
        (100 + i, f"x{i} y{i} z{i} w{i}") for i in range(120)
    ]
    src = tmp_path / "docs_src"
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        6
    ).write.parquet(str(src))

    stream_df = trending_ngrams_stream(
        spark,
        str(src),
        n=3,
        capacity=CAPACITY,
        n_buckets=BUCKETS,
        max_files_per_trigger=2,
    )
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName("trending_trim")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh2"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM trending_trim").collect()
    finally:
        q.stop()

    latest = {}
    for r in emitted:
        latest.setdefault(r["bucket"], []).append(r)
    final = {}  # bucket -> {ngram: lower_count}, n_seen
    for b, rs in latest.items():
        hi = max(r["n_seen"] for r in rs)
        final[b] = (
            {
                r["ngram"]: r["lower_count"]
                for r in rs
                if r["n_seen"] == hi and r["ngram"] is not None
            },
            hi,
        )
    # every bucket that saw data must have emitted a sentinel
    assert all(n_seen > 0 for _, n_seen in final.values())

    docs = spark.read.parquet(str(src))
    from omics_data_integration_utilities_spark.operators.text import word_ngrams_col

    truth = (
        docs.select(
            F2.explode(word_ngrams_col(tokens_col("text"), 3)).alias("ngram")
        )
        .withColumn("bucket", gram_bucket_col(F2.col("ngram"), BUCKETS))
        .groupBy("bucket", "ngram")
        .count()
        .collect()
    )
    for r in truth:
        cand, n_seen = final.get(r["bucket"], ({}, 0))
        if r["count"] * (CAPACITY + 1) > n_seen:
            assert r["ngram"] in cand, (
                f"heavy gram {r['ngram']} (count {r['count']}) missing from "
                f"bucket {r['bucket']} (n_seen {n_seen})"
            )
        if r["ngram"] in cand:
            assert cand[r["ngram"]] <= r["count"]


def test_trending_keys_stream_exact_and_typed(spark, tmp_path):
    """The generic hot-KEY monitor: no-trim regime over the events feed
    equals batch frequent_items on the same data, with the key column
    KEEPING its input type (long) — including the per-bucket NULL-key
    sentinel not corrupting typed keys (the object-dtype emit)."""
    from omics_data_integration_utilities_spark.operators.sketches import (
        frequent_items,
    )
    from omics_data_integration_utilities_spark.streaming.heavyhitters import (
        trending_keys_stream,
    )

    path = f"{SF_SMOKE}/events.parquet"
    stream_df = trending_keys_stream(
        spark, path, key_col="user_id", capacity=100_000, n_buckets=4
    )
    assert dict(stream_df.dtypes)["key"] == "bigint"
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName("hotkeys")
        .option("checkpointLocation", str(tmp_path / "ckpt_keys"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM hotkeys").collect()
    finally:
        q.stop()

    latest = {}
    for r in rows:
        latest.setdefault(r["bucket"], []).append(r)
    final = []
    for b, rs in latest.items():
        hi = max(r["n_seen"] for r in rs)
        final.extend(r for r in rs if r["n_seen"] == hi and r["key"] is not None)
    got = sorted(
        ((r["key"], r["lower_count"]) for r in final),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]

    events = spark.read.parquet(path)
    want = [
        (r["user_id"], r["cnt"])
        for r in frequent_items(
            events, "user_id", k=10, capacity=100_000, count_col="cnt"
        ).collect()
    ]
    assert got == want
    assert all(isinstance(k, int) for k, _ in got)


def test_trending_keys_stream_superset_under_trims_64bit(spark, tmp_path):
    """The generic key form under forced multi-batch trims: every key
    whose true count exceeds its bucket's n_seen/(capacity+1) must
    survive in the final candidate emission with lower_count <= truth —
    on 64-bit keys above 2^53, so a float round-trip anywhere in the
    state machinery would corrupt the surviving candidates."""
    from pyspark.sql import functions as F2

    from omics_data_integration_utilities_spark.streaming.heavyhitters import (
        trending_keys_stream,
    )

    CAPACITY, BUCKETS = 8, 4
    BASE = 2**60
    hot_a, hot_b = BASE + 1, BASE + 2  # adjacent: float64 collapses them
    rows = (
        [(i, hot_a) for i in range(60)]
        + [(1000 + i, hot_b) for i in range(40)]
        + [(2000 + i, BASE + 10_000 + 2 * i) for i in range(150)]
    )
    src = tmp_path / "keys_src"
    spark.createDataFrame(rows, "event_id long, user_id long").repartition(
        6
    ).write.parquet(str(src))

    stream_df = trending_keys_stream(
        spark,
        str(src),
        key_col="user_id",
        capacity=CAPACITY,
        n_buckets=BUCKETS,
        max_files_per_trigger=2,
    )
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName("keys_trim")
        .option("checkpointLocation", str(tmp_path / "ckpt_keys2"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM keys_trim").collect()
    finally:
        q.stop()

    latest = {}
    for r in emitted:
        latest.setdefault(r["bucket"], []).append(r)
    final = {}
    for b, rs in latest.items():
        hi = max(r["n_seen"] for r in rs)
        final[b] = (
            {r["key"]: r["lower_count"] for r in rs
             if r["n_seen"] == hi and r["key"] is not None},
            hi,
        )
    truth = (
        spark.read.parquet(str(src))
        .where(F2.col("user_id").isNotNull())
        .withColumn(
            "bucket", F2.pmod(F2.xxhash64("user_id"), F2.lit(BUCKETS)).cast("int")
        )
        .groupBy("bucket", "user_id")
        .count()
        .collect()
    )
    for r in truth:
        cand, n_seen = final.get(r["bucket"], ({}, 0))
        if r["count"] * (CAPACITY + 1) > n_seen:
            assert r["user_id"] in cand, (
                f"heavy key {r['user_id']} missing from bucket {r['bucket']}"
            )
        if r["user_id"] in cand:
            assert cand[r["user_id"]] <= r["count"]
    # the two planted 64-bit heavies must survive VERBATIM (not rounded)
    all_cands = {k for cand, _ in final.values() for k in cand}
    assert hot_a in all_cands and hot_b in all_cands
