"""R12 probe: text_heavy_hitters under a UNIQUE-TAIL EXPLOSION — the
operator's design case and worst case at once.

The corpus is sf0.1 documents replicated 1x/4x/16x with every copy's
text salted per-copy ("cNx" prepended to each token), so the distinct
3-gram space grows ~x k while the row count grows x k — the shape where
top_ngrams's full-cardinality groupBy shuffle becomes the bottleneck at
100 TB (the unique tail IS the shuffle).  A 54-token boilerplate phrase
is injected UNSALTED into ~3% of rows so the corpus carries >= 50 true
heavy grams (k=50): the probe asserts the CERTIFIED sketch path fires
at every scale and that the output equals brute-force top_ngrams.

The headline metric is SHUFFLE WRITE BYTES (Spark REST API, per-query
delta), not wall: single-box walls hide shuffle economics (the sketch
pays two scans + the Arrow hop, the groupBy pays the shuffle — on one
JVM at toy scale the shuffle is cheap), but the bytes curve is exactly
what diverges at cluster scale: top_ngrams's shuffle grows with the
distinct-gram tail, heavy_hitters's stays capacity-bounded.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.text import (  # noqa: E402
    heavy_hitters,
    top_ngrams,
)

# 54 tokens -> 52 distinct hot 3-grams (> k), all with count ~rows/33
HOT = " ".join(f"boiler{i:02d}" for i in range(54))
# 2048, NOT the registered query's 16384: per-partition distinct grams
# here are ~13.6k at 16x, so 16384 never trims (the sketch degenerates
# to keep-everything and the recount shuffles like the brute force —
# measured in the first probe run).  2048 forces the trimming regime
# this operator exists for, while the certificate still holds:
# c50*(2049) ~ 4.97M > N ~ 4.2M at 16x (margin 1.19x, constant across
# scales since both sides grow linearly).  At 100 TB the per-partition
# distinct count always dwarfs any sane capacity, so the trimming
# regime is THE regime.
CAPACITY = 2048
K = 50


def shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes across all completed stages (REST API)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "omics-spark-hh16x", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1000).count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()
    base_rows = docs.count()
    out = {"base_rows": base_rows, "capacity": CAPACITY, "k": K, "scales": {}}

    for k in (1, 4, 16):
        copies = docs.select("doc_id", "text")
        amp = None
        for c in range(k):
            # per-copy salt: every token prefixed -> every 3-gram unique
            # to its copy; the hot phrase is injected unsalted so it
            # stays corpus-global
            salted = copies.select(
                (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
                F.when(
                    F.col("doc_id") % 33 == 0, F.lit(HOT)
                ).otherwise(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(F.lit(f"c{c}x"), t),
                        ),
                    )
                ).alias("text"),
            )
            amp = salted if amp is None else amp.unionByName(salted)
        amp = amp.localCheckpoint()
        rows = amp.count()

        toks = F.split(F.col("text"), " ")
        grams = amp.select(
            F.explode(
                F.when(
                    F.size(toks) >= 3,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 2),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g")
        )
        n_distinct = grams.select("g").distinct().count()

        s0 = shuffle_write_bytes(spark)
        t0 = time.time()
        brute = [
            (r["ngram"], r["n_occurrences"])
            for r in top_ngrams(amp, "text", n=3, k=K).collect()
        ]
        t_brute = time.time() - t0
        s1 = shuffle_write_bytes(spark)

        t0 = time.time()
        hh_df = heavy_hitters(amp, "text", n=3, k=K, capacity=CAPACITY)
        got = [(r["ngram"], r["n_occurrences"]) for r in hh_df.collect()]
        t_hh = time.time() - t0
        s2 = shuffle_write_bytes(spark)
        certified = (
            "Exchange"
            not in hh_df._jdf.queryExecution().executedPlan().toString()
        )

        rec = {
            "rows": rows,
            "distinct_3grams": n_distinct,
            "top_ngrams_wall_s": round(t_brute, 2),
            "heavy_hitters_wall_s": round(t_hh, 2),
            "top_ngrams_shuffle_mib": round((s1 - s0) / 2**20, 2),
            "heavy_hitters_shuffle_mib": round((s2 - s1) / 2**20, 2),
            "certified_path": certified,
            "exact_match": got == brute,
            "hot_head_count": got[0][1] if got else None,
        }
        out["scales"][f"{k}x"] = rec
        print(json.dumps({f"{k}x": rec}), file=sys.stderr, flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
