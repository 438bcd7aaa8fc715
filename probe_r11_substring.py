"""R11 scale probe: the exact-substring dedup family on LONG documents
(r10 verdict item 5).  The r10 hot-gram probe measured partial-agg
collapse at 160k short docs; this one measures the island-merge WINDOW
behavior when per-doc partitions get large (>=100k gram rows per doc —
the per-doc sort the suffix-array replacement pays) and checks the
gram-table blow-up against the documented linear bound.

Construction: sf0.1 documents concatenated into G long docs of ~135k
tokens each (ordered by doc_id inside md5 groups — deterministic), then
self-unioned k in {1, 4, 16} with ids offset per copy and text IDENTICAL
across copies — maximal cross-copy duplication: every gram occurs k
times, every doc collapses to one full-length island, the worst case
for both the groupBy(g) hot path and the per-doc window.

Run: python probe_r11_substring.py ; one JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.dedup import (  # noqa: E402
    duplicated_substring_spans,
    remove_duplicated_spans,
    with_token_grams,
)

WIDTH = 8
GROUPS = 2  # long docs per copy (~135k tokens each from 5k sf0.1 docs)


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("omics-spark-substr-probe")
    spark.range(1000).count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    long_docs = (
        docs.withColumn("__g", F.pmod(F.col("doc_id"), F.lit(GROUPS)))
        .withColumn("__o", F.col("doc_id"))
        .groupBy("__g")
        .agg(
            F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("__o", "text"))).getField("text")).alias("text")
        )
        .select(F.col("__g").alias("doc_id"), "text")
    )
    long_docs = long_docs.localCheckpoint()  # freeze the construction

    out = {"width": WIDTH, "groups": GROUPS, "scales": {}}
    base_tok = long_docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t"),
        F.max(F.size(F.split("text", " "))).alias("m"),
    ).collect()[0]
    out["tokens_per_copy"] = int(base_tok["t"])
    out["max_doc_tokens"] = int(base_tok["m"])

    for k in (1, 4, 16):
        amp = long_docs
        for c in range(1, k):
            amp = amp.unionByName(
                long_docs.select(
                    (F.col("doc_id") + F.lit(c * GROUPS)).alias("doc_id"), "text"
                )
            )
        amp = amp.localCheckpoint()  # isolate amplification cost from the ops

        n_docs = amp.count()
        grams = with_token_grams(amp, "text", "doc_id", WIDTH)
        t0 = time.perf_counter()
        gram_rows = grams.count()
        gram_wall = time.perf_counter() - t0
        # documented linear bound: one gram row per token position
        bound = k * out["tokens_per_copy"] - (WIDTH - 1) * n_docs

        t0 = time.perf_counter()
        spans = duplicated_substring_spans(amp, "text", "doc_id", WIDTH)
        span_rows = spans.count()
        span_wall = time.perf_counter() - t0
        span_stats = spans.select(
            F.sum("span_tokens").alias("st"), F.max("span_tokens").alias("mx")
        ).collect()[0]

        t0 = time.perf_counter()
        removed = remove_duplicated_spans(amp, "text", "doc_id", WIDTH)
        rem_tokens = removed.select(
            F.sum(F.size(F.split("text", " "))).alias("t")
        ).collect()[0]["t"]
        rem_wall = time.perf_counter() - t0

        out["scales"][str(k)] = {
            "n_docs": n_docs,
            "gram_rows": gram_rows,
            "gram_rows_bound": bound,
            "linear_bound_holds": gram_rows == bound,
            "gram_wall_s": round(gram_wall, 2),
            "span_rows": span_rows,
            "span_tokens_total": int(span_stats["st"] or 0),
            "span_tokens_max": int(span_stats["mx"] or 0),
            "span_wall_s": round(span_wall, 2),
            "remove_wall_s": round(rem_wall, 2),
            "tokens_after_remove": int(rem_tokens or 0),
            "loadavg1": loadavg1(),
        }
        print(f"# k={k}: {out['scales'][str(k)]}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
