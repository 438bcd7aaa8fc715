"""R11 follow-up probe: gram_novelty on the long-doc self-union
construction (same worst case as probe_r11_substring: every gram shared
by k copies → maximal hot-gram load on the min-id-owner aggregate, and
later copies must score novelty exactly 0)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.dedup import gram_novelty  # noqa: E402

GROUPS = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("omics-spark-novelty-probe")
    spark.range(1000).count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    long_docs = (
        docs.withColumn("__g", F.pmod(F.col("doc_id"), F.lit(GROUPS)))
        .withColumn("__o", F.col("doc_id"))
        .groupBy("__g")
        .agg(
            F.concat_ws(
                " ",
                F.array_sort(F.collect_list(F.struct("__o", "text"))).getField("text"),
            ).alias("text")
        )
        .select(F.col("__g").alias("doc_id"), "text")
        .localCheckpoint()
    )
    out = {"scales": {}}
    for k in (1, 4, 16):
        amp = long_docs
        for c in range(1, k):
            amp = amp.unionByName(
                long_docs.select(
                    (F.col("doc_id") + F.lit(c * GROUPS)).alias("doc_id"), "text"
                )
            )
        amp = amp.localCheckpoint()
        t0 = time.perf_counter()
        res = gram_novelty(amp, "text", "doc_id")
        stats = res.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("novelty") == 0.0, 1).otherwise(0)).alias("zero_novelty_docs"),
            F.sum("n_grams").alias("gram_rows"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        out["scales"][str(k)] = {
            "docs": int(stats["docs"]),
            "zero_novelty_docs": int(stats["zero_novelty_docs"]),
            "distinct_gram_rows": int(stats["gram_rows"]),
            "wall_s": round(wall, 2),
        }
        # semantics: exactly (k-1)*GROUPS later copies must be fully seen
        assert int(stats["zero_novelty_docs"]) == (k - 1) * GROUPS, out
        print(f"# k={k}: {out['scales'][str(k)]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
