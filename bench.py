"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-count); the first
query absorbs session warm-up, so a tiny warm-up no-op runs first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

# headline set: the flagship plan, the signature band join, the correlation
# engine, the heaviest document/dedup ops, and a star join
HEADLINE = [
    "plan_mass_annotation",
    "plan_pathway_expand",
    "plan_corr_multiomics",
    "j4_band_join",
    "j6_transition_match",
    "j1_star_join",
    "j12_event_join",
    "a3_pricing_summary",
    "k6_pairwise_corr",
    "k6_spearman",
    "w1_mutual_rank",
    "p6_mad_filter",
    "p8_outlier_matrix",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_ngram_jaccard",
    "sim_ann_topk",
    "sim_cosine_neardup",
    "text_quality",
    "events_tumbling",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("omics-spark-bench")

    queries = entrymod.queries()
    # warm up the session: JVM, AQE machinery, parquet reader paths
    spark.range(1000).count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("supplier", "part", "lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    # warm the Arrow / python-worker path (mapInPandas machinery)
    import pandas as _pd

    spark.range(100).mapInPandas(
        lambda it: (pdf.assign(x=pdf.id) for pdf in it), schema="id long, x long"
    ).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
