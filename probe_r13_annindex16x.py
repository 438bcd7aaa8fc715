"""R13 probe: persisted ANN index lifecycle under corpus pressure
(1×/4×/16×) — build-once vs probe-many cost curve, the similarity
analog of probe_r13_indexlifecycle16x (dedup).

At each scale (sf0.1 embeddings duplicated with re-salted ids; vectors
perturbed per copy so duplicates aren't trivially identical):

  build_s  — build_ann_index over the full corpus (train + assign +
             bucketed write): what a generation rebuild pays, expected
             ~linear in the corpus;
  probe_s  — ann_index_topk of a FIXED 100-query batch at n_probes=4
             (median of 3 warm reps): what the serving path repeats,
             expected to grow with the probed buckets' population
             (corpus/n_lists per bucket → linear in corpus at fixed
             n_lists, but with a constant ~n_probes/n_lists ≪ 1 of the
             corpus read — the plan's SelectedBucketsCount),
  naive_s  — ivf_topk end-to-end at the same settings (re-train +
             re-assign + probe per batch): the no-index comparator.

The claim to verify: probe_s ≪ naive_s at every scale and the gap
widens with corpus size, because the index amortizes training and
assignment across batches while naive pays them per batch.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.similarity import (  # noqa: E402
    ann_index_topk,
    build_ann_index,
    ivf_topk,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _corpus(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = base.count()
    parts = []
    for i in range(mult):
        shift = float(i) * 0.001
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x.cast("double") + F.lit(shift)
                ).alias("embedding"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.repartition(32).localCheckpoint(), n * mult


def main() -> None:
    spark = get_spark("probe-annindex16x")
    results = []
    for mult in (1, 4, 16):
        df, n_rows = _corpus(spark, mult)
        queries = df.where(F.col("vec_id") % (n_rows // 100) == 0).localCheckpoint()
        nq = queries.count()
        path = tempfile.mkdtemp(prefix=f"ann_probe_{mult}x_")
        name = f"ann_probe_{mult}x"

        t0 = time.time()
        idx = build_ann_index(df, "embedding", "vec_id", name, path, n_lists=16)
        build_s = time.time() - t0

        walls = []
        for rep in range(4):
            t0 = time.time()
            ann_index_topk(spark, queries, idx, k=5, n_probes=4).count()
            if rep:
                walls.append(time.time() - t0)
        walls.sort()
        probe_s = walls[len(walls) // 2]

        t0 = time.time()
        ivf_topk(
            df, queries, "embedding", "vec_id", k=5, n_lists=16, n_probes=4
        ).count()
        naive_s = time.time() - t0

        rec = {
            "mult": mult,
            "rows": n_rows,
            "n_queries": nq,
            "build_s": round(build_s, 2),
            "probe_s": round(probe_s, 2),
            "naive_s": round(naive_s, 2),
            "naive_over_probe": round(naive_s / probe_s, 2),
        }
        results.append(rec)
        print(json.dumps(rec))
        spark.sql(f"DROP TABLE IF EXISTS {idx.lists_table}")
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"probe": "annindex16x", "sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
