"""R13 probe: profile_table exact (Expand-based multi-distinct) vs
approx (HLL++) under corpus pressure (1×/4×/16×) — measures the trade
the operator documents instead of asserting it.

The exact mode's multi-column ``count(DISTINCT)`` plans ONE Expand that
multiplies every input row by |cols| before the partial aggregate; the
approx mode folds each row into |cols| fixed-size HLL sketches in a
single pass, no row multiplication, and its shuffle is |partitions| ×
|cols| sketches regardless of input size.  Expectation: both grow
~linearly single-box (the Expand rows are pipelined, not materialized),
with exact carrying a constant ×|cols| row-processing overhead and a
distinct-value-proportional shuffle; the structural win (bounded
shuffle + bounded aggregation state) is what matters at 1000 executors,
and the probe's job is to confirm exact's cost multiplier is real and
the two modes agree within rsd at every scale.

Per scale: documents salted ×mult (every text distinct — worst case for
distinct counting), both modes over the same 5 columns, median of 3
warm reps, plus the max relative n_distinct deviation between modes.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.profile import (  # noqa: E402
    profile_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _corpus(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = base.count()
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(mult)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.repartition(32).localCheckpoint(), n * mult


def _timed(fn) -> tuple[float, list]:
    walls, out = [], None
    for rep in range(4):
        t0 = time.time()
        out = fn().collect()
        if rep:
            walls.append(time.time() - t0)
    walls.sort()
    return walls[len(walls) // 2], out


def main() -> None:
    spark = get_spark("probe-profile16x")
    results = []
    for mult in (1, 4, 16):
        df, n_rows = _corpus(spark, mult)
        exact_s, exact_rows = _timed(lambda: profile_table(df, COLS))
        approx_s, approx_rows = _timed(
            lambda: profile_table(df, COLS, approx=True, rsd=0.05)
        )
        ex = {r["col_name"]: r["n_distinct"] for r in exact_rows}
        ap = {r["col_name"]: r["n_distinct"] for r in approx_rows}
        max_rel_dev = max(
            abs(ap[c] - ex[c]) / max(1, ex[c]) for c in COLS
        )
        rec = {
            "mult": mult,
            "rows": n_rows,
            "exact_s": round(exact_s, 3),
            "approx_s": round(approx_s, 3),
            "exact_over_approx": round(exact_s / approx_s, 2),
            "max_rel_nd_dev": round(max_rel_dev, 4),
        }
        results.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"probe": "profile16x", "sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
