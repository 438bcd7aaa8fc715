"""R17 probe (verdict item 2): settle j12_event_join's surviving
SortMergeJoin.  The J12 plan joins (mutations ⋈ broadcast-edges) ⋈
outliers on (patient, gene); the left side fans every mutation row out
~150× (edges per brand) BEFORE the patient-level exchange, while the
outlier side would fan out only ~25× (edges per p_type).  Inner joins
reassociate, so m ⋈ (o ⋈ e) computes the identical row multiset with
~6× fewer shuffled rows.  This probe times both shapes interleaved in
ONE session (load-matched), prints the actual side cardinalities, and
times the registered aggregation on top of each.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators import joins as join_ops  # noqa: E402
from omics_data_integration_utilities_spark.plans.registry import _j12_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("probe-r17-j12")
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "pmod(xxhash64(id), 97) as b", "id"
    ).groupBy("b").agg({"id": "sum"}).count()
    print(f"calibration: {time.perf_counter() - t0:.3f}s loadavg={os.getloadavg()[0]:.1f}")

    mutations, edges, outliers = _j12_tables(spark, SF_DIR)
    m, e, o = (x.localCheckpoint() for x in (mutations, edges, outliers))
    nm, ne, no = m.count(), e.count(), o.count()
    me = nm and m.join(F.broadcast(e), m.gene == e.src).count()
    oe = no and o.join(F.broadcast(e), o.gene == e.dst).count()
    print(f"|mutations|={nm} |edges|={ne} |outliers|={no} |mxe|={me} |oxe|={oe}")

    def run(side):
        ev = join_ops.bipartite_event_join(m, e, o, expand_side=side)
        ev.groupBy("mut_gene").agg(F.count(F.lit(1)).alias("n_events")).count()

    for side in ("mutations", "outliers"):
        run(side)  # warm
    ts = {"mutations": [], "outliers": []}
    for side in ["outliers", "mutations", "mutations", "outliers",
                 "outliers", "mutations", "mutations", "outliers"]:
        t0 = time.perf_counter()
        run(side)
        ts[side].append(time.perf_counter() - t0)
    for side, v in ts.items():
        print(
            f"expand_side={side}: min {min(v):.3f} med {statistics.median(v):.3f} "
            f"{[round(t, 2) for t in v]}"
        )
    print(
        f"speedup(min) {min(ts['mutations']) / min(ts['outliers']):.2f}x "
        f"loadavg={os.getloadavg()[0]:.1f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
