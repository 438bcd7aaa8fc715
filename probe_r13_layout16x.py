"""R13 probe: layout-pruned scan vs flat scan under corpus pressure
(1×/4×/16×) — measures what sources/layout.py buys a selective reader.

Three layouts of the same (salted, per-copy-distinct) documents corpus:

  flat        — plain parquet, default task-count files (what a
                pipeline writes with no layout thought),
  partitioned — write_partitioned(source, cluster_by=doc_id): Hive
                directory per source, one file per directory,
  clustered   — write_clustered(doc_id, num_files≈corpus/250k rows):
                range-partitioned sorted files, no directories.

The probed query is the registered doc_pruned_scan shape (source =
'src7' AND doc_id < cut → per-lang agg). Reported per scale:

  *_s           — median warm scan wall (3 reps after 1 warm-up),
  bytes_total   — on-disk bytes of the whole layout,
  bytes_listed  — bytes under the directories a partition-pruned scan
                  lists at all (flat/clustered: everything; partitioned:
                  the one matching directory) — the I/O CEILING the
                  layout admits, filesystem-visible and runtime-free,
  rows          — result row checksum: all three layouts must agree.

Single-box walls at these corpus sizes are mostly scheduler + footer
overhead (the whole corpus fits in page cache), so the honest headline
is bytes_listed: directory pruning removes ~19/20ths of the reachable
bytes at every scale, a fraction that is scale-INDEPENDENT — at 100 TB
it is the difference between scanning 5 TB and 100 TB before predicate
evaluation even starts.  The wall ratios here are the regression tell,
not the claim.
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
from omics_data_integration_utilities_spark.sources.layout import (  # noqa: E402
    read_table,
    write_clustered,
    write_partitioned,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _corpus(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(mult)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    return df.repartition(32), n * mult


def _timed_scan(spark, path: str, cut: int) -> tuple[float, int]:
    walls = []
    out = None
    for rep in range(4):  # 1 warm-up + 3 timed
        t0 = time.time()
        agg = (
            read_table(spark, path)
            .where((F.col("source") == "src7") & (F.col("doc_id") < cut))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        )
        rows = sorted(tuple(r) for r in agg.collect())
        if rep:
            walls.append(time.time() - t0)
        out = rows
    walls.sort()
    return walls[len(walls) // 2], hash(tuple(out))


def main() -> None:
    spark = get_spark("probe-layout16x")
    results = []
    for mult in (1, 4, 16):
        df, n_rows = _corpus(spark, mult)
        cut = n_rows // 2
        root = tempfile.mkdtemp(prefix=f"layout_probe_{mult}x_")
        flat, part, clus = (os.path.join(root, d) for d in ("flat", "part", "clus"))
        df.write.parquet(flat)
        write_partitioned(df, part, ["source"], cluster_by=["doc_id"])
        write_clustered(df, clus, ["doc_id"], num_files=max(4, mult * 2))

        flat_s, h_flat = _timed_scan(spark, flat, cut)
        part_s, h_part = _timed_scan(spark, part, cut)
        clus_s, h_clus = _timed_scan(spark, clus, cut)
        assert h_flat == h_part == h_clus, "layouts disagree on the answer"

        bytes_part_total = _du(part)
        bytes_part_listed = _du(os.path.join(part, "source=src7"))
        rec = {
            "mult": mult,
            "rows": n_rows,
            "flat_s": round(flat_s, 3),
            "part_s": round(part_s, 3),
            "clus_s": round(clus_s, 3),
            "flat_bytes_listed": _du(flat),
            "part_bytes_total": bytes_part_total,
            "part_bytes_listed": bytes_part_listed,
            "part_listed_frac": round(bytes_part_listed / bytes_part_total, 4),
            "clus_bytes_listed": _du(clus),
        }
        results.append(rec)
        print(json.dumps(rec))
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"probe": "layout16x", "sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
