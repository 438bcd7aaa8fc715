"""R15 probe: the re-bucket/compaction maintenance commit
(`rebucket_bucketed_snapshot`) under snapshot growth — verifying the
two claims its docstring makes:

1. cost is O(snapshot) BY DESIGN: bytes written per maintenance commit
   track the snapshot's own size linearly across 1x/4x/16x seeds (the
   wall is single-box scheduler noise at MB scale, as with every
   snapshot probe; bytes are the honest headline);
2. at the same modulus it is a COMPACTION: after a fragmenting commit
   history, CURRENT's bucket map references several version dirs; one
   maintenance commit collapses them to exactly one, with row-for-row
   fidelity.

Setup per scale S (sf documents x mult, n_buckets=16): seed, then 6
small commits each confined to a couple of buckets (fragmenting the
map across version dirs), then rebucket at the same modulus
(compaction) and once more to n_buckets=64 (resize).  Reported per
scale: snapshot bytes, fragmented version-dir count, compaction bytes
written / wall / resulting dir count, resize bytes written / wall /
resulting bucket count, and a read-back row-count fidelity check.
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
from omics_data_integration_utilities_spark.streaming.sinks import (  # noqa: E402
    read_bucketed_snapshot,
    rebucket_bucketed_snapshot,
    upsert_batch_into_bucketed_snapshot,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 16


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _referenced_dirs(snap: str) -> "set[str]":
    with open(os.path.join(snap, open(os.path.join(snap, "CURRENT")).read().strip())) as f:
        man = json.load(f)
    return {p.split("/", 1)[0] for p in man["buckets"].values()}


def main() -> None:
    spark = get_spark("probe-rebucket")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars", "text"
    )
    base_n = docs.count()
    out = {"sf_dir": SF_DIR, "n_buckets": N_BUCKETS, "scales": []}
    for mult in (1, 4, 16):
        seed = (
            docs.withColumn(
                "__copy", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            .select(
                (F.col("doc_id") + F.col("__copy") * F.lit(10_000_000)).alias("k"),
                F.col("n_chars").cast("double").alias("v"),
                "text",
            )
        )
        snap = tempfile.mkdtemp(prefix="probe_rebucket16x_")
        rec = {"mult": mult, "seed_rows": base_n * mult}
        try:
            upsert_batch_into_bucketed_snapshot(
                spark, seed, snap, ["k"], batch_id=0, n_buckets=N_BUCKETS
            )
            rec["snapshot_bytes"] = sum(
                _du(os.path.join(snap, n))
                for n in os.listdir(snap)
                if n.startswith("v") and os.path.isdir(os.path.join(snap, n))
            )
            # fragment: 6 small commits, each confined to 2 buckets
            for i in range(1, 7):
                b0 = (2 * i) % N_BUCKETS
                batch = (
                    docs.where(
                        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_BUCKETS)).isin(
                            b0, (b0 + 1) % N_BUCKETS
                        )
                    )
                    .limit(50)
                    .select(
                        F.col("doc_id").alias("k"),
                        F.lit(-1.0).alias("v"),
                        "text",
                    )
                    .localCheckpoint()
                )
                upsert_batch_into_bucketed_snapshot(
                    spark, batch, snap, ["k"], batch_id=i, n_buckets=N_BUCKETS
                )
            rec["fragmented_dirs"] = len(_referenced_dirs(snap))
            rows_before = read_bucketed_snapshot(spark, snap).count()

            def measured(batch_id, new_n):
                before = {n for n in os.listdir(snap) if n.startswith("v")}
                t0 = time.monotonic()
                rebucket_bucketed_snapshot(
                    spark, snap, ["k"], batch_id=batch_id, new_n_buckets=new_n
                )
                wall = round(time.monotonic() - t0, 3)
                new_dirs = [
                    n for n in os.listdir(snap)
                    if n.startswith("v") and n not in before
                ]
                return wall, sum(_du(os.path.join(snap, n)) for n in new_dirs)

            w, b = measured(7, N_BUCKETS)  # compaction (same modulus)
            rec["compaction"] = {
                "wall_s": w,
                "bytes_written": b,
                "dirs_after": len(_referenced_dirs(snap)),
                "bytes_over_snapshot": round(b / max(1, rec["snapshot_bytes"]), 3),
            }
            w, b = measured(8, 64)  # resize 16 -> 64
            rec["resize_to_64"] = {
                "wall_s": w,
                "bytes_written": b,
                "buckets_after": len(
                    json.load(
                        open(os.path.join(snap, "m000000000008.json"))
                    )["buckets"]
                ),
                "bytes_over_snapshot": round(b / max(1, rec["snapshot_bytes"]), 3),
            }
            rec["rows_fidelity"] = (
                read_bucketed_snapshot(spark, snap).count() == rows_before
            )
        finally:
            shutil.rmtree(snap, ignore_errors=True)
        out["scales"].append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
