"""R14 probe: bucketed vs full-rewrite upsert snapshot under snapshot
growth (1x/4x/16x base corpus) with a FIXED small batch — the r13
verdict item 2 acceptance: per-batch rewrite cost must track the
TOUCHED-BUCKET data, not the snapshot size.

Setup per scale S: seed a snapshot with S x 60k documents-derived rows
(key = doc_id copy-salted, value = n_chars), then commit a fixed
100-row batch (touching ~a handful of the 64 buckets) into

  full     -- upsert_batch_into_snapshot       (rewrites everything)
  bucketed -- upsert_batch_into_bucketed_snapshot (rewrites touched
              buckets only; n_buckets=64)

Reported per scale: seed rows, touched buckets, median commit wall of
3 reps (each rep a fresh batch_id so every commit does real work), and
bytes written by the commit (the new version dir's on-disk size) --
the filesystem-visible, scheduler-noise-free form of the claim.

Measured shape (committed run, loadavg-quiet): full writes the whole
snapshot every commit (581 KB -> 8.4 MB across 1x/4x/16x); bucketed
writes touched_buckets/64 of it (~25x less at every scale, vs the 32x
ideal for 2/64 -- the gap is per-file parquet overhead), i.e. bytes
track TOUCHED-BUCKET data exactly.  Single-box commit walls at MB
scale are scheduler noise (all ~0.4-0.8 s); as with the layout probe,
bytes_written is the honest headline and the wall is the regression
tell.  At a real 100 TB snapshot the bytes ARE the wall.
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
    read_snapshot,
    upsert_batch_into_bucketed_snapshot,
    upsert_batch_into_snapshot,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 64


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    spark = get_spark("probe-bucketed-upsert")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars", "text"
    )
    base_n = docs.count()
    out = {"sf_dir": SF_DIR, "n_buckets": N_BUCKETS, "scales": []}
    for mult in (1, 4, 16):
        seed = (
            docs.withColumn("__copy", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .select(
                (F.col("doc_id") + F.col("__copy") * F.lit(10_000_000)).alias("k"),
                F.col("n_chars").cast("double").alias("v"),
                "text",
            )
        )
        # the batch is CONFINED to 2 of the 64 buckets (the claim under
        # test is touched-bucket-proportional cost; a batch of uniform
        # random keys would touch ~all buckets by coupon collecting)
        batch = (
            docs.select(
                F.col("doc_id").alias("k"),
                F.lit(-1.0).alias("v"),
                "text",
            )
            .where(F.pmod(F.xxhash64(F.col("k")), F.lit(N_BUCKETS)).isin(0, 1))
            .limit(100)
            .localCheckpoint()
        )
        touched = (
            batch.select(
                F.pmod(F.xxhash64(F.col("k")), F.lit(N_BUCKETS)).alias("b")
            )
            .distinct()
            .count()
        )
        root = tempfile.mkdtemp(prefix="probe_upsert16x_")
        rec = {
            "mult": mult,
            "seed_rows": base_n * mult,
            "batch_rows": batch.count(),
            "touched_buckets": touched,
        }
        try:
            for kind, commit, reader in (
                ("full", upsert_batch_into_snapshot, read_snapshot),
                ("bucketed", upsert_batch_into_bucketed_snapshot, read_bucketed_snapshot),
            ):
                snap = os.path.join(root, kind)
                kw = {"n_buckets": N_BUCKETS} if kind == "bucketed" else {}
                commit(spark, seed, snap, ["k"], batch_id=0, keep_versions=2, **kw)
                walls, wrote = [], []
                for rep in range(1, 4):
                    before = {n for n in os.listdir(snap) if n.startswith("v")}
                    t0 = time.monotonic()
                    commit(spark, batch, snap, ["k"], batch_id=rep, keep_versions=2, **kw)
                    walls.append(round(time.monotonic() - t0, 3))
                    new_dirs = [
                        n for n in os.listdir(snap)
                        if n.startswith("v") and n not in before
                    ]
                    wrote.append(sum(_du(os.path.join(snap, n)) for n in new_dirs))
                n_rows = reader(spark, snap).count()
                rec[kind] = {
                    "commit_s": sorted(walls)[1],
                    "commit_s_all": walls,
                    "bytes_written": wrote[-1],
                    "rows_after": n_rows,
                }
            if mult == 1:
                # sanity: same final state both layouts
                a = read_snapshot(spark, os.path.join(root, "full"))
                b = read_bucketed_snapshot(spark, os.path.join(root, "bucketed"))
                assert sorted(map(tuple, a.select("k", "v").collect())) == sorted(
                    map(tuple, b.select("k", "v").collect())
                ), "parity violation"
                rec["parity"] = "ok"
        finally:
            shutil.rmtree(root, ignore_errors=True)
        f, bkt = rec["full"], rec["bucketed"]
        rec["bytes_ratio_full_over_bucketed"] = round(
            f["bytes_written"] / max(1, bkt["bytes_written"]), 2
        )
        rec["wall_ratio_full_over_bucketed"] = round(
            f["commit_s"] / max(1e-9, bkt["commit_s"]), 2
        )
        out["scales"].append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
