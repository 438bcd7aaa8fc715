"""R13 probe (r12 verdict item 7): persisted dedup-index lifecycle under
corpus pressure (up to 64×) — build-from-raw vs blue-green extension
cost curve.

``extend_dedup_index`` documents its cost as O(index + batch), never
O(corpus): the old generation is read back as its two bucketed
PROJECTIONS (digest set, band-key counts) and the corpus TEXT is never
rescanned — at 100 TB the raw text dwarfs the projections by orders of
magnitude, so this is the difference between a nightly index refresh
that re-shingles the corpus and one that folds a batch in.

The probe scales the kept corpus 1×/4×/16×/64× (sf0.1 documents, per-copy
salted text so every doc is distinct) and at each scale measures:

  build_s     — build_dedup_index over the full raw corpus (what a
                naive nightly rebuild pays),
  extend_s    — extend_dedup_index folding a FIXED 500-doc batch into
                the existing generation (what blue-green pays),
  probe_s     — incremental_dedup_verdicts_indexed of a 500-doc probe
                batch against the extended generation (steady state),

and asserts the extended generation's verdicts equal a from-scratch
build over corpus+batch (extension == rebuild, now at every scale, not
just test scale).  The single-box claim to verify: build_s grows
~linearly with the corpus while extend_s grows far slower (it reads
projections, not text — at these scales mostly fixed DDL/write cost),
so the build/extend ratio widens with scale.
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
from omics_data_integration_utilities_spark.operators.dedup import (  # noqa: E402
    attach_dedup_index,
    build_dedup_index,
    extend_dedup_index,
    incremental_dedup_verdicts_indexed,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_N = 500


def scaled_corpus(spark, mult: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.lit(f"c{i}x "), F.col("text")).alias("text"),
        )
        for i in range(mult)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    spark = get_spark("probe-r13-indexlifecycle")
    root = tempfile.mkdtemp(prefix="omics_idxprobe_")
    base_batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(BATCH_N)
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
            F.concat(F.lit("batch "), F.col("text")).alias("text"),
        )
        .localCheckpoint()
    )
    probe_batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(BATCH_N)
        .select(
            (F.col("doc_id") + F.lit(950_000_000)).alias("doc_id"),
            # half the probe batch exactly duplicates batch docs, half is novel
            F.when(
                F.col("doc_id") % 2 == 0, F.concat(F.lit("batch "), F.col("text"))
            )
            .otherwise(F.concat(F.lit("novel "), F.col("text")))
            .alias("text"),
        )
        .localCheckpoint()
    )
    rows = []
    for mult in (1, 4, 16, 64):
        corpus = scaled_corpus(spark, mult).localCheckpoint()
        n_docs = corpus.count()

        t0 = time.time()
        gen0 = build_dedup_index(
            corpus, "text", "doc_id", f"probe13_g0_m{mult}",
            os.path.join(root, f"g0_m{mult}"), n_buckets=16,
        )
        build_s = time.time() - t0

        t0 = time.time()
        gen1 = extend_dedup_index(
            gen0, base_batch, "text", "doc_id", f"probe13_g1_m{mult}",
            os.path.join(root, f"g1_m{mult}"),
        )
        extend_s = time.time() - t0

        t0 = time.time()
        verdicts_ext = {
            r["doc_id"]: r["verdict"]
            for r in incremental_dedup_verdicts_indexed(
                probe_batch, gen1, "text", "doc_id"
            ).collect()
        }
        probe_s = time.time() - t0

        # extension == rebuild at THIS scale: a from-scratch index over
        # corpus+batch must give the probe batch identical verdicts
        rebuilt = build_dedup_index(
            corpus.unionByName(base_batch), "text", "doc_id",
            f"probe13_rb_m{mult}", os.path.join(root, f"rb_m{mult}"),
            n_buckets=16,
        )
        verdicts_rb = {
            r["doc_id"]: r["verdict"]
            for r in incremental_dedup_verdicts_indexed(
                probe_batch, rebuilt, "text", "doc_id"
            ).collect()
        }
        assert verdicts_ext == verdicts_rb, (
            f"extension != rebuild at {mult}x: "
            f"{ {k: (verdicts_ext[k], verdicts_rb[k]) for k in verdicts_ext if verdicts_ext[k] != verdicts_rb[k]} }"
        )
        n_exact = sum(1 for v in verdicts_ext.values() if v == "exact_ref")
        rows.append(
            {
                "mult": mult,
                "n_docs": n_docs,
                "build_s": round(build_s, 2),
                "extend_s": round(extend_s, 2),
                "probe_s": round(probe_s, 2),
                "build_over_extend": round(build_s / extend_s, 2),
                "probe_exact_refs": n_exact,
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"probe": "r13_indexlifecycle16x", "rows": rows}))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
