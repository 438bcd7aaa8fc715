"""R13 probe: contamination_report under its documented worst case —
SHARED BOILERPLATE on both sides of the train/test split.

The operator's pair fan-out per gram is |train docs carrying it| ×
|test docs carrying it| (inherent in the exact semantics: every
(test, train) pair sharing the gram IS attribution evidence).  A
boilerplate gram present in p% of BOTH sides therefore grows the pair
stage quadratically with corpus scale while everything else grows
linearly — the regime the docstring tells users to cap with
hot-gram filtering when approximate attribution is acceptable.

The probe injects a 6-token boilerplate phrase into ~10% of documents
(both sides inherit it through the 1-in-20 split), scales the corpus
1×/4×/16× (per-copy salted text so non-boilerplate grams stay unique),
and at each scale measures:

  pair_rows — the (test, train) pair-stage cardinality (the quantity
              the fan-out argument is about),
  wall_s    — end-to-end report wall,
  capped_s  — the same report with the boilerplate grams REMOVED
              upstream via the hot_posting_keys audit + an anti-join
              (what a user caps when exact attribution through
              boilerplate isn't wanted),
  under_attributed — test docs whose n_train_docs shrank under the cap
              (the price of capping, REPORTED not silent).

Claim verified: wall tracks pair_rows (quadratic in the boilerplate
cohort), the capped variant returns to ~linear, and capping changes
only boilerplate-driven attributions.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.text import (  # noqa: E402
    contamination_report,
    tokens_col,
    word_ngrams_col,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOILER = "standard legal disclaimer applies to this document"
N = 3


def corpus(spark, mult: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = []
    for i in range(mult):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.lit(f"c{i}x "), F.col("text")).alias("text"),
        )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    # ~10% of docs get the boilerplate APPENDED (unsalted: shared across
    # copies and across the train/test split)
    return out.select(
        "doc_id",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0,
            F.concat(F.col("text"), F.lit(" " + BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint()


def main() -> None:
    spark = get_spark("probe-r13-contamination")
    rows = []
    for mult in (1, 4, 16):
        docs = corpus(spark, mult)
        test = docs.where(F.col("doc_id") % 20 == 0).localCheckpoint()
        train = docs.where(F.col("doc_id") % 20 != 0).localCheckpoint()

        # pair-stage cardinality: distinct (test, train) sharing a gram
        grams = lambda d, out: d.select(  # noqa: E731
            F.col("doc_id").alias(out),
            F.explode(
                F.array_distinct(word_ngrams_col(tokens_col("text"), N))
            ).alias("g"),
        )
        pair_rows = (
            grams(train, "tid").join(grams(test, "qid"), "g")
            .groupBy("qid", "tid").count().count()
        )

        t0 = time.time()
        full = {
            r["test_id"]: r["n_train_docs"]
            for r in contamination_report(train, test, "text", "doc_id", n=N).collect()
        }
        wall = time.time() - t0

        # capped comparator: drop grams carried by too many TRAIN docs
        # (the boilerplate) before attribution
        cap = max(50, int(train.count() * 0.02))
        t0 = time.time()
        hot = (
            grams(train, "tid").groupBy("g").count()
            .where(F.col("count") > cap).select("g")
        )
        tr_capped = grams(train, "tid").join(hot, "g", "left_anti")
        te_g = grams(test, "qid")
        pair = (
            tr_capped.join(te_g, "g").groupBy("qid", "tid")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        capped = {
            r["qid"]: r["n"]
            for r in pair.groupBy("qid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        capped_s = time.time() - t0
        under = sum(
            1 for k, v in full.items() if capped.get(k, 0) < v
        )
        rows.append(
            {
                "mult": mult,
                "n_docs": docs.count(),
                "pair_rows": pair_rows,
                "wall_s": round(wall, 2),
                "capped_s": round(capped_s, 2),
                "under_attributed_test_docs": under,
                "n_test_docs": test.count(),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"probe": "r13_contamination16x", "rows": rows}))


if __name__ == "__main__":
    main()
