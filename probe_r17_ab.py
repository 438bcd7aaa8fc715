"""R17 probe (VERDICT r16 item 1): settle the three r16 rewrites whose
plan deltas are verified but whose r16 local timings were load-poisoned
— source_overlap (set_overlap_matrix self-join → posting lists),
dedup_minhash_accuracy (shared signature materialization), and
sim_index_recall (single-pass recall certificate).

Method: the OLD implementation is inlined below (verbatim from
``git show e5f16de^``, adapted only to call today's building blocks
where those blocks themselves are unchanged), and OLD/NEW run
INTERLEAVED in one session (B A A B B A per scale) so ambient drift
hits both arms equally — the load-matched A/B the r16 verdict asked
for.  ``--mult 4`` / ``--mult 16`` amplify the inputs the way the
standing 16× probes do (probe_r12_dedup16x / probe_r13_annindex16x),
so the scale trend is measured, not argued.

Decision rule (verdict item 1): each rewrite must show >=1.0x at sf0.1
quiet AND a non-shrinking win at 16x, or be reverted.
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators import dedup as dedup_ops  # noqa: E402
from omics_data_integration_utilities_spark.operators.similarity import (  # noqa: E402
    ann_index_topk,
    ann_recall_certificate,
    build_ann_index,
)
from omics_data_integration_utilities_spark.plans.registry_docs import _SUBSTR_K  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---------------------------------------------------------------- old impls
def old_set_overlap_matrix(df, group_col, key_col):
    """Pre-e5f16de set_overlap_matrix: pair intersection via key self-join."""
    sd = df.select(
        F.col(group_col).alias("src"), F.col(key_col).alias("key")
    ).distinct()
    totals = sd.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        sd.alias("a")
        .join(sd.alias("b"), "key")
        .where(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(F.col("src").alias("src_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("src").alias("src_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(ta, "src_a")
        .join(tb, "src_b")
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_shared",
            F.round(
                F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")), 6
            ).alias("jaccard"),
        )
    )


def old_minhash_estimate_accuracy(df, text_col, id_col):
    """Pre-e5f16de accuracy report: signature chain computed twice (band
    keys inside lsh_candidate_pairs + a separate sigs relation)."""
    sigs = dedup_ops.with_minhash_signature(df, text_col, id_col)
    pairs = dedup_ops.lsh_candidate_pairs(df, text_col, id_col)
    exact = dedup_ops.ngram_jaccard_pairs(
        df, text_col, id_col, min_jaccard=0.0
    ).select("id_a", "id_b", "jaccard")
    n_perms = len(dedup_ops.MINHASH_PERMS)
    n_docs = df.count()

    def _sig_side(rel):
        return F.broadcast(rel) if n_docs <= 200_000 else rel.hint("shuffle_hash")

    est = (
        pairs.join(
            _sig_side(df_sel(sigs, id_col, "id_a", "__sa")), "id_a"
        )
        .join(_sig_side(df_sel(sigs, id_col, "id_b", "__sb")), "id_b")
        .select(
            "id_a", "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with(F.col("__sa"), F.col("__sb"), lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(n_perms))
            ).alias("est_jaccard"),
        )
    )
    return est.join(exact.hint("merge"), ["id_a", "id_b"], "left").select(
        "id_a", "id_b",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        F.coalesce(F.round("jaccard", 6), F.lit(0.0)).alias("jaccard"),
        F.round(
            F.abs(F.col("est_jaccard") - F.coalesce("jaccard", F.lit(0.0))), 6
        ).alias("abs_err"),
    )


def df_sel(sigs, id_col, id_alias, sig_alias):
    return sigs.select(F.col(id_col).alias(id_alias), F.col("__sig").alias(sig_alias))


def old_ann_recall_certificate(spark, queries, index, k=5, probe_settings=(1, 2, 4, 8)):
    """Pre-e5f16de certificate: one full ann_index_topk pass PER setting."""
    settings = sorted({int(p) for p in probe_settings} | {index.n_lists})
    exact = (
        ann_index_topk(spark, queries, index, k=k, n_probes=index.n_lists)
        .select("query_id", "cand_id")
        .localCheckpoint()
    )
    certs = []
    for p in settings:
        approx = (
            exact
            if p == index.n_lists
            else ann_index_topk(spark, queries, index, k=k, n_probes=p)
        )
        per_q = (
            exact.join(
                approx.select("query_id", "cand_id", F.lit(1).alias("__hit")),
                ["query_id", "cand_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("n_exact"),
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
            )
        )
        certs.append(
            per_q.agg(
                F.count(F.lit(1)).alias("n_queries"),
                F.sum("n_exact").alias("n_exact"),
                F.sum("n_hit").alias("n_hit"),
                F.round(F.sum("n_hit") / F.sum("n_exact"), 6).alias("recall"),
                F.round(F.min(F.col("n_hit") / F.col("n_exact")), 6).alias("min_recall"),
            ).select(F.lit(p).cast("long").alias("n_probes"), "*")
        )
    out = certs[0]
    for c in certs[1:]:
        out = out.unionByName(c)
    return out


# ------------------------------------------------------------------ harness
def _cal(spark):
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "pmod(xxhash64(id), 97) as b", "id"
    ).groupBy("b").agg({"id": "sum"}).count()
    return time.perf_counter() - t0


def ab(name, make_old, make_new, reps=3):
    """Interleaved A/B: warm both arms once, then alternate B A A B B A."""
    make_new().count()  # warm new
    make_old().count()  # warm old
    ts = {"old": [], "new": []}
    order = (["new", "old", "old", "new", "new", "old"] * reps)[: 2 * reps]
    for arm in order:
        fn = make_old if arm == "old" else make_new
        t0 = time.perf_counter()
        fn().count()
        ts[arm].append(time.perf_counter() - t0)
    o, n = ts["old"], ts["new"]
    print(
        f"{name}: old min {min(o):.3f} med {statistics.median(o):.3f} "
        f"{[round(t,2) for t in o]} | new min {min(n):.3f} med "
        f"{statistics.median(n):.3f} {[round(t,2) for t in n]} | "
        f"speedup(min) {min(o)/min(n):.2f}x loadavg={os.getloadavg()[0]:.1f}",
        flush=True,
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mult", type=int, default=1, help="input amplification (1/4/16)")
    p.add_argument("--reps", type=int, default=3, help="timed reps per arm")
    p.add_argument(
        "--which", nargs="+", default=["overlap", "minhash", "recall"],
        choices=["overlap", "minhash", "recall"],
    )
    p.add_argument(
        "--linear", action="store_true",
        help="minhash: perturb texts per copy (linear pair growth)",
    )
    args = p.parse_args()
    mult = args.mult
    spark = get_spark("probe-r17-ab")
    print(f"calibration: {_cal(spark):.3f}s loadavg={os.getloadavg()[0]:.1f}", flush=True)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    if "overlap" in args.which:
        # q_source_overlap's exact input, keys amplified x mult by suffixing
        # the gram digest per copy (distinct (src, key) grows linearly; the
        # group count — the posting-list bound — stays fixed)
        grams = dedup_ops.with_token_grams(docs, "text", "doc_id", _SUBSTR_K)
        keyed = grams.join(docs.select("doc_id", "source"), "doc_id").select("source", "g")
        if mult > 1:
            keyed = keyed.select(
                "source",
                F.explode(
                    F.array(*[F.concat(F.col("g"), F.lit(str(i))) for i in range(mult)])
                ).alias("g"),
            )
        keyed = keyed.localCheckpoint()
        ab(
            f"source_overlap x{mult}",
            lambda: old_set_overlap_matrix(keyed, "source", "g"),
            lambda: dedup_ops.set_overlap_matrix(keyed, "source", "g"),
            reps=args.reps,
        )

    if "minhash" in args.which:
        # two amplification shapes: the r12 worst case (texts unchanged —
        # candidate pairs grow ~C(mult,2) per doc, stressing the join
        # legs) and --linear (texts perturbed per copy — pair count grows
        # ~linearly, so the per-doc signature-chain cost the r16 rewrite
        # removed dominates the delta instead of being drowned by pairs)
        n = docs.count()
        amp = docs.select("doc_id", "text")
        for i in range(1, mult):
            copy = docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                # --linear: suffix EVERY token per copy, so copies share
                # no shingle (pair count grows ~linearly with mult)
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(str(i))),
                    ),
                ).alias("text")
                if args.linear
                else F.col("text"),
            )
            amp = amp.unionByName(copy)
        amp = amp.localCheckpoint()
        ab(
            f"minhash_accuracy x{mult}",
            lambda: old_minhash_estimate_accuracy(amp, "text", "doc_id"),
            lambda: dedup_ops.minhash_estimate_accuracy(amp, "text", "doc_id"),
            reps=args.reps,
        )

    if "recall" in args.which:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        parts = [emb]
        for i in range(1, mult):
            shift = float(i) * 0.001
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                    F.transform(
                        "embedding", lambda x: x.cast("double") + F.lit(shift)
                    ).alias("embedding"),
                )
            )
        corpus = parts[0]
        for q in parts[1:]:
            corpus = corpus.unionByName(q)
        corpus = corpus.repartition(32).localCheckpoint()
        queries = emb.where(F.col("vec_id") % 10 == 0).localCheckpoint()
        path = tempfile.mkdtemp(prefix=f"r17ab_ann_{mult}x_")
        idx = build_ann_index(corpus, "embedding", "vec_id", f"r17ab_{mult}x", path, n_lists=16)
        ab(
            f"sim_index_recall x{mult}",
            lambda: old_ann_recall_certificate(spark, queries, idx),
            lambda: ann_recall_certificate(spark, queries, idx),
            reps=args.reps,
        )
        import shutil

        spark.sql(f"DROP TABLE IF EXISTS {idx.lists_table}")
        shutil.rmtree(path, ignore_errors=True)

    print(f"calibration(end): {_cal(spark):.3f}s loadavg={os.getloadavg()[0]:.1f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
