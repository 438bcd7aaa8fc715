"""R13 probe: the hot-key detector feeding the salting decision, end to
end — SCALE.md has claimed since r12 that ``sketches.frequent_items``
doubles as the skew detector for ``operators.skew.salted_join``; this
probe composes them on a genuinely skewed join and MEASURES the claim
(the registered ``events_salted_join`` query proves the composition's
semantics against the plain-join oracle; this measures the speedup).

Shape: a fact table where ONE key owns 35% of all rows joins a dim too
large to broadcast (auto-broadcast disabled, AQE off — the regime the
explicit pattern exists for: AQE's skew-join splitting can't help when
the skewed exchange feeds an aggregation or pre-partitioned state, and
a 1000-executor sort-merge join with one hot key leaves 999 executors
idle behind the straggler).  Pipeline under test:

  1. DETECT — frequent_items(fact, key): capacity-bounded MG sketch, so
     finding the hot keys never pays the skewed full-cardinality
     shuffle it exists to avoid.  Assert the planted hot key is found.
  2. ROUTE — rows with detected-hot keys through salted_join (hot side
     salted over n_salts, dim side replicated), the cold remainder
     through the plain join; union, aggregate.
  3. Assert the routed result EQUALS the plain join's aggregate.

Headline: wall(plain SMJ) / wall(detect + routed salted join) > 1, and
the plain join's max-task straggler (REST API max task duration over
the join stages) collapses in the salted plan.  Single-box walls
UNDERSTATE the cluster win: here the straggler only wastes 31/32 local
threads for its duration; at 1000 executors it wastes 999 for the same
duration while everything else scales down.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.sketches import (  # noqa: E402
    frequent_items,
)
from omics_data_integration_utilities_spark.operators.skew import (  # noqa: E402
    salted_join,
)

N_FACT = 6_000_000
N_DIM = 400_000
HOT_KEY = 424242
HOT_PCT = 35  # the hot key owns 35% of fact rows
N_SALTS = 32


def max_task_ms(spark, since_stage: int) -> tuple[int, int]:
    """(max stage wall ms, newest stage id) over stages completed after
    ``since_stage`` — the straggler signature of a skewed join."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    newest = max((s["stageId"] for s in stages), default=since_stage)
    walls = []
    for s in stages:
        if s["stageId"] <= since_stage:
            continue
        try:
            t0 = s["firstTaskLaunchedTime"]
            t1 = s["completionTime"]
        except KeyError:
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        walls.append(
            (datetime.strptime(t1, fmt) - datetime.strptime(t0, fmt)).total_seconds()
            * 1000
        )
    return int(max(walls) if walls else 0), newest


def newest_stage(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return max((s["stageId"] for s in stages), default=-1)


def main() -> None:
    spark = get_spark(
        "probe-r13-saltedjoin", extra_conf={"spark.ui.enabled": "true"}
    )
    # the regime the explicit pattern targets: no broadcast escape hatch,
    # no AQE runtime skew splitting
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    fact = (
        spark.range(N_FACT)
        .select(
            F.when(
                F.pmod(F.col("id"), F.lit(100)) < F.lit(HOT_PCT), F.lit(HOT_KEY)
            )
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_DIM)))
            .cast("long")
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .localCheckpoint()  # freeze the input so both plans scan the same data
    )
    dim = (
        spark.range(N_DIM)
        .select(F.col("id").alias("k"), F.xxhash64("id").alias("payload"))
        .localCheckpoint()
    )

    def agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") + F.col("payload")).alias("s"),
        )

    results = {}

    # 1a. DETECT via the capacity-bounded sketch on the FULL fact —
    # exact counts + certificate, the form you want when the hot set
    # feeds a cost model rather than a yes/no routing decision
    t0 = time.time()
    hot_df = frequent_items(fact, "k", k=5, capacity=4096, count_col="n")
    hot_rows = hot_df.collect()
    detect_exact_s = time.time() - t0
    hot = [r["k"] for r in hot_rows if r["n"] > N_FACT // 100]  # >1% = hot
    assert HOT_KEY in hot, f"detector missed the planted hot key: {hot_rows}"

    # 1b. DETECT on a 2% sample — for ROUTING, exactness is overkill: a
    # key owning >=1% of rows appears ~1200+ times in a 120k-row sample
    # (Chernoff: miss probability astronomically small), so the sampled
    # sketch finds every salting-relevant key at ~2% of the scan cost.
    # This is the form a query planner would run.
    t0 = time.time()
    sampled_rows = frequent_items(
        fact.sample(fraction=0.02, seed=13), "k", k=5, capacity=4096,
        count_col="n",
    ).collect()
    detect_sampled_s = time.time() - t0
    hot_sampled = [
        r["k"] for r in sampled_rows if r["n"] > int(N_FACT * 0.02) // 100
    ]
    assert HOT_KEY in hot_sampled, f"sampled detector missed: {sampled_rows}"

    # 2. plain sort-merge join (the straggler plan)
    s0 = newest_stage(spark)
    t0 = time.time()
    plain = agg(fact.join(dim, "k")).collect()[0]
    plain_s = time.time() - t0
    plain_straggler_ms, s1 = max_task_ms(spark, s0)

    # 2b. the obvious question — "why not just AQE?": same plain join
    # with AQE + its skew-join splitting ON.  AQE CAN split a skewed
    # sort-merge join's partitions at runtime (and does, below), which
    # is why the session default keeps it on; the explicit detect→route
    # pattern exists for the shapes AQE cannot rewrite — a skewed
    # exchange feeding an AGGREGATION or stateful operator, or a join
    # AQE won't touch because the skew reader can't apply (e.g. under
    # required distributions).  Reported side-by-side so the trade is
    # measured, not asserted.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t0 = time.time()
    plain_aqe = agg(fact.join(dim, "k")).collect()[0]
    plain_aqe_s = time.time() - t0
    s1 = newest_stage(spark)
    assert plain_aqe["n"] == plain["n"]
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # 3. detect-routed salted join
    t0 = time.time()
    hot_rows_df = fact.where(F.col("k").isin(hot))
    cold_rows_df = fact.where(~F.col("k").isin(hot))
    routed = salted_join(
        hot_rows_df, dim, ["k"], n_salts=N_SALTS, salt_source=["v"]
    ).unionByName(cold_rows_df.join(dim, "k"))
    salted = agg(routed).collect()[0]
    salted_s = time.time() - t0
    salted_straggler_ms, _ = max_task_ms(spark, s1)

    assert plain["n"] == salted["n"], (plain, salted)
    assert abs(plain["s"] - salted["s"]) <= 1e-6 * abs(plain["s"])

    results = {
        "probe": "r13_saltedjoin",
        "n_fact": N_FACT,
        "n_dim": N_DIM,
        "hot_pct": HOT_PCT,
        "n_salts": N_SALTS,
        "detect_exact_s": round(detect_exact_s, 2),
        "detect_sampled_s": round(detect_sampled_s, 2),
        "detected_hot": sorted(hot),
        "detected_hot_sampled": sorted(hot_sampled),
        "plain_join_s": round(plain_s, 2),
        "plain_join_aqe_s": round(plain_aqe_s, 2),
        "salted_join_s": round(salted_s, 2),
        "plain_straggler_stage_ms": plain_straggler_ms,
        "salted_straggler_stage_ms": salted_straggler_ms,
        "speedup_incl_sampled_detection": round(
            plain_s / (detect_sampled_s + salted_s), 2
        ),
        "speedup_join_only": round(plain_s / salted_s, 2),
        "rows_joined": plain["n"],
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
