"""ClusterOne-equivalent native clustering (SURVEY §2 K15, reference
``integrative_omics/wcModules.py:219-227``).

The reference shells out to the ClusterOne jar (``java -jar
cluster_one-1.0.jar edges.txt``) over the S10 edge-file sink.  This
module replaces the external binary with a native implementation of the
same published algorithm (Nepusz, Yu, Paccanaro 2012 — greedy
cohesiveness growth): Spark builds/aggregates the weighted edge list
distributed (exactly what the S10 sink feeds the jar), and the greedy
core runs driver-side on the collected edges — the same operating point
as the reference, where the jar is a single-node subprocess over a
post-filter graph.  Keep it that way at scale: filter first, cluster
the small residue.

Algorithm (deterministic, ties broken on the node key):

- cohesiveness ``f(V) = w_in / (w_in + w_bound + penalty·|V|)`` where
  ``w_in`` is total internal edge weight and ``w_bound`` the weight
  crossing the cluster boundary,
- seeds are vertices in decreasing weighted-degree order that are not
  yet in any cluster; each seed grows by the best single add-or-remove
  step until no step improves ``f``,
- overlapping clusters merge when the overlap score
  ``ω(A,B) = |A∩B|² / (|A|·|B|)`` reaches ``overlap_threshold``,
- clusters below ``min_size`` or below ``min_density`` are discarded
  (the jar's defaults discard size<3, density<0.5 complexes).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cohesiveness(w_in: float, w_bound: float, size: int, penalty: float) -> float:
    denom = w_in + w_bound + penalty * size
    return w_in / denom if denom > 0 else 0.0


def _grow(seed: str, adj: dict, penalty: float) -> frozenset:
    """Greedy best-step growth from one seed: at each step evaluate every
    adjacent external vertex (add) and every member (remove, never the
    seed); take the single step with the largest cohesiveness gain,
    node-key ties ascending; stop when no step improves.

    Candidate evaluation is INCREMENTAL — adding v moves ``w_v`` (v's
    weight into the cluster) from boundary to internal and contributes
    v's remaining degree to the boundary; removal is the mirror — so one
    candidate costs O(deg(v)) instead of an O(|V|·deg) full recount.
    The (w_in, w_bound) base is recounted from scratch after every
    APPLIED step, so float drift cannot accumulate across steps."""
    members = {seed}

    def stats(vset):
        w_in = 0.0
        w_bound = 0.0
        for u in vset:
            for v, w in adj[u].items():
                if v in vset:
                    w_in += w / 2.0  # each internal edge visited twice
                else:
                    w_bound += w
        return w_in, w_bound

    w_in, w_bound = stats(members)
    best_f = _cohesiveness(w_in, w_bound, len(members), penalty)
    while True:
        frontier = sorted(
            {v for u in members for v in adj[u] if v not in members}
        )
        candidates = [("add", v) for v in frontier] + [
            ("del", v) for v in sorted(members) if v != seed and len(members) > 1
        ]
        step_best = None
        for op, v in candidates:
            w_v = sum(w for u, w in adj[v].items() if u in members)
            ext_v = sum(adj[v].values()) - w_v
            if op == "add":
                f = _cohesiveness(
                    w_in + w_v, w_bound - w_v + ext_v, len(members) + 1, penalty
                )
            else:
                f = _cohesiveness(
                    w_in - w_v, w_bound - ext_v + w_v, len(members) - 1, penalty
                )
            if f > best_f + 1e-12 and (step_best is None or f > step_best[0] + 1e-12):
                step_best = (f, op, v)
        if step_best is None:
            return frozenset(members)
        best_f, op, v = step_best
        members = members | {v} if op == "add" else members - {v}
        w_in, w_bound = stats(members)


def _overlap(a: frozenset, b: frozenset) -> float:
    inter = len(a & b)
    return (inter * inter) / (len(a) * len(b))


def _grow_distributed(
    spark, adj: dict, seeds: list, penalty: float, n_blocks: int
) -> dict:
    """Seed-parallel growth: every seed grows in its own task against a
    broadcast adjacency (``_grow(seed)`` depends only on (seed, adj) —
    the sequential loop's ``clustered`` set decides only WHETHER a seed
    grows, never what it grows into, so growing all seeds up front and
    replaying the accept/skip decision driver-side reproduces the
    sequential output exactly).  Round-robin block assignment in
    degree-sorted order spreads the expensive high-degree seeds across
    blocks.  Some grows are wasted (their seed would have been skipped);
    that is the price of removing the driver-side CPU ceiling — the
    adjacency itself is one broadcast, the same memory the jar's
    single-node operating point needs."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(dict(adj))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        a = bc.value
        grown = [sorted(_grow(s, a, penalty)) for s in pdf["seed"]]
        return pd.DataFrame({"seed": pdf["seed"], "members": grown})

    sdf = spark.createDataFrame(
        [(i % n_blocks, s) for i, s in enumerate(seeds)],
        "block int, seed string",
    )
    rows = (
        sdf.repartition(n_blocks, "block")
        .groupBy("block")
        .applyInPandas(run, "seed string, members array<string>")
        .collect()
    )
    return {r["seed"]: frozenset(r["members"]) for r in rows}


def cluster_one(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    penalty: float = 2.0,
    overlap_threshold: float = 0.8,
    min_size: int = 3,
    min_density: float = 0.5,
    seed_parallel_threshold: int = 512,
) -> DataFrame:
    """Run the ClusterOne greedy over an undirected weighted edge list.

    Parallel/duplicate/self edges are aggregated distributed (undirected:
    (a,b) and (b,a) pool their weight) before the collect.  Returns one
    row per (cluster_id, member) with the cluster's size, density and
    cohesiveness; cluster_id is the rank by (-cohesiveness, members) so
    output is a pure function of the edge list.

    Dual strategy (the drivernet/rule-BFS pattern): graphs with at most
    ``seed_parallel_threshold`` seeds grow in the driver loop; larger
    graphs fan the per-seed growth out over executors against a
    broadcast adjacency (:func:`_grow_distributed` — provably the same
    output), leaving only the cheap accept/skip replay and overlap merge
    driver-side.
    """
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    adj: dict = defaultdict(dict)
    for r in und.collect():
        adj[r["a"]][r["b"]] = adj[r["a"]].get(r["b"], 0.0) + float(r["w"])
        adj[r["b"]][r["a"]] = adj[r["b"]].get(r["a"], 0.0) + float(r["w"])

    degree = {u: sum(nb.values()) for u, nb in adj.items()}
    seeds = sorted(degree, key=lambda u: (-degree[u], u))
    grown_map: dict = {}
    if len(seeds) > seed_parallel_threshold:
        n_blocks = max(2, spark.sparkContext.defaultParallelism)
        grown_map = _grow_distributed(spark, adj, seeds, penalty, n_blocks)
    clustered: set = set()
    raw: list[frozenset] = []
    for seed in seeds:
        if seed in clustered:
            continue
        grown = grown_map.get(seed)
        if grown is None:
            grown = _grow(seed, adj, penalty)
        raw.append(grown)
        clustered |= grown

    # merge overlapping clusters transitively (ω ≥ threshold)
    merged = [set(c) for c in raw]
    changed = True
    while changed:
        changed = False
        for i in range(len(merged)):
            if merged[i] is None:
                continue
            for j in range(i + 1, len(merged)):
                if merged[j] is None:
                    continue
                if _overlap(frozenset(merged[i]), frozenset(merged[j])) >= overlap_threshold:
                    merged[i] |= merged[j]
                    merged[j] = None
                    changed = True
    final = []
    for c in merged:
        if c is None or len(c) < min_size:
            continue
        vset = frozenset(c)
        w_in = sum(
            w for u in vset for v, w in adj[u].items() if v in vset
        ) / 2.0
        w_bound = sum(
            w for u in vset for v, w in adj[u].items() if v not in vset
        )
        n_in = sum(1 for u in vset for v in adj[u] if v in vset) // 2
        density = n_in / (len(vset) * (len(vset) - 1) / 2.0)
        if density < min_density:
            continue
        coh = _cohesiveness(w_in, w_bound, len(vset), penalty)
        final.append((round(coh, 6), sorted(vset), len(vset), round(density, 6)))
    final.sort(key=lambda t: (-t[0], t[1]))
    rows = [
        (cid, member, size, density, coh)
        for cid, (coh, members, size, density) in enumerate(final)
        for member in members
    ]
    return spark.createDataFrame(
        rows,
        "cluster_id long, member string, size long, density double, cohesiveness double",
    )
