"""Graph DAG-ification (SURVEY §2 K14, reference ``gizmos.py:567-630``).

The reference loads a (small, post-filter) edge list into networkx,
removes 2-cycles then all simple cycles by deleting the lowest-support
edge of each.  Spark keeps the edge *construction* distributed (joins and
aggregations produce the weighted edge list); the cycle-break itself runs
driver-side on the collected edges — pure Python (no networkx dependency),
deterministic: repeatedly find a cycle by DFS and delete its
lowest-weight edge (ties broken lexicographically).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame


def _find_cycle(adj: dict, nodes: list):
    """DFS for any cycle; returns the cycle's edge list or None.

    Deterministic: nodes and neighbors visited in sorted order.
    """
    WHITE, GRAY, BLACK = 0, 1, 2
    color = defaultdict(int)
    parent: dict = {}
    for start in nodes:
        if color[start] != WHITE:
            continue
        stack = [(start, iter(sorted(adj.get(start, ()))))]
        color[start] = GRAY
        while stack:
            node, it = stack[-1]
            advanced = False
            for nxt in it:
                if color[nxt] == GRAY:
                    cycle = [(node, nxt)]
                    cur = node
                    while cur != nxt:
                        cycle.append((parent[cur], cur))
                        cur = parent[cur]
                    return cycle
                if color[nxt] == WHITE:
                    color[nxt] = GRAY
                    parent[nxt] = node
                    stack.append((nxt, iter(sorted(adj.get(nxt, ())))))
                    advanced = True
                    break
            if not advanced:
                color[node] = BLACK
                stack.pop()
    return None


def break_cycles(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Return the acyclic subset of ``edges`` as a DataFrame.

    Collects the edge list (the reference's post-filter graphs are small —
    gizmos.py applies correlation cutoffs first; keep it that way at
    scale: filter THEN dagify).
    """
    spark = edges.sparkSession
    rows = edges.select(src_col, dst_col, weight_col).collect()
    kept = {(r[0], r[1]): r[2] for r in rows}

    def rebuild_adj():
        adj: dict = defaultdict(set)
        for (s, d) in kept:
            adj[s].add(d)
        return adj

    adj = rebuild_adj()
    nodes = sorted({n for e in kept for n in e})
    while True:
        cycle = _find_cycle(adj, nodes)
        if cycle is None:
            break
        victim = min(cycle, key=lambda e: (kept[e], e))
        del kept[victim]
        adj = rebuild_adj()
    out = [(s, d, w) for (s, d), w in sorted(kept.items())]
    return spark.createDataFrame(
        out, f"{src_col} string, {dst_col} string, {weight_col} long"
    )
