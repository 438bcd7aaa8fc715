"""Distributed table profiler — the "what is in this dataset" first
pass every large-scale curation pipeline runs before any other stage
(schema drift detection, null audits, cardinality estimates for join
planning, min/max ranges for layout/pruning decisions).

The reference repo has no profiler; this is part of the additive
LLM-data-pipeline surface.  Design targets the 100 TB shape:

- **One aggregation pass** over the table, all JVM-side expressions
  (count / min / max / distinct), no Python in the hot path.  The wide
  single-row aggregate is then unpivoted driver-cheaply with ``stack``
  — the unpivot runs on ONE row, so its cost is zero regardless of
  table size.
- **Exact vs approx distinct counts are an explicit caller choice.**
  ``approx=False`` uses ``count(DISTINCT c)`` per column: Spark plans
  one ``Expand`` (a |cols|× row multiplication before the partial
  aggregate) — exact, and fine while |cols| is small, but the expand
  factor is a real cost at 100 TB.  ``approx=True`` switches to
  HyperLogLog++ (``approx_count_distinct``): a single pass, no Expand,
  fixed sketch memory per column — the scale path.  The two are
  property-tested against each other within the configured rsd.
- min/max are computed in the column's NATIVE type (so numeric columns
  get numeric ordering) and only then rendered to string for the
  uniform report schema.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "profile_table",
    "profile_numeric",
    "profile_sketches",
    "merge_profile_sketches",
    "estimate_profile",
]

#: report schema, in order
_REPORT_COLS = (
    "col_name",
    "n_rows",
    "n_nonnull",
    "n_nulls",
    "null_frac",
    "n_distinct",
    "min_value",
    "max_value",
)


def _min_max(c: str) -> tuple[Column, Column]:
    # native-type ordering first, string rendering second — a BIGINT
    # column must report min=9 / max=100, not the lexicographic
    # min="100" / max="9" that casting before aggregating would give
    return (
        F.min(F.col(c)).cast("string"),
        F.max(F.col(c)).cast("string"),
    )


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` of ``df`` (default: all) into one row per
    column: ``(col_name, n_rows, n_nonnull, n_nulls, null_frac,
    n_distinct, min_value, max_value)``.

    ``null_frac`` is rounded to 6 decimals; ``min_value``/``max_value``
    are the native-type extrema rendered as strings (NULL for an
    all-null column).  ``n_distinct`` never counts NULL (SQL
    ``count(DISTINCT c)`` semantics in both engines).

    ``approx=True`` swaps the exact distinct count for HLL++ at the
    given ``rsd`` — the 100 TB path (single pass, no Expand; see module
    docstring).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(cols):
        nd = (
            F.approx_count_distinct(c, rsd)
            if approx
            else F.count_distinct(F.col(c))
        )
        mn, mx = _min_max(c)
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            nd.alias(f"__nd_{i}"),
            mn.alias(f"__min_{i}"),
            mx.alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)

    # unpivot the single wide row — stack() runs on 1 row, cost-free
    parts = []
    for i, c in enumerate(cols):
        lit = c.replace("'", "''")
        parts.append(f"'{lit}', __nn_{i}, __nd_{i}, __min_{i}, __max_{i}")
    stacked = wide.select(
        F.col("__n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            "as (col_name, n_nonnull, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        F.col("col_name"),
        F.col("__n_rows").alias("n_rows"),
        F.col("n_nonnull"),
        (F.col("__n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        F.round(
            (F.col("__n_rows") - F.col("n_nonnull"))
            / F.col("__n_rows").cast("double"),
            6,
        ).alias("null_frac"),
        F.col("n_distinct"),
        F.col("min_value"),
        F.col("max_value"),
    )


def profile_numeric(
    df: DataFrame,
    columns: Sequence[str],
    *,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Numeric-moments profile: one row per column with ``(col_name,
    n_nonnull, mean, stddev, min_value, max_value, q_25, q_50, ...)``
    — everything as doubles, moments rounded to 6 decimals so the
    report hashes stably across engines' summation orders.

    Same one-pass + 1-row-unpivot shape as :func:`profile_table`, and
    the same exact/approx split for the one aggregate whose exact form
    does not scale: ``approx=False`` uses Spark's exact ``percentile``
    (linear interpolation, SQL ``quantile_cont`` semantics — but it
    buffers every value of the group in the aggregation state, fine per
    column on a test table, the wrong shape at 100 TB);
    ``approx=True`` switches to ``approx_percentile`` (Greenwald-Khanna
    sketch, bounded state at any input size) at the given ``accuracy``.
    Mean/stddev/min/max are single-pass streaming aggregates either way.
    """
    cols = list(columns)
    if not cols:
        raise ValueError("profile_numeric: need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_numeric: unknown columns {missing}")
    qs = [float(q) for q in quantiles]
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"profile_numeric: quantiles must be in [0,1]: {qs}")

    def _q(c: Column, q: float) -> Column:
        if approx:
            return F.approx_percentile(c, F.lit(q), F.lit(accuracy))
        return F.percentile(c, F.lit(q))

    aggs: list[Column] = []
    for i, name in enumerate(cols):
        c = F.col(name).cast("double")
        aggs += [
            F.count(c).alias(f"__nn_{i}"),
            F.round(F.avg(c), 6).alias(f"__mean_{i}"),
            F.round(F.stddev(c), 6).alias(f"__sd_{i}"),
            F.min(c).alias(f"__min_{i}"),
            F.max(c).alias(f"__max_{i}"),
            *(
                F.round(_q(c, q).cast("double"), 6).alias(f"__q{j}_{i}")
                for j, q in enumerate(qs)
            ),
        ]
    wide = df.agg(*aggs)

    # fixed-point rendering, never str(): str(1e-05) = '1e-05' would put
    # a hyphen in the stack alias and die inside the SQL parser instead
    # of here
    q_names = [
        f"q_{format(q, '.12f').rstrip('0').rstrip('.').replace('.', '_') or '0'}"
        for q in qs
    ]
    if len(set(q_names)) != len(q_names):
        raise ValueError(f"profile_numeric: quantiles collide on names {q_names}")
    bad = [n for n in q_names if not n.replace("_", "").isalnum()]
    if bad:
        raise ValueError(f"profile_numeric: unrepresentable quantile names {bad}")
    parts = []
    for i, name in enumerate(cols):
        lit = name.replace("'", "''")
        fields = [f"__nn_{i}", f"__mean_{i}", f"__sd_{i}", f"__min_{i}", f"__max_{i}"]
        fields += [f"__q{j}_{i}" for j in range(len(qs))]
        parts.append(f"'{lit}', {', '.join(fields)}")
    out_fields = ["n_nonnull", "mean", "stddev", "min_value", "max_value", *q_names]
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            f"as (col_name, {', '.join(out_fields)})"
        )
    )


# ---------------------------------------------------------------------------
# mergeable profiles — incremental stats without rescanning history.
#
# At 100 TB the table is ingested in slices (a partition, a day, a
# micro-batch); re-running profile_table over ALL history per slice is
# O(corpus) per day.  The mergeable form profiles each slice ONCE into
# per-column summaries whose combine is exact-or-lossless:
#   count / null count / min / max  — trivially mergeable scalars,
#   distinct                        — a Datasketches HLL sketch binary
#                                     (register-wise max union: the
#                                     union of slice sketches IS the
#                                     sketch of the slice union),
# then folds slices together with merge_profile_sketches (any grouping:
# all-time, trailing window, per-source) and renders numbers with
# estimate_profile.  The per-slice relation is |cols| rows of scalars +
# one ≤ a-few-KB sketch each — the history a monitor keeps is KBs per
# slice, never the data.


def profile_sketches(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    lg_k: int = 12,
    slice_id: str | None = None,
) -> DataFrame:
    """Profile ``df`` into one MERGEABLE summary row per column:
    ``(slice_id?, col_name, n_rows, n_nonnull, min_value, max_value,
    distinct_sketch)`` where ``distinct_sketch`` is a Datasketches
    HLL(lg_k) binary.  Single pass, no Expand, JVM-only."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_sketches: need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_sketches: unknown columns {missing}")

    from pyspark.sql.types import NumericType

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    kinds: list[str] = []
    for i, c in enumerate(cols):
        numeric = isinstance(df.schema[c].dataType, NumericType)
        kinds.append("numeric" if numeric else "other")
        mn, mx = _min_max(c)
        # numeric columns additionally carry DOUBLE extrema keys so the
        # MERGE can order numerically — the rendered strings alone would
        # fold lexicographically ('9' > '100'), exactly the trap
        # _min_max exists to avoid.  (Integral values whose doubles
        # collide — |v| > 2^53 — may tie in the merge key; the picked
        # extremum is then off by < 1 ulp relative.  Documented bound.)
        num_min = (
            F.min(F.col(c)).cast("double") if numeric else F.lit(None).cast("double")
        )
        num_max = (
            F.max(F.col(c)).cast("double") if numeric else F.lit(None).cast("double")
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            # hll_sketch_agg ignores NULLs; cast to string so every
            # input type is sketchable and slices of drifting physical
            # types still merge
            F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_k)).alias(
                f"__sk_{i}"
            ),
            mn.alias(f"__min_{i}"),
            mx.alias(f"__max_{i}"),
            num_min.alias(f"__minn_{i}"),
            num_max.alias(f"__maxn_{i}"),
        ]
    wide = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        lit = c.replace("'", "''")
        parts.append(
            f"'{lit}', '{kinds[i]}', __nn_{i}, __sk_{i}, "
            f"__min_{i}, __max_{i}, __minn_{i}, __maxn_{i}"
        )
    out = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            "as (col_name, col_kind, n_nonnull, distinct_sketch, "
            "min_value, max_value, min_num, max_num)"
        ),
    ).select(
        "col_name", "col_kind", "n_rows", "n_nonnull", "distinct_sketch",
        "min_value", "max_value", "min_num", "max_num",
    )
    if slice_id is not None:
        out = out.select(F.lit(slice_id).alias("slice_id"), "*")
    return out


def merge_profile_sketches(profiles: DataFrame) -> DataFrame:
    """Fold per-slice summary rows (a union of :func:`profile_sketches`
    outputs) into one row per column: counts sum, min/max fold, HLL
    sketches union register-wise.  Numeric columns fold their extrema by
    the NUMERIC merge keys (``min_by``/``max_by`` keep the originally
    rendered string, so '9' vs '100' merges to '100'); everything else
    folds lexicographically, which IS that kind's ordering.  Input size
    is |slices|×|cols| tiny rows — this aggregation never touches the
    data again.

    Summary rows persisted by the pre-r13-fix ``profile_sketches`` lack
    ``col_kind``/``min_num``/``max_num``; they stay mergeable (a stored
    history must never force a full re-profile) under the documented
    lexicographic fallback: missing columns default to kind ``other``
    with NULL numeric keys."""
    for col, default in (
        ("col_kind", F.lit("other")),
        ("min_num", F.lit(None).cast("double")),
        ("max_num", F.lit(None).cast("double")),
    ):
        if col not in profiles.columns:
            profiles = profiles.withColumn(col, default)
    merged = profiles.groupBy("col_name").agg(
        # a group is "numeric" only if EVERY slice said numeric; any
        # non-numeric slice (incl. the pre-r13 "other" legacy default
        # AND a NULL kind from an allowMissingColumns union of legacy
        # rows — max(string) ignored those and could wrongly pick the
        # numeric fold, dropping the legacy slice's extrema) must force
        # the lexicographic fold.  Spelled as an explicit all-of fold,
        # not max(string) — string ordering of kind names is an
        # accident, not a contract
        F.when(
            F.min(F.when(F.col("col_kind") == "numeric", 1).otherwise(0)) == 1,
            F.lit("numeric"),
        )
        .otherwise(F.lit("other"))
        .alias("col_kind"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nonnull").alias("n_nonnull"),
        F.hll_union_agg(F.col("distinct_sketch"), F.lit(True)).alias(
            "distinct_sketch"
        ),
        # min_by/max_by ignore NULL keys (empty slices drop out); all-
        # NULL keys (non-numeric kinds, all-null columns) yield NULL
        F.min_by("min_value", "min_num").alias("__min_by_num"),
        F.max_by("max_value", "max_num").alias("__max_by_num"),
        F.min("min_value").alias("__min_lex"),
        F.max("max_value").alias("__max_lex"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
    )
    is_num = F.col("col_kind") == "numeric"
    return merged.select(
        "col_name",
        "col_kind",
        "n_rows",
        "n_nonnull",
        "distinct_sketch",
        F.when(is_num, F.col("__min_by_num"))
        .otherwise(F.col("__min_lex"))
        .alias("min_value"),
        F.when(is_num, F.col("__max_by_num"))
        .otherwise(F.col("__max_lex"))
        .alias("max_value"),
        "min_num",
        "max_num",
    )


def estimate_profile(profiles: DataFrame) -> DataFrame:
    """Render a (possibly merged) sketch-profile relation to numbers:
    the :func:`profile_table` report columns with ``n_distinct`` as the
    HLL estimate."""
    return profiles.select(
        "col_name",
        "n_rows",
        "n_nonnull",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        F.round(
            (F.col("n_rows") - F.col("n_nonnull"))
            / F.col("n_rows").cast("double"),
            6,
        ).alias("null_frac"),
        F.hll_sketch_estimate("distinct_sketch").alias("n_distinct"),
        "min_value",
        "max_value",
    )
