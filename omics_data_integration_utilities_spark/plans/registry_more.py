"""Query registry part 4 — remaining SURVEY §2 inventory coverage:
projections, categorical/null filters, outer/dict/parent-preserving joins,
alignment joins, union-all, unpivot, scalar-function families, top-k
windows, the K9 linear screen, and the §3.1 correlation pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analytics.graph import break_cycles
from ..analytics.methylmix import linear_filter, methylmix_model, methylmix_states
from ..functions.scalars import concat_key, set_encode
from ..operators import windows as win_ops
from ..operators.aggregates import correlate_long_matrices
from .registry import _t


# --------------------------------------------------------------------------
# §2.2 projections & simple predicates
# --------------------------------------------------------------------------

def q_p1_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 select/drop/rename (queryMassNPDB.py:175-185 3-schema outputs)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )


SQL_P1 = "SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance FROM customer"


def q_p3_categorical_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 strict/medium/loose boolean predicate (gizmos.py:689-696)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.where(
            (F.col("o_orderstatus") == "F") | (F.col("o_orderpriority") == "1-URGENT")
        )
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_P3 = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
WHERE o_orderstatus = 'F' OR o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus, o_orderpriority
"""


def q_p7_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 dropna subset (validateRulesWithOrigins.py:132)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.na.drop("any", subset=["lang"]).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_P7 = "SELECT lang, count(*) AS n FROM documents WHERE lang IS NOT NULL GROUP BY lang"


# --------------------------------------------------------------------------
# §2.4 distinct / mean profile
# --------------------------------------------------------------------------

def q_a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 dedup on a column subset (gizmos.py:311-316)."""
    return _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()


SQL_A2 = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


def q_a7_group_mean_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 cluster mean profile (MethylMix Download_Preprocess.R:1449-1461:
    average methylation per cluster × sample)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("cluster"), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("mean_value"))
    )


SQL_A7 = """
SELECT user_id % 10 AS cluster, event_type, round(avg(value), 6) AS mean_value
FROM events GROUP BY cluster, event_type
"""


# --------------------------------------------------------------------------
# §2.3 remaining joins
# --------------------------------------------------------------------------

def q_j2_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 full-outer merge of two aggregates (gizmos.py:672,713 unilateral
    coexpression outer merge)."""
    orders = _t(spark, sf_dir, "orders")
    from .registry import TS_1998_01_01

    early = (
        orders.where(F.col("o_orderdate") < F.expr(TS_1998_01_01))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_early"))
    )
    late = (
        orders.where(F.col("o_orderdate") >= F.expr(TS_1998_01_01))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )
    return (
        early.join(late, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n_early", F.lit(0)).alias("n_early"),
            F.coalesce("n_late", F.lit(0)).alias("n_late"),
        )
    )


SQL_J2 = """
WITH early AS (
  SELECT o_custkey, count(*) AS n_early FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY o_custkey
), late AS (
  SELECT o_custkey, count(*) AS n_late FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' GROUP BY o_custkey
)
SELECT coalesce(early.o_custkey, late.o_custkey) AS o_custkey,
       coalesce(n_early, 0) AS n_early, coalesce(n_late, 0) AS n_late
FROM early FULL OUTER JOIN late ON early.o_custkey = late.o_custkey
"""


def q_j9_dict_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 broadcast dictionary lookup (gizmos.py:699-704 pfam_dict.loc) —
    the row-at-a-time indexed lookup becomes a broadcast hash join."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "n_name"
    )


SQL_J9 = """
SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def q_j10_explode_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 explode keeps parent columns in-row — the reference needs an
    index join to reattach them (gizmos.py:495-501); Spark does not."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return toks.where(F.length("token") > 6).select("doc_id", "source", "token")


SQL_J10 = """
SELECT doc_id, source, token FROM (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token FROM documents
) WHERE length(token) > 6
"""


def q_j11_matrix_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 matrix-intersection alignment (corrMultiomics.py:205-210: shared
    sample columns) — long form it is an inner join on the sample key."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("click_avg")
    )
    views = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("view_avg")
    )
    return clicks.join(views, "user_id")


SQL_J11 = """
WITH c AS (
  SELECT user_id, round(avg(value), 6) AS click_avg FROM events
  WHERE event_type = 'click' GROUP BY user_id
), v AS (
  SELECT user_id, round(avg(value), 6) AS view_avg FROM events
  WHERE event_type = 'view' GROUP BY user_id
)
SELECT c.user_id, click_avg, view_avg FROM c JOIN v ON c.user_id = v.user_id
"""


# --------------------------------------------------------------------------
# §2.7 union-all
# --------------------------------------------------------------------------

def q_u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union-all accumulation (pathMassTransitions.py:191,312 fwd+bwd
    ghosts) — unionByName replaces iterative pd.concat."""
    part = _t(spark, sf_dir, "part")
    small = part.where(F.col("p_size") < 10).select(
        "p_partkey", F.lit("small").alias("side")
    )
    cheap = part.where(F.col("p_retailprice") < 950.0).select(
        "p_partkey", F.lit("cheap").alias("side")
    )
    return small.unionByName(cheap).groupBy("side").agg(F.count(F.lit(1)).alias("n"))


SQL_U1 = """
SELECT side, count(*) AS n FROM (
  SELECT p_partkey, 'small' AS side FROM part WHERE p_size < 10
  UNION ALL
  SELECT p_partkey, 'cheap' AS side FROM part WHERE p_retailprice < 950.0
) GROUP BY side
"""


# --------------------------------------------------------------------------
# §2.8 scalar families
# --------------------------------------------------------------------------

def q_f1_set_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 ;-set codec (gizmos.py:40-80 pd_to_set/set_to_string) —
    canonical sorted-distinct encoding."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey", set_encode(F.split(F.col("p_name"), " ")).alias("name_set")
    )


SQL_F1 = """
SELECT p_partkey,
       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ';') AS name_set
FROM part
"""


def q_f4_concat_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 composite key concat (heraldPathways.py:148 reaction_substrate)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        concat_key("l_orderkey", "l_linenumber").alias("line_key"), "l_quantity"
    )


SQL_F4 = """
SELECT l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR AS line_key, l_quantity
FROM lineitem
"""


def q_f5_id_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 deterministic content-hash IDs — replaces the reference's random
    VM_ ids (gizmos.py:330-336), SURVEY §7 reproducibility fix."""
    part = _t(spark, sf_dir, "part")
    content = F.concat_ws("|", F.col("p_name"), F.col("p_brand"))
    return part.select(
        "p_partkey",
        F.concat(F.lit("VM_"), F.substring(F.sha2(content, 256), 1, 16)).alias("vm_id"),
    )


SQL_F5 = """
SELECT p_partkey, 'VM_' || substr(sha256(p_name || '|' || p_brand), 1, 16) AS vm_id
FROM part
"""


def q_f6_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 round/abs/clip family (getMassTransitions.py:105-106,
    pathMassTransitions.py:163-165 np.clip)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.col("value") / 7.0, 4).alias("scaled"),
        F.abs(F.col("value") - 250.0).alias("centered_abs"),
        F.greatest(F.lit(0.0), F.col("value") - 400.0).alias("clipped"),
    )


SQL_F6 = """
SELECT event_id, round(value / 7.0, 4) AS scaled, abs(value - 250.0) AS centered_abs,
       greatest(0.0, value - 400.0) AS clipped
FROM events
"""


def q_f8_exp_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 exp/log/sqrt transforms (wcModules.py:96-98 edge weight
    exp(−(MR−1)/25); corrMultiomics.py:58 log10)."""
    li = _t(spark, sf_dir, "lineitem")
    pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return pair.select(
        "l_suppkey",
        "l_partkey",
        F.round(F.exp(-(F.col("n") - 1) / 25.0), 6).alias("edge_weight"),
        F.round(F.log10(F.col("n") + 1.0), 6).alias("log_n"),
        F.round(F.sqrt(F.col("n").cast("double")), 6).alias("sqrt_n"),
    )


SQL_F8 = """
SELECT l_suppkey, l_partkey,
       round(exp(-(n - 1) / 25.0), 6) AS edge_weight,
       round(log10(n + 1.0), 6) AS log_n,
       round(sqrt(n::DOUBLE), 6) AS sqrt_n
FROM (SELECT l_suppkey, l_partkey, count(*) AS n FROM lineitem GROUP BY 1, 2)
"""


def q_f10_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 melt/unpivot (pathMassTransitions.py:166-171 wide→long) via
    stack()."""
    part = _t(spark, sf_dir, "part")
    return part.selectExpr(
        "p_partkey",
        "stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (metric, val)",
    )


SQL_F10 = """
SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
UNION ALL
SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS val FROM part
"""


def q_f12_size_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 list-length predicate (gizmos.py:426,447 len(list) as bool)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.where(F.size(F.split(F.col("text"), " ")) > 55).select("doc_id")


SQL_F12 = "SELECT doc_id FROM documents WHERE len(string_split(text, ' ')) > 55"


# --------------------------------------------------------------------------
# §2.6 limits / top-k per group
# --------------------------------------------------------------------------

def q_o2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 deterministic head(n) debug dump (queryMassNPDB2.py:32)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_orderstatus")
    )


SQL_O2 = "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 100"


def q_w2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 top-k per partition with tie-breaks (wcModules.py rank tables)."""
    li = _t(spark, sf_dir, "lineitem")
    pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return win_ops.top_k_per_group(
        pair, ["l_suppkey"], "n", k=3, ascending=False, tie_break=["l_partkey"]
    )


SQL_W2 = """
SELECT l_suppkey, l_partkey, n FROM (
  SELECT l_suppkey, l_partkey, n,
         row_number() OVER (PARTITION BY l_suppkey ORDER BY n DESC, l_partkey ASC) AS rn
  FROM (SELECT l_suppkey, l_partkey, count(*) AS n FROM lineitem GROUP BY 1, 2)
) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# K9 linear screen + §3.1 pipeline
# --------------------------------------------------------------------------

def q_k9_linear_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 per-gene lm screen (MethylMix.R:171-216): slope<0, R²>0.02 —
    closed-form covar/var/corr², no UDF."""
    li = _t(spark, sf_dir, "lineitem")
    return linear_filter(
        li, "l_partkey", "l_discount", "l_quantity", min_n=5, max_slope=0.0, min_r2=0.02
    )


SQL_K9 = """
WITH s AS (
  SELECT l_partkey, count(*) AS n,
         covar_pop(l_discount, l_quantity) AS cov,
         var_pop(l_discount) AS var,
         corr(l_discount, l_quantity) AS r
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, n, round(cov / var, 6) AS slope, round(r * r, 6) AS r2
FROM s
WHERE n >= 5 AND var > 0 AND r IS NOT NULL AND cov / var < 0.0 AND r * r > 0.02
"""


def q_plan_corr_multiomics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 corrMultiomics lifecycle: two long matrices → sample-align
    inner join → per-pair correlation (the Pool fan-out as partition
    parallelism).  Matrix = avg event value per (user, type)."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("user_id", "event_type").agg(F.avg("value").alias("v"))
    out = correlate_long_matrices(
        m, m, sample_col="user_id", left_key="event_type", right_key="event_type",
        left_val="v", right_val="v", min_n=5,
    )
    return (
        out.where((F.col("lk") < F.col("rk")) & (F.abs(F.col("r")) < 0.999999))
        .select("lk", "rk", "n", F.round("r", 6).alias("r"), F.round("t", 6).alias("t"))
    )


SQL_PLAN_CORR = """
WITH m AS (
  SELECT user_id, event_type, avg(value) AS v FROM events GROUP BY user_id, event_type
),
c AS (
  SELECT a.event_type AS lk, b.event_type AS rk, count(*) AS n, corr(a.v, b.v) AS r
  FROM m a JOIN m b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT lk, rk, n, round(r, 6) AS r, round(r * sqrt((n - 2) / (1 - r * r)), 6) AS t
FROM c WHERE n >= 5 AND r IS NOT NULL AND abs(r) < 0.999999
"""


# --------------------------------------------------------------------------
# analytics kernels (rows-only: EM mixture, DAG-ification)
# --------------------------------------------------------------------------

def q_methylmix_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 per-gene beta-mixture model (blc_2 EM + BIC + mean-difference
    gates + Wilcoxon DM vs a 'normal' cohort + flip-over,
    MethylMix.R:313-419) via cogrouped applyInPandas — no SQL oracle
    (iterative EM).  values scaled to (0,1) beta support by /500."""
    ev = _t(spark, sf_dir, "events").withColumn("beta_v", F.col("value") / F.lit(500.0))
    cancer = ev.where(F.col("user_id") % 7 != 0).select("event_type", "beta_v")
    normal = ev.where(F.col("user_id") % 7 == 0).select("event_type", "beta_v")
    return methylmix_model(cancer, "event_type", "beta_v", normal_df=normal)


def q_plan_methylmix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MethylMix lifecycle composed end-to-end (the reference's
    MethylMix() main driver, MethylMix.R:236-290: ClusterProbes → per-
    cluster mean profiles → per-cluster beta-mixture DM calls vs the
    normal cohort).  Genes = event_type, probes = a value-derived bucket,
    samples = users; cancer/normal cohorts split by user hash.  Rows-only
    (K8+K11 iterative kernels), deterministic."""
    from ..analytics.clustering import cluster_mean_profiles, cluster_probes

    # sample = a 20-bucket cohort key, not raw user ids: the reference's
    # probe clustering drops probes with ANY missing sample (dropna on
    # the probe × sample pivot), so the matrix must be dense
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("gene"),
        (F.col("event_id") % 4).cast("string").alias("probe"),
        (F.col("user_id") % 20).cast("string").alias("sample"),
        (F.col("value") / F.lit(500.0)).alias("beta"),
        (F.col("user_id") % 7 == 0).alias("is_normal"),
    )
    cells = ev.groupBy("gene", "probe", "sample", "is_normal").agg(
        F.avg("beta").alias("beta")
    )
    cancer = cells.where(~F.col("is_normal"))
    clusters = cluster_probes(cancer, "gene", "probe", "sample", "beta")
    prof_cancer = cluster_mean_profiles(
        cancer, clusters, "gene", "probe", "sample", "beta"
    ).withColumn("gene_cluster", F.concat_ws("__", "gene", "cluster"))
    prof_normal = cluster_mean_profiles(
        cells.where(F.col("is_normal")), clusters, "gene", "probe", "sample", "beta"
    ).withColumn("gene_cluster", F.concat_ws("__", "gene", "cluster"))
    return methylmix_model(
        prof_cancer.select("gene_cluster", "mean_value"),
        "gene_cluster",
        "mean_value",
        normal_df=prof_normal.select("gene_cluster", "mean_value"),
    )


def q_methylmix_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 sample-level MethylationStates output (MethylMix.R:405-419) —
    per-sample classification + DM state, no SQL oracle (iterative EM)."""
    ev = _t(spark, sf_dir, "events").withColumn("beta_v", F.col("value") / F.lit(500.0))
    cancer = ev.where(F.col("user_id") % 7 != 0).select(
        "event_type", "event_id", "beta_v"
    )
    normal = ev.where(F.col("user_id") % 7 == 0).select(
        "event_type", "event_id", "beta_v"
    )
    return methylmix_states(
        cancer, "event_type", "event_id", "beta_v", normal_df=normal, no_normal_mode=True
    )


def q_methylmix_states_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver check for the K8 sample-level states matrix
    (MethylMix.R:405-419): the 8.5k-row methylmix_states output is too
    large to pin as a VALUES literal, so this digests it to per-
    (gene, classification) aggregates — count, value checksum, state
    checksum — pinned as a golden oracle.  Any change in a single
    sample's classification or state moves a checksum, so the digest
    hash-locks the full matrix without the 8.5k-row literal.  Rounding
    to 4 decimals leaves ~6 orders of magnitude of headroom over
    float-sum reassociation noise (~1e-10)."""
    states = q_methylmix_states(spark, sf_dir)
    return (
        states.groupBy("event_type", "classification")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.round(F.sum("methylation_state"), 4).alias("state_sum"),
            F.round(F.sum(F.col("event_id").cast("double")), 0).alias("id_sum"),
        )
    )


def q_k14_dag_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K14 cycle removal on a weighted digraph (gizmos.py:567-630) —
    distributed edge construction, driver-side deterministic DFS break."""
    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.groupBy(
            (F.col("user_id") % 20).cast("string").alias("src"),
            ((F.col("user_id") * 7 + 3) % 20).cast("string").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .where(F.col("src") != F.col("dst"))
    )
    return break_cycles(edges)


def q_j3_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left equi-join (validateRulesWithOrigins.py:131: transitions ←
    MetaNetX lookup keeps unmatched rows with nulls): every customer with
    its urgent-order count, unmatched customers kept at 0."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_urgent"))
    )


SQL_J3 = """
SELECT c_custkey, count(o_orderkey) AS n_urgent
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON c_custkey = o.o_custkey
GROUP BY c_custkey
"""


QUERIES_MORE: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "p1_project_rename": q_p1_project_rename,
    "j3_left_join": q_j3_left_join,
    "p3_categorical_filter": q_p3_categorical_filter,
    "p7_dropna": q_p7_dropna,
    "a2_distinct": q_a2_distinct,
    "a7_group_mean_profile": q_a7_group_mean_profile,
    "j2_outer_join": q_j2_outer_join,
    "j9_dict_join": q_j9_dict_join,
    "j10_explode_parent": q_j10_explode_parent,
    "j11_matrix_align": q_j11_matrix_align,
    "u1_union_all": q_u1_union_all,
    "f1_set_encode": q_f1_set_encode,
    "f4_concat_key": q_f4_concat_key,
    "f5_id_generation": q_f5_id_generation,
    "f6_rounding": q_f6_rounding,
    "f8_exp_log": q_f8_exp_log,
    "f10_unpivot": q_f10_unpivot,
    "f12_size_predicate": q_f12_size_predicate,
    "o2_limit": q_o2_limit,
    "w2_topk_per_group": q_w2_topk_per_group,
    "k9_linear_filter": q_k9_linear_filter,
    "plan_corr_multiomics": q_plan_corr_multiomics,
    "methylmix_em": q_methylmix_em,
    "methylmix_states": q_methylmix_states,
    "methylmix_states_digest": q_methylmix_states_digest,
    "plan_methylmix": q_plan_methylmix,
    "k14_dag_break": q_k14_dag_break,
}

ORACLES_MORE: dict[str, str] = {
    "p1_project_rename": SQL_P1,
    "j3_left_join": SQL_J3,
    "p3_categorical_filter": SQL_P3,
    "p7_dropna": SQL_P7,
    "a2_distinct": SQL_A2,
    "a7_group_mean_profile": SQL_A7,
    "j2_outer_join": SQL_J2,
    "j9_dict_join": SQL_J9,
    "j10_explode_parent": SQL_J10,
    "j11_matrix_align": SQL_J11,
    "u1_union_all": SQL_U1,
    "f1_set_encode": SQL_F1,
    "f4_concat_key": SQL_F4,
    "f5_id_generation": SQL_F5,
    "f6_rounding": SQL_F6,
    "f8_exp_log": SQL_F8,
    "f10_unpivot": SQL_F10,
    "f12_size_predicate": SQL_F12,
    "o2_limit": SQL_O2,
    "w2_topk_per_group": SQL_W2,
    "k9_linear_filter": SQL_K9,
    "plan_corr_multiomics": SQL_PLAN_CORR,
    # methylmix_em / k14_dag_break: iterative kernels, rows-only check
}
