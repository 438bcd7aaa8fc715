"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship mass-annotation plan (SURVEY §3.2) at
sf0.001.  ``queries()`` exposes every implemented SURVEY §2 operator;
``oracle_sql()`` the matching DuckDB SQL (same column names/rounding).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from omics_data_integration_utilities_spark.plans.registry import ORACLES, QUERIES
from omics_data_integration_utilities_spark.plans.registry_docs import (
    ORACLES_DOCS,
    QUERIES_DOCS,
)
from omics_data_integration_utilities_spark.plans.registry_analytics import (
    ORACLES_ANALYTICS,
    QUERIES_ANALYTICS,
)
from omics_data_integration_utilities_spark.plans.registry_more import (
    ORACLES_MORE,
    QUERIES_MORE,
)
from omics_data_integration_utilities_spark.plans.registry_kernels import (
    ORACLES_KERNELS,
    QUERIES_KERNELS,
)
from omics_data_integration_utilities_spark.plans.registry_pathway import (
    ORACLES_PATHWAY,
    QUERIES_PATHWAY,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>=0."""
    return QUERIES["plan_mass_annotation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(QUERIES)
    out.update(QUERIES_DOCS)
    out.update(QUERIES_ANALYTICS)
    out.update(QUERIES_MORE)
    out.update(QUERIES_KERNELS)
    out.update(QUERIES_PATHWAY)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(ORACLES)
    out.update(ORACLES_DOCS)
    out.update(ORACLES_ANALYTICS)
    out.update(ORACLES_MORE)
    out.update(ORACLES_KERNELS)
    out.update(ORACLES_PATHWAY)
    return out
