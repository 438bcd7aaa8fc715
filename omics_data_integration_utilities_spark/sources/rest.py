"""REST API source pattern (SURVEY §2.1 S6 — reference ``kegg.py``,
``uniprot_pfam_map.py``: driver-side HTTP fetch parsed into a table).

An external API is not a distributed source: the correct Spark shape is a
driver-side (or rate-limited foreachPartition) fetch that lands in a
DataFrame and is broadcast into joins.  This container has no network, so
the transport is injectable: pass ``fetch`` (url → text).  The default
transport raises with a clear message; tests inject a fake.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _default_fetch(url: str) -> str:
    raise NotImplementedError(
        "no network access in this environment; inject fetch=<callable> "
        "(e.g. requests.get(url).text in a connected deployment)"
    )


def fetch_tsv_source(
    spark: SparkSession,
    url: str,
    schema: str,
    fetch: Callable[[str], str] | None = None,
    sep: str = "\t",
    comment: str = "#",
) -> DataFrame:
    """Fetch a TSV document (the KEGG/UniProt list shape) and return a
    DataFrame with the declared schema.  Driver-side by design — the
    result is a dimension table meant for ``F.broadcast``."""
    text = (fetch or _default_fetch)(url)
    rows = [
        line.split(sep)
        for line in text.splitlines()
        if line.strip() and not line.startswith(comment)
    ]
    return spark.createDataFrame(rows, schema)
