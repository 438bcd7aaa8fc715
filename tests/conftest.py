from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("omics-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_duck_views(con, sf_dir: str) -> None:
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def normalize_rows(columns, rows, float_digits: int = 6):
    """Driver-compare emulation: sort columns by name, canonicalize values,
    return a sorted multiset of row tuples."""
    import datetime
    import math

    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return ("null",)
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            return ("f", round(v, float_digits))
        if isinstance(v, int):
            return ("i", v)
        if isinstance(v, datetime.datetime):
            return ("ts", v.replace(tzinfo=None).isoformat())
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return ("f", round(float(v), float_digits))
        except Exception:
            pass
        return ("s", str(v))

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare_query_to_oracle(spark, duck, name, fn, sql, sf_dir):
    """Run the Spark query and the DuckDB oracle; assert multiset equality."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    register_duck_views(duck, sf_dir)
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    sn = normalize_rows(scols, srows)
    dn = normalize_rows(dcols, drows)
    if sn != dn:
        only_s = [r for r in sn if r not in set(dn)][:5]
        only_d = [r for r in dn if r not in set(sn)][:5]
        raise AssertionError(
            f"{name}: value mismatch rows spark={len(sn)} duck={len(dn)}\n"
            f"  spark-only: {only_s}\n  duck-only: {only_d}"
        )
    return len(sn)
