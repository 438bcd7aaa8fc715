from .readers import (  # noqa: F401
    read_csv,
    read_tsv_with_comments,
    read_parquet_table,
    rename_by_position,
)
from .tables import TESTDATA_TABLES, load_table, register_views  # noqa: F401
