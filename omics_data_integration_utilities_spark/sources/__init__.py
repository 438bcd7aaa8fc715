from .readers import (  # noqa: F401
    read_csv,
    read_tsv_with_comments,
    read_parquet_table,
    rename_by_position,
)
from .tables import TESTDATA_TABLES, load_table, register_views  # noqa: F401
from .writers import (  # noqa: F401
    write_parquet,
    write_csv,
    write_edge_file,
    write_bucketed_table,
)
from .layout import read_table, write_clustered, write_partitioned  # noqa: F401
