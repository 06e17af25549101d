"""Sources & sinks (SURVEY.md §2.1)."""

from sdc_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_csv,
    read_parquet,
    table_path,
)
from sdc_spark.sources.writers import to_csv, to_parquet  # noqa: F401
