"""Data sources: file readers and standard-vocabulary registry."""

from biomedical_data_integration_spark.sources.readers import (
    TPCH_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_media_binaries,
    read_parquet,
    register_views,
)
from biomedical_data_integration_spark.sources.writers import (
    write_bucketed_table,
    write_csv,
    write_json,
    write_parquet,
    write_training_shards,
)
from biomedical_data_integration_spark.sources.standards import (
    DataFrameStandard,
    DictStandard,
    JsonStandard,
    Standard,
    get_standard,
    register_standard,
)

__all__ = [
    "write_bucketed_table",
    "write_csv",
    "write_json",
    "write_parquet",
    "write_training_shards",
    "TPCH_TABLES",
    "DataFrameStandard",
    "DictStandard",
    "JsonStandard",
    "Standard",
    "get_standard",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "register_standard",
    "register_views",
]
