"""Batch sources and sinks."""

from pyconnect_spark.sources.io import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_json,
    read_parquet,
    read_text,
    write_parquet,
)
