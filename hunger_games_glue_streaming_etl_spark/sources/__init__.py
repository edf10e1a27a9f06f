from .batch import load_table, load_tables, read_csv, read_json, read_parquet
from .streaming import read_json_stream, read_parquet_stream, read_rate_stream

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_json_stream",
    "read_parquet_stream",
    "read_rate_stream",
]
