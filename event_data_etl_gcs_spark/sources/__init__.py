from .catalog import load_table, load_tables, register_views
from .json_source import read_json_events
from .parquet_sink import write_parquet_table

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_json_events",
    "write_parquet_table",
]
