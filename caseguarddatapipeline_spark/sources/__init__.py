from .jdbc import jdbc_scan, jdbc_upsert
from .tables import TABLES, load_table, load_tables, register_temp_views

__all__ = [
    "TABLES",
    "jdbc_scan",
    "jdbc_upsert",
    "load_table",
    "load_tables",
    "register_temp_views",
]
