from .tables import read_table, register_tables, save_bucketed, save_df, load_df
from .xyzpy_store import export_xyzpy_store, import_xyzpy_store, infer_store_format

__all__ = [
    "read_table",
    "register_tables",
    "save_bucketed",
    "save_df",
    "load_df",
    "import_xyzpy_store",
    "export_xyzpy_store",
    "infer_store_format",
]
