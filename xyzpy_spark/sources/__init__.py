from .tables import read_table, register_tables, save_bucketed, save_df, load_df

__all__ = [
    "read_table",
    "register_tables",
    "save_bucketed",
    "save_df",
    "load_df",
]
