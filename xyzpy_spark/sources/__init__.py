from .tables import read_table, register_tables

__all__ = ["read_table", "register_tables"]
