from .inspect import (
    count_exchanges,
    executed_plan,
    has_exchange,
    pushed_filters,
    scan_columns,
    wholestage_codegen_ids,
)

__all__ = [
    "count_exchanges",
    "executed_plan",
    "has_exchange",
    "pushed_filters",
    "scan_columns",
    "wholestage_codegen_ids",
]
