"""Plan inspection: utilities to assert the physical plans we designed for.

A query that is correct but plans badly (missed pushdown, surprise
shuffle, broadcast that didn't happen) is a scale bug — these helpers make
plan shape a *tested invariant* rather than something eyeballed once.
"""

from dbtransfer_spark.plans.checks import (
    DOMAIN_BOUNDED_GLOBAL_WINDOWS,
    count_exchanges,
    count_unpartitioned_windows,
    formatted_plan,
    has_broadcast_join,
    has_operator,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_operator",
    "count_exchanges",
    "count_unpartitioned_windows",
    "DOMAIN_BOUNDED_GLOBAL_WINDOWS",
]
