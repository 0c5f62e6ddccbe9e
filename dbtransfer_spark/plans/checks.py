"""Physical-plan predicates over ``df.explain("formatted")`` output.

The reference hand-codes its physical techniques (keyset pagination,
column pruning, batched writes — SURVEY.md §4); our engine delegates them
to Catalyst and *verifies* they happened. Each helper parses the formatted
explain string — stable enough across Spark 3.5-4.x for the coarse
assertions we make (operator presence, pushed filters, read schema).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters entries from all scans."""
    plan = formatted_plan(df)
    return " ".join(re.findall(r"PushedFilters: \[(.*?)\]", plan))


def read_schema_columns(df: DataFrame, table_fragment: str = "") -> list[list[str]]:
    """Column lists each parquet scan actually reads (column pruning
    evidence). Optionally filter to scans whose location matches
    ``table_fragment``."""
    plan = formatted_plan(df)
    out: list[list[str]] = []
    for scan in re.finditer(
        r"Scan parquet[^\n]*\n(?:.*?\n)*?.*?Location:[^\n]*?(\S*)\n(?:.*?\n)*?.*?ReadSchema: struct<([^>]*)>",
        plan,
    ):
        loc, schema = scan.group(1), scan.group(2)
        if table_fragment and table_fragment not in scan.group(0):
            continue
        cols = [c.split(":")[0].strip() for c in schema.split(",") if c.strip()]
        out.append(cols)
    return out


def has_operator(df: DataFrame, name: str) -> bool:
    return name in formatted_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges) —
    the scale-cost headline of a plan. Formatted mode prints shuffle nodes
    as ``(N) Exchange`` (broadcasts as ``(N) BroadcastExchange``), with
    reused exchanges as ``ReusedExchange``; count distinct real shuffles."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))
