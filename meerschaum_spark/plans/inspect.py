"""Physical-plan inspection helpers.

The engine's performance contract is checkable: filters reach the parquet
scan (``PushedFilters``), projections prune columns (``ReadSchema``),
small dimensions broadcast, and whole-stage codegen spans the hot path.
These helpers surface those facts for tests and tuning — the Spark
analogue of the reference's EXPLAIN-driven flavor tuning.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan (column-pruning check)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def plan_report(df: DataFrame) -> dict[str, object]:
    """One-glance plan health summary."""
    text = explain_str(df)
    simple = explain_str(df, "simple")
    return {
        "scans": len(re.findall(r"Scan parquet", text)),
        "pushed_filters": pushed_filters(df),
        "read_schemas": scan_columns(df),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", simple)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", simple)),
        "shuffles": len(re.findall(r"Exchange ", simple)),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "partition_filters": re.findall(r"PartitionFilters: \[([^\]]*)\]", text),
    }
