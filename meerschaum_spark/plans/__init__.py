from meerschaum_spark.plans.inspect import (
    explain_str,
    plan_report,
    pushed_filters,
    scan_columns,
)

__all__ = ["explain_str", "plan_report", "pushed_filters", "scan_columns"]
