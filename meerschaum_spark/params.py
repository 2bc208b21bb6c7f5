"""Unified parameter-filter engine: ``params`` dict → a single Spark Column.

This one function replaces BOTH of the reference's filter implementations —
the SQL generator ``build_where`` (meerschaum/utils/sql.py:1085-1218) and the
in-memory pandas twin ``query_df`` (meerschaum/utils/dataframe.py:1813-2058).
Catalyst pushes the resulting predicate into the parquet scan, so there is no
separate "in-memory engine": that is the unification win of going Spark-first.

Semantics (reference-parity):
  * scalar value            → ``col = value``
  * list of values          → ``col IN (...)``
  * ``'_'``-prefixed string → negation: ``col != v`` / ``col NOT IN (...)``
  * ``None``                → ``col IS NULL``
  * ``'_None'``             → ``col IS NOT NULL``
  * mixed null + values     → ``(col IN (...) OR col IS NULL)``
  * in- and ex- lists combine with AND; separate columns combine with AND
  * dict value              → canonical-JSON text equality
"""

from __future__ import annotations

import datetime
import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from meerschaum_spark.dtypes import canonical_json, coerce_timezone

NEGATION_PREFIX = "_"

#: strings with a verbatim SQL single-quoted spelling (no quote to escape,
#: no backslash — Spark's default parser treats backslash as an escape —
#: and no control characters)
_SQL_SAFE_STR = re.compile(r"^[^'\\\x00-\x1f]*$")

_SIMPLE_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def sql_in_condition(col_name: str, values: list[Any]) -> Column:
    """``col IN (...)`` as ONE py4j round-trip.

    ``Column.isin`` ships every value to the JVM as a separate literal
    call — a 250-key pushdown probe costs ~0.4 s of driver↔JVM chatter
    before any work runs. Serializing the list into a single SQL string
    for ``F.expr`` parses JVM-side into the same ``In()`` predicate, so
    parquet filter pushdown and partition pruning are unchanged. Values
    without an exact, safe SQL literal spelling (floats, timestamps,
    bytes, exotic strings) fall back to ``isin`` — correctness first.
    """
    if not _SIMPLE_IDENT.match(col_name):
        # dotted/backticked names: F.col resolves struct fields, a
        # backtick-quoted expr would not — keep isin's resolution rules
        return F.col(col_name).isin(list(values))
    lits: list[str] = []
    for v in values:
        if isinstance(v, bool):
            lits.append("TRUE" if v else "FALSE")
        elif isinstance(v, int) and -(2 ** 63) <= v < 2 ** 63:
            lits.append(str(v))
        elif isinstance(v, str) and _SQL_SAFE_STR.match(v):
            lits.append("'" + v + "'")
        else:
            return F.col(col_name).isin(list(values))
    return F.expr(f"`{col_name}` IN ({', '.join(lits)})")


def split_in_ex_values(values: Any) -> tuple[list[Any], list[Any]]:
    """Split a params value into (include, exclude) lists, stripping the
    negation prefix (reference utils/misc.py:1410-1447 ``get_in_ex_params``)."""
    if not isinstance(values, (list, tuple, set)):
        values = [values]
    in_vals: list[Any] = []
    ex_vals: list[Any] = []
    for v in values:
        if isinstance(v, str) and v.startswith(NEGATION_PREFIX):
            stripped = v[len(NEGATION_PREFIX):]
            ex_vals.append(None if stripped == "None" else _coerce(stripped))
        else:
            in_vals.append(_coerce(v))
    return in_vals, ex_vals


def _coerce(v: Any) -> Any:
    if isinstance(v, dict):
        return canonical_json(v)
    if isinstance(v, datetime.datetime):
        return coerce_timezone(v)
    return v


def params_to_filter(params: dict[str, Any] | None) -> Column | None:
    """Build one boolean Column for a params dict; ``None`` if empty."""
    if not params:
        return None
    conds: list[Column] = []
    for col_name, raw in params.items():
        col = F.col(col_name)
        if isinstance(raw, dict):
            # JSON-equality on canonical text (reference utils/sql.py:1203-1212)
            conds.append(col.cast("string") == F.lit(canonical_json(raw)))
            continue
        in_vals, ex_vals = split_in_ex_values(raw)
        sub = _build_side(col, in_vals, negate=False, col_name=col_name)
        if sub is not None:
            conds.append(sub)
        sub = _build_side(col, ex_vals, negate=True, col_name=col_name)
        if sub is not None:
            conds.append(sub)
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _build_side(col: Column, vals: list[Any], negate: bool,
                col_name: str | None = None) -> Column | None:
    if not vals:
        return None

    def _in(non_null: list[Any]) -> Column:
        if col_name is not None:
            return sql_in_condition(col_name, non_null)
        return col.isin(non_null)

    has_null = any(v is None for v in vals)
    non_null = [v for v in vals if v is not None]
    if negate:
        # NOT IN is null-unsafe in SQL; reference emits col != each value.
        # We additionally keep NULL rows unless None itself is excluded,
        # matching query_df's NA-aware behavior.
        parts: list[Column] = []
        if non_null:
            base = (~_in(non_null) if len(non_null) > 1
                    else (col != F.lit(non_null[0])))
            if not has_null:
                base = base | col.isNull()
            parts.append(base)
        if has_null:  # '_None' → IS NOT NULL
            parts.append(col.isNotNull())
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out
    if non_null and has_null:
        base = (_in(non_null) if len(non_null) > 1
                else (col == F.lit(non_null[0])))
        return base | col.isNull()
    if non_null:
        return (_in(non_null) if len(non_null) > 1
                else (col == F.lit(non_null[0])))
    return col.isNull()


def datetime_filter(
    dt_col: str | None,
    begin: Any = None,
    end: Any = None,
) -> Column | None:
    """``dt >= begin AND dt < end`` — begin inclusive, end EXCLUSIVE
    (reference connectors/sql/_pipes.py:1480-1502)."""
    if dt_col is None or (begin is None and end is None):
        return None
    col = F.col(dt_col)
    cond: Column | None = None
    if begin is not None:
        cond = col >= F.lit(begin)
    if end is not None:
        c2 = col < F.lit(end)
        cond = c2 if cond is None else (cond & c2)
    return cond


def combine_filters(*conds: Column | None) -> Column | None:
    """AND together any non-None conditions."""
    live = [c for c in conds if c is not None]
    if not live:
        return None
    out = live[0]
    for c in live[1:]:
        out = out & c
    return out
