"""Export surface: canonical JSON docs and CSV (reference
utils/dataframe.py:2061-2155 ``to_json`` and the API CSV routes,
meerschaum/api/routes/_pipes.py:356-887).

Canonical rules carried over: ISO-8601 datetimes, Decimal → plain string
(no exponent), bytes → base64, uuid lowercase. These match the
serializers in ``dtypes`` so a round-trip through export re-ingests to
identical rows.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerschaum_spark.dtypes import json_serialize_value, serialize_decimal


def _clean_value(v: Any) -> Any:
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return serialize_decimal(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, list):
        return [_clean_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _clean_value(x) for k, x in v.items()}
    return v


#: default driver-side materialization cap for ``df_to_json_rows``
JSON_ROWS_DEFAULT_LIMIT = 100_000


def df_to_json_rows(df: DataFrame,
                    limit: int | None = JSON_ROWS_DEFAULT_LIMIT) -> list[str]:
    """Collect to canonical JSON strings — a DRIVER-SIDE materialization,
    capped at ``JSON_ROWS_DEFAULT_LIMIT`` rows by default so an
    unbounded table cannot OOM the driver by accident. Pass
    ``limit=None`` to opt out explicitly; for full-table export use the
    distributed ``write_json``."""
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    return [
        json.dumps({k: _clean_value(v) for k, v in row.asDict(recursive=True).items()},
                   sort_keys=True, separators=(",", ":"),
                   default=json_serialize_value)
        for row in rows
    ]


def iter_json_docs(df: DataFrame) -> Iterator[dict[str, Any]]:
    """Stream docs to the driver without materializing the whole frame
    (reference get_pipe_docs / as_iterator)."""
    for row in df.toLocalIterator():
        yield {k: _clean_value(v) for k, v in row.asDict(recursive=True).items()}


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed JSON-lines export; datetimes ISO, decimals as strings."""
    out = df
    for field in df.schema.fields:
        if field.dataType.typeName() == "decimal":
            out = out.withColumn(field.name, F.col(field.name).cast("string"))
        elif field.dataType.typeName() == "binary":
            out = out.withColumn(field.name, F.base64(F.col(field.name)))
    out.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    """Distributed CSV export (reference API /csv endpoint). Complex
    columns are JSON-encoded text."""
    out = df
    for field in df.schema.fields:
        tn = field.dataType.typeName()
        if tn in ("array", "map", "struct"):
            out = out.withColumn(field.name, F.to_json(F.col(field.name)))
        elif tn == "binary":
            out = out.withColumn(field.name, F.base64(F.col(field.name)))
    out.write.mode(mode).option("header", str(header).lower()) \
       .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").csv(path)
