"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + column names + values (order-insensitive).

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def normalize(v):
    if v is None:
        return None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact match required
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def sort_key(row):
    return tuple((v is None, str(type(v)), v if v is not None else "")
                 for v in row)


def run(sf_dir: str, only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from meerschaum_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            s_set = sorted(
                (tuple(normalize(row[c]) for c in scols) for row in srows),
                key=sort_key)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — spark rows={len(srows)}")
            continue
        try:
            # Fetch through Arrow, exactly like the driver's gate:
            # ``fetchall()`` silently coerces DuckDB HUGEINT to Python int,
            # but over Arrow it surfaces as decimal128(38,0) → Decimal —
            # a type the value hash does NOT normalize against Spark's
            # bigint. Fetching the same way keeps this local gate honest.
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            ocols_raw = tbl.column_names
            orows = tbl.to_pylist()
            ocols = sorted(ocols_raw)
            o_set = sorted(
                (tuple(normalize(row[c]) for c in ocols) for row in orows),
                key=sort_key)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} duck={ocols}")
            failures += 1
            continue
        if len(s_set) != len(o_set):
            print(f"FAIL {name}: rowcount spark={len(s_set)} duck={len(o_set)}")
            failures += 1
            continue
        if s_set != o_set:
            bad = next(i for i, (a, b) in enumerate(zip(s_set, o_set)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  cols : {scols}")
            print(f"  spark: {s_set[bad]}")
            print(f"  duck : {o_set[bad]}")
            failures += 1
            continue
        print(f"OK   {name}: rows={len(s_set)}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    sys.exit(1 if run(sf_dir, only) else 0)
