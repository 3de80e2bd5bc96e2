"""Guard: every oracle_sql() entry must emit only canonical scalar
DuckDB types.

Round-6 forensics: all 6 driver hash mismatches (q12, skew_profile,
pivot, hopping, rolling x2) — and ONLY those — had an uncast
``SUM(BIGINT)`` output column, which DuckDB types as HUGEINT. Our
local gate fetches via ``fetchall()`` (HUGEINT -> exact Python int,
indistinguishable from BIGINT), but a harness that fetches via
``.df()`` / ``.arrow()`` gets float64 / decimal128 for HUGEINT —  a
representation difference that breaks any type-sensitive value hash
even when the numbers are identical. The separation was perfect:
43/43 green oracles clean, 7/7 red oracles flagged.

The invariant enforced here: oracle output columns are restricted to
types whose Python/pandas/Arrow representations all agree with the
Spark side (BIGINT, INTEGER, DOUBLE, VARCHAR, BOOLEAN, ...). Sums
over ints must be ``CAST(... AS BIGINT)``; decimals must round-trip
``CAST(CAST(x AS VARCHAR) AS DOUBLE)`` (the existing convention).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types whose fetchall / .df() / .arrow() representations are stable
# and match the Spark collect() representation of the paired query.
CANONICAL = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE",
    "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
}


def test_every_oracle_emits_canonical_scalar_types():
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    offenders = []
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in desc:
            if typ not in CANONICAL:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle output columns with driver-hash-unsafe types "
        "(cast HUGEINT sums to BIGINT, decimals to DOUBLE via VARCHAR): "
        + "; ".join(offenders)
    )
