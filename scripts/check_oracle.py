"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same parquet, compare row count, column names, and an
order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"f:{v}" if False else f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return "s:" + str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    digests = sorted(
        hashlib.md5("|".join(canon(r[i]) for i in order).encode()).hexdigest() for r in rows
    )
    return hashlib.md5("\n".join(digests).encode()).hexdigest()


def check_all(spark, sf_dir: str, only: set[str] | None = None) -> list[str]:
    """Run every __spark_entry__.queries() entry against its oracle_sql()
    on ``sf_dir``; returns the list of failing query names. Importable so
    the pytest suite can gate ALL registered queries every run (the
    driver's per-round gate may cover only a subset — this keeps the
    newest queries from regressing silently between rounds)."""
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            # operator-internal cache handles (shingles, lm bigrams,
            # sample inputs) must not accumulate across 80+ queries
            spark.catalog.clearCache()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"weak  {name}: no oracle (rows-only) -> {len(s_rows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs = table_hash(s_rows, s_cols)
            hd = table_hash(d_rows, d_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a sample diff
                ss = {tuple(canon(v) for v in sorted(zip(s_cols, r))) for r in ([dict(zip(s_cols, r)).items() and r for r in s_rows][:0] or [])}
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems:
                o = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                od = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sset = {tuple(canon(r[i]) for i in o) for r in s_rows}
                dset = {tuple(canon(r[i]) for i in od) for r in d_rows}
                print("   spark-only:", list(sset - dset)[:3])
                print("   duck-only :", list(dset - sset)[:3])
        else:
            print(f"OK    {name} ({len(s_rows)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from docetl_spark import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)
    failures = check_all(spark, sf_dir, only or None)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
