"""Driver-style correctness harness: run every __spark_entry__.queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir;
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dvx.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    # type-STRICT: a Decimal stays a Decimal (normalized), so a DuckDB
    # HUGEINT/DECIMAL sum vs a Spark BIGINT sum is a mismatch here, exactly
    # as the driver's value-hash sees it (round-1 lesson: canonicalizing
    # Decimal->float masked three hash failures)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    return v


_TYPE_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "varchar": "str",
    "boolean": "bool", "date": "date", "timestamp": "ts",
}


def _spark_type_class(dt_name: str) -> str:
    base = dt_name.split("(")[0].lower()
    if base.startswith("decimal"):
        return "dec"
    return _TYPE_CLASS.get(base, base)


def _duck_type_class(tname: str) -> str:
    t = tname.lower()
    if t.startswith("decimal") or t in ("hugeint", "uhugeint"):
        return "dec"
    if t in ("tinyint", "smallint", "integer", "bigint", "utinyint",
             "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("float", "real", "double"):
        return "float"
    if t in ("varchar", "string"):
        return "str"
    if t.startswith("timestamp"):
        return "ts"
    return _TYPE_CLASS.get(t, t)


def row_key(row, cols_sorted, colidx):
    return tuple(canon(row[colidx[c]]) for c in cols_sorted)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = {c: _duck_type_class(str(t)) for c, t in zip(dcols, rel.types)}
            drows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck] {name}: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        else:
            stypes = {c: _spark_type_class(t) for c, t in sdf.dtypes}
            badt = [
                f"{c}: spark {stypes[c]} vs duckdb {dtypes[c]}"
                for c in scols
                if stypes[c] != dtypes[c]
            ]
            if badt:
                problems.append("dtype mismatch " + "; ".join(badt))
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            cols_sorted = sorted(scols)
            sidx = {c: scols.index(c) for c in scols}
            didx = {c: dcols.index(c) for c in dcols}
            sset = sorted(
                (row_key(r, cols_sorted, sidx) for r in srows), key=lambda t: str(t)
            )
            dset = sorted(
                (row_key(r, cols_sorted, didx) for r in drows), key=lambda t: str(t)
            )
            n_bad = sum(1 for a, b in zip(sset, dset) if a != b)
            if n_bad:
                ex = next((a, b) for a, b in zip(sset, dset) if a != b)
                problems.append(f"{n_bad}/{len(sset)} value mismatches, e.g. {ex[0]} vs {ex[1]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)}")
        else:
            print(f"[ok] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    for n, p in failures:
        print(" -", n, ":", p[:300])
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
