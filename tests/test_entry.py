"""Driver-contract smoke: entry() runs, queries() match oracle_sql() on a
sample (the full 43-query sweep lives in tools/check_oracles.py and runs
at sf0.01)."""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SAMPLE = [
    "cdc_current_state",
    "cdc_sat_version_counts",
    "view_conversation_summary",
    "gold_fact_summary",
    "gold_dim_date",
    "q1_pricing_summary",
    "text_stats",
    "cdc_lineage",
    "cdc_schema_evolution",
    "lake_time_travel",
    "multimodal_features",
]


def _canon(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(50).collect()
    assert len(rows) > 0
    assert {"conv_id", "turn_idx", "role", "text"} <= set(df.columns)


def test_every_query_has_callable_and_most_have_oracles():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 40
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    no_oracle = set(qs) - set(os_)
    assert no_oracle <= {"ann_lsh", "ann_ivf"}, f"unexpected rows-only queries: {no_oracle}"


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = entrymod.queries()[name](spark, sf_dir)
    srows = sdf.collect()
    cur = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    cols = sorted(sdf.columns)
    sidx = {c: sdf.columns.index(c) for c in cols}
    didx = {c: dcols.index(c) for c in cols}
    a = sorted((tuple(_canon(r[sidx[c]]) for c in cols) for r in srows), key=str)
    b = sorted((tuple(_canon(r[didx[c]]) for c in cols) for r in drows), key=str)
    assert a == b
