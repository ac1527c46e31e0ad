"""Driver-contract pre-flight (SURVEY §5.2 'Driver contract' layer).

Replicates the driver's compare: run every queries()[name] on Spark and the
matching oracle_sql()[name] on DuckDB over the same parquet dir, then check
row count, column names, and order-insensitive values. Runs at sf0.001 for
speed (the driver uses sf0.01 — same generator, bigger N).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, round floats,
    sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
                if math.isnan(v):
                    v = "nan"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


ALL_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_contract_query(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) > 0, f"rows-only query {name} returned 0 rows"
        return
    res = duck.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), \
        f"{name}: column names differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), \
        f"{name}: row count {len(srows)} vs {len(drows)}"
    sc, sv = _canon(srows, scols)
    dc, dv = _canon(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
    assert sv == dv, (f"{name}: values differ, first mismatches "
                      f"{[(sv[i], dv[i]) for i in mism]}")
