"""Driver-mimic: run every queries() entry at small SF and compare to
its oracle_sql() via DuckDB — row count, column names, and sorted
values (order-insensitive), exactly like CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return c


def _canon(df):
    """list-of-tuples, all values normalized, sorted."""
    cols = sorted(df.columns)
    rows = [
        tuple(_norm(row[c]) for c in cols)
        for row in df.to_dict("records")
    ]
    return cols, sorted(rows)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, sf_dir, con, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = con.sql(ORACLES[name]).df()
    scols, srows = _canon(sdf)
    ocols, orows = _canon(odf)
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs {len(orows)}"
    )
    if srows != orows:
        diffs = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 4 and sum(r.n for r in rows) > 0
