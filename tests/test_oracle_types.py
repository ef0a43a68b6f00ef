"""Oracle type gate: no oracle_sql() entry may project a HUGEINT.

DuckDB types window SUMs and integer SUMs as HUGEINT; pandas converts
HUGEINT to float64, so the driver's value hash compares 1.0 against the
engine's bigint 1 and grades the row red even when values agree (the
round-6 `arcade_sessionize` failure). Every such column must be wrapped
in CAST(... AS BIGINT) at projection time. tools/check_correctness.py
enforces the same gate at run time; this test enforces it statically
over ALL oracles (binding a relation is cheap — nothing executes).
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"
_HUGE = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _hugeint_cols(con, sql: str) -> list[str]:
    rel = con.sql(sql)
    return [
        f"{c}:{t}"
        for c, t in zip(rel.columns, [str(t) for t in rel.types])
        if t in _HUGE
    ]


def test_detector_flags_hugeint(con):
    # DuckDB types SUM over integers as HUGEINT — the detector must see it
    assert _hugeint_cols(con, "SELECT SUM(1) AS s") == ["s:HUGEINT"]
    assert _hugeint_cols(con, "SELECT CAST(SUM(1) AS BIGINT) AS s") == []


def test_no_oracle_projects_hugeint(con):
    import __spark_entry__ as entrymod

    bad: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        hug = _hugeint_cols(con, sql)
        if hug:
            bad[name] = hug
    assert not bad, (
        f"oracles project HUGEINT columns (CAST them to BIGINT): {bad}"
    )
