"""Smoke-execute EVERY oracle_sql() entry in DuckDB and assert the
output column types are driver-comparable.

The driver compares Spark and DuckDB results by schema + value hash;
DuckDB silently widens integer SUM() to HUGEINT (int128) and ratio
arithmetic to DECIMAL, neither of which exists on the Spark side, so
an oracle emitting them hash-mismatches despite equal values (the
round-1 zonal_stats incident, queries.py:500-502, and the round-3
hexbin HUGEINT bug this test would have caught).  Every new oracle is
exercised here automatically because we iterate the live registry.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# types the driver-side pandas conversion maps cleanly onto a Spark
# schema; anything outside (HUGEINT, DECIMAL, UHUGEINT, unsigned ints)
# either doesn't exist in Spark or hashes differently
_OK_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}


def _ok(duck_type: str) -> bool:
    t = duck_type.upper()
    if t in _OK_TYPES:
        return True
    # list/struct of ok element types (e.g. BIGINT[], DOUBLE[])
    if t.endswith("[]"):
        return _ok(t[:-2])
    return False


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _oracles() -> dict[str, str]:
    import __spark_entry__ as e

    return e.oracle_sql()


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_executes_with_comparable_types(con, name):
    sql = _oracles()[name]
    rel = con.sql(sql)
    bad = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, [str(t) for t in rel.types])
        if not _ok(str(t))
    ]
    assert not bad, (
        f"oracle {name!r} emits driver-incomparable DuckDB types {bad}; "
        "CAST to BIGINT/DOUBLE/VARCHAR in the SQL (zonal_stats convention)"
    )
    # the oracle must actually run to completion on the test sf
    rel.fetchall()
