"""Every ``oracle_sql()`` string must COMPILE in DuckDB (EXPLAIN, not
execute) against the driver's view layout — a registration typo or a
dialect slip in an oracle would otherwise only surface inside the
driver's correctness gate."""

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


def test_every_oracle_compiles(entry_mod):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    failures = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            failures.append((name, repr(exc)[:200]))
    assert not failures, failures
