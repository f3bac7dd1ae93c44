"""Every ``queries()`` entry runs at sf0.001 and yields a usable result.

This is the cheap cross-cutting net the per-operator tests don't give:
a registration typo, an empty-result schema loss, or an operator that
only works at one scale all surface here before the driver does.
"""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

SF_DIR = "/root/testdata/sf0.001"


def _load_entry():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _load_entry()


def test_every_query_runs_and_keeps_schema(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    failures = []
    for name, fn in qs.items():
        try:
            res = fn(SF_DIR)
            if isinstance(res, ray.data.Dataset):
                # to_pandas() drops columns of EMPTY datasets (Ray quirk);
                # schema() is the authoritative surface the driver can rely on
                cols = res.schema(fetch_if_missing=True).names
                res.count()  # the pipeline must actually execute
            elif isinstance(res, (pa.Table,)):
                cols = res.column_names
            else:  # pandas
                cols = list(res.columns)
            if not cols:
                failures.append((name, "empty schema"))
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            failures.append((name, repr(exc)[:200]))
    assert not failures, failures
