"""Driver-contract smoke test: every queries() entry runs at sf0.001.

Cheap breakage detector for the driver's CORRECTNESS gate — each callable
must execute end-to-end on the smallest scale factor and return a
non-None Dataset / DataFrame / Table with at least one column.  Value
correctness is covered by scripts/check_oracle.py (DuckDB at sf0.01) and
by the golden fixtures; this test only guards the contract surface:
importability, the (sf_dir) call signature, and a materialisable result.
"""
import os

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _entry():
    import __ray_entry__ as e

    return e


def _names():
    return sorted(_entry().queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_smoke(ray_session, name):
    e = _entry()
    fn = e.queries()[name]
    res = fn(SF)
    assert res is not None
    if isinstance(res, pd.DataFrame):
        df = res
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res.to_pandas()  # ray Dataset
    assert len(df.columns) >= 1
    assert len(df) >= 0  # materialises without error


def test_oracle_sql_keys_subset_of_queries():
    e = _entry()
    extra = set(e.oracle_sql()) - set(e.queries())
    assert not extra, f"oracle_sql keys without a queries() entry: {extra}"


def test_entry_runs(ray_session):
    e = _entry()
    res = e.entry()
    assert res is not None


def test_sf_dirs_exist():
    for sf in ("sf0.001", "sf0.01"):
        assert os.path.isdir(f"/root/testdata/{sf}")
