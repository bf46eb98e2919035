"""Every __spark_entry__ query vs its DuckDB oracle at sf0.001 —
the same check the driver's t2 gate runs at sf0.01."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
from oracle_harness import compare_query

import __spark_entry__ as E

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


def test_contract_shape():
    assert set(_ORACLES) <= set(_QUERIES)
    # a healthy majority must be strongly (oracle-) checked
    assert len(_ORACLES) >= 40


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    ok, detail = compare_query(spark, sf_dir, name, _QUERIES[name], _ORACLES.get(name))
    assert ok, f"{name}: {detail}"
