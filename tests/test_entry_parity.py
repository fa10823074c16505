"""Driver-contract regression: every queries() entry matches its DuckDB
oracle at sf0.001 (the driver gate runs the same comparison at sf0.01;
tools/check_parity.py runs it standalone at any sf)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tools.check_parity import compare, duck_con  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
# Data-dependent oracles (trained IVF refits locally) must target the
# same dir the Spark queries read.
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_matches_oracle(spark, con, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = E.queries()[name](spark, SF_DIR)
    # Driver-canonicalizer contract: output schemas must be atomic-typed
    # (the driver's pandas sort_values dies on unhashable list/dict cells
    # — CORRECTNESS_r04 multimodal_features). Library APIs may return
    # nested types; the *query* must explode/stringify them.
    nested = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, f"{name}: non-atomic output columns {nested}"
    got = df.toPandas()
    oracle = E.oracle_sql().get(name)
    if oracle is None:
        assert len(got) >= 0  # rows-only contract: runs, stable schema
        return
    want = con.execute(oracle).fetch_df()
    errs = compare(name, got, want)
    assert not errs, f"{name}: {errs}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
