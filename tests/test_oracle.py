"""The correctness gate, locally: every queries() entry vs its
DuckDB oracle at sf0.001 (fast; the driver repeats this at sf0.01).
Mirrors SURVEY.md §5."""

import pytest

import __spark_entry__ as entry_mod
from oracle_harness import compare

QS = entry_mod.queries()
OS = entry_mod.oracle_sql()


def test_keys_align():
    assert set(OS) <= set(QS)


@pytest.mark.parametrize("name", sorted(QS))
def test_query_against_oracle(name, spark, sf_dir):
    df = QS[name](spark, sf_dir)
    if name in OS:
        ok, problems = compare(name, df, OS[name], sf_dir, verbose=False)
        assert ok, problems
    else:
        assert df.count() >= 0  # rows-only contract


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
