"""Driver-contract invariants for __spark_entry__.py: the README/SURVEY
claim "every query oracle-gated" must be structurally true, not
aspirational."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) == set(qs), (
        "queries without oracle: %s; oracles without query: %s"
        % (sorted(set(qs) - set(oracles)), sorted(set(oracles) - set(qs)))
    )
    assert len(qs) >= 54


def test_queries_are_callables_and_oracles_are_sql():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
