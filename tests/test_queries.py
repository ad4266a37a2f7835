"""Every registered query must hash-match its DuckDB oracle (driver's t2 gate,
mirrored locally). Queries without an oracle get a rows-run check."""

from __future__ import annotations

import pytest

from doris_spark import queries as Q

Q.load_all()


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = Q.QUERIES[name](spark, sf_dir)
    if name in Q.ORACLES:
        from tests.oracle_utils import compare

        ok, msg = compare(df, duck, Q.ORACLES[name])
        assert ok, f"{name}: {msg}"
    else:
        n = df.count()
        assert n >= 0
