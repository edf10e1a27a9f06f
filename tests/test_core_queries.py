"""Every registered query with an oracle is checked against DuckDB at
sf0.001 — the same comparison the driver's correctness gate runs at sf0.01."""

from __future__ import annotations

import pytest

from hunger_games_glue_streaming_etl_spark.plans import ORACLE, QUERIES

from conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, oracle_con):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLE:
        assert_matches_oracle(df, oracle_con, ORACLE[name])
    else:
        assert df.count() >= 0  # rows-only check, mirrors the driver


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)
