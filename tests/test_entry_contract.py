"""Shape checks for the driver contract (full Spark-vs-DuckDB comparison
lives in scripts/check_contract.py, run separately because it needs a JVM)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def test_queries_have_oracles():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert qs, 'queries() must not be empty'
    missing = set(oracles) - set(qs)
    assert not missing, f'oracles without queries: {missing}'
    # round 2: every query carries an oracle (the ANN paths gained SQL
    # twins — hyperplane literals / grid quantizer).  Round 4 adds exactly
    # one deliberate exception: ann_kmeans_topk is an iterative Lloyd's
    # refinement (driver-side loop over centroid updates) that SQL cannot
    # express; the driver records its weaker rows-only check, and the
    # oracle-checked grid/LSH variants remain the production ANN paths.
    rows_only_allowed = {'ann_kmeans_topk'}
    rows_only = set(qs) - set(oracles)
    assert rows_only <= rows_only_allowed, \
        f'rows-only queries (every operator must carry an oracle): ' \
        f'{rows_only - rows_only_allowed}'


def test_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_oracle_sql_is_select():
    for name, sql in entry.oracle_sql().items():
        head = sql.strip().split(None, 1)[0].upper()
        assert head in ('SELECT', 'WITH'), name
