"""Driver contract shim: the real contract is ``dftly_spark.contract``.

The driver imports this repo-root module for ``entry`` / ``queries`` /
``oracle_sql`` (and ``bench.py`` additionally for ``warm_caches``).  The
8.5k-line query/oracle corpus that used to live here was split into
``dftly_spark/contract/`` in round 13 (one module per wave, registration
order preserved by the package's import order); this file stays a thin
re-export so every existing entry point keeps working unchanged.
"""

from dftly_spark.contract import (  # noqa: F401
    _agg_spec_query,  # reached by tests/test_fuzz_oracle.py's x128 harness
    _pq_schema,
    entry,
    oracle_sql,
    queries,
    warm_caches,
)
