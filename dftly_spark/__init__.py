"""dftly-spark: a PySpark-native column-expression compiler.

A from-scratch engine with the capability surface of mmcdermott/dftly
(reference snapshot at /root/reference, MIT): a YAML/dict/string expression
DSL compiled to native ``pyspark.sql.Column`` expressions — zero Python UDFs
on the reference surface, so every expression stays inside Catalyst
whole-stage codegen (SURVEY.md §4.2).

    >>> from dftly_spark import Parser
    >>> exprs = Parser.to_spark({"revenue": "$l_extendedprice * (1 - $l_discount)"})
    >>> # df.select(*exprs.values())

Beyond the reference surface, :mod:`dftly_spark.ops` adds table-level
operators for large-scale training-data pipelines (dedup, similarity search,
text analysis, multimodal columns).
"""

from .nodes import (  # noqa: F401
    ALL_NODES,
    BINARY_OPS,
    DT_CAST_ACCESSORS,
    NODES,
    UNARY_OPS,
    LoweringContext,
    Node,
)
from .parser import Parser  # noqa: F401
from .sqlgen import SqlGenError, spec_to_duckdb_sql, to_duckdb_sql  # noqa: F401
from .timetype import (  # noqa: F401
    micros_to_time,
    time_to_micros,
    time_type_enabled,
)

__version__ = "0.1.0"
__all__ = [
    "Parser",
    "Node",
    "NODES",
    "ALL_NODES",
    "BINARY_OPS",
    "UNARY_OPS",
    "DT_CAST_ACCESSORS",
    "LoweringContext",
    "to_duckdb_sql",
    "spec_to_duckdb_sql",
    "SqlGenError",
    "micros_to_time",
    "time_to_micros",
    "time_type_enabled",
]
