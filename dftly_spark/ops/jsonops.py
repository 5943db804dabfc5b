"""Semi-structured (JSON string) column handling, JVM-side.

Event/properties payloads in pipelines are routinely JSON strings (the
testdata's ``events.props``).  Two extraction styles:

* :func:`json_extract_fields` — path-based ``get_json_object``: schema-free,
  per-field, null on missing path or invalid JSON.  Right for pulling a few
  fields out of arbitrary blobs.
* :func:`json_parse_typed` — ``from_json`` with an explicit DDL schema: one
  parse per row regardless of field count, typed columns out.  Right when
  the payload schema is known and many fields are needed (the per-field
  path calls each re-parse the string).

Both are native Catalyst expressions — no Python, full codegen — and both
prune: unreferenced JSON fields are never materialized (``from_json``
schema pruning is Catalyst's ``OptimizeJsonExprs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_extract_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, tuple[str, str]],
) -> DataFrame:
    """Append one column per ``name: (json_path, cast_type)`` entry.

    Paths are ``$.key[.sub]`` JSONPath; missing paths and malformed JSON
    yield null (same contract as DuckDB ``json_extract_string`` + CAST).
    """
    out = df
    for name, (path, typ) in fields.items():
        col = F.get_json_object(F.col(json_col), path)
        out = out.withColumn(name, col.cast(typ) if typ != "string" else col)
    return out


def json_parse_typed(df: DataFrame, json_col: str, ddl_schema: str) -> DataFrame:
    """Parse ``json_col`` once into a struct column ``<json_col>_parsed``
    using a DDL schema (e.g. ``"k BIGINT, tags ARRAY<STRING>"``).

    Unparseable rows yield a null struct (``from_json`` PERMISSIVE mode).
    """
    return df.withColumn(
        f"{json_col}_parsed", F.from_json(F.col(json_col), ddl_schema)
    )
