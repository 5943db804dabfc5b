"""YAML pipeline runner: step forms, validation, sink round-trip."""

import pytest
from pyspark.sql import functions as F

from dftly_spark.pipeline import _OP_REGISTRY, run_pipeline

SF_DIR = "/root/testdata/sf0.001"


def test_registry_covers_frame_ops(spark):
    # spot-check the registry picked up frame-first ops and skipped helpers
    for name in ("exact_dedup", "cap_per_group", "semantic_dedup", "sessionize",
                 "pivot_wide", "melt", "line_filter", "cooccurrence_pmi",
                 "distinct_counts"):
        assert name in _OP_REGISTRY
    for name in ("dot", "cosine", "unit", "tokens", "mix_sql",
                 "fit_scalar_quantizer", "schema_drift",
                 # two-frame ops can't run from a one-frame YAML step
                 "snapshot_diff", "merge_upsert", "asof_join",
                 "nearest_join", "range_join", "bm25_topk"):
        assert name not in _OP_REGISTRY


def test_expression_steps_fuse_into_scan(spark):
    out = run_pipeline(
        spark,
        """
        source: {table: lineitem}
        steps:
          - with_columns:
              revenue: "$l_extendedprice * (1 - $l_discount)"
          - filter: "$l_quantity > 10"
          - select:
              ok: "$l_orderkey"
              revenue: "$revenue"
        """,
        sf_dir=SF_DIR,
    )
    expect = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_quantity") > 10)
        .select(
            F.col("l_orderkey").alias("ok"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )
    assert out.exceptAll(expect).count() == 0 and expect.exceptAll(out).count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # filter pushed to the parquet scan; whole pipeline is scan + project
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)" in plan
    assert "Exchange" not in plan


def test_op_step_with_join_back(spark):
    out = run_pipeline(
        spark,
        """
        source: {table: documents}
        steps:
          - op: exact_dedup
            args: {text_col: text, id_col: doc_id}
            join_back: {key: doc_id}
        """,
        sf_dir=SF_DIR,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # survivors keep the full input schema, one row per distinct text group
    assert out.columns == docs.columns
    n_groups = docs.select(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    ).distinct().count()
    assert out.count() == n_groups


def test_sink_round_trip(spark, tmp_path):
    p = str(tmp_path / "out")
    run_pipeline(
        spark,
        {
            "source": {"table": "region"},
            "steps": [{"select": {"r_regionkey": "$r_regionkey"}}],
            "sink": {"path": p, "format": "parquet"},
        },
        sf_dir=SF_DIR,
    )
    assert spark.read.parquet(p).count() == 5


def test_events_source_normalizes_ts(spark):
    out = run_pipeline(spark, {"source": {"table": "events"}}, sf_dir=SF_DIR)
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="unknown pipeline keys"):
        run_pipeline(spark, {"source": {"table": "region"}, "nope": 1}, sf_dir=SF_DIR)
    with pytest.raises(ValueError, match="needs a source"):
        run_pipeline(spark, {"steps": []}, sf_dir=SF_DIR)
    with pytest.raises(ValueError, match="exactly one of"):
        run_pipeline(
            spark,
            {"source": {"table": "region"}, "steps": [{"filter": "1", "op": "x"}]},
            sf_dir=SF_DIR,
        )
    with pytest.raises(ValueError, match="unknown op"):
        run_pipeline(
            spark,
            {"source": {"table": "region"}, "steps": [{"op": "not_an_op"}]},
            sf_dir=SF_DIR,
        )
    with pytest.raises(ValueError, match="join_back needs 'key'"):
        run_pipeline(
            spark,
            {
                "source": {"table": "documents"},
                "steps": [
                    {
                        "op": "exact_dedup",
                        "args": {"text_col": "text", "id_col": "doc_id"},
                        "join_back": {True: "doc_id"},  # YAML 1.1 bare `on`
                    }
                ],
            },
            sf_dir=SF_DIR,
        )


STREAM_SPEC = """
source: {table: events, stream: true}
steps:
  - with_columns:
      vmag: "$value * 100"
  - filter: "$event_type == 'purchase'"
  - select:
      event_id: "$event_id"
      user_id: "$user_id"
      vmag: "$vmag::int64"
"""


def test_streaming_pipeline_matches_batch(spark, tmp_path):
    from dftly_spark.io import normalize_event_ts

    out = run_pipeline(spark, STREAM_SPEC, sf_dir=SF_DIR)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("pipe_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("pipe_stream")
    expect = run_pipeline(
        spark,
        STREAM_SPEC.replace(", stream: true", ""),
        sf_dir=SF_DIR,
    )
    assert got.count() == expect.count() > 0
    assert got.exceptAll(expect).count() == 0


def test_streaming_pipeline_rejects_stateful_ops_and_sinks(spark):
    with pytest.raises(ValueError, match="not stream-safe"):
        run_pipeline(
            spark,
            {
                "source": {"table": "events", "stream": True},
                "steps": [{"op": "sessionize", "args": {"gap_micros": 1}}],
            },
            sf_dir=SF_DIR,
        )
    with pytest.raises(ValueError, match="writeStream"):
        run_pipeline(
            spark,
            {"source": {"table": "events", "stream": True}, "sink": {"path": "/tmp/x"}},
            sf_dir=SF_DIR,
        )


def test_streaming_pipeline_allows_row_local_ops(spark):
    out = run_pipeline(
        spark,
        {
            "source": {"table": "documents", "stream": True},
            "steps": [{"op": "gopher_rules", "args": {"min_words": 20}}],
        },
        sf_dir=SF_DIR,
    )
    assert out.isStreaming and "keep" in out.columns


def test_op_where_filters_op_output(spark):
    out = run_pipeline(
        spark,
        {
            "source": {"table": "documents"},
            "steps": [
                {
                    "op": "gopher_rules",
                    "args": {"min_words": 20},
                    "where": "$keep",
                    "join_back": {"key": "doc_id"},
                }
            ],
        },
        sf_dir=SF_DIR,
    )
    from dftly_spark.ops import gopher_rules

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_keep = gopher_rules(docs, min_words=20).where(F.col("keep")).count()
    assert 0 < out.count() == n_keep < docs.count()
    assert out.columns == docs.columns


def test_example_yaml_runs(spark):
    from pathlib import Path

    out = run_pipeline(
        spark, Path("examples/corpus_clean.yaml"), sf_dir=SF_DIR
    )
    assert out.columns == ["doc_id", "lang", "source", "n_tokens"]
    assert out.count() > 0


def test_event_analytics_example_runs(spark):
    from pathlib import Path

    out = run_pipeline(
        spark, Path("examples/event_analytics.yaml"), sf_dir=SF_DIR
    )
    assert out.columns == ["user_id", "event_type", "total_value"]
    assert out.count() > 0
    # pivot->melt round trip conserves the summed mass
    from dftly_spark.io import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    total = ev.where(F.col("value") >= 0).agg(F.sum("value")).collect()[0][0]
    got = out.agg(F.sum("total_value")).collect()[0][0]
    assert abs(got - total) < 1e-6


def test_sql_step_composes_with_expression_steps(spark):
    out = run_pipeline(
        spark,
        """
        source: {table: lineitem}
        steps:
          - with_columns:
              revenue: "$l_extendedprice * (1 - $l_discount)"
          - sql: |
              SELECT l_returnflag, round(sum(revenue), 6) AS rev
              FROM {t} GROUP BY l_returnflag
          - filter: "$rev > 0"
        """,
        sf_dir=SF_DIR,
    )
    rows = {r["l_returnflag"]: r["rev"] for r in out.collect()}
    assert set(rows) == {"A", "N", "R"} and all(v > 0 for v in rows.values())
    # the dftly-derived column feeds the SQL agg; the post-filter applies
    # to the SQL output — one composed plan end to end


def test_sql_step_tolerates_literal_braces(spark):
    out = run_pipeline(
        spark,
        """
        source: {table: part}
        steps:
          - sql: |
              SELECT p_partkey, regexp_extract(p_name, '[a-z]{3}', 0) AS tri
              FROM {t} WHERE p_partkey <= 5
        """,
        sf_dir=SF_DIR,
    )
    rows = out.collect()
    assert len(rows) > 0 and all(len(r["tri"]) in (0, 3) for r in rows)


def test_sql_step_view_is_unique_and_dropped(spark):
    # two runs of the same pipeline (same step index) must not clobber each
    # other's view, and no temp view may leak after the run
    before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    yaml_src = """
    source: {table: region}
    steps:
      - sql: "SELECT count(*) AS n FROM {t}"
    """
    a = run_pipeline(spark, yaml_src, sf_dir=SF_DIR)
    b = run_pipeline(spark, yaml_src, sf_dir=SF_DIR)
    # both frames stay usable after their views were dropped (analysis is
    # eager — the plan no longer references the view)
    assert a.collect()[0]["n"] == b.collect()[0]["n"] == 5
    after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert not {v for v in after - before if v.startswith("_dftly_step_")}


def test_drop_sql_views_drains_pending_registry(spark):
    # Classic Spark drops views eagerly, so the Connect-only registry is
    # empty and the hook is a no-op; a stale name left in the registry
    # (e.g. after a Connect session restart) is drained without raising.
    from dftly_spark import pipeline as plmod

    yaml_src = """
    source: {table: region}
    steps:
      - sql: "SELECT count(*) AS n FROM {t}"
    """
    run_pipeline(spark, yaml_src, sf_dir=SF_DIR).collect()
    assert plmod._PENDING_SQL_VIEWS.get(spark) in (None, [])
    assert plmod.drop_sql_views(spark) == 0
    # stale name (e.g. after a Connect session restart) drains w/o raising
    plmod._pending_views(spark).append("_dftly_step_0_999999")  # never created
    assert plmod.drop_sql_views(spark) in (0, 1)
    assert plmod._PENDING_SQL_VIEWS.get(spark) in (None, [])


def test_drop_sql_views_is_per_session(spark):
    # The registry must be keyed by session: draining for one session
    # leaves another session's pending views untouched.
    from dftly_spark import pipeline as plmod

    class _FakeSession:  # stands in for a second Connect session
        pass

    other = _FakeSession()
    plmod._pending_views(other).append("_dftly_step_9_123")
    assert plmod.drop_sql_views(spark) == 0  # does not touch `other`
    assert plmod._PENDING_SQL_VIEWS.get(other) == ["_dftly_step_9_123"]
    del plmod._PENDING_SQL_VIEWS[other]
