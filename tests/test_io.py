"""Table I/O round-trips: schema fidelity per format, FAILFAST defaults."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dftly_spark.io import read_table, register_views, write_table

SCHEMA = "id bigint, name string, score double, flag boolean, at timestamp"
ROWS = [
    (1, "a", 1.5, True, dt.datetime(2024, 1, 1, 12, 30, 0)),
    (2, "b,with,commas", -0.25, False, dt.datetime(2024, 6, 1, 0, 0, 1)),
    (3, None, None, None, None),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "jsonl", "orc"])
def test_round_trip_preserves_schema_and_values(spark, frame, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_table(frame, path, format=fmt)
    back = read_table(spark, path, format=fmt, schema=SCHEMA)
    assert back.schema == frame.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, frame.collect()))


def test_jsonl_round_trips_nested_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["x", "y"], {"k": 2})],
        "id bigint, tags array<string>, props map<string,bigint>",
    )
    path = str(tmp_path / "nested")
    write_table(df, path, format="jsonl")
    back = read_table(
        spark, path, format="jsonl",
        schema="id bigint, tags array<string>, props map<string,bigint>",
    )
    r = back.collect()[0]
    assert r.tags == ["x", "y"] and r.props == {"k": 2}


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit DDL schema"):
        read_table(spark, str(tmp_path), format="csv")


def test_failfast_raises_on_malformed(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part.json").write_text('{"id": 1}\n{not json at all\n')
    df = read_table(spark, str(bad), format="jsonl", schema="id bigint")
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()
    # explicit opt-in to salvage
    ok = read_table(
        spark, str(bad), format="jsonl", schema="id bigint", mode="PERMISSIVE"
    )
    assert [r.id for r in ok.collect()] == [1, None]


def test_partitioned_write(spark, frame, tmp_path):
    path = str(tmp_path / "parts")
    write_table(frame.where(F.col("flag").isNotNull()), path, partition_by=["flag"])
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert {f"flag={r.flag}" for r in back.collect()} <= {"flag=true", "flag=false"}


def test_register_views(spark):
    register_views(spark, "/root/testdata/sf0.001", ["region", "nation"])
    got = spark.sql(
        "SELECT count(*) AS n FROM region JOIN nation ON r_regionkey = n_regionkey"
    ).collect()[0].n
    assert got == 25


def test_text_round_trip_and_guard(spark, frame, tmp_path):
    path = str(tmp_path / "txt")
    write_table(frame.select(F.col("name").alias("value")), path, format="text")
    back = read_table(spark, path, format="text")
    assert back.columns == ["value"]
    # text has no null encoding: None rows write as empty lines
    assert sorted(r.value for r in back.collect()) == ["", "a", "b,with,commas"]
    with pytest.raises(ValueError, match="one string column"):
        write_table(frame, str(tmp_path / "bad"), format="text")
