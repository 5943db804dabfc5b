import datetime as dt

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dftly-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def run1(spark):
    """Evaluate one dftly expression against a one-row DataFrame.

    ``run1(expr, schema="a int", row=(None,))`` or ``run1(expr, **{"a": 1})``.
    """
    from dftly_spark import Parser

    def _run(expr, schema=None, row=None, **data):
        if schema is not None:
            df = spark.createDataFrame([row or ()], schema)
        elif data:
            df = spark.createDataFrame([tuple(data.values())], list(data.keys()))
        else:
            df = spark.range(1)
        return df.select(Parser.expr_to_spark(expr, schema=df).alias("v")).collect()[0][0]

    return _run
