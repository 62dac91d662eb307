import sys

import pytest

sys.path.insert(0, "/root/repo")

from end_to_end_datapipeline_project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def make_bronze_df(spark, records):
    """Build the Bronze envelope shape ``{"result": [...]}`` from a list of
    (Lines, VehicleNumber, Lat, Lon, Time) tuples — mirrors the raw API
    snapshot files (FIXTURES.md §1)."""
    from end_to_end_datapipeline_project_spark.schemas import BRONZE_SCHEMA

    rows = [([r for r in records],)]
    return spark.createDataFrame(rows, BRONZE_SCHEMA)


def make_silver_df(spark, rows):
    """Build rows matching the Silver contract (FIXTURES.md §2):
    (Lines, VehicleNumber, Lat, Lon, Time iso-string)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "Lines string, VehicleNumber string, Lat double, Lon double, Time string"
    )
    return df.withColumn("Time", F.col("Time").cast("timestamp")).withColumn(
        "date", F.to_date("Time")
    )


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture so hypothesis @given tests can take the session-scoped
    SparkSession without hypothesis treating it as a strategy argument."""
    return spark
