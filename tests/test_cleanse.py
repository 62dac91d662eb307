"""Silver-tier invariants (model: reference tests/test_silver.py, SURVEY §5)."""

import pytest
from conftest import make_bronze_df

from end_to_end_datapipeline_project_spark.cleanse import (
    bronze_to_silver,
    dedup_deterministic,
    null_probe,
)

DAY = "2026-02-23"


def rec(lines="180", veh="1000", lat=52.2, lon=21.0, time=f"{DAY} 12:00:00"):
    return (lines, veh, lat, lon, time)


def test_dedup_keeps_one_row_per_key(spark):
    bronze = make_bronze_df(
        spark, [rec(), rec(), rec(veh="1001", time=f"{DAY} 12:00:15")]
    )
    out = bronze_to_silver(bronze, DAY)
    assert out.count() == 2


def test_dedup_survivor_is_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 1, "b"), ("k", 1, "a"), ("k", 2, "z")], "k string, t int, payload string"
    )
    out = dedup_deterministic(df, keys=["k", "t"]).collect()
    by_t = {r.t: r.payload for r in out}
    assert by_t == {1: "a", 2: "z"}  # min under the tiebreak order survives


def test_geo_box_filter(spark):
    bronze = make_bronze_df(
        spark,
        [
            rec(lat=52.2, lon=21.0),  # Warsaw — kept
            rec(veh="2000", lat=50.06, lon=19.94),  # Kraków — dropped
        ],
    )
    out = bronze_to_silver(bronze, DAY).collect()
    assert len(out) == 1 and out[0].VehicleNumber == "1000"


def test_date_filter_drops_other_days(spark):
    bronze = make_bronze_df(
        spark,
        [rec(), rec(veh="2000", time="2026-02-22 23:59:59")],
    )
    assert bronze_to_silver(bronze, DAY).count() == 1


def test_empty_lines_dropped_after_trim(spark):
    bronze = make_bronze_df(
        spark, [rec(lines="  "), rec(lines=" 7 ", veh="2000")]
    )
    out = bronze_to_silver(bronze, DAY).collect()
    assert len(out) == 1 and out[0].Lines == "7"


def test_null_rows_dropped(spark):
    bronze = make_bronze_df(
        spark, [rec(), ("180", None, 52.2, 21.0, f"{DAY} 12:00:30")]
    )
    assert bronze_to_silver(bronze, DAY).count() == 1


def test_silver_schema_contract(spark):
    out = bronze_to_silver(make_bronze_df(spark, [rec()]), DAY)
    assert set(out.columns) == {"Lines", "VehicleNumber", "Lat", "Lon", "Time", "date"}
    types = dict((f.name, f.dataType.typeName()) for f in out.schema.fields)
    assert types["Lat"] == "double"
    assert types["Time"] == "timestamp"
    assert types["date"] == "date"


def test_null_probe_counts(spark):
    df = spark.createDataFrame(
        [("a", "1"), (None, "2"), ("c", None)], "Lines string, VehicleNumber string"
    )
    assert null_probe(df, ["Lines", "VehicleNumber"]) == 2


def test_silver_schema_contract(spark):
    """bronze_to_silver's output must match the declared SILVER_SCHEMA
    (name + type, reference tests/test_silver.py:134-144) — the schema
    constant is a live contract, not documentation."""
    from end_to_end_datapipeline_project_spark.schemas import SILVER_SCHEMA

    bronze = make_bronze_df(spark, [rec()])
    out = bronze_to_silver(bronze, DAY)
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in SILVER_SCHEMA.fields]
    assert got == want
