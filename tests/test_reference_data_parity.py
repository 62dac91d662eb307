"""Switchability proof: run THIS engine's bronze→silver→gold pipeline on
the reference repo's OWN raw landing-zone files (/root/reference/WAW —
real `{"result": [...]}` bus-GPS JSON, `year=/month=/day=` partitioned)
and cross-check the silver row set against an independent DuckDB
evaluation of the reference's cleanse semantics
(gtfstransformerSilver.py:27-56: explode → trim/cast → dropna → Warsaw
box → target date → non-empty Lines → dedup on (VehicleNumber, Time)).

A user of the reference can point this repo at the same raw files and
get the same silver rows — asserted here, not claimed.
"""

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from end_to_end_datapipeline_project_spark.cleanse import bronze_to_silver
from end_to_end_datapipeline_project_spark.pipeline_queries import EVENTS_TRAJ  # noqa: F401
from end_to_end_datapipeline_project_spark.reports import daily_report
from end_to_end_datapipeline_project_spark.sources import read_bronze
from end_to_end_datapipeline_project_spark.trajectory import TrajectoryConfig, enrich

RAW = "/root/reference/WAW"
DAY = "2026-02-10"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RAW), reason="reference raw data not present"
)

BUS_TRAJ = TrajectoryConfig(
    key="VehicleNumber", time="Time", lat="Lat", lon="Lon"
)


def _duck_silver(day: str):
    """Independent implementation of the reference cleanse in DuckDB."""
    files = sorted(glob.glob(f"{RAW}/year=*/month=*/day=*/*.json"))
    con = duckdb.connect()
    listing = ", ".join(f"'{f}'" for f in files)
    return con.sql(
        f"""
      WITH raw AS (
        SELECT unnest(result) AS v
        FROM read_json([{listing}],
          columns = {{'result': 'STRUCT(Lines VARCHAR, Lon DOUBLE,
                       VehicleNumber VARCHAR, "Time" VARCHAR,
                       Lat DOUBLE, Brigade VARCHAR)[]'}})
      ),
      typed AS (
        SELECT trim(v.Lines) AS Lines,
               trim(v.VehicleNumber) AS VehicleNumber,
               v.Lat AS Lat, v.Lon AS Lon,
               CAST(v."Time" AS TIMESTAMP) AS t,
               CAST(CAST(v."Time" AS TIMESTAMP) AS DATE) AS d
        FROM raw
        WHERE v.Lines IS NOT NULL AND v.VehicleNumber IS NOT NULL
          AND v.Lat IS NOT NULL AND v.Lon IS NOT NULL
          AND v."Time" IS NOT NULL
      ),
      boxed AS (
        SELECT * FROM typed
        WHERE Lat BETWEEN 52.0 AND 52.4 AND Lon BETWEEN 20.5 AND 21.5
          AND d = DATE '{day}' AND Lines <> ''
      )
      SELECT DISTINCT ON (VehicleNumber, t)
             Lines, VehicleNumber, Lat, Lon, t
      FROM boxed ORDER BY VehicleNumber, t, Lines, Lat, Lon
    """
    ).fetchall()


def test_silver_matches_independent_cleanse_on_reference_raw(spark):
    bronze = read_bronze(spark, RAW)
    silver = bronze_to_silver(bronze, DAY)
    got = {
        (r.Lines, r.VehicleNumber, str(r.Time))
        for r in silver.select("Lines", "VehicleNumber", "Time").collect()
    }
    exp = {(l, v, str(t)) for (l, v, la, lo, t) in _duck_silver(DAY)}
    assert got == exp
    assert len(got) > 100  # real data, non-trivial volume
    # reference silver contract: column set and no nulls
    assert set(silver.columns) == {"Lines", "VehicleNumber", "Lat", "Lon", "Time", "date"}
    assert silver.filter(
        F.col("Lines").isNull() | F.col("VehicleNumber").isNull()
    ).count() == 0


def test_gold_report_runs_on_reference_raw(spark):
    bronze = read_bronze(spark, RAW, year=2026, month=2, day=10)
    silver = bronze_to_silver(bronze, DAY)
    enriched = enrich(silver, BUS_TRAJ)
    rep = daily_report(enriched, group_col="Lines")
    rows = rep.collect()
    assert rows
    for r in rows:
        assert r.total_distance_km >= 0
        assert r.max_recorded_speed <= 70.0  # anomaly cutoff applied
        assert r.unique_vehicles_count >= 1
