"""End-to-end orchestrator: Bronze JSON landing zone → Silver → Gold with
dynamic-partition-overwrite idempotency (reference main.py --mode
transform as a library, incremental instead of full-rewrite)."""

import json
import os

from pyspark.sql import functions as F

from end_to_end_datapipeline_project_spark.etl import run_batch

DAY = "2026-02-23"


def _land(base, year, month, day, name, records):
    d = f"{base}/year={year}/month={month:02d}/day={day:02d}"
    os.makedirs(d, exist_ok=True)
    with open(f"{d}/{name}.json", "w") as f:
        json.dump({"result": records}, f)


def rec(line, veh, time, lat=52.2, lon=21.0):
    return {
        "Lines": line,
        "VehicleNumber": veh,
        "Lat": lat,
        "Lon": lon,
        "Time": time,
    }


def test_run_batch_end_to_end_and_idempotent(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    # two pings for one vehicle (a real segment), one dup, one other-day row
    _land(
        bronze, 2026, 2, 23, "s1",
        [
            rec("180", "1000", f"{DAY} 12:00:00"),
            rec("180", "1000", f"{DAY} 12:00:15", lat=52.2001),
            rec("180", "1000", f"{DAY} 12:00:15", lat=52.2001),  # dup
            rec("7", "2000", "2026-02-22 09:00:00"),  # other day: filtered
        ],
    )
    report = run_batch(
        spark, bronze, silver, gold, DAY, year=2026, month=2, day=23
    )
    rows = report.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.Lines == "180"
    assert r.data_points_count == 2
    assert r.unique_vehicles_count == 1
    assert r.total_distance_km > 0

    silver_rows = spark.read.parquet(silver).count()
    assert silver_rows == 2  # dup collapsed, other-day row filtered

    # re-run the same date: dynamic overwrite replaces, never duplicates
    report2 = run_batch(
        spark, bronze, silver, gold, DAY, year=2026, month=2, day=23
    )
    assert spark.read.parquet(silver).count() == 2
    assert report2.count() == 1

    # a second date lands and processes WITHOUT touching day 23's outputs
    _land(bronze, 2026, 2, 24, "s2", [rec("9", "3000", "2026-02-24 08:00:00")])
    run_batch(spark, bronze, silver, gold, "2026-02-24", 2026, 2, 24)
    all_silver = spark.read.parquet(silver)
    assert all_silver.count() == 3
    assert {str(r.date) for r in all_silver.select("date").distinct().collect()} == {
        "2026-02-23",
        "2026-02-24",
    }
    assert spark.read.parquet(gold).count() == 2


def test_rerun_with_zero_rows_replaces_stale_partition(spark, tmp_path):
    """A corrected landing file that cleanses to ZERO rows must still
    replace the previous run's partition — dynamic partition overwrite
    no-ops on empty frames and would leave stale Silver/Gold data."""
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    _land(
        bronze, 2026, 2, 23, "s1",
        [rec("180", "1000", f"{DAY} 12:00:00"),
         rec("180", "1000", f"{DAY} 12:00:15", lat=52.2001)],
    )
    report = run_batch(
        spark, bronze, silver, gold, DAY, year=2026, month=2, day=23
    )
    assert report.count() == 1
    assert spark.read.parquet(silver).count() == 2

    # "correct" the landing data: every row now fails the bounding-box
    # cleanse -> the re-run's silver frame is EMPTY
    _land(
        bronze, 2026, 2, 23, "s1",
        [rec("180", "1000", f"{DAY} 12:00:00", lat=0.0, lon=0.0),
         rec("180", "1000", f"{DAY} 12:00:15", lat=0.0, lon=0.0)],
    )
    report2 = run_batch(
        spark, bronze, silver, gold, DAY, year=2026, month=2, day=23
    )
    assert report2.count() == 0  # stale Gold must NOT resurface
    assert spark.read.parquet(silver).count() == 0
