"""Bronze JSON reader with partition pruning + partitioned parquet sinks."""

import json
import os

from pyspark.sql import functions as F

from end_to_end_datapipeline_project_spark.sinks import write_partitioned_parquet
from end_to_end_datapipeline_project_spark.sources import read_bronze


def write_snapshot(base, year, month, day, name, records):
    d = f"{base}/year={year}/month={month:02d}/day={day:02d}"
    os.makedirs(d, exist_ok=True)
    with open(f"{d}/{name}.json", "w") as f:
        json.dump({"result": records}, f)


def rec(veh, time, brigade="1"):
    # includes the extra Brigade field the declared schema must project away
    return {
        "Lines": "180",
        "VehicleNumber": veh,
        "Lat": 52.2,
        "Lon": 21.0,
        "Time": time,
        "Brigade": brigade,
    }


def test_read_bronze_partition_pruning(spark, tmp_path):
    base = str(tmp_path / "bronze")
    write_snapshot(base, 2026, 2, 23, "a", [rec("1000", "2026-02-23 12:00:00")])
    write_snapshot(base, 2026, 2, 22, "b", [rec("2000", "2026-02-22 12:00:00")])

    all_days = read_bronze(spark, base)
    assert all_days.select(F.explode("result")).count() == 2

    one_day = read_bronze(spark, base, year=2026, month=2, day=23)
    vehicles = [
        r.v.VehicleNumber
        for r in one_day.select(F.explode("result").alias("v")).collect()
    ]
    assert vehicles == ["1000"]

    # the partition filter must prune at the scan, not post-filter
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # declared schema projects Brigade away at parse time
    assert "Brigade" not in one_day.select(F.explode("result").alias("v")).select(
        "v.*"
    ).columns


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "2026-02-23", 1.0), ("b", "2026-02-24", 2.0)],
        "k string, date string, v double",
    ).withColumn("date", F.to_date("date"))
    out = str(tmp_path / "silver")
    write_partitioned_parquet(df, out, ["date"], files_per_partition=1)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert set(back.columns) == {"k", "v", "date"}
    # partition dirs exist → date-partition pruning is available downstream
    assert any(p.startswith("date=") for p in os.listdir(out))
