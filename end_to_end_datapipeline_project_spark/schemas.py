"""Declared schemas (schema-on-read, never inference).

The reference declares its Bronze envelope schema explicitly so the JSON
parser projects away unused fields at parse time (reference
gtfstransformerSilver.py:12-22 — note it deliberately drops the raw
``Brigade`` field).  We keep that discipline: explicit StructTypes double as
projection pushdown and as documentation of the data contract.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- GTFS bus-position domain (reference parity) -------------------------

#: One vehicle-position record inside the raw API envelope.
BUS_SCHEMA = T.StructType(
    [
        T.StructField("Lines", T.StringType(), True),
        T.StructField("VehicleNumber", T.StringType(), True),
        T.StructField("Lat", T.DoubleType(), True),
        T.StructField("Lon", T.DoubleType(), True),
        T.StructField("Time", T.StringType(), True),
    ]
)

#: Raw Bronze file shape: ``{"result": [ {record}, ... ]}``.
BRONZE_SCHEMA = T.StructType(
    [T.StructField("result", T.ArrayType(BUS_SCHEMA), True)]
)

#: Silver contract (reference tests/test_silver.py:134-144).
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("Lines", T.StringType(), False),
        T.StructField("VehicleNumber", T.StringType(), False),
        T.StructField("Lat", T.DoubleType(), False),
        T.StructField("Lon", T.DoubleType(), False),
        T.StructField("Time", T.TimestampType(), False),
        T.StructField("date", T.DateType(), False),
    ]
)

#: Gold per-line daily report contract (reference gtfsGold.py:94-105).
GOLD_REPORT_COLUMNS = [
    "Lines",
    "total_distance_km",
    "total_cost_pln",
    "max_segment_km",
    "data_points_count",
    "avg_speed",
    "max_recorded_speed",
    "unique_vehicles_count",
    "avg_dist_per_vehicle",
    "cost_of_1km",
]

# --- driver testdata domain (TESTDATA.md) --------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# (the multimodal asset/feature contracts live with their kernels in
# llm_ops/multimodal.py — a second copy here drifted from the real
# schema and was removed)
