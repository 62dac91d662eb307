"""Grid-bucketed radius join == brute-force cross join, including points
that straddle cell boundaries (the case a wrong neighborhood would miss)."""

from pyspark.sql import functions as F

from end_to_end_datapipeline_project_spark.geo import haversine_km
from end_to_end_datapipeline_project_spark.spatial import (
    RADIUS_KM,
    _DLAT,
    _DLON,
    radius_pairs,
)


def _brute_force(points):
    a = points.select(
        F.col("user_id").alias("user_a"),
        F.col("lat").alias("la"),
        F.col("lon").alias("lo"),
    )
    b = points.select(
        F.col("user_id").alias("user_b"),
        F.col("lat").alias("lb"),
        F.col("lon").alias("lb_lon"),
    )
    d = F.round(
        haversine_km(F.col("la"), F.col("lo"), F.col("lb"), F.col("lb_lon")), 6
    )
    return (
        a.crossJoin(b)
        .filter(F.col("user_a") < F.col("user_b"))
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= RADIUS_KM)
        .select("user_a", "user_b", "dist_km")
    )


def test_grid_join_matches_brute_force_on_boundary_points(spark):
    # points deliberately placed just either side of cell edges, plus a
    # diagonal pair ~2 km apart and far-apart controls
    base_lat, base_lon = 52.2, 21.0
    eps = 1e-6
    cell_lat = (int(base_lat / _DLAT) + 1) * _DLAT  # a real cell boundary
    cell_lon = (int(base_lon / _DLON) + 1) * _DLON
    pts = [
        (1, cell_lat - eps, cell_lon - eps),
        (2, cell_lat + eps, cell_lon + eps),  # adjacent-diagonal cell, ~0 km
        (3, cell_lat - eps, cell_lon + eps),
        (4, cell_lat + 0.017, cell_lon),  # ~1.9 km north, neighbor cell
        (5, cell_lat + 0.040, cell_lon),  # ~4.4 km north, out of radius
        (6, 52.05, 20.6),  # far away
    ]
    points = spark.createDataFrame(pts, "user_id LONG, lat DOUBLE, lon DOUBLE")
    got = {tuple(r) for r in radius_pairs(points).collect()}
    want = {tuple(r) for r in _brute_force(points).collect()}
    assert got == want
    assert any(a == 1 and b == 2 for a, b, _ in want)  # boundary pair found


def test_trajectory_hausdorff_metric_properties(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.spatial import (
        _TRAJ_USERS,
        q_trajectory_hausdorff,
    )

    rows = q_trajectory_hausdorff(spark, sf_dir).collect()
    # all unordered user pairs present exactly once
    n = len({r.user_a for r in rows} | {r.user_b for r in rows})
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r.user_a < r.user_b < _TRAJ_USERS
        assert r.hausdorff_km >= 0.0
        # the synthetic box is ~45km x ~70km; Hausdorff is bounded by it
        assert r.hausdorff_km < 120.0
