"""Dependency-free renderer tests: structure-parse the SVG/HTML outputs
and render end-to-end from the real oracle-checked contract queries."""

import xml.etree.ElementTree as ET

import pandas as pd
import pytest

from end_to_end_datapipeline_project_spark.render import (
    render_route_map,
    render_speed_lines,
    render_top10_bar,
    save_route_map,
)

SVG_NS = "{http://www.w3.org/2000/svg}"


def _path_pdf():
    return pd.DataFrame(
        {
            "seq": [2, 1, 3],  # deliberately unordered: renderer must sort
            "lat": [52.21, 52.20, 52.22],
            "lon": [21.01, 21.00, 21.02],
            "is_start": [0, 1, 0],
            "is_end": [0, 0, 1],
            "center_lat": [52.21] * 3,
            "center_lon": [21.01] * 3,
        }
    )


def test_route_map_structure():
    html = render_route_map(_path_pdf())
    # polyline over the seq-ORDERED points
    assert (
        "[[52.200000, 21.000000], [52.210000, 21.010000], "
        "[52.220000, 21.020000]]" in html
    )
    assert "setView([52.210000, 21.010000], 13)" in html
    assert "Start" in html and "Koniec" in html
    assert "'green'" in html and "'red'" in html
    # deterministic: same frame, same bytes
    assert html == render_route_map(_path_pdf())


def test_route_map_empty_raises():
    with pytest.raises(ValueError):
        render_route_map(_path_pdf().iloc[0:0])


def test_route_map_atomic_save(tmp_path):
    dest = tmp_path / "map.html"
    save_route_map(_path_pdf(), str(dest))
    assert dest.read_text().startswith("<!DOCTYPE html>")
    assert not [p for p in tmp_path.iterdir() if p.name.endswith(".tmp")]


def test_top10_bar_svg():
    pdf = pd.DataFrame(
        {
            "bar_pos": [1, 2, 3],
            "line": ["L7", "L<2>", "L9"],
            "total_cost_pln": [10.0, 20.0, 40.0],
        }
    )
    svg = render_top10_bar(pdf)
    root = ET.fromstring(svg)  # well-formed XML (incl. escaped L<2>)
    rects = [
        r
        for r in root.iter(f"{SVG_NS}rect")
        if r.get("fill") == "skyblue"
    ]
    assert len(rects) == 3
    # display order = ascending bar_pos (the contract's x position,
    # mirroring the reference's ascending sort: cheapest of the top-10
    # leftmost), and bar heights are proportional to value
    heights = [float(r.get("height")) for r in rects]
    assert heights[-1] == max(heights)
    assert abs(heights[0] / heights[-1] - 0.25) < 1e-6
    assert abs(heights[1] / heights[-1] - 0.5) < 1e-6
    labels = [t.text for t in root.iter(f"{SVG_NS}text")]
    assert "L<2>" in labels and "L9" in labels


def test_speed_lines_svg():
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:05",
                 "2024-01-01 10:00", "2024-01-01 10:05"]
            ),
            "speed_kmh": [10.0, 30.0, 20.0, 40.0],
            "user_id": [1, 1, 2, 2],
        }
    )
    svg = render_speed_lines(pdf)
    root = ET.fromstring(svg)
    lines = list(root.iter(f"{SVG_NS}polyline"))
    assert len(lines) == 2
    # two points per series, x strictly increasing within a polyline
    for pl in lines:
        pts = [p.split(",") for p in pl.get("points").split()]
        assert len(pts) == 2
        assert float(pts[0][0]) < float(pts[1][0])
    # distinct colors per series
    assert len({pl.get("stroke") for pl in lines}) == 2


def test_render_from_real_contracts(spark, sf_dir):
    """End-to-end: the oracle-checked contract queries feed the
    renderers directly — the full S10/S11 path minus a browser."""
    from end_to_end_datapipeline_project_spark.pipeline_queries import (
        q_chart_top10_costs,
        q_route_map_path,
    )
    from end_to_end_datapipeline_project_spark.sinks import to_pandas_edge

    sf = sf_dir
    path_pdf = to_pandas_edge(q_route_map_path(spark, sf))
    html = render_route_map(path_pdf)
    assert "L.polyline" in html and "Koniec" in html
    chart_pdf = to_pandas_edge(q_chart_top10_costs(spark, sf))
    svg = render_top10_bar(chart_pdf)
    root = ET.fromstring(svg)
    assert len(list(root.iter(f"{SVG_NS}rect"))) >= 1
