"""Dependency-free presentation renderers for the S10/S11 sinks.

The engine's map/chart DATA contracts are oracle-checked Spark queries
(``q_route_map_path``, ``q_chart_top10_costs``); this module turns those
frames into the same artifacts the reference produces with
folium / matplotlib / seaborn — a Leaflet route-map HTML
(reference ``mapping.py:9-37``), a top-10 cost bar chart
(``main.py:86-98``) and a per-vehicle speed line plot
(``main.py:107-112``) — using nothing beyond the standard library, so
the presentation edge works in containers without plotting libs.

Inputs are the small, capped pandas frames from
:func:`sinks.to_pandas_edge` (the reference also renders driver-side
pandas); every renderer is a pure ``frame -> str`` function plus an
atomic ``save_*`` wrapper mirroring the reference's ``m.save(...)`` /
``plt.show()`` edge.  Rendering is deterministic: same frame, same
bytes.
"""

from __future__ import annotations

import os
from html import escape

#: Leaflet assets, same CDN-style references folium emits in its HTML.
_LEAFLET_CSS = "https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"
_LEAFLET_JS = "https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"

_MAP_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>Route map</title>
<link rel="stylesheet" href="{css}"/>
<script src="{js}"></script>
<style>#map {{ width: 100%; height: 100vh; }}</style>
</head>
<body>
<div id="map"></div>
<script>
var map = L.map('map').setView([{center_lat}, {center_lon}], {zoom});
L.tileLayer('https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png',
            {{maxZoom: 19}}).addTo(map);
var path = {path_json};
L.polyline(path, {{color: 'blue'}}).bindTooltip("Coast").addTo(map);
L.circleMarker(path[0], {{color: 'green', radius: 8}})
  .bindPopup("Start").addTo(map);
L.circleMarker(path[path.length - 1], {{color: 'red', radius: 8}})
  .bindPopup("Koniec").addTo(map);
</script>
</body>
</html>
"""


def render_route_map(path_pdf, zoom: int = 13) -> str:
    """Leaflet HTML for the drill-down vehicle's route.

    ``path_pdf`` is the ``q_route_map_path`` frame: one row per ping
    with (seq, lat, lon, is_start, is_end, center_lat, center_lon).
    Mirrors reference ``mapping.py:9-37``: map centered on the path's
    mean point at zoom 13, one PolyLine over the (ts-ordered) points
    with tooltip "Coast", a green Start marker on the first point and
    a red "Koniec" marker on the last.
    """
    rows = path_pdf.sort_values("seq")
    if len(rows) == 0:
        raise ValueError("route path is empty — nothing to render")
    pts = [
        f"[{lat:.6f}, {lon:.6f}]"
        for lat, lon in zip(rows["lat"], rows["lon"])
    ]
    first = rows.iloc[0]
    return _MAP_TEMPLATE.format(
        css=_LEAFLET_CSS,
        js=_LEAFLET_JS,
        center_lat=f"{first['center_lat']:.6f}",
        center_lon=f"{first['center_lon']:.6f}",
        zoom=zoom,
        path_json="[" + ", ".join(pts) + "]",
    )


def _svg_header(width: int, height: int, title: str) -> list:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="sans-serif">',
        f'<text x="{width / 2:.1f}" y="24" text-anchor="middle" '
        f'font-size="16">{escape(title)}</text>',
    ]


def _axis_labels(out: list, width: int, height: int, xlabel: str,
                 ylabel: str) -> None:
    out.append(
        f'<text x="{width / 2:.1f}" y="{height - 6}" '
        f'text-anchor="middle" font-size="13">{escape(xlabel)}</text>'
    )
    out.append(
        f'<text x="14" y="{height / 2:.1f}" text-anchor="middle" '
        f'font-size="13" transform="rotate(-90 14 {height / 2:.1f})">'
        f"{escape(ylabel)}</text>"
    )


def render_top10_bar(
    chart_pdf,
    title: str = "Top 10 najdroższych linii autobusowych",
    xlabel: str = "Numer Linii",
    ylabel: str = "Całkowity koszt paliwa (PLN)",
    width: int = 1000,
    height: int = 600,
) -> str:
    """SVG bar chart of the top-10 lines by total fuel cost.

    ``chart_pdf`` is the ``q_chart_top10_costs`` frame: (bar_pos, line,
    total_cost_pln) with bar_pos = the bar's x position ranked ASCENDING
    by cost — the same display order as reference ``main.py:86-98``
    (cheapest of the top-10 leftmost), so bars are laid out by ascending
    bar_pos.  Bars are skyblue with proportional heights and value
    captions.
    """
    rows = chart_pdf.sort_values("bar_pos", ascending=True)
    n = len(rows)
    if n == 0:
        raise ValueError("chart frame is empty — nothing to render")
    top, bottom, left = 40.0, 70.0, 60.0
    plot_w, plot_h = width - left - 20.0, height - top - bottom
    vmax = max(float(v) for v in rows["total_cost_pln"]) or 1.0
    slot = plot_w / n
    bar_w = slot * 0.8
    out = _svg_header(width, height, title)
    out.append(
        f'<line x1="{left}" y1="{top + plot_h:.1f}" '
        f'x2="{left + plot_w:.1f}" y2="{top + plot_h:.1f}" '
        f'stroke="black"/>'
    )
    for i, (_, r) in enumerate(rows.iterrows()):
        v = float(r["total_cost_pln"])
        h = plot_h * v / vmax
        x = left + i * slot + (slot - bar_w) / 2
        y = top + plot_h - h
        label = escape(str(r["line"]))
        out.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w:.1f}" '
            f'height="{h:.1f}" fill="skyblue"/>'
        )
        out.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{top + plot_h + 16:.1f}" '
            f'text-anchor="middle" font-size="11">{label}</text>'
        )
        out.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{y - 4:.1f}" '
            f'text-anchor="middle" font-size="10">{v:.2f}</text>'
        )
    _axis_labels(out, width, height, xlabel, ylabel)
    out.append("</svg>")
    return "\n".join(out)


#: deterministic per-series palette (cycled), seaborn-ish defaults
_SERIES_COLORS = (
    "#4c72b0", "#dd8452", "#55a868", "#c44e52", "#8172b3",
    "#937860", "#da8bc3", "#8c8c8c", "#ccb974", "#64b5cd",
)


def render_speed_lines(
    pdf,
    x: str = "ts",
    y: str = "speed_kmh",
    hue: str = "user_id",
    title: str = "Prędkość autobusu z największym kosztem paliwa",
    xlabel: str = "Czas",
    ylabel: str = "Predkosc km/h",
    width: int = 1000,
    height: int = 600,
) -> str:
    """SVG line plot of speed over time, one polyline per vehicle.

    Mirrors reference ``main.py:107-112`` (``sns.relplot(kind="line",
    hue='VehicleNumber')``) over the drill-down vehicle's enriched
    pings.  ``x`` may be datetimes or numbers; series are drawn in
    sorted-``hue`` order with a deterministic palette, points within a
    series in ascending ``x``.
    """
    if len(pdf) == 0:
        raise ValueError("line frame is empty — nothing to render")
    xs = pdf[x]
    # datetimes → epoch seconds for scaling; numbers pass through
    if hasattr(xs, "dt"):
        try:
            xv = xs.astype("int64") / 1e9
        except (TypeError, ValueError):
            xv = xs.astype(float)
    else:
        xv = xs.astype(float)
    yv = pdf[y].astype(float)
    x0, x1 = float(xv.min()), float(xv.max())
    y0, y1 = float(yv.min()), float(yv.max())
    xspan = (x1 - x0) or 1.0
    yspan = (y1 - y0) or 1.0
    top, bottom, left = 40.0, 70.0, 60.0
    # 130 px right gutter so legend labels render inside the viewBox
    # instead of clipping at the edge
    plot_w, plot_h = width - left - 130.0, height - top - bottom

    def sx(v: float) -> float:
        return left + (v - x0) / xspan * plot_w

    def sy(v: float) -> float:
        return top + plot_h - (v - y0) / yspan * plot_h

    out = _svg_header(width, height, title)
    out.append(
        f'<rect x="{left}" y="{top}" width="{plot_w:.1f}" '
        f'height="{plot_h:.1f}" fill="none" stroke="#cccccc"/>'
    )
    work = pdf.assign(__x=xv, __y=yv)
    for i, key in enumerate(sorted(work[hue].unique(), key=str)):
        series = work[work[hue] == key].sort_values("__x")
        color = _SERIES_COLORS[i % len(_SERIES_COLORS)]
        pts = " ".join(
            f"{sx(a):.1f},{sy(b):.1f}"
            for a, b in zip(series["__x"], series["__y"])
        )
        out.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" '
            f'stroke-width="2"/>'
        )
        out.append(
            f'<text x="{left + plot_w + 8:.1f}" y="{top + 14 + i * 16:.1f}" '
            f'font-size="11" fill="{color}">{escape(str(key))}</text>'
        )
    _axis_labels(out, width, height, xlabel, ylabel)
    out.append("</svg>")
    return "\n".join(out)


#: process-wide tmp-name counter (next() is atomic under the GIL) so
#: concurrent same-process saves to one dest never share a tmp inode —
#: same discipline as landing._TMP_SEQ
_TMP_SEQ = __import__("itertools").count()


def _atomic_write(text: str, dest: str) -> None:
    """Publish via dot-tmp + rename so readers never see a partial file
    (same discipline as landing.save_raw)."""
    d, base = os.path.split(os.path.abspath(dest))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{base}.{os.getpid()}_{next(_TMP_SEQ)}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dest)


def save_route_map(path_pdf, dest: str, zoom: int = 13) -> None:
    """``Mapping.path_map``'s ``m.save("map.html")`` edge (mapping.py:37)."""
    _atomic_write(render_route_map(path_pdf, zoom=zoom), dest)


def save_top10_bar(chart_pdf, dest: str, **kw) -> None:
    _atomic_write(render_top10_bar(chart_pdf, **kw), dest)


def save_speed_lines(pdf, dest: str, **kw) -> None:
    _atomic_write(render_speed_lines(pdf, **kw), dest)
