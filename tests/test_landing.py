"""Landing client (SURVEY.md §2.1 S1-S3): retry policy, partition layout,
failure handling — all with a stubbed transport, no network."""

import json
from datetime import datetime, timezone

import requests

from end_to_end_datapipeline_project_spark.landing import (
    RETRY_POLICY,
    LandingClient,
    make_session,
)


class _FakeResponse:
    def __init__(self, payload=None, status=200):
        self._payload = payload
        self.status_code = status

    def raise_for_status(self):
        if self.status_code >= 400:
            raise requests.HTTPError(f"{self.status_code}")

    def json(self):
        return self._payload


class _FakeSession:
    def __init__(self, responses):
        self._responses = list(responses)
        self.calls = []

    def get(self, url, params=None, timeout=None):
        self.calls.append((url, params, timeout))
        r = self._responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


def test_session_mounts_reference_retry_policy():
    s = make_session()
    for scheme in ("http://", "https://"):
        retry = s.get_adapter(scheme + "x").max_retries
        assert retry.total == RETRY_POLICY["total"]
        assert retry.backoff_factor == RETRY_POLICY["backoff_factor"]
        assert set(retry.status_forcelist) == set(
            RETRY_POLICY["status_forcelist"]
        )


def test_poll_once_lands_hive_partitioned_file(tmp_path):
    payload = {"result": [{"Lines": "180", "VehicleNumber": "1000"}]}
    fake = _FakeSession([_FakeResponse(payload)])
    c = LandingClient("WAW", "http://api", str(tmp_path), session=fake)
    now = datetime(2026, 2, 23, 12, 21, 44, tzinfo=timezone.utc)
    path = c.poll_once({"type": "1"}, now=now)
    assert path.endswith(
        "WAW/year=2026/month=02/day=23/WAW_20260223_122144.json"
    )
    assert json.load(open(path)) == payload
    # timeout forwarded (gtfsdataingestor.py:42-46 parity)
    assert fake.calls[0][2] == 10.0


def test_poll_once_skips_save_on_failure(tmp_path):
    fake = _FakeSession([requests.ConnectionError("down")])
    c = LandingClient("WAW", "http://api", str(tmp_path), session=fake)
    assert c.poll_once({}) is None  # the reference would crash here
    assert list(tmp_path.iterdir()) == []


def test_save_raw_linkless_fs_fallback(tmp_path, monkeypatch):
    """On filesystems that forbid hard links, save_raw must NOT expose a
    visible 0-byte .json at any instant: the fallback renames the fully
    written tmp onto a writer-unique final name.  Simulated by making
    os.link raise EPERM (as FUSE/network mounts do)."""
    import os as _os

    def _no_link(*a, **kw):
        raise PermissionError("hard links not supported")

    monkeypatch.setattr(
        "end_to_end_datapipeline_project_spark.landing.os.link", _no_link
    )
    payload = {"result": [{"Lines": "180"}]}
    fake = _FakeSession([_FakeResponse(payload), _FakeResponse(payload)])
    c = LandingClient("WAW", "http://api", str(tmp_path), session=fake)
    now = datetime(2026, 2, 23, 12, 21, 44, tzinfo=timezone.utc)
    p1 = c.poll_once({}, now=now)
    p2 = c.poll_once({}, now=now)  # same-second poll must not clobber
    assert p1 != p2
    for p in (p1, p2):
        assert json.load(open(p)) == payload
        base = _os.path.basename(p)
        assert base.startswith("WAW_20260223_122144_")  # writer-unique
        assert not base.startswith(".")
    part = _os.path.dirname(p1)
    # no leaked tmp, no claimed empty files
    names = sorted(_os.listdir(part))
    assert names == sorted([_os.path.basename(p1), _os.path.basename(p2)])


def test_http_error_returns_none(tmp_path):
    fake = _FakeSession([_FakeResponse(status=503)])
    c = LandingClient("WAW", "http://api", str(tmp_path), session=fake)
    assert c.get_data({}) is None


def test_landing_against_real_local_http_server(spark, tmp_path):
    """Full offline integration: a real HTTP server on 127.0.0.1 serves
    the bus-API envelope, failing the first attempt with a 503 so the
    urllib3 Retry adapter (reference retry policy) actually retries at
    the transport level; the landed year=/month=/day= file then round-
    trips through read_bronze -> bronze_to_silver."""
    import json
    import threading
    from datetime import datetime, timezone
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from end_to_end_datapipeline_project_spark.cleanse import bronze_to_silver
    from end_to_end_datapipeline_project_spark.landing import LandingClient
    from end_to_end_datapipeline_project_spark.sources import read_bronze

    payload = {
        "result": [
            {
                "Lines": "130",
                "VehicleNumber": "V1",
                "Lat": 52.2,
                "Lon": 21.0,
                "Time": "2026-02-10 12:00:00",
                "Brigade": "1",
            },
            {
                "Lines": "130",
                "VehicleNumber": "V1",
                "Lat": 52.21,
                "Lon": 21.01,
                "Time": "2026-02-10 12:00:30",
                "Brigade": "1",
            },
        ]
    }
    hits = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if len(hits) == 1:
                self.send_response(503)  # Retry-covered status
                self.end_headers()
                return
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        client = LandingClient(
            city="WAW",
            base_url=f"http://127.0.0.1:{srv.server_port}/api",
            save_path=str(tmp_path),
        )
        now = datetime(2026, 2, 10, 12, 0, 45, tzinfo=timezone.utc)
        path = client.poll_once({"type": "1"}, now=now)
    finally:
        srv.shutdown()
    assert path is not None and "/year=2026/month=02/day=10/" in path
    assert len(hits) == 2  # transport-level retry really happened
    silver = bronze_to_silver(
        read_bronze(spark, f"{tmp_path}/WAW"), "2026-02-10"
    )
    rows = silver.collect()
    assert {(r.VehicleNumber, str(r.Time)) for r in rows} == {
        ("V1", "2026-02-10 12:00:00"),
        ("V1", "2026-02-10 12:00:30"),
    }
