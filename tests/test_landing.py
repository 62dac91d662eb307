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


def test_http_error_returns_none(tmp_path):
    fake = _FakeSession([_FakeResponse(status=503)])
    c = LandingClient("WAW", "http://api", str(tmp_path), session=fake)
    assert c.get_data({}) is None
