"""CLI orchestration parity (reference main.py:29-31): ``python -m
end_to_end_datapipeline_project_spark --mode ingest|transform`` end-to-end
on the synthetic bronze fixture — no network, injectable client/session."""

import json
import os

from end_to_end_datapipeline_project_spark.__main__ import main

DAY = "2026-02-23"


def _land(base, name, records, year=2026, month=2, day=23):
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


class StubClient:
    """LandingClient stand-in: scripted poll_once results."""

    def __init__(self, results):
        self.results = list(results)
        self.calls = 0

    def poll_once(self, params):
        self.calls += 1
        return self.results.pop(0) if self.results else None


def test_ingest_mode_polls_skips_failures_and_counts(tmp_path):
    client = StubClient(["/tmp/a.json", None, "/tmp/b.json"])
    slept = []
    lines = []
    landed = main(
        ["--mode", "ingest", "--polls", "3", "--interval", "0.5"],
        client=client,
        sleep=slept.append,
        out=lines.append,
    )
    assert landed == 2
    assert client.calls == 3
    # interval honored between polls, not after the last one
    assert slept == [0.5, 0.5]
    assert any("request failed, skipped" in ln for ln in lines)


def test_ingest_mode_requires_url_without_client():
    import pytest

    with pytest.raises(SystemExit):
        main(["--mode", "ingest", "--polls", "1", "--base-url", ""])


def test_transform_mode_end_to_end(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    _land(
        bronze,
        "s1",
        [
            rec("180", "1000", f"{DAY} 12:00:00"),
            rec("180", "1000", f"{DAY} 12:00:15", lat=52.2001),
            rec("7", "2000", f"{DAY} 12:00:00"),
        ],
    )
    lines = []
    report = main(
        [
            "--mode", "transform",
            "--bronze-dir", bronze,
            "--silver-dir", str(tmp_path / "silver"),
            "--gold-dir", str(tmp_path / "gold"),
            "--date", DAY,
        ],
        spark=spark,
        out=lines.append,
    )
    got = {r.Lines for r in report.collect()}
    assert got == {"180", "7"}
    # the printed chart frame carries the contract columns
    text = "\n".join(lines)
    assert "total_cost_pln" in text and "180" in text
    # gold parquet actually landed, partitioned by date
    assert os.path.isdir(f"{tmp_path}/gold/date={DAY}")


def test_transform_mode_requires_dirs(spark):
    import pytest

    with pytest.raises(SystemExit):
        main(["--mode", "transform", "--date", DAY], spark=spark)
