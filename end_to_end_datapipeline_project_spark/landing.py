"""Bronze landing client: HTTP polling → Hive-partitioned raw JSON files.

Reference parity for SURVEY.md §2.1 S1-S3 (`gtfsdataingestor.py:20-67`):
same retry policy (3 retries, backoff factor 1, on 429/500/502/503/504
for GET, mounted on http+https), same 10 s timeout, same
``{save_path}/{city}/year=YYYY/month=MM/day=DD/{city}_{ts}.json`` layout.
Deliberately NOT ported: the reference passes a failed request's ``None``
straight into ``json.dump`` and crashes the polling loop
(`main.py:40-45`, flagged in SURVEY.md §3.1); here ``poll_once`` skips
the save and reports failure instead.

The client is transport-injectable so tests exercise retry/timeout/layout
without any network; the engine proper never imports this module — landed
files enter through ``sources.read_bronze`` (batch) or
``streaming.read_bronze_stream`` (incremental), keeping ingestion-side
concerns out of query plans (SURVEY.md §7.4).
"""

from __future__ import annotations

import itertools
import json
import os
from datetime import datetime, timezone

import requests
from urllib3.util.retry import Retry

#: reference retry policy, gtfsdataingestor.py:20-24
RETRY_POLICY = dict(
    total=3,
    backoff_factor=1,
    status_forcelist=(429, 500, 502, 503, 504),
    allowed_methods=("GET",),
)
TIMEOUT_S = 10.0

#: process-wide tmp-name counter (next() is atomic under the GIL), so
#: concurrent threads never share a landing tmp inode
_TMP_SEQ = itertools.count()


def make_session() -> requests.Session:
    """requests Session with the reference's urllib3 Retry mounted on
    both schemes (gtfsdataingestor.py:25-28)."""
    session = requests.Session()
    adapter = requests.adapters.HTTPAdapter(max_retries=Retry(**RETRY_POLICY))
    session.mount("http://", adapter)
    session.mount("https://", adapter)
    return session


class LandingClient:
    """Poll a JSON API and land each snapshot as one raw file per poll."""

    def __init__(
        self,
        city: str,
        base_url: str,
        save_path: str,
        session: requests.Session | None = None,
    ):
        self.city = city
        self.base_url = base_url
        self.save_path = save_path
        self.session = session or make_session()

    def get_data(self, params: dict) -> dict | None:
        """GET with timeout + raise_for_status; None on request failure
        (gtfsdataingestor.py:32-54)."""
        try:
            resp = self.session.get(
                self.base_url, params=params, timeout=TIMEOUT_S
            )
            resp.raise_for_status()
            return resp.json()
        except requests.RequestException:
            return None

    def save_raw(self, data: dict, now: datetime | None = None) -> str:
        """Write one snapshot to the Hive-style date partition dir and
        return the path (gtfsdataingestor.py:57-67)."""
        now = now or datetime.now(timezone.utc)
        part = (
            f"{self.save_path}/{self.city}/year={now:%Y}"
            f"/month={now:%m}/day={now:%d}"
        )
        os.makedirs(part, exist_ok=True)
        path = f"{part}/{self.city}_{now:%Y%m%d_%H%M%S}.json"
        # atomic publish: a streaming file source listing the landing dir
        # must never see a half-written snapshot (a 0-byte/truncated JSON
        # parses to result=NULL and the poll silently vanishes from
        # Silver, and file sources track paths-as-seen so the replaced
        # content is never reprocessed) — write the dot-prefixed temp
        # FIRST (Spark sources ignore dotfiles), then claim the final
        # name atomically with link(2): the visible path only ever
        # appears fully written.  FileExistsError on the link
        # disambiguates same-second polls instead of clobbering the
        # earlier snapshot.
        # per-writer-unique tmp (pid + process-wide counter): two
        # concurrent same-second polls must not share a tmp inode — a
        # shared name would let writer B truncate the bytes writer A is
        # about to link into visibility
        tmp = (
            f"{part}/.{self.city}_{now:%Y%m%d_%H%M%S}"
            f"_{os.getpid()}_{next(_TMP_SEQ)}.json.tmp"
        )
        try:
            with open(tmp, "w") as f:
                json.dump(data, f)
            seq = 0
            while True:
                try:
                    os.link(tmp, path)
                    break
                except FileExistsError:
                    seq += 1
                    path = (
                        f"{part}/{self.city}_{now:%Y%m%d_%H%M%S}_{seq}.json"
                    )
                except OSError:
                    # filesystem forbids hard links (some network/FUSE
                    # mounts).  No claim dance here: an O_EXCL claim +
                    # replace exposes a visible 0-byte .json between the
                    # two calls — exactly the half-written-snapshot
                    # hazard this function exists to prevent (a file
                    # source that lists in that window records the path
                    # as seen, parses NULL, and never reprocesses the
                    # replaced bytes).  Instead make the FINAL name
                    # writer-unique (pid + process-wide counter, same
                    # scheme as tmp) and atomically rename the fully
                    # written tmp onto it — the path only ever appears
                    # complete, and uniqueness removes the collision the
                    # claim was guarding against.
                    path = (
                        f"{part}/{self.city}_{now:%Y%m%d_%H%M%S}"
                        f"_{os.getpid()}_{next(_TMP_SEQ)}.json"
                    )
                    os.replace(tmp, path)
                    return path
        finally:
            # never leak the dot-prefixed tmp into the landing partition
            # (replace() above consumes it; unlink tolerates that)
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass
        return path

    def poll_once(self, params: dict, now: datetime | None = None) -> str | None:
        """One poll: fetch, skip-on-failure (the reference's None-crash
        fixed), land on success. Returns the landed path or None."""
        data = self.get_data(params)
        if data is None:
            return None
        return self.save_raw(data, now=now)
