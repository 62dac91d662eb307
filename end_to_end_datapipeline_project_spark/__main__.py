"""CLI orchestration — ``python -m end_to_end_datapipeline_project_spark``.

Reference parity for ``main.py:29-31`` (``argparse --mode
ingest|transform``), wired to the engine's library surface instead of the
reference's inline script:

- ``--mode ingest``: the reference's 49-iteration polling loop
  (``main.py:37-45``) via :class:`landing.LandingClient` — poll count and
  interval are flags, a failed poll is skipped instead of crashing the
  loop on ``json.dump(None)`` (the reference bug SURVEY.md §3.1 flags).
- ``--mode transform``: the reference's Bronze→Silver→Gold run
  (``main.py:48-116``) via :func:`etl.run_batch` with partition-pruned
  bronze reads, then prints the Gold report and the top-10 chart frame
  (the data contract behind the reference's matplotlib bar chart,
  ``main.py:86-98``) through the Arrow pandas edge.

Everything is injectable (spark session, landing client, clock) so tests
exercise both modes end-to-end without network or a real cluster.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Callable

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m end_to_end_datapipeline_project_spark",
        description="Bronze/Silver/Gold ETL orchestrator (Spark-first "
        "re-expression of the reference pipeline).",
    )
    p.add_argument(
        "--mode", choices=["ingest", "transform"], required=True
    )
    # ingest flags (env-var defaults mirror reference main.py:22-25)
    p.add_argument("--base-url", default=os.environ.get("BASE_URL"))
    p.add_argument("--save-path", default=os.environ.get("SAVE_PATH"))
    p.add_argument("--city", default=os.environ.get("CITY", "WAW"))
    p.add_argument("--resource-id", default=os.environ.get("RESOURCE_ID"))
    p.add_argument("--api-type", default=os.environ.get("API_TYPE"))
    p.add_argument("--polls", type=int, default=49)
    p.add_argument("--interval", type=float, default=15.0)
    # transform flags
    p.add_argument("--bronze-dir")
    p.add_argument("--silver-dir")
    p.add_argument("--gold-dir")
    p.add_argument("--date", help="processing date YYYY-MM-DD")
    p.add_argument(
        "--no-prune",
        action="store_true",
        help="scan the whole landing zone instead of the date partition",
    )
    p.add_argument("--top-n", type=int, default=10)
    return p


def run_ingest(args, client=None, sleep: Callable[[float], None] = time.sleep,
               out=print) -> int:
    """Reference main.py:37-45 polling loop; returns landed-file count."""
    from .landing import LandingClient

    if client is None:
        for flag in ("base_url", "save_path"):
            if not getattr(args, flag):
                raise SystemExit(
                    f"--{flag.replace('_', '-')} (or its env var) is "
                    "required in ingest mode"
                )
        client = LandingClient(
            city=args.city, base_url=args.base_url, save_path=args.save_path
        )
    params = {}
    if args.resource_id:
        params["resource_id"] = args.resource_id
    if args.api_type:
        params["type"] = args.api_type
    landed = 0
    for i in range(args.polls):
        path = client.poll_once(params)
        if path is None:
            out(f"poll {i + 1}/{args.polls}: request failed, skipped")
        else:
            landed += 1
            out(f"poll {i + 1}/{args.polls}: landed {path}")
        if i + 1 < args.polls and args.interval > 0:
            sleep(args.interval)
    out(f"ingest done: {landed}/{args.polls} snapshots landed")
    return landed


def run_transform(args, spark=None, out=print):
    """Reference main.py:48-116 as one incremental, idempotent batch."""
    from .etl import run_batch
    from .sinks import to_pandas_edge

    for flag in ("bronze_dir", "silver_dir", "gold_dir", "date"):
        if not getattr(args, flag):
            raise SystemExit(
                f"--{flag.replace('_', '-')} is required in transform mode"
            )
    if spark is None:
        from .session import get_spark

        spark = get_spark("etl-transform")
    try:
        year, month, day = (int(x) for x in args.date.split("-"))
    except ValueError:
        raise SystemExit(
            f"--date must be YYYY-MM-DD, got {args.date!r}"
        ) from None
    report = run_batch(
        spark,
        args.bronze_dir,
        args.silver_dir,
        args.gold_dir,
        args.date,
        **(
            {}
            if args.no_prune
            else {"year": year, "month": month, "day": day}
        ),
    )
    # the chart-data contract behind the reference's matplotlib bar chart
    # (main.py:86-98): top-N lines by cost, ascending for display
    top = (
        report.orderBy(F.desc("total_cost_pln"), F.asc("Lines"))
        .limit(args.top_n)
    )
    # Lines tiebreak keeps equal-cost rows in the same deterministic
    # order q_chart_top10_costs defines (pandas' default quicksort is
    # unstable on ties)
    top_pd = to_pandas_edge(top).sort_values(
        by=["total_cost_pln", "Lines"], ascending=[True, False]
    )
    out(f"gold report for {args.date}:")
    out(top_pd.to_string(index=False))
    return report


def main(argv=None, spark=None, client=None, sleep=time.sleep, out=print):
    args = build_parser().parse_args(argv)
    if args.mode == "ingest":
        return run_ingest(args, client=client, sleep=sleep, out=out)
    return run_transform(args, spark=spark, out=out)


if __name__ == "__main__":
    main(sys.argv[1:])
