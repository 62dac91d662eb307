"""Structured Streaming tier.

The reference's "stream" is a driver-side polling loop writing JSON files
every 15 s (reference main.py:39-46) and batch jobs over the landed files.
The Spark-first upgrade (SURVEY.md §2.10) is a file-source Structured
Stream over the same landing zone:

- bronze→silver continuously, with a **watermark** bounding state and a
  **streaming dropDuplicates** keyed (VehicleNumber, Time) replacing the
  batch dedup;
- event-time windowed aggregation replacing the daily batch report;
- ``Trigger.AvailableNow`` gives the batch-parity mode: process
  everything landed, then stop — same results, same code path.

At scale the file source handles new-file discovery incrementally
(listing only new partitions), state is bounded by the watermark, and the
sink is exactly-once via checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cleanse import cleanse_filters, explode_envelope, typed_projection
from .schemas import BRONZE_SCHEMA


def read_bronze_stream(
    spark: SparkSession, bronze_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """File-source stream over the raw JSON landing zone (declared schema —
    streaming reads never infer).  ``bronze_dir`` may be a glob (e.g.
    ``.../year=*/month=*/day=*/*.json`` for the reference's partitioned
    landing zone); ``max_files_per_trigger`` sets the micro-batch size —
    smaller values exercise more batch boundaries in parity tests."""
    return (
        spark.readStream.schema(BRONZE_SCHEMA)
        .option("multiline", "true")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(bronze_dir)
    )


def bronze_to_silver_stream(
    bronze: DataFrame, current_date: str, watermark: str = "1 day"
) -> DataFrame:
    """Streaming Silver: explode → type → cleanse → watermark → streaming
    dedup on (VehicleNumber, Time).

    The watermark bounds the dedup state: keys older than event-time
    ``watermark`` are evicted, so state is O(traffic × watermark), not
    O(history) — the thing that makes this viable on an unbounded stream.

    Survivor semantics caveat: streaming dropDuplicates keeps the FIRST
    ARRIVAL per key (arrival order, not a deterministic ranking — no
    window functions on streams), while the batch tier's
    dedup_deterministic keeps the rank-1 row.  The two tiers agree
    whenever duplicate keys carry identical payloads (true of re-polled
    landing files, the reference's duplicate source); conflicting
    payloads under one key resolve arrival-ordered here and
    deterministically in batch — batch is the reproducible source of
    truth for such conflicts.
    """
    df = typed_projection(explode_envelope(bronze))
    df = cleanse_filters(df, current_date)
    return df.withWatermark("Time", watermark).dropDuplicates(
        ["VehicleNumber", "Time"]
    )


def write_silver_stream(
    silver: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Exactly-once parquet sink, partitioned by date, checkpointed."""
    writer = (
        silver.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window_size: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type with late-data
    handling — the streaming form of the reference's daily report."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


STATEFUL_OUTPUT_SCHEMA = "user_id long, n_events long, max_value double"
STATEFUL_STATE_SCHEMA = "n long, mx double"


def stateful_user_stats(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, max) maintained in GroupState across micro-batches.

    Emits the running totals once per key per batch.  Both statistics are
    monotone, so ``max()`` over the emitted rows equals the final answer
    regardless of how the input was split into batches — which is what
    makes the operator exactly checkable against a batch oracle.

    State is O(#keys); with a real unbounded stream, pair with a
    processing-time timeout to evict idle keys (omitted here because the
    driver-checked run uses Trigger.AvailableNow).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, mx = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["value"].max()
            # all-null chunk: pandas max() is NaN — adopting it would
            # poison the running max forever (NaN never compares less)
            if len(pdf) and not pd.isna(batch_max) and (
                mx is None or batch_max > mx
            ):
                mx = float(batch_max)
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        STATEFUL_OUTPUT_SCHEMA,
        STATEFUL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    spark: SparkSession, stream_df: DataFrame, table_name: str, complete: bool = True
) -> DataFrame:
    """Run an availableNow stream into an in-memory sink and return the
    result table (batch-parity execution of a streaming plan)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # detach the result from the memory sink and DROP the sink's temp
    # view: each invocation otherwise leaves its full result set
    # resident in the driver for the session lifetime (bench loops and
    # repeated gate runs accumulated every past run's rows)
    out = spark.table(table_name).localCheckpoint()
    spark.catalog.dropTempView(table_name)
    return out


def protobuf_available() -> bool:
    """transformWithStateInPandas speaks protobuf to the JVM state server;
    the capability is environment-dependent (needs the `protobuf` pip
    package), so callers gate on this instead of crashing mid-stream."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_activity_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user running (event count, distinct event-type count) via Spark
    4's ``transformWithStateInPandas`` — the arbitrary-state API that
    supersedes ``applyInPandasWithState``: typed state variables
    (ValueState / ListState / MapState) live in the RocksDB state store
    instead of one opaque pickled tuple, so state survives schema
    evolution and scales past executor memory.

    Both emitted statistics are monotone, so ``max()`` over the
    per-batch emissions equals the final answer — the same
    batch-parity-oracle trick as :func:`stateful_user_stats`.

    Requires the ``protobuf`` Python package (the state-server wire
    protocol); gate on :func:`protobuf_available`.
    """
    if not protobuf_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the `protobuf` pip package "
            "(google.protobuf) for its state-server protocol; not present "
            "in this environment"
        )

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class UserActivity(StatefulProcessor):
        def init(self, handle) -> None:
            self._count = handle.getValueState("cnt", "n BIGINT")
            self._types = handle.getListState("types", "t STRING")

        def handleInputRows(self, key, rows, timer_values):
            v = self._count.get()
            n = v[0] if v is not None else 0
            seen = set(t[0] for t in self._types.get())
            for pdf in rows:
                n += len(pdf)
                new = sorted(set(pdf["event_type"]) - seen)
                if new:
                    self._types.appendList([(t,) for t in new])
                    seen.update(new)
            self._count.update((n,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [len(seen)],
                }
            )

        def close(self) -> None:
            pass

    return events_stream.groupBy("user_id").transformWithStateInPandas(
        UserActivity(),
        "user_id BIGINT, n_events BIGINT, n_types BIGINT",
        "Update",
        "None",
    )


GEOFENCE_OUTPUT_SCHEMA = "user_id long, event_id long, ts timestamp, transition string"
GEOFENCE_STATE_SCHEMA = "last_inside int"

#: inner box shared with the batch twin (pipeline_queries._FENCE)
GEOFENCE_BOX = (52.15, 52.25, 20.9, 21.1)


def geofence_transitions_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of the batch geofence op: per-vehicle in/out state
    carried across micro-batches in GroupState, emitting only state
    CHANGES — the stateful alerting shape (enter/exit push events) a
    fleet product runs on the live stream.

    Within a batch the group's rows are sorted (ts, event_id) before the
    state walk; across batches the carried ``last_inside`` makes the
    boundary transition exact.  State is one int per vehicle — bounded
    by fleet size, not stream length (add a processing-time timeout for
    retired vehicles on a real deployment).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    lat_min, lat_max, lon_min, lon_max = GEOFENCE_BOX

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        last = state.get[0] if state.exists else -1  # -1 = no prior ping
        out = {"user_id": [], "event_id": [], "ts": [], "transition": []}
        # CONCATENATE the group's Arrow chunks before sorting: a group
        # larger than one Arrow batch arrives as several pandas frames
        # in arbitrary row order, and sorting each chunk independently
        # would walk the in/out state out of timestamp order
        whole = pd.concat(list(pdfs), ignore_index=True)
        pdf = whole.dropna(subset=["value", "ts"]).sort_values(
            ["ts", "event_id"]
        )
        frac = pdf["value"] - pdf["value"].floordiv(1)
        lat = 52.0 + frac * 0.4
        lon7 = pdf["value"] * 7
        lon = 20.5 + (lon7 - lon7.floordiv(1))
        inside = (
            lat.between(lat_min, lat_max) & lon.between(lon_min, lon_max)
        ).astype(int)
        for eid, ts, ins in zip(pdf["event_id"], pdf["ts"], inside):
            if last != -1 and ins != last:
                out["user_id"].append(key[0])
                out["event_id"].append(int(eid))
                out["ts"].append(ts)
                out["transition"].append("enter" if ins else "exit")
            last = int(ins)
        state.update((last,))
        yield pd.DataFrame(out)

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        GEOFENCE_OUTPUT_SCHEMA,
        GEOFENCE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
