"""Structured Streaming front-ends (SURVEY.md §2 "Streaming" stretch).

Batch resume via the lineage anti-join (lineage.py) is the primary
checkpoint story; these wrappers give the same semantics with Spark's
own checkpointing:

* `run_streaming_ingest` — corpus files stream in (AvailableNow =
  one-shot over everything new since the last checkpoint), each
  micro-batch runs the full KG pipeline via foreachBatch and appends
  triples + lineage.
* `windowed_event_counts` — watermarked tumbling-window aggregation.
* `sessionize_stateful` — custom stateful operator
  (applyInPandasWithState): gap-based sessions with explicit state.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rdf_generator_spark.sources.corpus import CORPUS_SCHEMA


def corpus_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(CORPUS_SCHEMA).parquet(path)


def run_streaming_ingest(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    dataset_id: Optional[str] = None,
    await_termination: bool = True,
):
    """One AvailableNow pass: new corpus files -> triples/lineage parquet.

    Execution is at-least-once (a foreachBatch retry re-runs the batch),
    but table state is exactly-once: run_resumable writes both tables
    with dynamic partition overwrite keyed by (repo, commit), so a
    retried batch overwrites the same partitions instead of appending
    duplicates. The stream checkpoint (source offsets) bounds which
    files each batch sees."""
    from rdf_generator_spark.streaming.lineage import run_resumable

    checkpoint = os.path.join(out_dir, "_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        run_resumable(
            spark, batch_df, out_dir, dataset_id=dataset_id,
            snapshot_id=f"stream-batch-{batch_id}",
        )

    q = (
        corpus_stream(spark, in_path)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts with late-data watermark; works on both a
    streaming and a batch events DataFrame."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v_cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "v_cents",
        )
    )


_SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stateful(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful streaming operator: per-user session counting with
    explicit GroupState (applyInPandasWithState). Gap > `gap_seconds`
    opens a new session; state carries (last_ts, counters) across
    micro-batches."""

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            for ts in sorted(pd.to_datetime(pdf["ts"]).map(lambda t: t.timestamp())):
                if last_ts is None or ts - last_ts > gap_seconds:
                    n_sessions += 1
                n_events += 1
                last_ts = ts
        state.update((float(last_ts) if last_ts else 0.0, n_sessions, n_events))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_sessions": n_sessions, "n_events": n_events}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, _SESSION_OUTPUT, _SESSION_STATE, "update", GroupStateTimeout.NoTimeout
    )
