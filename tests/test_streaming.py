"""Structured Streaming: AvailableNow corpus ingest, watermarked
windows, custom stateful sessionization."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rdf_generator_spark.sources.corpus import corpus_df
from rdf_generator_spark.sources.synth import synth_corpus_rows
from rdf_generator_spark.streaming import stream as S


def test_streaming_ingest_available_now(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    rows = synth_corpus_rows(n_datasets=2, ntax=4, nchar=4, seed=9)
    corpus_df(spark, rows).write.parquet(in_dir)

    S.run_streaming_ingest(spark, in_dir, out_dir)
    tri = spark.read.parquet(os.path.join(out_dir, "triples"))
    n1 = tri.count()
    assert n1 > 0
    assert tri.select("repo").distinct().count() == 2

    # second invocation with no new files: stream checkpoint skips all
    S.run_streaming_ingest(spark, in_dir, out_dir)
    assert spark.read.parquet(os.path.join(out_dir, "triples")).count() == n1

    # drop a new corpus file set in -> only the new doc is processed
    rows2 = [
        (r.replace("dataset-000", "dataset-100"), p, c, l, t)
        for r, p, c, l, t in synth_corpus_rows(n_datasets=1, ntax=4, nchar=4, seed=10)
    ]
    corpus_df(spark, rows2).write.mode("append").parquet(in_dir)
    S.run_streaming_ingest(spark, in_dir, out_dir)
    tri3 = spark.read.parquet(os.path.join(out_dir, "triples"))
    assert tri3.select("repo").distinct().count() == 3
    lin = spark.read.parquet(os.path.join(out_dir, "lineage"))
    assert lin.filter(F.col("snapshot_id") == "stream-batch-0").count() > 0


def test_windowed_event_counts_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = S.windowed_event_counts(events)
    total = batch.agg(F.sum("n").alias("t")).first()["t"]
    assert total == events.count()
    cols = batch.columns
    assert cols == ["window_start", "event_type", "n", "v_cents"]


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # batch expectation (same semantics as queries.events_sessionize)
    from rdf_generator_spark.queries import events_sessionize

    want = {
        r["user_id"]: r["n_sessions"]
        for r in events_sessionize(spark, "/root/testdata/sf0.001").collect()
    }

    in_dir = str(tmp_path / "ev")
    events.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    out = S.sessionize_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: r["n_sessions"]
        for r in spark.sql(
            "select user_id, max(n_sessions) as n_sessions from sessions group by user_id"
        ).collect()
    }
    assert got == want
