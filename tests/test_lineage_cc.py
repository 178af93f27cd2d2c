"""Checkpoint-resume lineage + connected-components canonicalization."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rdf_generator_spark.operators.canonicalize import (
    apply_canonical_mapping,
    connected_components,
)
from rdf_generator_spark.sources.corpus import corpus_df
from rdf_generator_spark.sources.synth import synth_corpus_rows
from rdf_generator_spark.streaming import lineage as L


def test_resume_skips_done_docs(spark, tmp_path):
    out = str(tmp_path / "out")
    rows = synth_corpus_rows(n_datasets=2, ntax=5, nchar=5, seed=3)
    corpus = corpus_df(spark, rows)

    r1 = L.run_resumable(spark, corpus, out, snapshot_id="snap1")
    assert r1["docs"] == 2 and r1["triples"] > 0
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    # 5 files per dataset (json/nexus/species/csv/owl) x 2 datasets
    assert lin.count() == 10

    # second run: everything done -> no work
    r2 = L.run_resumable(spark, corpus, out, snapshot_id="snap2")
    assert r2 == {"docs": 0, "triples": 0}

    # new dataset appears; the shared vocab.owl also changes content
    # (it accumulates labels across datasets), so all 3 docs re-run —
    # exactly the content-drift semantics we want
    rows3 = synth_corpus_rows(n_datasets=3, ntax=5, nchar=5, seed=3)
    corpus3 = corpus_df(spark, rows3)
    r3 = L.run_resumable(spark, corpus3, out, snapshot_id="snap3")
    assert r3["docs"] == 3

    # content drift in one file -> that document reprocessed
    drifted = [
        (repo, path, commit, lang, content + "\n")
        if lang == "csv" and repo.endswith("0000") else (repo, path, commit, lang, content)
        for repo, path, commit, lang, content in rows3
    ]
    r4 = L.run_resumable(spark, corpus_df(spark, drifted), out, snapshot_id="snap4")
    assert r4["docs"] == 1

    # lineage carries the sha256 invariant
    row = lin.select("content_sha256").first()
    assert len(row["content_sha256"]) == 64


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y"), ("q", "q")], ["a", "b"]
    )
    got = {
        (r["node"], r["canon"]) for r in connected_components(edges).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"), ("q", "q"),
    }


def test_apply_canonical_mapping(spark):
    tri = spark.createDataFrame(
        [
            ("r", "c", "ex:a", "ex:p", "ex:b", False, None),
            ("r", "c", "ex:b2", "ex:p", "ex:lit", True, None),
            ("r", "c", "ex:z", "ex:p", "ex:b2", False, None),
        ],
        "repo string, commit string, s string, p string, o string, lit boolean, dt string",
    )
    mapping = spark.createDataFrame(
        [("r", "c", "ex:b2", "ex:b")], ["repo", "commit", "node", "canon"]
    )
    got = {
        (r["s"], r["o"], r["lit"])
        for r in apply_canonical_mapping(tri, mapping).collect()
    }
    # subject rewritten; IRI object rewritten; literal object untouched
    assert got == {
        ("ex:a", "ex:b", False),
        ("ex:b", "ex:lit", True),
        ("ex:z", "ex:b", False),
    }