#!/usr/bin/env python
"""Extra (non-frozen) benchmark instrumentation for optimization work.

Times the kg pipeline phase-by-phase (each hub-table materialization,
the final count) plus the relational headline queries with a noop sink,
per guide §1.4. Does NOT replace bench.py (frozen); numbers here feed
OPTIMIZATION_r06.md only.

Usage:
  python bench_extra.py kg        # phase-wise kg pipeline timings
  python bench_extra.py queries   # noop-isolated relational queries
  python bench_extra.py plans     # dump .explain('formatted') to plans/r06
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from bench import build_session  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    sec = round(time.perf_counter() - t0, 3)
    print(f"  {label:<42s} {sec:8.3f} s", flush=True)
    return out, sec


def run_kg(spark, iters=2):
    from rdf_generator_spark import queries as Q
    from rdf_generator_spark.plans import pipeline as P
    from rdf_generator_spark.sources.corpus import corpus_parquet_df
    from rdf_generator_spark.sources.synth import synth_corpus_rows

    Q.ensure_workers_can_import(spark)
    kg_scale = int(os.environ.get("SPARK_GRAFT_KG_SCALE", "4"))
    rows = synth_corpus_rows(
        n_datasets=6 * kg_scale, ntax=40, nchar=40, seed=1234,
        giant_every=6, giant_scale=3,
    )
    corpus = corpus_parquet_df(spark, rows)

    # monkeypatch the materializer to time each hub checkpoint
    phase_times = {}
    orig_materializer = P._materializer

    def timing_materializer(spark_, staging_dir):
        inner = orig_materializer(spark_, staging_dir)

        def mat(df, name):
            spark_.sparkContext.setJobDescription(f"mat:{name}")
            t0 = time.perf_counter()
            out = inner(df, name)
            phase_times[f"mat_{name}"] = round(time.perf_counter() - t0, 3)
            spark_.sparkContext.setJobDescription(None)
            return out

        return mat

    P._materializer = timing_materializer
    try:
        for it in range(iters):
            phase_times.clear()
            t0 = time.perf_counter()
            res = P.build_graph(spark, corpus)
            t_build = time.perf_counter()
            phase_times["build_call"] = round(t_build - t0, 3)
            spark.sparkContext.setJobDescription("final count")
            n = res["triples"].count()
            phase_times["final_count"] = round(time.perf_counter() - t_build, 3)
            spark.sparkContext.setJobDescription(None)
            phase_times["total"] = round(time.perf_counter() - t0, 3)
            mats = sum(v for k, v in phase_times.items() if k.startswith("mat_"))
            phase_times["driver_overhead"] = round(
                phase_times["build_call"] - mats, 3
            )
            print(f"iter {it}: n_triples={n}")
            for k, v in phase_times.items():
                print(f"  {k:<20s} {v:8.3f} s")
            print(json.dumps({"iter": it, **phase_times}), flush=True)
    finally:
        P._materializer = orig_materializer


def run_queries(spark, sf_dir):
    from rdf_generator_spark import queries as Q

    names = [
        "q1_pricing_summary", "q3_shipping_topk", "j1_broadcast_fill",
        "j5_symbol_state_join", "a5_prune_anti_join",
        "a2_sequential_counters", "dedup_exact", "text_token_stats",
        "events_sessionize", "ann_cosine_topk",
    ]
    allq = {**Q.QUERIES, **Q.QUERIES_EXTRA}
    out = {}
    for name in names:
        fn = allq[name]
        best = None
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            sec = round(time.perf_counter() - t0, 3)
            best = sec if best is None else min(best, sec)
        out[name] = best
        print(f"  {name:<28s} {best:8.3f} s (noop best-of-3)", flush=True)
    print(json.dumps(out))


def dump_plans(spark, sf_dir, tag):
    from rdf_generator_spark import queries as Q

    os.makedirs(os.path.join(REPO_ROOT, "plans", "r06"), exist_ok=True)
    names = [
        "q1_pricing_summary", "q3_shipping_topk", "j1_broadcast_fill",
        "j5_symbol_state_join", "a5_prune_anti_join",
        "a2_sequential_counters", "dedup_exact", "text_token_stats",
        "events_sessionize", "ann_cosine_topk",
    ]
    allq = {**Q.QUERIES, **Q.QUERIES_EXTRA}
    for name in names:
        df = allq[name](spark, sf_dir)
        p = os.path.join(REPO_ROOT, "plans", "r06", f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"wrote {p}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "kg"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    kg_scale = int(os.environ.get("SPARK_GRAFT_KG_SCALE", "4"))
    spark = build_session(cpus, kg_scale)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if mode == "kg":
            run_kg(spark, iters=int(os.environ.get("KG_ITERS", "2")))
        elif mode == "queries":
            run_queries(spark, sf_dir)
        elif mode == "deep":
            run_deep(spark)
        elif mode == "plans":
            dump_plans(spark, sf_dir, sys.argv[2] if len(sys.argv) > 2 else "before")
    finally:
        spark.stop()




def run_deep(spark):
    """Sub-phase diagnostics: where do visits/final actually spend time."""
    from pyspark.sql import functions as F

    from rdf_generator_spark import queries as Q
    from rdf_generator_spark.plans import pipeline as P
    from rdf_generator_spark.sources import parsers
    from rdf_generator_spark.sources.corpus import corpus_parquet_df
    from rdf_generator_spark.sources.synth import synth_corpus_rows

    Q.ensure_workers_can_import(spark)
    kg_scale = int(os.environ.get("SPARK_GRAFT_KG_SCALE", "4"))
    rows = synth_corpus_rows(
        n_datasets=6 * kg_scale, ntax=40, nchar=40, seed=1234,
        giant_every=6, giant_scale=3,
    )
    corpus = corpus_parquet_df(spark, rows)

    # warm the JVM once
    timed("warm: full build+count", lambda: P.build_graph(spark, corpus)["triples"].count())

    timed("parse chars (noop)", lambda: noop(parsers.parse_char_docs(corpus)))
    timed("parse nexus (noop)", lambda: noop(parsers.parse_nexus_docs(corpus)))
    timed("parse species (noop)", lambda: noop(parsers.parse_species_docs(corpus)))
    timed("parse metadata (noop)", lambda: noop(parsers.parse_metadata_docs(corpus)))

    hubs, t_hubplan = timed(
        "hub plan construction (assemble=False, no jobs beyond collects)",
        lambda: P.build_graph(spark, corpus, assemble=False),
    )
    timed("charsx (noop, unmat lineage)", lambda: noop(hubs["chars"]))
    timed("states_x (noop, unmat lineage)", lambda: noop(hubs["states"]))
    timed("cells_j (noop, unmat lineage)", lambda: noop(hubs["cells"]))
    timed("visits (noop, unmat lineage)", lambda: noop(hubs["visits"]))
    timed("visits count only", lambda: hubs["visits"].count())

    # full build with mats, then time final sub-pieces on the checkpointed parts
    res, _ = timed("full build (mats only)", lambda: P.build_graph(spark, corpus))
    parts = res["parts"]
    from rdf_generator_spark.operators.graph_ops import (
        apply_label_priority, dedup_triples, prune_unreferenced,
    )
    allt, _ = timed("dedup all (noop)", lambda: dedup_triples(parts.drop("part")) )
    timed("dedup all (noop) run", lambda: noop(allt))
    pruned, _ = timed("prune plan", lambda: prune_unreferenced(allt))
    timed("pruned (noop)", lambda: noop(pruned))
    mp, _ = timed("matrix dedup+prune plan", lambda: prune_unreferenced(
        dedup_triples(parts.filter(F.col("part") == "matrix").drop("part"))))
    timed("matrix_pruned (noop)", lambda: noop(mp))
    timed("final triples (count)", lambda: res["triples"].count())
    timed("final triples again (count)", lambda: res["triples"].count())


if __name__ == "__main__":
    main()
