"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (exact; broadcast the query side).
Scale path: IVF — k-means-style coarse centroids (deterministic seeded
init + a few Lloyd iterations, all DataFrame ops) partition the corpus;
queries probe only the nearest `n_probe` cells. Everything is built-in
column algebra over `array<float>`; no Python in the scoring loop.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (queries broadcast).

    One narrow pass over the corpus per query batch + a per-query top-k
    window; at cluster scale replace the window with
    groupBy(q).agg(max_by-heap) or mapPartitions partial top-k."""
    joined = vectors.crossJoin(F.broadcast(queries))
    sim = _dot(F.col(vec_col), F.col(q_vec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(q_vec_col))
    )
    scored = joined.select(
        F.col(q_id_col), F.col(id_col), sim.alias("cosine")
    ).filter(F.col(q_id_col) != F.col(id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )


def ivf_build(
    vectors: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build IVF centroids + assignments.

    Deterministic init: the n_cells vectors with smallest
    xxhash64(id) (a seeded sample without RNG state); then `iters`
    Lloyd rounds, each one join + one aggregation. Returns
    (centroids_df(cell, centroid), assignments_df(id, cell)).

    Seeding is distributed top-k: orderBy+limit compiles to
    TakeOrderedAndProject (per-partition partial top-k merged on the
    driver) — NOT a global row_number window, which would funnel every
    vector through one task at 10^9 rows. Cell ids then come from a
    posexplode over one sorted n_cells-element array (the only
    collect_list, bounded by n_cells)."""
    seeded = vectors.select(
        F.col(id_col), F.col(vec_col), F.xxhash64(F.col(id_col).cast("string")).alias("hh")
    )
    seeds = seeded.orderBy("hh", id_col).limit(n_cells)
    centroids = (
        seeds.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("hh"), F.col(id_col).alias("id"),
                                        F.col(vec_col).alias("v")))
            ).alias("arr")
        )
        .select(F.posexplode("arr").alias("cell", "s"))
        .select("cell",
                F.transform(F.col("s.v"), lambda x: x.cast("double")).alias("centroid"))
    )

    def assign(cents: DataFrame) -> DataFrame:
        joined = vectors.crossJoin(F.broadcast(cents))
        d2 = F.aggregate(
            F.zip_with(F.col(vec_col), F.col("centroid"),
                       lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        ww = Window.partitionBy(id_col).orderBy("d2", "cell")
        return (
            joined.select(F.col(id_col), F.col(vec_col), F.col("cell"), d2.alias("d2"))
            .withColumn("rn", F.row_number().over(ww))
            .filter(F.col("rn") == 1)
            .select(id_col, vec_col, "cell")
        )

    for _ in range(iters):
        assigned = assign(centroids)
        dim_arr = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        # centroid update as posexplode + per-(cell, dim) avg: each
        # aggregation buffer holds one running mean, never a cell's full
        # vector list — a collect_list-then-fold would OOM on a hot cell
        # at 10^9 vectors. The final collect_list is bounded by `dim`.
        centroids = (
            assigned.select("cell", F.posexplode(dim_arr).alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                "cell",
                F.transform(F.col("dm"), lambda s: s["m"]).alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
    return centroids, assign(centroids).select(id_col, "cell")


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the memory/IO scale path
    for ANN (4x smaller than float32, dot products stay within ~1% for
    unit-norm data).

    scale = max(|v|) / 127; q_i = clamp(floor(v_i/scale + 0.5), ±127).
    floor(x + 0.5) instead of round(): both engines (and any SQL twin)
    agree on exact IEEE semantics, with no HALF_UP/HALF_EVEN ambiguity.
    Zero vectors quantize to all-zero with scale 0. Returns one row per
    (id, dim) — (id, scale_ppb, dim, q), integer-only output so value
    hashes are float-format-proof."""
    absmax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    scale = absmax / F.lit(127.0)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(absmax == 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
                ),
            )
        ),
    )
    return df.select(
        F.col(id_col),
        F.floor(scale * F.lit(1_000_000_000)).cast("bigint").alias("scale_ppb"),
        F.posexplode(q).alias("dim", "q"),
    )


def ivf_topk(
    vectors: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ANN top-k probing the `n_probe` closest cells per query — scans
    only assigned partitions instead of the full corpus."""
    qc = queries.crossJoin(F.broadcast(centroids))
    qd2 = F.aggregate(
        F.zip_with(F.col(q_vec_col), F.col("centroid"),
                   lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    wq = Window.partitionBy(q_id_col).orderBy("d2", "cell")
    probes = (
        qc.select(F.col(q_id_col), F.col(q_vec_col), F.col("cell"), qd2.alias("d2"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(q_id_col, q_vec_col, "cell")
    )
    cand = vectors.join(assignments, id_col).join(F.broadcast(probes), "cell")
    sim = _dot(F.col(vec_col), F.col(q_vec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(q_vec_col))
    )
    scored = cand.select(F.col(q_id_col), F.col(id_col), sim.alias("cosine")).filter(
        F.col(q_id_col) != F.col(id_col)
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )
