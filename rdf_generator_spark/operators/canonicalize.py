"""Canonical-IRI union over same-as edges: connected components by
iterative min-IRI label propagation (SURVEY.md §2 "Graph ops").

In the reference, canonicalization is implicit — identical UUID5 seeds
collapse under set-union (K1-K4) and the dual species-name keys (J3)
unify mentions. At corpus scale, multiple documents can mint different
IRIs for the same entity (e.g. the two `sp-` seed variants, F9
main.py:638 vs 1174); those links become explicit same-as edges and the
scale-out canonicalizer is small-diameter label propagation:

    label(n) <- min(label(n), min over neighbors(label(m)))

iterated to fixpoint with per-round lineage truncation — O(log d)
rounds for component diameter d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC = ["repo", "commit"]


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """edges(a, b) [+ optional doc keys] -> mapping(node, canon).

    `canon` is the lexicographically smallest IRI in each component.
    Works globally (no doc keys) or per-document if doc key columns are
    present in `edges`.
    """
    keys = [c for c in DOC if c in edges.columns]
    sym = edges.select(*keys, "a", "b").unionByName(
        edges.select(*keys, F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = (
        sym.select(*keys, F.col("a").alias("node"), F.col("b").alias("nbr"))
        .groupBy(*keys, "node")
        .agg(F.least(F.min("nbr"), F.first("node")).alias("canon"))
    )
    # adjacency with self-loops so isolated updates keep own label
    adj = sym.select(*keys, F.col("a").alias("node"), F.col("b").alias("nbr"))
    adj = adj.unionByName(
        adj.select(*keys, "node", F.col("node").alias("nbr")).distinct()
    ).distinct().localCheckpoint(eager=True)

    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        lab_n = labels.select(
            *[F.col(k).alias(f"__{k}") for k in keys],
            F.col("node").alias("__nbr"),
            F.col("canon").alias("__c"),
        )
        cond = (F.col("nbr") == F.col("__nbr"))
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__{k}"))
        new_labels = (
            adj.join(lab_n, cond)
            .groupBy(*keys, "node")
            .agg(F.min("__c").alias("canon"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select(
                    *[F.col(k).alias(f"__{k}") for k in keys],
                    F.col("node").alias("__n"),
                    F.col("canon").alias("__old"),
                ),
                [new_labels["node"] == F.col("__n")]
                + [new_labels[k] == F.col(f"__{k}") for k in keys],
            )
            .filter(F.col("canon") != F.col("__old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(*keys, "node", "canon")


def species_same_as_edges(triples: DataFrame) -> DataFrame:
    """Same-as edges between the two sp- mint variants: two sp- IRIs
    denoting species concepts with identical normalized labels within a
    document (F9 dual-seed quirk)."""
    from rdf_generator_spark import terms as T

    sp_labels = (
        triples.filter(
            F.col("s").startswith(T.KB + "sp-") & (F.col("p") == T.RDFS_LABEL)
        )
        .select(*DOC, F.lower(F.col("o")).alias("k"), F.col("s").alias("node"))
        .distinct()
    )
    a = sp_labels.select(*DOC, "k", F.col("node").alias("a"))
    b = sp_labels.select(
        F.col("repo").alias("__r"), F.col("commit").alias("__c"),
        F.col("k").alias("__k"), F.col("node").alias("b"),
    )
    return (
        a.join(
            b,
            (F.col("repo") == F.col("__r"))
            & (F.col("commit") == F.col("__c"))
            & (F.col("k") == F.col("__k"))
            & (F.col("a") < F.col("b")),
        )
        .select(*DOC, "a", "b")
        .distinct()
    )


def apply_canonical_mapping(
    triples: DataFrame, mapping: DataFrame, hint=None
) -> DataFrame:
    """Rewrite subjects and IRI objects through (node -> canon), then
    re-dedup (set semantics collapse the merged nodes).

    The mapping grows with the corpus (one row per merged node), so no
    broadcast hint by default — AQE broadcasts it at small scale and
    shuffles past the threshold. Pass `hint=F.broadcast` to force."""
    if hint is None:
        hint = lambda d: d  # noqa: E731
    keys = [c for c in DOC if c in mapping.columns]
    ms = mapping.select(
        *[F.col(k).alias(f"__s{k}") for k in keys],
        F.col("node").alias("__sn"), F.col("canon").alias("__sc"),
    )
    cond_s = F.col("s") == F.col("__sn")
    for k in keys:
        cond_s = cond_s & (F.col(k) == F.col(f"__s{k}"))
    out = (
        triples.join(hint(ms), cond_s, "left")
        .withColumn("s", F.coalesce(F.col("__sc"), F.col("s")))
        .drop("__sn", "__sc", *[f"__s{k}" for k in keys])
    )
    mo = mapping.select(
        *[F.col(k).alias(f"__o{k}") for k in keys],
        F.col("node").alias("__on"), F.col("canon").alias("__oc"),
    )
    cond_o = (F.col("o") == F.col("__on")) & (~F.col("lit"))
    for k in keys:
        cond_o = cond_o & (F.col(k) == F.col(f"__o{k}"))
    out = (
        out.join(hint(mo), cond_o, "left")
        .withColumn("o", F.coalesce(F.col("__oc"), F.col("o")))
        .drop("__on", "__oc", *[f"__o{k}" for k in keys])
    )
    from rdf_generator_spark.operators.graph_ops import dedup_triples

    return dedup_triples(out)
