"""V1-V3 validation rules: golden conformance + mutation tests.

Reference behavior: the final combined graph conforms; the matrix graph
alone fails TUShape (TUs lack iao:denotes until TU enrichment) — the
same failures pySHACL reports in the reference's validation_summary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_generator_spark import terms as T
from rdf_generator_spark.plans.pipeline import build_graph
from rdf_generator_spark.validation.shacl_rules import (
    RULES,
    conformance_report,
    expanded_types,
    validate,
)

from tests.fixtures import golden_corpus_df


@pytest.fixture(scope="module")
def result(spark):
    return build_graph(spark, golden_corpus_df(spark))


def test_rule_table_covers_shapes():
    shapes = {r.shape for r in RULES}
    assert shapes == {
        "NeomorphicPhenotypeShape", "TransformationalSimplePhenotypeShape",
        "TransformationalComplexPhenotypeShape", "OrganismNodeShape",
        "LocatorNodeShape", "VariableNodeShape", "QualityNodeShape",
        "CharacterShape", "StateNodeShape", "MatrixShape", "TUShape",
        "SpeciesInstanceShape", "SpeciesConceptShape",
    }


def test_final_graph_conforms(spark, result):
    v = validate(result["triples"], scope="final")
    assert v.count() == 0


def test_matrix_scope_tu_violations(spark, result):
    v = validate(result["matrix_pruned"], scope="matrix").collect()
    assert len(v) == 10
    assert all(r["shape"] == "TUShape" and r["constraint"] == "minCount" for r in v)
    rep = conformance_report(
        validate(result["matrix_pruned"], scope="matrix")
    ).collect()
    assert len(rep) == 1 and not rep[0]["conforms"]


def test_mutation_missing_organism(spark, result):
    mutated = result["triples"].filter(F.col("p") != T.PHB_HAS_ORGANISM)
    v = validate(mutated, scope="mut")
    rows = v.filter(F.col("path") == T.PHB_HAS_ORGANISM).collect()
    # every phenotype statement now violates its shape's org minCount
    assert len(rows) == 174
    # and the organisms are no longer focus nodes of OrganismNodeShape
    assert v.filter(F.col("shape") == "OrganismNodeShape").count() == 0


def test_mutation_extra_quality_label(spark, result):
    tri = result["triples"]
    one_qua = (
        tri.filter(
            (F.col("p") == T.PHB_HAS_QUALITY) & (~F.col("lit"))
        )
        .select("repo", "commit", F.col("o").alias("s"))
        .limit(1)
        .withColumn("p", F.lit(T.RDFS_LABEL))
        .withColumn("o", F.lit("duplicate label"))
        .withColumn("lit", F.lit(True))
        .withColumn("dt", F.lit(None).cast("string"))
    )
    mutated = tri.unionByName(one_qua.select(tri.columns))
    v = validate(mutated, scope="mut").filter(F.col("shape") == "QualityNodeShape")
    rows = v.collect()
    assert len(rows) == 1
    assert rows[0]["constraint"] == "maxCount" and rows[0]["actual"] == 2


def test_rdfs_closure_expansion(spark):
    # subclass chain: instance typed Leaf counts as Mid and Root
    rows = [
        ("r", "c", "ex:i", T.RDF_TYPE, "ex:Leaf", False, None),
        ("r", "c", "ex:Leaf", T.RDFS_SUBCLASSOF, "ex:Mid", False, None),
        ("r", "c", "ex:Mid", T.RDFS_SUBCLASSOF, "ex:Root", False, None),
    ]
    df = spark.createDataFrame(
        rows, "repo string, commit string, s string, p string, o string, lit boolean, dt string"
    )
    types = {
        (r["node"], r["type"]) for r in expanded_types(df).collect()
    }
    assert ("ex:i", "ex:Leaf") in types
    assert ("ex:i", "ex:Mid") in types
    assert ("ex:i", "ex:Root") in types


def test_scoped_validation_report(spark, result):
    from rdf_generator_spark.validation.scopes import (
        render_summary,
        validation_report,
    )

    violations, conformance = validation_report(result)
    rows = conformance.collect()
    scopes = {r["scope"] for r in rows}
    # 10 chars + matrix + 10 TUs + species + final = 23 (reference count)
    assert len(rows) == 23
    assert {"CDAO Matrix", "Species Combined", "Final Combined Graph"} <= scopes
    assert sum(1 for s in scopes if s.startswith("Char_ID ")) == 10
    assert sum(1 for s in scopes if s.startswith("TU ")) == 10
    by = {r["scope"]: r for r in rows}
    # final and species conform; matrix fails TUShape; char/TU scopes
    # conform (phenotype shapes have no targets there)
    assert by["Final Combined Graph"]["conforms"]
    assert by["Species Combined"]["conforms"]
    assert not by["CDAO Matrix"]["conforms"]
    assert by["Char_ID C1"]["conforms"]
    assert by["TU Arhysoceble_picta"]["conforms"]
    text = render_summary(rows, violations.collect())
    assert "==== CDAO Matrix ====" in text and "TUShape" in text
    # pySHACL-shaped skeleton (reference main.py:1220-1225 appends the
    # validator's report text under each ==== header)
    assert "Validation Report" in text
    assert "Conforms: False" in text and "Conforms: True" in text
    matrix_block = text.split("==== CDAO Matrix ====")[1].split("====")[0]
    assert "Results (10):" in matrix_block
    assert "Constraint Violation in " in matrix_block
    assert "\tSeverity: sh:Violation" in matrix_block
    assert "\tFocus Node: " in matrix_block
