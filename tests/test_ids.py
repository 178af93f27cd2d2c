"""UUID5 minting: SQL expression must agree bit-for-bit with uuid.uuid5.

Mirrors the reference determinism test
(/root/reference/tests/test_main.py:80-98): same seed -> same IRI, and
dataset salt / metadata fingerprint dominate the organism seed.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from rdf_generator_spark.ids import kb_iri, uuid5_col, uuid5_kb
from rdf_generator_spark.terms import KB, UUID_NAMESPACE_HEX

SEEDS = [
    "",
    "a",
    "dataset::demo::arhysoceble_picta::adult organism",
    "pheno-C1::arhysoceble_picta::female",
    "char_C10",
    "http://purl.obolibrary.org/obo/PATO_0001879",
    "ünïcødé :: seed ✓",
    "metadata::deadbeef01234567::meganomia_gigas::female organism",
    "None::None::width",
    "with  double  spaces and\ttabs",
]


def test_uuid5_col_matches_python(spark):
    ns = uuid.UUID(hex=UUID_NAMESPACE_HEX)
    df = spark.createDataFrame([(s,) for s in SEEDS], ["seed"])
    got = {r["seed"]: r["u"] for r in df.select("seed", uuid5_col(F.col("seed")).alias("u")).collect()}
    for s in SEEDS:
        assert got[s] == str(uuid.uuid5(ns, s)), s


def test_kb_iri_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SEEDS], ["seed"])
    got = {r["seed"]: r["u"] for r in df.select("seed", kb_iri("org", F.col("seed")).alias("u")).collect()}
    for s in SEEDS:
        assert got[s] == uuid5_kb("org", s)
        assert got[s].startswith(KB + "org-")


def test_seed_salt_dominates():
    # Same organism+taxon under different dataset salts -> different IRIs
    a = uuid5_kb("org", "dataset::one::picta::adult organism")
    b = uuid5_kb("org", "dataset::two::picta::adult organism")
    assert a != b
    # Deterministic across calls
    assert a == uuid5_kb("org", "dataset::one::picta::adult organism")
