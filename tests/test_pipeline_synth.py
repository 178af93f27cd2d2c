"""Multi-dataset synthetic-corpus golden test: pipeline vs oracle per doc.

Exercises paths the example corpus doesn't: '?' and out-of-range symbols,
negation states resolved via J2 and via the OWL vocab, multiple documents
in one corpus (counter scoping), zoobank ids, 3-state chars.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from rdf_generator_spark.plans.pipeline import build_graph
from rdf_generator_spark.sources import parsers as P
from rdf_generator_spark.sources.corpus import build_label_index, corpus_df
from rdf_generator_spark.sources.synth import synth_corpus_rows

from tests.oracle.refsim import RefSim


@pytest.mark.parametrize("seed", [7, 23])
def test_synth_corpus_matches_oracle_per_doc(spark, seed):
    rows = synth_corpus_rows(n_datasets=3, ntax=8, nchar=8, seed=seed)
    corpus = corpus_df(spark, rows)
    res = build_graph(spark, corpus)
    got_by_doc = defaultdict(set)
    for r in res["triples"].collect():
        got_by_doc[r["repo"]].add((r["s"], r["p"], r["o"], bool(r["lit"]), r["dt"]))

    by_repo = defaultdict(dict)
    for repo, path, commit, lang, content in rows:
        by_repo[repo][lang] = content

    assert len(got_by_doc) == 3
    for repo, docs in by_repo.items():
        chars = P.char_rows_from_json(docs["json"])
        cells = P._parse_nexus_matrix(docs["nexus"])
        species = P.species_rows_from_json(docs["species-json"])
        metadata = {r["char_id"]: r["source_text"]
                    for r in P.metadata_rows_from_csv(docs["csv"])}
        vocab = build_label_index(docs["owl"])
        want = RefSim(chars, cells, species, metadata, vocab).run()["final"].triples()
        got = got_by_doc[repo]
        extra, missing = got - want, want - got
        assert got == want, (
            f"{repo}: extra={len(extra)} missing={len(missing)}\n"
            + "\n".join(f"  EXTRA {t}" for t in sorted(extra)[:8])
            + "\n".join(f"  MISS  {t}" for t in sorted(missing)[:8])
        )


def test_no_metadata_corpus_uses_input_salt_tier(spark):
    """K2 tier 3 end-to-end (reference main.py:245-247): with no
    metadata CSV and no dataset_id, the salt is
    input::<normalized json basename> — pipeline and refsim must agree
    on the full per-doc triple set, which pins every org- seed minted
    through that salt."""
    rows = [
        r for r in synth_corpus_rows(n_datasets=2, ntax=5, nchar=5, seed=31)
        if r[3] != "csv"
    ]
    corpus = corpus_df(spark, rows)
    res = build_graph(spark, corpus)
    got_by_doc = defaultdict(set)
    for r in res["triples"].collect():
        got_by_doc[r["repo"]].add((r["s"], r["p"], r["o"], bool(r["lit"]), r["dt"]))

    by_repo = defaultdict(dict)
    for repo, path, commit, lang, content in rows:
        by_repo[repo][lang] = content
        if lang == "json":
            by_repo[repo]["__json_base"] = path.rsplit("/", 1)[-1]

    assert len(got_by_doc) == 2
    for repo, docs in by_repo.items():
        chars = P.char_rows_from_json(docs["json"])
        cells = P._parse_nexus_matrix(docs["nexus"])
        species = P.species_rows_from_json(docs["species-json"])
        vocab = build_label_index(docs["owl"])
        sim = RefSim(chars, cells, species, {}, vocab,
                     json_basename=docs["__json_base"])
        assert sim.salt.startswith("input::"), sim.salt
        want = sim.run()["final"].triples()
        got = got_by_doc[repo]
        extra, missing = got - want, want - got
        assert got == want, (
            f"{repo}: extra={len(extra)} missing={len(missing)}\n"
            + "\n".join(f"  EXTRA {t}" for t in sorted(extra)[:8])
            + "\n".join(f"  MISS  {t}" for t in sorted(missing)[:8])
        )


def test_dataset_id_from_yaml_config(spark):
    """SRC1: dataset_id in a lang='yaml' config row salts every org seed
    (reference main.py:232-235: config dominates the metadata salt)."""
    from rdf_generator_spark.ids import uuid5_kb
    from rdf_generator_spark import terms as T

    rows = synth_corpus_rows(n_datasets=1, ntax=4, nchar=4, seed=5)
    repo, _, commit, _, _ = rows[0]
    with_cfg = rows + [(repo, "config.yaml", commit, "yaml", "dataset_id: demo-42\n")]
    res = build_graph(spark, corpus_df(spark, with_cfg))
    orgs = {
        r["s"]
        for r in res["triples"].filter(
            (res["triples"].p == T.RDF_TYPE)
            & (res["triples"].o == T.OWL_NAMED_INDIVIDUAL)
        ).collect()
        if r["s"].startswith(T.KB + "org-")
    }
    # at least one org seed must match the dataset::demo-42 salt
    cells = P._parse_nexus_matrix(rows[1][4])
    taxon = sorted({t for _, t, _, _ in cells})[0]
    from rdf_generator_spark.normalize import py_norm_seed_component, py_norm_taxon_label

    seed = "::".join([
        "dataset::demo-42",
        py_norm_seed_component(py_norm_taxon_label(taxon)) or "unknown-taxon",
        "female organism",
    ])
    expected = uuid5_kb("org", seed)
    assert any(o == expected for o in orgs) or any(
        uuid5_kb("org", seed.replace("female organism", "male organism")) == o
        for o in orgs
    ), (expected, sorted(orgs)[:4])


def test_skewed_corpus_giant_matrix_exact(spark):
    """Skew path: one 10x-larger NEXUS matrix among small documents —
    per-document exactness must hold and the giant must not perturb its
    neighbors (windows are per-document)."""
    rows = synth_corpus_rows(
        n_datasets=3, ntax=6, nchar=6, seed=31, giant_every=3, giant_scale=5
    )
    corpus = corpus_df(spark, rows)
    res = build_graph(spark, corpus)
    got_by_doc = defaultdict(set)
    for r in res["triples"].collect():
        got_by_doc[r["repo"]].add((r["s"], r["p"], r["o"], bool(r["lit"]), r["dt"]))
    by_repo = defaultdict(dict)
    for repo, path, commit, lang, content in rows:
        by_repo[repo][lang] = content
    sizes = {}
    for repo, docs in by_repo.items():
        chars = P.char_rows_from_json(docs["json"])
        cells = P._parse_nexus_matrix(docs["nexus"])
        species = P.species_rows_from_json(docs["species-json"])
        metadata = {r["char_id"]: r["source_text"]
                    for r in P.metadata_rows_from_csv(docs["csv"])}
        vocab = build_label_index(docs["owl"])
        want = RefSim(chars, cells, species, metadata, vocab).run()["final"].triples()
        assert got_by_doc[repo] == want, repo
        sizes[repo] = len(want)
    # the giant really is an order of magnitude bigger
    assert max(sizes.values()) > 8 * min(sizes.values())


def test_adversarial_labels_exact(spark, tmp_path):
    """Labels with quotes, backslashes, newlines-in-comments, unicode and
    odd whitespace must survive seeding, emission and Turtle roundtrip."""
    import json as _json

    chars = [
        {
            "Char_ID": "C1",
            "Organism": {"Label": "adult organism",
                         "URI": "http://purl.obolibrary.org/obo/UBERON_0007023"},
            "Locators": [
                {"Locator 1 label": 'lóbulo "anterior"', "Locator 1 URI": None},
                {"Locator 2 label": "weird\\path", "Locator 2 URI": None},
            ],
            "Variable": {"Variable label": "forma  doble espacio",
                         "Variable URI": None,
                         "Variable comment": "line one\nline two"},
            "States": [
                {"State 0 label": "présent", "State 0 URI": None, "State 0 token": "0"},
                {"State 1 label": 'not "quoted"', "State 1 URI": None, "State 1 token": "1"},
            ],
            "Tag": "transformational_complex",
        },
        {
            "Char_ID": "C2",
            "Organism": {"Label": "female organism",
                         "URI": "http://purl.obolibrary.org/obo/UBERON_0003100"},
            "Locators": [{"Locator 1 label": "büte", "Locator 1 URI": None}],
            "States": [
                {"State 0 label": '"quoted"',
                 "State 0 URI": "http://purl.obolibrary.org/obo/PATO_0000001",
                 "State 0 token": "0"},
                {"State 1 label": "zwei", "State 1 URI": None, "State 1 token": "1"},
            ],
            "Tag": "neomorphic",
        },
    ]
    nexus = (
        "#NEXUS\n\nBEGIN DATA;\n\tDIMENSIONS  NTAX=2 NCHAR=2;\n"
        "\tFORMAT DATATYPE = STANDARD GAP = - MISSING = ? SYMBOLS = \"01\";\n"
        "\tMATRIX\n\t'Tàxon_ünïcode'  01\n\t'Second_taxon'  10\n\n;\nEND;\n"
    )
    species = _json.dumps([
        {"input_species_name": "Tàxon_ünïcode",
         "valid_species_name": "Tàxon ünïcode (Quoté, 1999)",
         "ID": 123, "zoobank_identifier": None, "match_level": "species"},
    ])
    meta = 'Char_ID,Comment\nC1,Modified from "weird" source\n'
    rows = [
        ("adv/repo", "c.json", "a" * 40, "json", _json.dumps(chars)),
        ("adv/repo", "m.nex", "a" * 40, "nexus", nexus),
        ("adv/repo", "s.json", "a" * 40, "species-json", species),
        ("adv/repo", "md.csv", "a" * 40, "csv", meta),
    ]
    res = build_graph(spark, corpus_df(spark, rows))
    got = {
        (r["s"], r["p"], r["o"], bool(r["lit"]), r["dt"])
        for r in res["triples"].collect()
    }
    want = RefSim(
        P.char_rows_from_json(rows[0][4]),
        P._parse_nexus_matrix(nexus),
        P.species_rows_from_json(species),
        {r["char_id"]: r["source_text"] for r in P.metadata_rows_from_csv(meta)},
        {},
    ).run()["final"].triples()
    assert got == want, (len(got - want), len(want - got),
                         sorted(got - want)[:4], sorted(want - got)[:4])

    # turtle roundtrip with the hostile literals
    import os as _os
    from rdf_generator_spark.sinks.turtle import write_turtle
    from tests.test_turtle import parse_turtle

    out = str(tmp_path / "adv.ttl")
    write_turtle(res["triples"], lambda r, c: out)
    got_ttl = parse_turtle(open(out, encoding="utf-8").read())
    assert got_ttl == want


def test_multi_matrix_contract_and_shard_roundtrip(spark):
    """A repo with two matrices: build_graph fails loudly; after
    shard_multi_matrix_groups each shard round-trips golden-equal."""
    import pytest

    from rdf_generator_spark.plans.pipeline import build_graph
    from rdf_generator_spark.sources.corpus import (
        corpus_df, shard_multi_matrix_groups,
    )
    from tests.fixtures import GOLDEN_REPO, golden_corpus_rows, golden_parsed
    from tests.oracle.refsim import RefSim

    rows = golden_corpus_rows()
    multi = []
    for repo, path, commit, lang, content in rows:
        if lang in ("json", "nexus"):
            ext = path.rsplit(".", 1)[1]
            multi.append((repo, f"data/m1.{ext}", commit, lang, content))
            multi.append((repo, f"data/m2.{ext}", commit, lang, content))
        else:
            multi.append((repo, path, commit, lang, content))
    corpus = corpus_df(spark, multi)

    with pytest.raises(ValueError, match="input contract violated"):
        build_graph(spark, corpus)

    sharded = shard_multi_matrix_groups(corpus)
    res = build_graph(spark, sharded)
    per_repo = {}
    for r in res["triples"].select("repo", "s", "p", "o", "lit", "dt").collect():
        per_repo.setdefault(r["repo"], set()).add(
            (r["s"], r["p"], r["o"], bool(r["lit"]), r["dt"])
        )
    assert set(per_repo) == {f"{GOLDEN_REPO}::m1", f"{GOLDEN_REPO}::m2"}

    want = RefSim(*golden_parsed()).run()["final"].triples()
    assert per_repo[f"{GOLDEN_REPO}::m1"] == want
    assert per_repo[f"{GOLDEN_REPO}::m2"] == want


def test_shard_ambiguous_pairing_raises(spark):
    """Stems that don't pair 1:1 have no safe automatic mapping."""
    import pytest

    from rdf_generator_spark.sources.corpus import (
        corpus_df, shard_multi_matrix_groups,
    )
    from tests.fixtures import golden_corpus_rows

    rows = golden_corpus_rows()
    multi = []
    for repo, path, commit, lang, content in rows:
        if lang == "json":
            multi.append((repo, "data/m1.json", commit, lang, content))
            multi.append((repo, "data/m2.json", commit, lang, content))
        elif lang == "nexus":
            # only ONE nexus — m2 has no partner
            multi.append((repo, "data/m1.nex", commit, lang, content))
        else:
            multi.append((repo, path, commit, lang, content))
    with pytest.raises(ValueError, match="pair 1:1 by path stem"):
        shard_multi_matrix_groups(corpus_df(spark, multi))


def test_dataset_id_config_deterministic_and_bounded(spark):
    """SRC1 hardening (VERDICT r4 nit 3): with several yaml docs in the
    corpus, the winning dataset_id is the lexicographically-first
    (repo, path, commit) row carrying one — not partition-order luck —
    malformed yaml and dataset_id-less docs are skipped, and the
    driver-side collect is bounded by a structural limit()."""
    from rdf_generator_spark.plans.pipeline import dataset_id_from_config
    from rdf_generator_spark.sources.corpus import corpus_df

    docs = [
        ("r2", "b.yaml", "c" * 40, "yaml", "dataset_id: second\n"),
        ("r1", "z.yaml", "c" * 40, "yaml", "not: a dataset id\n"),
        ("r1", "a.yaml", "c" * 40, "yaml", ":: not yaml ["),
        ("r1", "m.yaml", "c" * 40, "yaml", "dataset_id: first\n"),
    ]
    # order-independence: reversed input gives the same winner
    for rows in (docs, docs[::-1]):
        assert dataset_id_from_config(
            corpus_df(spark, rows).repartition(7)
        ) == "first"
    # the scan plan carries the structural bound
    plan = (
        corpus_df(spark, docs)
        .filter("lang = 'yaml'")
        .orderBy("repo", "path", "commit")
        .limit(64)
    )._jdf.queryExecution().toString()
    assert "Limit" in plan or "TakeOrdered" in plan
