"""Deterministic synthetic corpus generator.

Produces `(repo, path, commit, lang, content)` rows following the exact
grammar of the reference's example corpus (character JSON with positional
keys, NEXUS STANDARD matrix, species JSON, metadata CSV, and a small
OWL/XML vocabulary) — seed-fixed, no external data (BASELINE.md "Bench
corpus"). Used by bench.py and scale tests; skew knobs allow one giant
matrix per batch.
"""

from __future__ import annotations

import json
import random
from typing import List, Tuple

from rdf_generator_spark.sources.corpus import content_commit

_ANATOMY = [
    "labrum", "glossa", "cardo", "galea", "lorum", "mandible", "pollex",
    "stipes", "flabellum", "palpus", "clypeus", "scape", "pedicel",
    "tarsus", "tibia", "femur", "coxa", "trochanter", "sternum", "tergum",
]
_REGIONS = [
    "anterior surface", "posterior surface", "distal region",
    "proximal region", "basal area", "mesal margin", "lateral margin",
    "apical region", "dorsal surface", "ventral surface",
]
_QUALITIES = [
    "broader", "narrower", "smooth", "punctate", "rugose", "U-shaped",
    "straight", "incised", "exposed", "concealed", "absent", "present",
    "fused", "separated", "expanded", "rounded", "truncate", "elongate",
    "flattened", "curved",
]
_VARIABLES = [
    "width", "shape", "texture", "degree of fusion", "degree of expansion",
    "degree of concealment", "length", "curvature", "orientation",
]
_GENERA = [
    "Arhysoceble", "Ancyloscelis", "Diadasina", "Partamona", "Euglossa",
    "Anthidium", "Coelioxys", "Meganomia", "Halictus", "Augochlora",
    "Melipona", "Bombus", "Xylocopa", "Centris", "Epicharis",
]
_EPITHETS = [
    "picta", "apiformis", "distincta", "cupira", "cordata", "porterae",
    "octodentata", "gigas", "rubicundus", "pura", "fasciata", "nigrita",
    "frontalis", "analis", "tarsata",
]


def _obo(rng: random.Random, prefix: str) -> str:
    return f"http://purl.obolibrary.org/obo/{prefix}_{rng.randrange(1, 10 ** 7):07d}"


def make_dataset(
    rng: random.Random, ntax: int, nchar: int, vocab_labels: dict
) -> Tuple[str, str, str, str]:
    """Returns (chars_json, nexus, species_json, metadata_csv)."""
    taxa = []
    seen = set()
    while len(taxa) < ntax:
        name = f"{rng.choice(_GENERA)}_{rng.choice(_EPITHETS)}"
        if ntax > len(_GENERA) * len(_EPITHETS) // 2:
            name = f"{name}_{len(taxa)}"
        if name not in seen:
            seen.add(name)
            taxa.append(name)

    chars = []
    for i in range(1, nchar + 1):
        adult = rng.random() < 0.7
        org = (
            {"Label": "adult organism",
             "URI": "http://purl.obolibrary.org/obo/UBERON_0007023"}
            if adult
            else {"Label": "female organism",
                  "URI": "http://purl.obolibrary.org/obo/UBERON_0003100"}
        )
        n_loc = rng.randint(1, 4)
        locators = []
        for j in range(1, n_loc + 1):
            term = rng.choice(_ANATOMY) if j == 1 else rng.choice(_REGIONS)
            uri = None
            if rng.random() < 0.6:
                uri = _obo(rng, "HAO" if j == 1 else "BSPO")
            elif rng.random() < 0.5:
                vocab_labels.setdefault(term, None)  # resolvable via OWL vocab
            locators.append({f"Locator {j} label": term, f"Locator {j} URI": uri})
        has_var = rng.random() < 0.8
        n_states = rng.choice([2, 2, 2, 3])
        states = []
        for k in range(n_states):
            q = rng.choice(_QUALITIES)
            if k == 0 and rng.random() < 0.15:
                q = "not " + rng.choice(_QUALITIES)
            uri = _obo(rng, "PATO") if rng.random() < 0.5 else None
            if uri is None and rng.random() < 0.4:
                vocab_labels.setdefault(q.lower(), None)
            states.append(
                {f"State {k} label": q, f"State {k} URI": uri, f"State {k} token": str(k)}
            )
        row = {
            "Char_ID": f"C{i}",
            "Organism": org,
            "Locators": locators,
            "States": states,
        }
        if has_var:
            var = {"Variable label": rng.choice(_VARIABLES),
                   "Variable URI": _obo(rng, "PATO") if rng.random() < 0.5 else None}
            if rng.random() < 0.4:
                var["Variable comment"] = f"relative to {rng.choice(_ANATOMY)}"
            row["Variable"] = var
            row["Tag"] = (
                "transformational_complex" if var.get("Variable comment")
                else "transformational_simple"
            )
        else:
            row["Tag"] = "neomorphic"
        chars.append(row)

    # NEXUS matrix
    lines = [
        "#NEXUS", "", "BEGIN DATA;",
        f"\tDIMENSIONS  NTAX={ntax} NCHAR={nchar};",
        "\tFORMAT DATATYPE = STANDARD RESPECTCASE GAP = - MISSING = ? "
        "SYMBOLS = \"0123\";",
        "\tMATRIX",
    ]
    for t in taxa:
        syms = []
        for c in chars:
            r = rng.random()
            if r < 0.03:
                syms.append("-")
            elif r < 0.05:
                syms.append("?")
            elif r < 0.06:
                syms.append("9")  # parseable but out-of-range state index
            else:
                syms.append(str(rng.randrange(len(c["States"]))))
        lines.append(f"\t'{t}'    {''.join(syms)}")
    lines += ["", ";", "END;", ""]
    nexus = "\n".join(lines)

    species = []
    for t in taxa:
        genus, epithet = t.split("_")[0], t.split("_")[1]
        species.append(
            {
                "input_species_name": t,
                "valid_species_name": f"{genus} {epithet} (Author, {rng.randint(1758, 1999)})",
                "ID": rng.randrange(10 ** 6, 10 ** 8),
                "zoobank_identifier": None if rng.random() < 0.8 else f"zb:{rng.randrange(10**6)}",
                "match_level": "species",
            }
        )

    meta_lines = ["Char_ID,Comment"]
    for i in range(1, nchar + 1):
        meta_lines.append(
            f"C{i},Modified from character {rng.randrange(1, 99)} of "
            f"Synthetic and Generated ({rng.randint(1900, 1999)})"
        )
    return (
        json.dumps(chars, indent=1),
        nexus,
        json.dumps(species, indent=1),
        "\n".join(meta_lines) + "\n",
    )


def make_vocab_owl(vocab_labels: dict, rng: random.Random) -> str:
    """OWL/XML vocabulary resolving a subset of unresolved labels."""
    base = "https://example.org/synth/vocab.owl"
    parts = [
        '<?xml version="1.0"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
        '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"',
        '         xmlns:owl="http://www.w3.org/2002/07/owl#"',
        f'         xml:base="{base}">',
        f'<owl:Ontology rdf:about="{base}"/>',
    ]
    for i, label in enumerate(sorted(vocab_labels), 1):
        if rng.random() < 0.7:  # leave some unresolved (miss-count path)
            parts.append(f'<owl:Class rdf:about="#SYN_{i:07d}">')
            parts.append(f"  <rdfs:label>{label}</rdfs:label>")
            parts.append("</owl:Class>")
    parts.append("</rdf:RDF>")
    return "\n".join(parts)


def synth_corpus_rows(
    n_datasets: int = 4,
    ntax: int = 10,
    nchar: int = 10,
    seed: int = 42,
    giant_every: int = 0,
    giant_scale: int = 10,
    giant_shape: Tuple[int, int] = None,
) -> List[tuple]:
    """Corpus rows for `n_datasets` repos. With ``giant_every=k`` every
    k-th dataset is `giant_scale`x larger in both dimensions (skew knob);
    ``giant_shape=(ntax, nchar)`` overrides the giant's dimensions
    explicitly (e.g. ``(500, 2000)`` for the straggler probe — one
    million-cell NEXUS among normal documents)."""
    rng = random.Random(seed)
    rows: List[tuple] = []
    vocab_labels: dict = {}
    datasets = []
    for d in range(n_datasets):
        big = giant_every and (d % giant_every == giant_every - 1)
        if big and giant_shape:
            g_ntax, g_nchar = giant_shape
        else:
            f = giant_scale if big else 1
            g_ntax, g_nchar = ntax * f, nchar * f
        datasets.append(make_dataset(rng, g_ntax, g_nchar, vocab_labels))
    owl = make_vocab_owl(vocab_labels, rng)
    for d, (cj, nx, sp, mc) in enumerate(datasets):
        repo = f"synth/dataset-{d:04d}"
        commit = content_commit([cj, nx, sp, mc])
        rows.append((repo, "chars.json", commit, "json", cj))
        rows.append((repo, "matrix.nex", commit, "nexus", nx))
        rows.append((repo, "species.json", commit, "species-json", sp))
        rows.append((repo, "metadata.csv", commit, "csv", mc))
        rows.append((repo, "vocab.owl", commit, "owl", owl))
    return rows
