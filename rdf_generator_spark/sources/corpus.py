"""Corpus table helpers + ontology vocabulary loading.

The engine's only large input is the corpus table
``(repo, path, commit, lang, content)`` (Iceberg at scale; any DataFrame
source here). Ontologies are tiny dimension inputs: parsed driver-side
into a ``vocab(norm_label, uri)`` DataFrame that is broadcast into the
entity-linking join (SURVEY.md §2 J1).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Iterable, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from rdf_generator_spark.normalize import py_norm_term_label

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("norm_label", T.StringType()),
        T.StructField("uri", T.StringType()),
    ]
)

# File-extension -> corpus lang discriminator (FIXTURES.md §1)
EXT_LANG = {
    ".json": "json",
    ".nex": "nexus",
    ".nexus": "nexus",
    ".csv": "csv",
    ".owl": "owl",
    ".yaml": "yaml",
    ".ttl": "ttl",
}


def content_commit(contents: Iterable[str]) -> str:
    """Deterministic 40-hex pseudo-commit for synthesized corpora."""
    h = hashlib.sha1()
    for c in contents:
        h.update(c.encode("utf-8"))
    return h.hexdigest()


def corpus_df(spark: SparkSession, rows: List[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, CORPUS_SCHEMA)


# ---------------------------------------------------------------------------
# OWL label index (SRC6). rdflib-free: the ontologies are RDF/XML with
# rdf:about + rdfs:label elements; '#x' / 'x' abouts resolve against
# xml:base per RDF/XML semantics, matching what rdflib produces for
# pmck.owl (main.py:277-293).
# ---------------------------------------------------------------------------

_ABOUT_BLOCK = re.compile(
    r"rdf:about=\"([^\"]+)\"(.*?)(?=rdf:about=\"|\Z)", re.DOTALL
)
_LABEL = re.compile(r"<rdfs:label[^>]*>(.*?)</rdfs:label>", re.DOTALL)
_XML_BASE = re.compile(r"xml:base=\"([^\"]+)\"")


def _unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&apos;", "'")
        .replace("&amp;", "&")
    )


def parse_owl_labels(content: str) -> List[Tuple[str, str]]:
    """(subject_uri, raw_label) pairs in document order."""
    base_m = _XML_BASE.search(content)
    base = base_m.group(1) if base_m else ""
    out: List[Tuple[str, str]] = []
    for m in _ABOUT_BLOCK.finditer(content):
        about, block = m.group(1), m.group(2)
        if about.startswith("#"):
            subject = base + about
        elif "://" in about:
            subject = about
        else:
            subject = base + "#" + about if about else base
        for lm in _LABEL.finditer(block):
            out.append((subject, _unescape(lm.group(1))))
    return out


def build_label_index(content: str) -> Dict[str, str]:
    """normalized label -> URI, first-wins (main.py:277-293)."""
    index: Dict[str, str] = {}
    for subject, label in parse_owl_labels(content):
        key = py_norm_term_label(label)
        if key and key not in index:
            index[key] = subject
    return index


def vocab_df_from_corpus(
    spark: SparkSession, corpus: DataFrame, owl_path_hint: Optional[str] = None
) -> DataFrame:
    """Collect lang='owl' rows (tiny dimension docs) and build the vocab
    table. `owl_path_hint` restricts to a path substring (e.g. 'pmck')."""
    rows = corpus.filter(corpus.lang == "owl")
    if owl_path_hint:
        rows = rows.filter(rows.path.contains(owl_path_hint))
    index: Dict[str, str] = {}
    for r in rows.select("path", "content").collect():
        for k, v in build_label_index(r["content"]).items():
            index.setdefault(k, v)
    return spark.createDataFrame(sorted(index.items()), VOCAB_SCHEMA)
