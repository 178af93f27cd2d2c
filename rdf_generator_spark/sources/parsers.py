"""Arrow-batched document parsers: corpus `content` -> typed DataFrames.

Every parser is a ``mapInPandas`` transform over the corpus table
``(repo, path, commit, lang, content)`` — documents stream through in
Arrow batches, one output row per extracted record, so a single giant
document fans out inside its partition without a shuffle. The irregular
positional key names of the character JSON ("Locator 1 label",
"State 0 URI" — /root/reference/rdf_generator/main.py:752,1003,1099) are
normalized to fixed StructTypes here so everything downstream is
statically typed and stays in the JVM.
"""

from __future__ import annotations

import csv
import io
import json
import re
from typing import Any, Dict, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from rdf_generator_spark.normalize import (
    py_extract_revision_source,
    py_norm_taxon_label,
    py_norm_species_uri,
)

_DOC_KEY_FIELDS = [
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
]

LABEL_URI = T.StructType(
    [T.StructField("label", T.StringType()), T.StructField("uri", T.StringType())]
)

STATE_STRUCT = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("token", T.StringType()),
    ]
)

CHARS_SCHEMA = T.StructType(
    _DOC_KEY_FIELDS
    + [
        T.StructField("char_pos", T.IntegerType()),
        T.StructField("char_id", T.StringType()),
        T.StructField("char_label", T.StringType()),
        T.StructField("org_label", T.StringType()),
        T.StructField("org_uri", T.StringType()),
        T.StructField("locators", T.ArrayType(LABEL_URI)),
        T.StructField("has_variable", T.BooleanType()),
        T.StructField("var_label", T.StringType()),
        T.StructField("var_uri", T.StringType()),
        T.StructField("var_comment", T.StringType()),
        T.StructField("states", T.ArrayType(STATE_STRUCT)),
        T.StructField("tag", T.StringType()),
        T.StructField("species_label", T.StringType()),
        T.StructField("species_id", T.StringType()),
        # Quirk F12: the reference reads MatrixLabel from the *leaked* last
        # loop variable of the load phase (main.py:500 + 1720), i.e. the
        # document's LAST row. Replicated per document on every row.
        T.StructField("doc_matrix_label", T.StringType()),
    ]
)

CELLS_SCHEMA = T.StructType(
    _DOC_KEY_FIELDS
    + [
        T.StructField("taxon_pos", T.IntegerType()),
        T.StructField("taxon", T.StringType()),
        T.StructField("char_index", T.IntegerType()),
        T.StructField("symbol", T.StringType()),
    ]
)

SPECIES_SCHEMA = T.StructType(
    _DOC_KEY_FIELDS
    + [
        T.StructField("sp_pos", T.IntegerType()),
        T.StructField("input_name", T.StringType()),
        T.StructField("valid_name", T.StringType()),
        T.StructField("gbif_id", T.StringType()),
        T.StructField("zoobank_id", T.StringType()),
        T.StructField("match_level", T.StringType()),
        T.StructField("uri", T.StringType()),
    ]
)

METADATA_SCHEMA = T.StructType(
    _DOC_KEY_FIELDS
    + [
        T.StructField("char_id", T.StringType()),
        T.StructField("source_text", T.StringType()),
        # CSV row position: the reference folds rows into a dict where a
        # repeated Char_ID overwrites (main.py:214-221) — carrying the
        # position lets the pipeline replay last-row-wins distributively.
        T.StructField("meta_pos", T.IntegerType()),
    ]
)


def _first_value(d: Dict[str, Any], needle: str, require_truthy: bool = False):
    """Positional-key matcher: first value whose key contains `needle`
    (case-insensitive) — the reference's `next(v for k,v in ...)` idiom."""
    for k, v in d.items():
        if needle in k.lower():
            if require_truthy and not v:
                continue
            return v
    return None


def _norm_locator(loc: Any) -> Optional[Dict[str, Optional[str]]]:
    """Locator normalization P1 (main.py:500-512): str -> {label,uri}."""
    if isinstance(loc, dict):
        return {
            "label": _none_or_str(_first_value(loc, "label")),
            "uri": _none_or_str(_first_value(loc, "uri")),
        }
    if isinstance(loc, str):
        return {"label": loc.split("/")[-1], "uri": loc}
    return None


def _none_or_str(v: Any) -> Optional[str]:
    return None if v is None else str(v)


def char_rows_from_json(content: str) -> List[dict]:
    """One character JSON document -> list of normalized char dicts
    (without the repo/path/commit keys)."""
    try:
        raw = json.loads(content)
    except (ValueError, TypeError):
        return []
    rows = raw if isinstance(raw, list) else [raw]
    doc_matrix_label = None
    if rows and isinstance(rows[-1], dict):
        doc_matrix_label = _none_or_str(rows[-1].get("MatrixLabel"))
    out: List[dict] = []
    for pos, row in enumerate(rows):
        if not isinstance(row, dict):
            continue
        org = row.get("Organism") or {}
        var = row.get("Variable")
        locators = [
            n
            for n in (_norm_locator(loc) for loc in (row.get("Locators") or []))
            if n is not None
        ]
        states = []
        for st in row.get("States") or []:
            if isinstance(st, dict):
                states.append(
                    {
                        "label": _none_or_str(_first_value(st, "label")),
                        "uri": _none_or_str(_first_value(st, "uri")),
                        "token": _none_or_str(_first_value(st, "token")),
                    }
                )
        # Missing Char_ID: the reference mints a fresh uuid4 per
        # processing call (main.py:1150) — nondeterministic and
        # inconsistent across its own phases; we substitute one stable
        # per-position id (documented deviation, SURVEY.md §7 K5 family)
        char_id = _none_or_str(row.get("Char_ID"))
        if char_id is None:
            char_id = f"__nochar__{pos}"
        out.append(
            {
                "char_pos": pos,
                "char_id": char_id,
                "char_label": _none_or_str(row.get("CharacterLabel")),
                "org_label": _none_or_str(org.get("Label")),
                "org_uri": _none_or_str(org.get("URI")),
                "locators": locators,
                "has_variable": bool(var),
                "var_label": _none_or_str((var or {}).get("Variable label")),
                "var_uri": _none_or_str((var or {}).get("Variable URI")),
                "var_comment": _none_or_str((var or {}).get("Variable comment")),
                "states": states,
                "tag": _none_or_str(row.get("Tag")),
                "species_label": _none_or_str(row.get("SpeciesLabel")),
                "species_id": _none_or_str(row.get("SpeciesID")),
                "doc_matrix_label": doc_matrix_label,
            }
        )
    return out


def parse_char_docs(corpus: DataFrame) -> DataFrame:
    """Character JSON documents (lang='json') -> one row per character."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                for row in char_rows_from_json(content):
                    out.append({"repo": repo, "path": path, "commit": commit, **row})
            yield pd.DataFrame(out, columns=[f.name for f in CHARS_SCHEMA.fields])

    return corpus.filter(corpus.lang == "json").mapInPandas(gen, CHARS_SCHEMA)


_NEXUS_ROW = re.compile(r"^\s*(?:'([^']*)'|\"([^\"]*)\"|(\S+))\s*(.*)$")


def _parse_nexus_matrix(content: str) -> List[tuple]:
    """Minimal NEXUS STANDARD-matrix reader.

    Honors quoted taxon labels and interleaved blocks (rows for an
    already-seen taxon append symbols). Polymorphic groups '(..)'/'{..}'
    become single multi-char tokens, matching how the reference's
    int() guard rejects them (main.py:1775-1780).
    """
    m = re.search(r"MATRIX(.*?);", content, flags=re.IGNORECASE | re.DOTALL)
    if not m:
        return []
    order: List[str] = []
    symbols: Dict[str, List[str]] = {}
    for line in m.group(1).splitlines():
        line = line.split("[")[0]  # strip NEXUS comments
        if not line.strip():
            continue
        mm = _NEXUS_ROW.match(line)
        if not mm:
            continue
        taxon = next(g for g in mm.groups()[:3] if g is not None)
        rest = mm.group(4) or ""
        toks: List[str] = []
        i = 0
        while i < len(rest):
            ch = rest[i]
            if ch.isspace():
                i += 1
                continue
            if ch in "({":
                close = ")" if ch == "(" else "}"
                j = rest.find(close, i)
                j = j if j != -1 else len(rest) - 1
                toks.append(rest[i : j + 1])
                i = j + 1
            else:
                toks.append(ch)
                i += 1
        if taxon not in symbols:
            order.append(taxon)
            symbols[taxon] = []
        symbols[taxon].extend(toks)
    return [
        (pos, taxon, idx, sym)
        for pos, taxon in enumerate(order)
        for idx, sym in enumerate(symbols[taxon])
    ]


def parse_nexus_docs(corpus: DataFrame) -> DataFrame:
    """NEXUS documents (lang='nexus') -> long cells table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                for taxon_pos, taxon, char_index, symbol in _parse_nexus_matrix(content or ""):
                    out.append(
                        {
                            "repo": repo,
                            "path": path,
                            "commit": commit,
                            "taxon_pos": taxon_pos,
                            "taxon": taxon,
                            "char_index": char_index,
                            "symbol": symbol,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in CELLS_SCHEMA.fields])

    return corpus.filter(corpus.lang == "nexus").mapInPandas(gen, CELLS_SCHEMA)


def species_rows_from_json(content: str) -> List[dict]:
    """One species JSON document -> normalized records (main.py:537-551)."""
    try:
        entries = json.loads(content)
    except (ValueError, TypeError):
        return []
    if not isinstance(entries, list):
        entries = [entries]
    out: List[dict] = []
    for pos, s in enumerate(entries):
        if not isinstance(s, dict):
            continue
        input_name = (
            py_norm_taxon_label(s["input_species_name"])
            if s.get("input_species_name")
            else _none_or_str(s.get("input_species_name"))
        )
        valid_name = (
            py_norm_taxon_label(s["valid_species_name"])
            if s.get("valid_species_name")
            else _none_or_str(s.get("valid_species_name"))
        )
        uri = s.get("URI")
        if uri:
            uri = py_norm_species_uri(uri, input_name or "")
        out.append(
            {
                "sp_pos": pos,
                "input_name": input_name,
                "valid_name": valid_name,
                "gbif_id": _none_or_str(s.get("ID")),
                "zoobank_id": _none_or_str(s.get("zoobank_identifier")),
                "match_level": _none_or_str(s.get("match_level")),
                "uri": _none_or_str(uri),
            }
        )
    return out


def metadata_rows_from_csv(content: str) -> List[dict]:
    """One metadata CSV -> (char_id, source_text) rows (main.py:208-224)."""
    out: List[dict] = []
    try:
        for pos, row in enumerate(csv.DictReader(io.StringIO(content or ""))):
            char_id = str(row.get("Char_ID", "") or "").strip()
            source_text = py_extract_revision_source(row.get("Comment"))
            if char_id and source_text:
                out.append(
                    {"char_id": char_id, "source_text": source_text,
                     "meta_pos": pos}
                )
    except csv.Error:
        pass
    return out


def parse_species_docs(corpus: DataFrame) -> DataFrame:
    """Species JSON documents (lang='species-json') -> species records.

    Names are taxon-normalized at load, URIs species-normalized —
    mirroring main.py:537-551.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                for row in species_rows_from_json(content):
                    out.append({"repo": repo, "path": path, "commit": commit, **row})
            yield pd.DataFrame(out, columns=[f.name for f in SPECIES_SCHEMA.fields])

    return corpus.filter(corpus.lang == "species-json").mapInPandas(gen, SPECIES_SCHEMA)


def parse_metadata_docs(corpus: DataFrame) -> DataFrame:
    """Metadata CSVs (lang='csv') -> (char_id, source_text); empty rows
    dropped and 'Modified from ' stripped (main.py:208-224)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                for row in metadata_rows_from_csv(content):
                    out.append({"repo": repo, "path": path, "commit": commit, **row})
            yield pd.DataFrame(out, columns=[f.name for f in METADATA_SCHEMA.fields])

    return corpus.filter(corpus.lang == "csv").mapInPandas(gen, METADATA_SCHEMA)
