"""Independent pure-Python oracle for the reference's graph semantics.

This is the executable spec the Spark pipeline is tested against: it
re-derives the reference's emitted triple sets directly from the
documented behavior of /root/reference/rdf_generator/main.py (citations
inline), using plain dicts/sets — no rdflib, no Spark. It consumes the
same parsed inputs the engine consumes (rows from
rdf_generator_spark.sources.parsers) so parser and graph semantics are
validated independently.

Deviations from the reference, both documented in SURVEY.md §7:
  * K5 uuid4 fallbacks (main.py:950-962) are replaced by deterministic
    seeds (unreachable on the example corpus).
  * Global sequential counters are scoped per dataset/document.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional, Tuple

from rdf_generator_spark import terms as T
from rdf_generator_spark.ids import uuid5_kb
from rdf_generator_spark.normalize import (
    py_norm_seed_component,
    py_norm_taxon_label,
    py_parse_char_num,
    py_norm_species_uri,
)

Triple = Tuple[str, str, str, bool, Optional[str]]


class OGraph:
    """Insertion-ordered triple set (mirrors rdflib Graph set semantics
    plus the first-label bookkeeping the reference relies on)."""

    def __init__(self) -> None:
        self._set: set = set()
        self.rows: List[Triple] = []

    def add(self, s: str, p: str, o: str, lit: bool = False, dt: Optional[str] = None):
        t = (s, p, o, lit, dt)
        if t not in self._set:
            self._set.add(t)
            self.rows.append(t)

    def update(self, other: "OGraph"):
        for t in other.rows:
            self.add(*t)

    def has_label(self, s: str) -> bool:
        return any(r[0] == s and r[1] == T.RDFS_LABEL for r in self._set)

    def first_label(self, s: str) -> Optional[str]:
        for r in self.rows:
            if r[0] == s and r[1] == T.RDFS_LABEL:
                return r[2]
        return None

    def types(self, s: str) -> List[str]:
        return [r[2] for r in self.rows if r[0] == s and r[1] == T.RDF_TYPE]

    def subjects_of_type(self, t: str) -> List[str]:
        return [r[0] for r in self.rows if r[1] == T.RDF_TYPE and r[2] == t]

    def triples(self) -> set:
        return set(self._set)

    def add_individual(self, e: str, label: str):
        # add_individual_triples (main.py:98-101)
        self.add(e, T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL)
        self.add(e, T.RDFS_LABEL, label, lit=True)


def base_graph() -> OGraph:
    """build_base_graph (main.py:400-489)."""
    g = OGraph()
    A = g.add
    for cls in [T.UBERON_FEMALE, T.UBERON_MALE, T.CDAO_CELL, T.CDAO_STATE,
                T.CDAO_MATRIX, T.CDAO_CHARACTER, T.CDAO_TU,
                T.PHB_NEOMORPHIC, T.PHB_TRANSF_SIMPLE, T.PHB_TRANSF_COMPLEX]:
        A(cls, T.RDF_TYPE, T.OWL_CLASS)
    for cls, lbl in [
        (T.CDAO_CELL, "standard cell"), (T.CDAO_STATE, "standard state"),
        (T.CDAO_MATRIX, "character state data matrix"),
        (T.CDAO_CHARACTER, "standard character"), (T.CDAO_TU, "TU"),
        (T.PHB_NEOMORPHIC, "Neomorphic Statement"),
        (T.PHB_TRANSF_SIMPLE, "Transformational Simple Statement"),
        (T.PHB_TRANSF_COMPLEX, "Transformational Complex Statement"),
    ]:
        A(cls, T.RDFS_LABEL, lbl, lit=True)
    for prop, lbl in [
        (T.PHB_HAS_ORGANISM, "has organism component"),
        (T.PHB_HAS_ENTITY, "has entity component"),
        (T.PHB_HAS_VARIABLE, "has variable component"),
        (T.PHB_HAS_QUALITY, "has quality component"),
        (T.PHB_REFERS_TO_STATEMENT, "refers to phenotype statement"),
        (T.CDAO_HAS_CHARACTER, "has_Character"),
        (T.CDAO_HAS_STATE, "has_State"),
        (T.CDAO_BELONGS_TO_TU, "belongs_to_TU"),
        (T.CDAO_BELONGS_TO_CHARACTER, "belongs_to_Character"),
        (T.CDAO_HAS_TU, "has_TU"),
        (T.BFO_HAS_PART, "has part"),
        (T.RO_HAS_CHARACTERISTIC, "has characteristic"),
        (T.RO_HAS_ROLE_IN_MODELLING, "has role in modelling"),
        (T.IAO_DENOTES, "denotes"),
    ]:
        A(prop, T.RDF_TYPE, T.OWL_OBJECT_PROPERTY)
        A(prop, T.RDFS_LABEL, lbl, lit=True)
    for dprop in [T.DC_DESCRIPTION, T.DWC_TAXON_ID, T.DWC_PARENT_NAME_USAGE_ID,
                  T.KB_SORT_CHAR_NUM, T.KB_SORT_SPECIES]:
        A(dprop, T.RDF_TYPE, T.OWL_DATATYPE_PROPERTY)
    A(T.KB_SORT_CHAR_NUM, T.RDFS_LABEL, "sort character number", lit=True)
    A(T.KB_SORT_SPECIES, T.RDFS_LABEL, "sort species", lit=True)
    for aprop in [T.RDFS_LABEL, T.RDFS_COMMENT, T.RDFS_SEEALSO]:
        A(aprop, T.RDF_TYPE, T.OWL_ANNOTATION_PROPERTY)
    A(T.PROV_ENTITY, T.RDF_TYPE, T.OWL_CLASS)
    A(T.PROV_HAD_PRIMARY_SOURCE, T.RDF_TYPE, T.OWL_OBJECT_PROPERTY)
    A(T.PROV_HAD_PRIMARY_SOURCE, T.RDFS_LABEL, "had primary source", lit=True)
    return g


def _missing_uri(u: Optional[str]) -> bool:
    # apply_pmck_uri_fallbacks fill condition (main.py:313-314)
    return u is None or not str(u).strip() or str(u).strip().lower() == "null"


def _norm_term(label: Optional[str]) -> str:
    from rdf_generator_spark.normalize import py_norm_term_label

    return py_norm_term_label(label)


class Counters:
    def __init__(self):
        self.vals: Dict[str, int] = {}

    def next(self, family: str) -> int:
        self.vals[family] = self.vals.get(family, 0) + 1
        return self.vals[family]


class RefSim:
    """One dataset (document group) worth of reference semantics."""

    def __init__(
        self,
        chars: List[dict],
        cells: List[tuple],  # (taxon_pos, taxon, char_index, symbol)
        species: List[dict],
        metadata: Dict[str, str],  # char_id -> source_text (already stripped)
        vocab: Dict[str, str],
        dataset_id: Optional[str] = None,
        json_basename: Optional[str] = None,
    ):
        self.chars = [dict(c, locators=[dict(l) for l in c["locators"]],
                           states=[dict(s) for s in c["states"]]) for c in chars]
        self.cells = sorted(cells, key=lambda r: (r[2], r[0]))
        self.taxa = [t for _, t in sorted({(p, t) for p, t, _, _ in cells})]
        self.cell_by = {(t, ci): sym for _, t, ci, sym in cells}
        self.species = species
        self.metadata = metadata
        self.vocab = vocab
        self.dataset_id = dataset_id
        self.json_basename = json_basename
        self.ctr = Counters()
        self.fill_stats = {"filled": 0, "unresolved": 0}
        self._fill_uris()
        self.quality_label_to_uri = self._state_label_index()
        self.salt = self._salt()

    # --- load-phase semantics -------------------------------------------

    def _fill_slot(self, obj: dict, label_key: str, uri_key: str):
        if not _missing_uri(obj.get(uri_key)):
            return
        norm = _norm_term(obj.get(label_key))
        if not norm:
            return
        resolved = self.vocab.get(norm)
        if resolved:
            obj[uri_key] = resolved
            self.fill_stats["filled"] += 1
        else:
            self.fill_stats["unresolved"] += 1

    def _fill_uris(self):
        # J1 (main.py:296-343) over the normalized parse shape
        for row in self.chars:
            if row.get("org_label") is not None or row.get("org_uri") is not None:
                slot = {"label": row.get("org_label"), "uri": row.get("org_uri")}
                self._fill_slot(slot, "label", "uri")
                row["org_uri"] = slot["uri"]
            for loc in row["locators"]:
                self._fill_slot(loc, "label", "uri")
            if row.get("has_variable"):
                slot = {"label": row.get("var_label"), "uri": row.get("var_uri")}
                self._fill_slot(slot, "label", "uri")
                row["var_uri"] = slot["uri"]
            for st in row["states"]:
                self._fill_slot(st, "label", "uri")

    def _state_label_index(self) -> Dict[str, str]:
        # J2 index (main.py:566-572): raw label lower -> first truthy URI
        index: Dict[str, str] = {}
        for row in self.chars:
            for st in row["states"]:
                lab = str(st.get("label") or "").strip().lower()
                uri = st.get("uri")
                if lab and uri and lab not in index:
                    index[lab] = uri
        return index

    def _salt(self) -> str:
        # build_dataset_seed_salt (main.py:227-249)
        did = py_norm_seed_component(self.dataset_id)
        if did:
            return f"dataset::{did}"
        vals = sorted(
            v for v in (py_norm_seed_component(x) for x in self.metadata.values()) if v
        )
        if vals:
            fp = hashlib.sha256("||".join(vals).encode("utf-8")).hexdigest()[:16]
            return f"metadata::{fp}"
        # tier 3 (main.py:245-247): normalized input-json basename
        jb = py_norm_seed_component(self.json_basename)
        if jb:
            return f"input::{jb}"
        return "dataset::default"

    # --- helpers ---------------------------------------------------------

    def org_seed(self, org_label: Optional[str], taxon_label: Optional[str]) -> str:
        taxon_c = py_norm_seed_component(taxon_label) or "unknown-taxon"
        org_c = py_norm_seed_component(org_label) or "organism"
        return "::".join([self.salt, taxon_c, org_c])

    def _state_fields(self, char_id: str, st: dict):
        label = str(st.get("label") if st.get("label") is not None else "unknown").strip()
        uri = st.get("uri") or None
        is_neg = label.lower().startswith("not ")
        base_label = None
        if is_neg:
            base_label = label[4:].strip()
            label = f"not {base_label}"
        resolved = uri
        if is_neg and not uri:
            resolved = self.quality_label_to_uri.get(base_label.strip().lower())
        seed = f"{char_id}_{uri or label.lower()}"
        return label, uri, is_neg, base_label, resolved, seed

    # --- phase b: character graphs (main.py:1640-1693) -------------------

    def process_phenotype(self, g: OGraph, row: dict, count_states: bool = True):
        char_id = row["char_id"]
        char_label = row.get("char_label") or f"Character {char_id}"
        char_uri = uuid5_kb("char", f"char_{char_id}")
        g.add(char_uri, T.RDF_TYPE, T.CDAO_CHARACTER)
        g.add(char_uri, T.RDFS_LABEL, char_label, lit=True)
        g.add(char_uri, T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL)
        source_text = self.metadata.get(char_id)
        if source_text:
            src = uuid5_kb("src", f"revision-source::{char_id}::{source_text.lower()}")
            g.add(src, T.RDF_TYPE, T.PROV_ENTITY)
            g.add(src, T.RDFS_LABEL, source_text, lit=True)
            g.add(char_uri, T.PROV_HAD_PRIMARY_SOURCE, src)
        state_map: Dict[int, str] = {}
        for idx, st in enumerate(row["states"]):
            label, uri, _neg, _base, _res, seed = self._state_fields(char_id, st)
            sta = uuid5_kb("sta", seed)
            g.add(sta, T.RDF_TYPE, T.CDAO_STATE)
            if not g.has_label(sta):
                n = self.ctr.next("STATE")
                g.add_individual(sta, f"{label.strip() or 'state'}:id-{n}")
            state_map[idx] = sta
        for idx in state_map:
            g.add(char_uri, T.PHB_MAY_HAVE_STATE, state_map[idx])
        # species-in-row graph (main.py:1169-1181)
        sp_g = OGraph()
        sp_label = py_norm_taxon_label(row.get("species_label"))
        if sp_label and row.get("species_id"):
            sp_uri = uuid5_kb("sp", sp_label)
            sp_g.add(sp_uri, T.RDF_TYPE, T.TXR_SPECIES)
            sp_g.add(sp_uri, T.RDFS_LABEL, sp_label, lit=True)
            sp_g.add(sp_uri, T.DWC_PARENT_NAME_USAGE_ID,
                     f"https://www.gbif.org/species/{row['species_id']}")
        return char_uri, state_map, sp_g

    def handle_quality(self, g: OGraph, row: dict) -> Dict[int, str]:
        char_id = row["char_id"]
        out: Dict[int, str] = {}
        for idx, st in enumerate(row["states"]):
            label, uri, is_neg, base_label, resolved, seed = self._state_fields(char_id, st)
            qua = uuid5_kb("qua", seed)
            if uri:
                g.add(uri, T.RDF_TYPE, T.OWL_CLASS)
                g.add(uri, T.RDFS_LABEL, label, lit=True)
                g.add(qua, T.RDF_TYPE, uri)
            if not g.has_label(qua):
                n = self.ctr.next("QUALITY")
                g.add_individual(qua, f"{label.strip() or 'quality'}:id-{n}")
            if is_neg and resolved:
                seed2 = str(resolved)
                restr = uuid5_kb("restr", seed2)
                display = base_label
                g.add(restr, T.RDFS_LABEL, f"has_characteristic some {display}", lit=True)
                g.add(restr, T.RDF_TYPE, T.OWL_RESTRICTION)
                g.add(restr, T.OWL_ON_PROPERTY, T.RO_HAS_CHARACTERISTIC)
                g.add(restr, T.OWL_SOME_VALUES_FROM, resolved)
                comp = uuid5_kb("comp", seed2)
                g.add(comp, T.RDF_TYPE, T.OWL_CLASS)
                g.add(comp, T.OWL_COMPLEMENT_OF, restr)
                g.add(comp, T.RDFS_LABEL,
                      f"NOT (has_characteristic some {display})", lit=True)
                g.add(qua, T.RDF_TYPE, comp)
                if row.get("var_uri"):
                    g.add(row["var_uri"], T.RDF_TYPE, T.OWL_CLASS)
                    g.add(qua, T.RDF_TYPE, row["var_uri"])
            out[idx] = qua
        return out

    def handle_organism(self, g: OGraph, org_label: str, org_uri: Optional[str],
                        taxon_label: str) -> str:
        uri = org_uri or (T.KB + str(org_label).replace(" ", "_"))
        inst = uuid5_kb("org", self.org_seed(org_label, taxon_label))
        g.add(uri, T.RDF_TYPE, T.OWL_CLASS)
        g.add(uri, T.RDFS_LABEL, org_label, lit=True)
        g.add(inst, T.RDF_TYPE, uri)
        g.add(inst, T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL)
        if not g.has_label(inst):
            n = self.ctr.next("ORGANISM")
            g.add_individual(inst, f"{(org_label or 'organism').strip()}:id-{n}")
        return inst

    def handle_locators(self, g: OGraph, row: dict, org_inst: str) -> List[str]:
        prev = org_inst
        out = []
        for loc in row["locators"]:
            label = loc.get("label")
            if not label:
                continue
            uri = loc.get("uri") or None
            seed_base = uri or label.strip().lower()
            cur = uuid5_kb("loc", f"{prev}::{seed_base}")
            if uri:
                g.add(uri, T.RDFS_LABEL, label, lit=True)
                g.add(uri, T.RDF_TYPE, T.OWL_CLASS)
                g.add(cur, T.RDF_TYPE, uri)
            if not g.has_label(cur):
                n = self.ctr.next("LOCATOR")
                g.add_individual(cur, f"{label.strip() or 'locator'}:id-{n}")
            g.add(prev, T.BFO_HAS_PART, cur)
            out.append(cur)
            prev = cur
        return out

    def variable_chain_seed(self, row: dict) -> Optional[str]:
        locs = row["locators"]
        if not locs:
            return None
        # main.py:933-953 — None URIs stringify to "None" (quirk)
        uris = [str(l.get("uri")).strip() for l in locs]
        labels = [str(l.get("label")).strip() for l in locs]
        if uris and all(uris):
            return "::".join(uris)
        if labels and all(labels):
            return "::".join(labels)
        return f"__malformed__::{row['char_id']}"  # K5 deterministic stand-in

    def handle_variable(self, g: OGraph, row: dict, org_inst: str) -> Optional[str]:
        if not row.get("has_variable"):
            return None
        var_label = row.get("var_label") or "Unnamed Variable"
        chain = self.variable_chain_seed(row)
        if chain:
            seed = f"{org_inst}::{chain}::{var_label.strip().lower()}"
        else:
            seed = f"__noloc__::{row['char_id']}::{var_label.strip().lower()}"  # K5 stand-in
        inst = uuid5_kb("var", seed)
        if not g.has_label(inst):
            n = self.ctr.next("VARIABLE")
            g.add_individual(inst, f"{var_label.strip() or 'variable'}:id-{n}")
        if row.get("var_uri"):
            g.add(row["var_uri"], T.RDF_TYPE, T.OWL_CLASS)
            g.add(row["var_uri"], T.RDFS_LABEL, var_label, lit=True)
            g.add(inst, T.RDF_TYPE, row["var_uri"])
        if row.get("var_comment"):
            g.add(inst, T.RDFS_COMMENT, row["var_comment"], lit=True)
        return inst

    def statement_type(self, row: dict) -> str:
        if not row.get("has_variable"):
            return T.PHB_NEOMORPHIC
        c = row.get("var_comment")
        if c and str(c).strip():
            return T.PHB_TRANSF_COMPLEX
        return T.PHB_TRANSF_SIMPLE

    # --- full run --------------------------------------------------------

    def run(self) -> Dict[str, Any]:
        base = base_graph()

        # phase b: per-character graphs
        combined_char = OGraph()
        combined_char.update(base)
        character_graphs: Dict[str, OGraph] = {}
        char_state_mapping: Dict[str, Dict[int, str]] = {}
        char_order: List[str] = []
        for row in self.chars:
            char_id = row["char_id"]
            char_order.append(char_id)
            g_char = OGraph()
            g_char.update(base)
            _cu, smap, sp_g = self.process_phenotype(g_char, row)
            char_state_mapping[char_id] = smap
            if sp_g.rows:
                g_char.update(sp_g)
                combined_char.update(sp_g)
            combined_char.update(g_char)
            character_graphs[char_id] = g_char

        # phase c: matrix graph (main.py:1696-1893)
        g = OGraph()
        mx_label = None
        if self.chars:
            mx_label = self.chars[-1].get("doc_matrix_label")
        mx = uuid5_kb("mx", mx_label or "default_matrix")
        g.add(mx, T.RDF_TYPE, T.CDAO_MATRIX)
        if not g.has_label(mx):
            g.add(mx, T.RDFS_LABEL, f"matrix:id-{self.ctr.next('MATRIX')}", lit=True)
        g.add(mx, T.DC_DESCRIPTION, "matrix description", lit=True)
        g.add(mx, T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL)

        rows_by_id = {r["char_id"]: r for r in self.chars}
        for char_index, char_id in enumerate(char_order):
            row = rows_by_id.get(char_id)
            if not row:
                continue
            quality_map = self.handle_quality(g, row)
            char_uri, _smap, sp_g = self.process_phenotype(g, row)
            if sp_g.rows:
                g.update(sp_g)
            g.add(mx, T.CDAO_HAS_CHARACTER, char_uri)
            for taxon in self.taxa:
                cell = uuid5_kb("cell", f"{taxon}_{char_index}")
                if not g.has_label(cell):
                    g.add(cell, T.RDFS_LABEL, f"cell:id-{self.ctr.next('CELL')}", lit=True)
                g.add(cell, T.DC_DESCRIPTION,
                      f"Cell for taxon {taxon}, character {char_id}", lit=True)
                g.add(cell, T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL)
                g.add(cell, T.RDF_TYPE, T.CDAO_CELL)
                g.add(cell, T.CDAO_BELONGS_TO_CHARACTER, char_uri)
                symbol = str(self.cell_by.get((taxon, char_index), "")).strip()
                try:
                    state_index = int(symbol)
                except (TypeError, ValueError):
                    continue
                chosen_state = char_state_mapping.get(char_id, {}).get(state_index)
                per_pheno_seed = f"pheno-{char_id}::{taxon.strip().lower()}"
                org_label = row.get("org_label")
                dup = bool(org_label) and org_label.strip().lower() == "adult organism"
                if dup:
                    variants = [
                        (uuid5_kb("phe", per_pheno_seed + "::female"),
                         "female organism", T.UBERON_FEMALE),
                        (uuid5_kb("phe", per_pheno_seed + "::male"),
                         "male organism", T.UBERON_MALE),
                    ]
                else:
                    variants = [(uuid5_kb("phe", per_pheno_seed), org_label,
                                 row.get("org_uri"))]
                norm_taxon = py_norm_taxon_label(taxon)
                for ph, v_org_label, v_org_uri in variants:
                    g.add(ph, T.KB_SORT_CHAR_NUM, str(py_parse_char_num(char_id)),
                          lit=True, dt=T.XSD_INTEGER)
                    g.add(ph, T.KB_SORT_SPECIES, norm_taxon, lit=True)
                    g.add(ph, T.DC_DESCRIPTION,
                          f"Phenotype statement for "
                          f"{row.get('char_label') or char_id} in {norm_taxon}",
                          lit=True)
                    g.add_individual(ph, f"phenotype:id-{self.ctr.next('PHENOTYPE')}")
                    g.add(ph, T.RDF_TYPE, self.statement_type(row))
                    org_inst = self.handle_organism(g, v_org_label, v_org_uri, norm_taxon)
                    locs = self.handle_locators(g, row, org_inst)
                    tu = uuid5_kb("tu", norm_taxon.strip().lower())
                    g.add(tu, T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL)
                    g.add(tu, T.RDF_TYPE, T.CDAO_TU)
                    g.add(org_inst, T.RO_HAS_ROLE_IN_MODELLING, tu)
                    g.add(cell, T.CDAO_BELONGS_TO_TU, tu)
                    g.add(mx, T.CDAO_HAS_TU, tu)
                    g.add(ph, T.PHB_HAS_ORGANISM, org_inst)
                    for lc in locs:
                        g.add(ph, T.PHB_HAS_ENTITY, lc)
                    var_inst = self.handle_variable(g, row, org_inst)
                    if var_inst:
                        g.add(ph, T.PHB_HAS_VARIABLE, var_inst)
                    q_base = quality_map.get(state_index)
                    if q_base is not None:
                        per_org_q = uuid5_kb("qua", f"{org_inst}::{char_id}::{q_base}")
                        base_label = g.first_label(q_base)
                        g.add_individual(per_org_q, base_label or "quality")
                        for t in g.types(q_base):
                            if t != T.OWL_NAMED_INDIVIDUAL:
                                g.add(per_org_q, T.RDF_TYPE, t)
                        chosen_q = per_org_q
                        if locs:
                            g.add(locs[-1], T.RO_HAS_CHARACTERISTIC, chosen_q)
                        g.add(ph, T.PHB_HAS_QUALITY, chosen_q)
                    if chosen_state is not None:
                        g.add(cell, T.CDAO_HAS_STATE, chosen_state)
                    g.add(cell, T.PHB_REFERS_TO_STATEMENT, ph)
        matrix = g

        # species + TU phases (main.py:1944-2051)
        sp_g = OGraph()
        tu_union = OGraph()
        for taxon in self.taxa:
            taxon_label = py_norm_taxon_label(taxon)
            info = {}
            for rec in self.species:
                if (rec.get("valid_name") or "") == taxon_label or \
                   (rec.get("input_name") or "") == taxon_label:
                    info = dict(rec)
                    break
            sp_graph = OGraph()
            sp_uri = py_norm_species_uri(info.get("uri"), taxon_label)
            sp_graph.add(sp_uri, T.RDF_TYPE, T.OWL_CLASS)
            concept_label = py_norm_taxon_label(info.get("valid_name") or taxon_label)
            sp_graph.add(sp_uri, T.RDFS_LABEL, concept_label, lit=True)
            sp_graph.add(sp_uri, T.RDF_TYPE, T.TXR_SPECIES)
            sp_inst = uuid5_kb("sp", taxon_label.strip().lower())
            sp_graph.add(sp_inst, T.RDF_TYPE, sp_uri)
            sp_graph.add_individual(sp_inst, taxon_label)
            if info.get("gbif_id"):
                sp_graph.add(sp_inst, T.DWC_PARENT_NAME_USAGE_ID,
                             f"GBIF:{info['gbif_id']}", lit=True)
                sp_graph.add(sp_inst, T.RDFS_SEEALSO,
                             f"https://www.gbif.org/species/{info['gbif_id']}")
            if info.get("zoobank_id"):
                sp_graph.add(sp_inst, T.DWC_TAXON_ID, info["zoobank_id"], lit=True)

            tu_graph = OGraph()
            # J7 substring copy is a no-op on generated IRIs (SURVEY.md J7).
            # Per-character graphs merge for every cell column of this taxon
            # (main.py:1987-1996).
            for ci in sorted(ci for (t, ci) in self.cell_by if t == taxon):
                if ci < len(char_order):
                    gc = character_graphs.get(char_order[ci])
                    if gc:
                        tu_graph.update(gc)
            sp_g.update(sp_graph)

            # default organism instance (main.py:2030-2037)
            org_inst = None
            for row in self.chars:
                if row.get("org_label") and row.get("species_label"):
                    org_inst = uuid5_kb(
                        "org", self.org_seed(row["org_label"], row["species_label"])
                    )
                    break
            if org_inst is None:
                org_inst = uuid5_kb("org", f"{taxon_label.strip().lower()}::organism")

            tu = uuid5_kb("tu", taxon_label.strip().lower())
            valid_label = (info.get("valid_name") or info.get("input_name")
                           or taxon_label or "Unknown species")
            valid_label = str(valid_label).strip()
            parts = valid_label.split(" ", 2)
            binomial = f"{parts[0]} {parts[1]}" if len(parts) >= 2 else valid_label
            author = parts[2] if len(parts) == 3 else ""
            html = f"<i>{binomial}</i> {author}".strip()
            tu_graph.add_individual(tu, taxon_label)
            tu_graph.add(tu, T.RDFS_COMMENT, html, lit=True)
            tu_graph.add(org_inst, T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL)
            tu_graph.add(tu, T.RDF_TYPE, T.CDAO_TU)
            tu_graph.add(tu, T.IAO_DENOTES, sp_inst)
            tu_union.update(tu_graph)

        # outputs (main.py:2123-2179)
        prune(matrix)
        apply_label_priority(matrix, combined_char)

        final = OGraph()
        for part in (base, combined_char, matrix, sp_g, tu_union):
            final.update(part)
        prune(final)
        apply_label_priority(matrix, final)

        return {
            "base": base,
            "char": combined_char,
            "matrix": matrix,
            "species": sp_g,
            "tu": tu_union,
            "final": final,
            "fill_stats": self.fill_stats,
            "counters": dict(self.ctr.vals),
        }


def prune(g: OGraph) -> Dict[str, int]:
    """prune_unreferenced_prototypes (main.py:1596-1634)."""
    referenced_q = {r[2] for r in g.rows if r[1] == T.PHB_HAS_QUALITY and not r[3]}
    referenced_o = {r[2] for r in g.rows if r[1] == T.PHB_HAS_ORGANISM and not r[3]}
    victims = set()
    for s in set(g.subjects_of_type(T.OWL_NAMED_INDIVIDUAL)):
        local = s[len(T.KB):] if s.startswith(T.KB) else ""
        if local.startswith("qua-") and s not in referenced_q:
            victims.add(s)
        elif local.startswith("org-") and s not in referenced_o:
            victims.add(s)
    kept = [r for r in g.rows
            if r[0] not in victims and not (not r[3] and r[2] in victims)]
    g.rows = kept
    g._set = set(kept)
    return {"total": len(victims)}


def apply_label_priority(matrix: OGraph, target: OGraph) -> int:
    """apply_matrix_label_priority (main.py:1243-1270)."""
    changes = 0
    target_subjects = {r[0] for r in target.rows}
    for subj in target_subjects:
        preferred = matrix.first_label(subj)
        if preferred is None:
            continue
        existing = [r for r in target.rows if r[0] == subj and r[1] == T.RDFS_LABEL]
        texts = [r[2] for r in existing]
        if existing and len(texts) == 1 and texts[0] == preferred:
            continue
        for r in existing:
            target._set.discard(r)
        target.rows = [r for r in target.rows if not (r[0] == subj and r[1] == T.RDFS_LABEL)]
        target.add(subj, T.RDFS_LABEL, preferred, lit=True)
        changes += 1
    return changes
