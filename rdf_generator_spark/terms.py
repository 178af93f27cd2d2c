"""IRI vocabulary constants for the phenotype knowledge graph.

These mirror the namespace table of the reference implementation
(/root/reference/rdf_generator/main.py:72-87) so emitted triples are
IRI-identical, but are plain strings: our engine is columnar and never
materializes node objects.
"""

from __future__ import annotations

BFO = "http://purl.obolibrary.org/obo/BFO_"
CDAO = "http://purl.obolibrary.org/obo/CDAO_"
DC = "http://purl.org/dc/terms/"
DWC = "http://rs.tdwg.org/dwc/terms/"
IAO = "http://purl.obolibrary.org/obo/IAO_"
KB = "http://www.phenobees.org/kb#"
OBO = "http://purl.obolibrary.org/obo#"
PATO = "http://purl.obolibrary.org/obo/PATO_"
PHB = "https://raw.githubusercontent.com/tsrsilva/rdf-generator/refs/heads/main/data/ontologies/PHB_"
PMCK = "https://raw.githubusercontent.com/tsrsilva/rdf-generator/refs/heads/main/data/ontologies/PMCK_"
PROV = "http://www.w3.org/ns/prov#"
RO = "http://purl.obolibrary.org/obo/RO_"
TXR = "http://purl.obolibrary.org/obo/TAXRANK_"
UBERON = "http://purl.obolibrary.org/obo/UBERON_"
XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"

RDF_TYPE = RDF_NS + "type"
RDFS_LABEL = RDFS_NS + "label"
RDFS_COMMENT = RDFS_NS + "comment"
RDFS_SEEALSO = RDFS_NS + "seeAlso"
RDFS_SUBCLASSOF = RDFS_NS + "subClassOf"

OWL_CLASS = OWL_NS + "Class"
OWL_NAMED_INDIVIDUAL = OWL_NS + "NamedIndividual"
OWL_OBJECT_PROPERTY = OWL_NS + "ObjectProperty"
OWL_DATATYPE_PROPERTY = OWL_NS + "DatatypeProperty"
OWL_ANNOTATION_PROPERTY = OWL_NS + "AnnotationProperty"
OWL_RESTRICTION = OWL_NS + "Restriction"
OWL_ON_PROPERTY = OWL_NS + "onProperty"
OWL_SOME_VALUES_FROM = OWL_NS + "someValuesFrom"
OWL_COMPLEMENT_OF = OWL_NS + "complementOf"
OWL_ONTOLOGY = OWL_NS + "Ontology"
OWL_IMPORTS = OWL_NS + "imports"

# PHB statement classes / properties (main.py:103-113, 441-450)
PHB_NEOMORPHIC = PHB + "0000021"
PHB_TRANSF_SIMPLE = PHB + "0000022"
PHB_TRANSF_COMPLEX = PHB + "0000023"
PHB_HAS_ENTITY = PHB + "0000001"
PHB_HAS_ORGANISM = PHB + "0000002"
PHB_HAS_QUALITY = PHB + "0000003"
PHB_HAS_VARIABLE = PHB + "0000004"
PHB_REFERS_TO_STATEMENT = PHB + "0000005"
PHB_MAY_HAVE_STATE = PHB + "0000032"

# CDAO classes / properties (main.py:419-429, 451-460)
CDAO_CELL = CDAO + "0000008"
CDAO_STATE = CDAO + "0000045"
CDAO_MATRIX = CDAO + "0000056"
CDAO_CHARACTER = CDAO + "0000075"
CDAO_TU = CDAO + "0000138"
CDAO_HAS_CHARACTER = CDAO + "0000142"
CDAO_HAS_STATE = CDAO + "0000184"
CDAO_BELONGS_TO_TU = CDAO + "0000191"
CDAO_BELONGS_TO_CHARACTER = CDAO + "0000205"
CDAO_HAS_TU = CDAO + "0000208"

BFO_HAS_PART = BFO + "0000051"
RO_HAS_CHARACTERISTIC = RO + "0000053"
RO_HAS_ROLE_IN_MODELLING = RO + "0003301"
IAO_DENOTES = IAO + "0000219"
TXR_SPECIES = TXR + "0000006"

UBERON_FEMALE = UBERON + "0003100"
UBERON_MALE = UBERON + "0003101"
UBERON_ADULT = UBERON + "0007023"

DC_DESCRIPTION = DC + "description"
DWC_TAXON_ID = DWC + "taxonID"
DWC_PARENT_NAME_USAGE_ID = DWC + "parentNameUsageID"
KB_SORT_CHAR_NUM = KB + "sortCharNum"
KB_SORT_SPECIES = KB + "sortSpecies"
PROV_ENTITY = PROV + "Entity"
PROV_HAD_PRIMARY_SOURCE = PROV + "hadPrimarySource"

XSD_INTEGER = XSD + "integer"

# The UUID5 namespace the reference mints every kb: IRI under
# (main.py:86). Hex form of UUID("12345678-1234-5678-1234-567812345678").bytes.
UUID_NAMESPACE_HEX = "12345678123456781234567812345678"

# Deterministic Turtle prefix block ordering (main.py:367-386)
PREFIXES = [
    ("bfo", BFO),
    ("cdao", CDAO),
    ("dc", DC),
    ("dwc", DWC),
    ("iao", IAO),
    ("kb", KB),
    ("obo", OBO),
    ("owl", OWL_NS),
    ("pato", PATO),
    ("phb", PHB),
    ("pmck", PMCK),
    ("prov", PROV),
    ("rdf", RDF_NS),
    ("rdfs", RDFS_NS),
    ("ro", RO),
    ("txr", TXR),
    ("uberon", UBERON),
    ("xsd", XSD),
]

# kb: local-name prefixes of generated individuals (main.py:1301-1304)
KB_GENERATED_PREFIXES = (
    "sp-", "phe-", "org-", "loc-", "var-", "qua-", "sta-",
    "mx-", "char-", "tu-", "cell-", "comp-", "restr-",
)

DEFAULT_CHAR_SORT_NUM = 10 ** 9
