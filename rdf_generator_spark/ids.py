"""Deterministic UUID5 IRI minting — pure Spark SQL, no Python UDF.

The reference canonicalizes every generated node with
``uuid.uuid5(NAMESPACE, seed)`` (/root/reference/rdf_generator/main.py:93-96):
equal seeds collapse to equal IRIs when graphs are set-unioned. RFC 4122 v5
is just SHA-1 over (namespace bytes + seed bytes) with the version/variant
bits patched, so we express it entirely with built-in JVM functions
(``sha1``/``unhex``/``encode``/``translate``) and stay inside whole-stage
codegen — the minting hot path never leaves the JVM.

A plain-Python twin (`uuid5_kb`) is provided for tests and driver-side use.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

from rdf_generator_spark.terms import KB, UUID_NAMESPACE_HEX

_UUID_NAMESPACE = uuid.UUID(hex=UUID_NAMESPACE_HEX)

# Hex digit d -> (d & 0x3) | 0x8, the RFC 4122 variant patch for the
# high nibble of octet 8.
_VARIANT_IN = "0123456789abcdef"
_VARIANT_OUT = "89ab89ab89ab89ab"


def uuid5_col(seed: Column) -> Column:
    """Column expression computing ``str(uuid.uuid5(NAMESPACE, seed))``.

    SHA-1 of (namespace bytes || utf8(seed)); first 16 bytes formatted
    8-4-4-4-12 with version nibble forced to '5' and variant patched.
    """
    h = F.sha1(F.concat(F.unhex(F.lit(UUID_NAMESPACE_HEX)), F.encode(seed, "UTF-8")))
    return F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-5"),
        F.substring(h, 14, 3),
        F.lit("-"),
        F.translate(F.substring(h, 17, 1), _VARIANT_IN, _VARIANT_OUT),
        F.substring(h, 18, 3),
        F.lit("-"),
        F.substring(h, 21, 12),
    )


def kb_iri(prefix: str, seed: Column) -> Column:
    """``kb:{prefix}-{uuid5(seed)}`` — the universal generated-IRI shape
    (main.py:93-96)."""
    return F.concat(F.lit(f"{KB}{prefix}-"), uuid5_col(seed))


def uuid5_kb(prefix: str, seed: str) -> str:
    """Driver/test-side twin of `kb_iri`."""
    return f"{KB}{prefix}-{uuid.uuid5(_UUID_NAMESPACE, seed)}"
