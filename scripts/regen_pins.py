#!/usr/bin/env python
"""Regenerate the pinned oracle VALUES in rdf_generator_spark/queries_kg.py.

Ground truth is the pure-Python executable reference spec
(tests/oracle/refsim.py) run on the golden example corpus — an
independent derivation from the Spark pipeline. Run after any semantic
pipeline change:

    PYTHONPATH=/root/repo python scripts/regen_pins.py
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_generator_spark.queries_kg import (  # noqa: E402
    FAMILIES, census_py, digest_py, family_pred_py,
)
from tests.fixtures import golden_parsed  # noqa: E402
from tests.oracle.refsim import RefSim  # noqa: E402

TARGET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rdf_generator_spark", "queries_kg.py",
)


def main() -> int:
    chars, cells, species, metadata, vocab = golden_parsed()
    out = RefSim(chars, cells, species, metadata, vocab).run()
    final = sorted(out["final"].triples())

    pins = {}
    for name in FAMILIES:
        pred = family_pred_py(name)
        pins[name] = digest_py([r for r in final if pred(r)])

    census = census_py(final)
    parts = []
    for key in ["char", "matrix", "species", "final"]:
        n, digest = digest_py(sorted(out[key].triples()))
        parts.append((key, n, digest))

    lines = ["GOLDEN_PINS: Dict[str, Tuple[int, str]] = {"]
    for name in sorted(pins):
        n, digest = pins[name]
        lines.append(f'    "{name}": ({n}, "{digest}"),')
    lines.append("}")
    lines.append("CENSUS_PINS: List[Tuple[str, int, str]] = [")
    for p, n, d in census:
        lines.append(f'    ("{p}", {n}, "{d}"),')
    lines.append("]")
    lines.append("PARTS_PINS: List[Tuple[str, int, str]] = [")
    for p, n, d in parts:
        lines.append(f'    ("{p}", {n}, "{d}"),')
    lines.append("]")
    block = "\n".join(lines)

    src = io.open(TARGET, encoding="utf-8").read()
    start = src.index(">>> GOLDEN_PINS_START")
    start = src.index("\n", start) + 1
    end = src.index("# <<< GOLDEN_PINS_END")
    src = src[:start] + block + "\n" + src[end:]
    io.open(TARGET, "w", encoding="utf-8").write(src)
    print(f"wrote {len(pins)} family pins, {len(census)} census rows, "
          f"{len(parts)} part rows to {TARGET}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
