"""One source of truth for registry counts (VERDICT r3 item 7).

COVERAGE.md / README.md / BASELINE.md repeatedly drifted from the live
registry ("46 canonical" vs "47" vs "49" across round-3 docs). This
test derives the real numbers from the registry modules and asserts
every "<N> canonical quer..." / "<N> granular" / "<N> oracle checks"
claim in the docs matches them, so a stale count fails CI instead of
confusing the next reader.
"""

from __future__ import annotations

import os
import re

from rdf_generator_spark import queries as Q
from rdf_generator_spark import queries_kg as QK

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_CANONICAL = len({**Q.QUERIES, **QK.QUERIES})
N_EXTRA = len({**Q.QUERIES_EXTRA, **QK.QUERIES_EXTRA})
N_ORACLE_CHECKS = len({**Q.ORACLES, **QK.ORACLES}) + len(
    {**Q.ORACLES_EXTRA, **QK.ORACLES_EXTRA}
)

DOCS = ["COVERAGE.md", "README.md", "BASELINE.md"]

PATTERNS = [
    # "46 canonical queries/operator entries/entries"
    (re.compile(r"(\d+) canonical (?:quer|operator|entr)"), N_CANONICAL),
    # "45 granular EXTRA entries" / "45 granular variants"
    (re.compile(r"(\d+) granular (?:EXTRA|variant)"), N_EXTRA),
    # "91 oracle checks"
    (re.compile(r"(\d+) oracle checks"), N_ORACLE_CHECKS),
]


def test_registry_is_fully_oracled():
    canon = {**Q.QUERIES, **QK.QUERIES}
    oracles = {**Q.ORACLES, **QK.ORACLES}
    assert set(oracles) == set(canon)
    extra_q = {**Q.QUERIES_EXTRA, **QK.QUERIES_EXTRA}
    extra_o = {**Q.ORACLES_EXTRA, **QK.ORACLES_EXTRA}
    assert set(extra_o) == set(extra_q)
    assert not set(canon) & set(extra_q)


def test_doc_count_claims_match_registry():
    failures = []
    n_claims = 0
    for doc in DOCS:
        text = open(os.path.join(REPO, doc), encoding="utf-8").read()
        for pat, want in PATTERNS:
            for m in pat.finditer(text):
                n_claims += 1
                if int(m.group(1)) != want:
                    failures.append(f"{doc}: '{m.group(0)}' should be {want}")
    assert not failures, failures
    # the claims must actually exist (guard against silently reworded docs)
    assert n_claims >= 6, n_claims
