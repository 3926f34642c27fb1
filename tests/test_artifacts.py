"""Doc/artifact hygiene: every `artifacts/*.json` path cited in the
top-level docs must exist and parse (VERDICT r4 §weak-2 — measurement
claims with no committed measurements)."""
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC_FILES = ["ROADMAP.md", "README.md",
             os.path.join("docs", "PERFORMANCE.md"),
             os.path.join("docs", "PARITY.md"),
             os.path.join("docs", "REPRODUCE.md")]
_CITE = re.compile(r"artifacts/[A-Za-z0-9_.-]+\.json")


def cited_artifacts():
    paths = set()
    for doc in DOC_FILES:
        p = os.path.join(ROOT, doc)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            paths.update(_CITE.findall(f.read()))
    return sorted(paths)


@pytest.mark.parametrize("rel", cited_artifacts())
def test_cited_artifact_exists_and_parses(rel):
    path = os.path.join(ROOT, rel)
    assert os.path.exists(path), (
        f"{rel} is cited in docs but not committed — run the tool that "
        "produces it (or drop the citation)")
    with open(path) as f:
        data = json.load(f)
    assert data, f"{rel} exists but is empty"
