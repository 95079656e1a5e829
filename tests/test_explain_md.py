"""EXPLAIN.md completeness (round-12 verdict item 3): the committed
plan artifact must contain a section for every one of the 10 costliest
BENCH_FULL queries — curation can add context, but it can never drop
the plans a reviewer most wants to read."""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_explain_md_contains_bench_top10():
    with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
        q = json.load(f)["queries"]
    top10 = [n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])[:10]]
    with open(os.path.join(REPO, "EXPLAIN.md")) as f:
        sections = set(re.findall(r"^## (\S+)$", f.read(), re.M))
    missing = [n for n in top10 if n not in sections]
    assert not missing, (
        f"EXPLAIN.md is missing top-10 bench plans {missing} — rerun "
        "tools/gen_explain.py after refreshing BENCH_FULL.json"
    )


def test_explain_md_sections_are_registered_queries():
    import __spark_entry__ as entry

    names = set(entry.queries())
    with open(os.path.join(REPO, "EXPLAIN.md")) as f:
        sections = set(re.findall(r"^## (\S+)$", f.read(), re.M))
    stale = sorted(sections - names)
    assert not stale, f"EXPLAIN.md documents unregistered queries: {stale}"
