#!/usr/bin/env python
"""Round-11 lint: which HEADLINE queries lose plan nodes under count()?

For every bench.py HEADLINE query, compiles the physical plan of
``df.groupBy().count()`` and of the full-width materialization, and
reports queries whose count() plan dropped Join/Generate/Window nodes —
the round-9 "count() can lie" failure mode (bigram_lm_fluency) that also
hid gopher_repetition_signals' real cost in r9/r10.

Plan compilation only — no execution; runs at sf0.01 in seconds.
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from real_estate_project1_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
NODES = re.compile(r"\b(\w*Join\w*|Generate|Window\w*)\b")


def counts(plan: str):
    out = {}
    for m in NODES.findall(plan):
        out[m] = out.get(m, 0) + 1
    return out


def main():
    import bench

    spark = get_spark("r11-elim-scan", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    flagged, errors = [], []
    for name in bench.HEADLINE:
        try:
            df = queries[name](spark, SF_DIR)
            full = df._jdf.queryExecution().executedPlan().toString()
            cnt = (
                df.groupBy()
                .count()
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:
            errors.append((name, str(exc)[:100]))
            continue
        cf, cc = counts(full), counts(cnt)
        dropped = {
            k: cf[k] - cc.get(k, 0) for k in cf if cf[k] > cc.get(k, 0)
        }
        if dropped:
            mark = (
                " (already ELIMINATION_PRONE)"
                if name in bench.ELIMINATION_PRONE
                else " *** NOT HANDLED ***"
            )
            flagged.append(f"{name}: dropped {dropped}{mark}")
    for line in flagged:
        print(line)
    for name, err in errors:
        print(f"ERROR {name}: {err}")
    if not flagged:
        print("no elimination-prone queries found")
    spark.stop()


if __name__ == "__main__":
    main()
