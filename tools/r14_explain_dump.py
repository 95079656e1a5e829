"""Round-13 optimization deliverable: dump ``explain('formatted')`` for
named declared queries into plans/r13/<query>_<tag>.txt.

Run: python tools/r13_explain_dump.py <tag> <query> [query ...]
     (tag is 'before' or 'after'; sf dir via $SPARK_GRAFT_SF_DIR)
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from real_estate_project1_etl_spark.session import get_spark

    spark = get_spark(
        "r14-explain", cpus=32, shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
