"""Round-12 verdict item 1: interleaved A/B for containment_quote_pairs.

BENCH_r11.json recorded 3.16 s for containment_quote_pairs while the SAME
round's final full-bench run (bench_err.log:62) recorded 1.859 s — two
full-bench executions of identical code, 1.7x apart, which is exactly the
ambient-drift signature documented in SCALE.md ("Round-11: ambient host
drift", measured 1.4x on an identical probe three hours apart). This probe
settles it with the documented method: ONE fresh session, target and a
stable control interleaved turn by turn, so any host-level slowdown hits
both and the RATIO is drift-immune.

Control: prefix_filter_jaccard_pairs — same family (shingle + prefix-filter
candidate join + verify), stable bench history, no shared cached state with
the target (each query builds its own shingle sets).

Run:  python tools/r12_ab_containment.py [sf_dir] [iters]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    import __spark_entry__ as entry
    from real_estate_project1_etl_spark.session import get_spark

    spark = get_spark(
        "r12-ab-containment",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry.queries()
    target = qs["containment_quote_pairs"]
    control = qs["prefix_filter_jaccard_pairs"]

    # steady-state warmup at the target SF, both queries
    target(spark, sf).count()
    control(spark, sf).count()

    t_times, c_times = [], []
    for i in range(iters):
        t0 = time.time()
        tn = target(spark, sf).count()
        t_times.append(time.time() - t0)
        t0 = time.time()
        cn = control(spark, sf).count()
        c_times.append(time.time() - t0)
        print(
            f"iter {i}: target {t_times[-1]:.3f}s ({tn} rows)  "
            f"control {c_times[-1]:.3f}s ({cn} rows)",
            flush=True,
        )

    def stats(xs):
        s = sorted(xs)
        return s[len(s) // 2], s[0], s[-1]

    tm, tlo, thi = stats(t_times)
    cm, clo, chi = stats(c_times)
    print(f"\ntarget  median {tm:.3f}s  min {tlo:.3f}  max {thi:.3f}")
    print(f"control median {cm:.3f}s  min {clo:.3f}  max {chi:.3f}")
    print(f"ratio target/control: {tm / cm:.2f}")
    verdict = (
        "DRIFT: interleaved median is in the 1.86s final-run band, not the "
        "3.16s artifact band"
        if tm <= 2.2
        else "REGRESSION CANDIDATE: interleaved median stays above 2.2s — "
        "bisect the operator"
    )
    print(f"verdict: {verdict}")


if __name__ == "__main__":
    main()
