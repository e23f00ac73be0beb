"""Per-query isolation bench (guide §1.4) — NOT the driver's harness.

Times a named subset of ``__spark_entry__.queries()`` against the noop
sink, same methodology as bench.py's query loop (reps, min) but without
the headline pipeline, so single-operator A/B runs are fast. Also dumps
``.explain('formatted')`` per query when asked.

Usage:
    python bench_extra.py q1 q2 ...            # time those queries
    python bench_extra.py --reps 3 q1 q2
    python bench_extra.py --explain DIR q1 ... # also write DIR/<q>.txt
    python bench_extra.py --all                # every query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    explain_dir = None
    names: list[str] = []
    run_all = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif a == "--all":
            run_all = True; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from geobuf_cpp_spark.session import get_spark

    spark = get_spark("bench_extra", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    todo = list(qs) if run_all else names
    timings = {}
    for name in todo:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(max(reps, 0)):  # --reps 0: plan dump only
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            timings[name] = round(best, 3)
            print(f"{name}: {best:.3f}s", file=sys.stderr, flush=True)
        if explain_dir:
            import io
            from contextlib import redirect_stdout

            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
    spark.stop()
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
