"""Isolated per-query timing: min-of-N noop-sink runs for the named
bench queries, after the same warm-up/prime sequence bench.py uses.

Usage: python tools/qtime.py [-n reps] <query> [query ...]
Prints one JSON line {"query": best_sec, ...} at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args

    # bench posture since r16: AQE on (production default); env wins for A/Bs
    import __spark_entry__ as e
    import bench
    from pandas_reporter_spark.session import get_session

    qs = {**e.queries(), **bench._bench_overrides()}
    spark = get_session("qtime")

    bench.run(qs["q_tpch_q1"](spark, SF_DIR))  # JVM + footer warm-up
    try:
        from pandas_reporter_spark.tables import relayout

        relayout(spark, SF_DIR)
    except Exception:
        pass
    try:
        from pandas_reporter_spark.ingest import ingest

        ingest(spark, SF_DIR)
    except Exception:
        pass

    def _ident(it):
        for pdf in it:
            yield pdf

    spark.range(0, 256, 1, 32).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        if os.path.isdir(warm_dir):
            try:
                bench.run(qs[name](spark, warm_dir))  # codegen warm-up
            except Exception:
                pass

    best: dict[str, float | None] = {}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            try:
                bench.run(qs[name](spark, SF_DIR))
            except Exception as exc:
                print(f"qtime: {name} FAILED: {exc!r}", file=sys.stderr)
                best.setdefault(name, None)
                continue
            dt = round(time.time() - t0, 3)
            if best.get(name) is None or dt < best[name]:
                best[name] = dt
    print(json.dumps(best))


if __name__ == "__main__":
    main()
