"""Capture .explain('formatted') for bench queries into plans/r15/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt for each bench query (or the
given subset). Streaming queries (plans only exist inside a run) and
bench-override production rows are captured from their registered
DataFrame when one is constructible; queries whose callable starts a
streaming job are skipped with a note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]

    os.environ.setdefault("SPARK_GRAFT_AQE", "false")  # match bench posture
    import __spark_entry__ as e
    from pandas_reporter_spark.session import get_session
    import bench

    qs = {**e.queries(), **bench._bench_overrides()}
    names = only or [n for n in bench.BENCH_QUERIES if n in qs]
    spark = get_session("capture_plans")

    # SPARK_GRAFT_PRIME=1: build the at-rest sidecars first so captured
    # plans show the same primed shapes the bench times (r15 — the
    # unprimed capture shows artifact consumers' self-derive fallback
    # plans instead, e.g. the BM25 leg re-tokenizing the corpus).
    if os.environ.get("SPARK_GRAFT_PRIME", "").strip() in ("1", "true"):
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

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"))
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, SF_DIR)
            if df.isStreaming:
                text = ("(streaming DataFrame: logical plan only; physical plan "
                        "exists per micro-batch)\n")
                text += df._jdf.queryExecution().analyzed().toString()
            else:
                text = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
        except Exception as ex:
            text = f"(plan capture failed: {ex!r})\n"
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
